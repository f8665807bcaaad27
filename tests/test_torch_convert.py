# torch->flax checkpoint conversion (MIGRATION.md "Bringing torch
# weights"): a reference-format .pth state_dict converted by
# execution/torch_convert.py must make the flax model produce the same
# dense outputs as the torch source modules.
import os

import numpy as np
import pytest

from tests.test_reference_parity import REF, _build_flax_s, _build_torch_s

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not available"
)


def _reference_style_state_dict(bb, neck, head, module_prefix=False):
    sd = {}
    for prefix, mod in (("_backbone", bb), ("_neck", neck), ("_head", head)):
        for k, v in mod.state_dict().items():
            sd[f"{prefix}.{k}"] = v
    if module_prefix:  # DataParallel-saved checkpoints
        sd = {f"module.{k}": v for k, v in sd.items()}
    return sd


def test_convert_reference_checkpoint_roundtrip(tmp_path):
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp

    from lfdtpu.execution import load_checkpoint, save_checkpoint
    from lfdtpu.execution.torch_convert import load_reference_checkpoint

    det, variables = _build_flax_s()
    bb, neck, head = _build_torch_s()  # randomly initialized torch source

    # make BN running stats non-trivial so their conversion is exercised
    with torch.no_grad():
        for m in list(bb.modules()) + list(neck.modules()):
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)

    pth = tmp_path / "ref.pth"
    torch.save(
        {"state_dict": _reference_style_state_dict(bb, neck, head, module_prefix=True),
         "meta": {"epoch": 1000}},
        pth,
    )

    converted = load_reference_checkpoint(str(pth), det, variables)

    # converted checkpoint must survive lfdtpu checkpoint IO
    out = tmp_path / "converted.pkl"
    save_checkpoint(str(out), converted)
    state, _ = load_checkpoint(str(out), strict=True, target_structure=converted)
    variables = {"params": state["params"], "batch_stats": state["batch_stats"]}

    rng = np.random.RandomState(0)
    x = rng.rand(1, 128, 128, 3).astype(np.float32)
    cls_f, reg_f = det.net.apply(variables, jnp.asarray(x), train=False)

    bb.eval(); neck.eval(); head.eval()
    with torch.no_grad():
        tx = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())
        cls_outs, reg_outs = head(neck(bb(tx)))
        cls_t = torch.cat(
            [o.permute(0, 2, 3, 1).reshape(1, -1, o.shape[1]) for o in cls_outs], dim=1
        ).numpy()
        reg_t = torch.cat(
            [o.permute(0, 2, 3, 1).reshape(1, -1, o.shape[1]) for o in reg_outs], dim=1
        ).numpy()

    np.testing.assert_allclose(np.asarray(cls_f), cls_t, rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(reg_f), reg_t, rtol=1e-3, atol=2e-4)


def test_convert_rejects_shape_mismatch(tmp_path):
    torch = pytest.importorskip("torch")

    from lfdtpu import zoo
    from lfdtpu.execution.torch_convert import convert_reference_state_dict

    import jax

    det = zoo.widerface_lfd("XS")  # wrong architecture for an S state_dict
    variables = det.init(jax.random.PRNGKey(0), (128, 128))
    bb, neck, head = _build_torch_s()
    sd = {k: v.numpy() for k, v in
          _reference_style_state_dict(bb, neck, head).items()}
    with pytest.raises(AssertionError):
        convert_reference_state_dict(sd, det, variables)


def test_convert_torchvision_resnet18():
    """A conv1/bn1/layer{s} state_dict (torchvision naming — also what the
    reference's pretrained-backbone loader consumes) must convert to
    identical forward outputs."""
    torch = pytest.importorskip("torch")
    import importlib.util
    import sys

    import jax
    import jax.numpy as jnp

    from lfdtpu.execution.torch_convert import convert_torchvision_resnet
    from lfdtpu.models import ResNet

    spec = importlib.util.spec_from_file_location(
        "ref_resnet_cv", os.path.join(REF, "lfd/model/backbone/resnet.py"))
    rr = importlib.util.module_from_spec(spec)
    sys.modules["ref_resnet_cv"] = rr
    spec.loader.exec_module(rr)

    trn = rr.ResNet(depth=18)  # default taps: last block of each stage
    with torch.no_grad():
        for m in trn.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)

    frn = ResNet(depth=18, norm_cfg=dict(type="BN"))
    x = np.random.RandomState(0).rand(1, 64, 64, 3).astype(np.float32)
    v = frn.init(jax.random.PRNGKey(0), jnp.asarray(x))

    sd = {k: t.numpy() for k, t in trn.state_dict().items()}
    converted = convert_torchvision_resnet(sd, v)

    outs_f = frn.apply(converted, jnp.asarray(x), train=False)

    trn.eval()
    with torch.no_grad():
        tx = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())
        outs_t = trn(tx)
    assert len(outs_f) == len(outs_t)
    for a, b in zip(outs_f, outs_t):
        bt = b.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(a), bt, rtol=1e-3, atol=2e-4)


def test_convert_deep_stem_resnet50():
    """mmdet-style deep-stem checkpoints (stem.{i} Sequential) convert via
    the same path; Bottleneck downsample mapping also exercised."""
    torch = pytest.importorskip("torch")
    import importlib.util
    import sys

    import jax
    import jax.numpy as jnp

    from lfdtpu.execution.torch_convert import convert_torchvision_resnet
    from lfdtpu.models import ResNet

    spec = importlib.util.spec_from_file_location(
        "ref_resnet_ds", os.path.join(REF, "lfd/model/backbone/resnet.py"))
    rr = importlib.util.module_from_spec(spec)
    sys.modules["ref_resnet_ds"] = rr
    spec.loader.exec_module(rr)

    trn = rr.ResNet(depth=50, deep_stem=True)
    with torch.no_grad():
        for m in trn.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)

    frn = ResNet(depth=50, deep_stem=True, norm_cfg=dict(type="BN"))
    x = np.random.RandomState(0).rand(1, 64, 64, 3).astype(np.float32)
    v = frn.init(jax.random.PRNGKey(0), jnp.asarray(x))

    sd = {k: t.numpy() for k, t in trn.state_dict().items()}
    converted = convert_torchvision_resnet(sd, v)
    outs_f = frn.apply(converted, jnp.asarray(x), train=False)

    trn.eval()
    with torch.no_grad():
        tx = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())
        outs_t = trn(tx)
    for a, b in zip(outs_f, outs_t):
        np.testing.assert_allclose(
            np.asarray(a), b.permute(0, 2, 3, 1).numpy(), rtol=1e-3, atol=3e-4)
