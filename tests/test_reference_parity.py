# Numerical parity against the reference torch implementation: copy one set
# of weights into both the flax model and the reference torch modules and
# compare dense outputs. Skipped when the reference checkout is absent.
#
# This is the "same weights => same boxes" oracle SURVEY.md §4 calls for:
# if the conv stacks agree to float tolerance, decode parity (tested in
# test_decode_parity.py) carries it through to final detections.
import importlib.util
import os
import sys

import numpy as np
import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not available"
)


def _load_ref(name, rel):
    spec = importlib.util.spec_from_file_location(name, os.path.join(REF, rel))
    m = importlib.util.module_from_spec(spec)
    sys.modules[name] = m
    spec.loader.exec_module(m)
    return m


def _build_flax_s():
    from lfdtpu import zoo

    det = zoo.widerface_lfd("S")
    import jax

    variables = det.init(jax.random.PRNGKey(0), (128, 128))
    return det, variables


def _build_torch_s():
    torch = pytest.importorskip("torch")
    lr = _load_ref("ref_lfd_resnet_p", "lfd/model/backbone/lfd_resnet.py")
    snk = _load_ref("ref_simple_neck_p", "lfd/model/neck/simple_neck.py")
    lh = _load_ref("ref_lfd_head_p", "lfd/model/head/lfd_head.py")
    bb = lr.LFDResNet(
        block_mode="faster", stem_mode="faster", body_mode=None,
        input_channels=3, stem_channels=64,
        body_architecture=[4, 2, 2, 3], body_channels=[64, 64, 64, 128],
        out_indices=((0, 3), (1, 1), (2, 1), (3, 0), (3, 2)),
        norm_cfg=dict(type="BatchNorm2d"),
    )
    neck = snk.SimpleNeck(
        num_neck_channels=128,
        num_input_channels_list=bb.num_output_channels_list,
        num_input_strides_list=bb.num_output_strides_list,
        norm_cfg=dict(type="BatchNorm2d"),
    )
    head = lh.LFDHead(
        num_classes=1, num_heads=5, num_input_channels=128,
        num_head_channels=128, num_conv_layers=2,
        norm_cfg=dict(type="GroupNorm", num_groups=16),
        share_head_flag=True, merge_path_flag=True,
        classification_loss_type="FocalLoss", regression_loss_type="IoULoss",
    )
    return bb, neck, head


def _flax_convs_in_order(params, batch_stats, include_head=True):
    """(kernel, bias?, norm_scale?, norm_bias?) per conv, in forward order,
    using the known module naming of this repo's backbone/neck/head.
    include_head=False stops after the neck (for detectors with a non-LFD
    head, e.g. FCOS — see test_reference_parity_v2.py)."""
    entries = []

    def conv_norm(tree, stats):
        conv = tree["Conv_0"]
        norm = None
        if "Norm_0" in tree:
            sub = tree["Norm_0"]
            key = "BatchNorm_0" if "BatchNorm_0" in sub else "GroupNorm_0"
            norm = dict(sub[key])
            if stats is not None and "Norm_0" in stats:
                norm.update(stats["Norm_0"][key])
        return conv, norm

    bb = params["backbone"]
    bbs = batch_stats.get("backbone", {})
    for k in ["stem0", "stem1", "stem2", "stem3"]:
        entries.append(("bb." + k,) + conv_norm(bb[k], bbs.get(k)))
    for i, nblocks in enumerate([4, 2, 2, 3]):
        for j in range(nblocks):
            name = f"stage{i}_block{j}"
            blk = bb[name]
            blks = bbs.get(name, {})
            for c in ["ConvNormAct_0", "ConvNormAct_1"]:
                entries.append((f"bb.{name}.{c}",) + conv_norm(blk[c], blks.get(c)))
            if j == 0:
                sc = blk["_Shortcut_0"]
                scs = blks.get("_Shortcut_0", {})
                entries.append(
                    (f"bb.{name}.shortcut",) + conv_norm(sc, scs)
                )
    nk = params["neck"]
    nks = batch_stats.get("neck", {})
    for i in range(5):
        entries.append((f"neck{i}",) + conv_norm(nk[f"neck{i}"], nks.get(f"neck{i}")))
    if not include_head:
        return entries
    hd = params["head"]
    for c in ["conv0", "conv1"]:
        sub = hd["shared_merge"][c]
        norm = dict(sub["Norm_0"]["GroupNorm_0"])
        entries.append((f"head.merge.{c}", sub["Conv_0"], norm))
    entries.append(("head.cls_final", hd["shared_cls"]["final"], None))
    entries.append(("head.reg_final", hd["shared_reg"]["final"], None))
    return entries


def _torch_convs_in_order(bb, neck, head=None):
    import torch.nn as nn

    mods = []
    # stem: Sequential [conv, bn, relu] * 4
    seq = list(bb._stem)
    for i in range(0, len(seq), 3):
        mods.append((seq[i], seq[i + 1]))
    for i, nblocks in enumerate([4, 2, 2, 3]):
        stage = getattr(bb, f"stage{i}")
        for j in range(nblocks):
            blk = stage[j]
            mods.append((blk._conv1, blk._norm1))
            mods.append((blk._conv2, blk._norm2))
            if blk._downsample is not None:
                mods.append((blk._downsample[0], blk._downsample[1]))
    for i in range(5):
        seq = list(getattr(neck, f"neck{i}"))
        mods.append((seq[0], seq[1]))
    if head is None:
        return mods
    merge = list(head.head0_merge_path)
    # [conv, gn, relu, conv, gn, relu]
    mods.append((merge[0], merge[1]))
    mods.append((merge[3], merge[4]))
    mods.append((list(head.head0_classification_path)[0], None))
    mods.append((list(head.head0_regression_path)[0], None))
    return mods


def _transplant_s(variables, bb, neck, head=None):
    """Copy the flax WIDERFACE-S weights into the reference torch modules.
    head=None transplants backbone+neck only (FCOS-head models transplant
    their head separately)."""
    import torch

    flax_entries = _flax_convs_in_order(
        variables["params"], variables.get("batch_stats", {}),
        include_head=head is not None,
    )
    torch_mods = _torch_convs_in_order(bb, neck, head)
    assert len(flax_entries) == len(torch_mods), (
        len(flax_entries), len(torch_mods)
    )

    with torch.no_grad():
        for (name, conv, norm), (tconv, tnorm) in zip(flax_entries, torch_mods):
            k = np.asarray(conv["kernel"])  # HWIO
            w = torch.from_numpy(np.transpose(k, (3, 2, 0, 1)).copy())
            assert tuple(w.shape) == tuple(tconv.weight.shape), (name, w.shape, tconv.weight.shape)
            tconv.weight.copy_(w)
            if "bias" in conv and tconv.bias is not None:
                tconv.bias.copy_(torch.from_numpy(np.asarray(conv["bias"]).copy()))
            if norm is not None and tnorm is not None:
                tnorm.weight.copy_(torch.from_numpy(np.asarray(norm["scale"]).copy()))
                tnorm.bias.copy_(torch.from_numpy(np.asarray(norm["bias"]).copy()))
                if hasattr(tnorm, "running_mean") and "mean" in norm:
                    tnorm.running_mean.copy_(torch.from_numpy(np.asarray(norm["mean"]).copy()))
                    tnorm.running_var.copy_(torch.from_numpy(np.asarray(norm["var"]).copy()))
        # per-level reg Scale params
        if head is not None:
            for i in range(5):
                s = np.asarray(variables["params"]["head"][f"scale{i}"]["scale"])
                head._scales[i]._scale.copy_(torch.tensor(float(s)))


def test_same_weights_same_outputs():
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp

    det, variables = _build_flax_s()
    bb, neck, head = _build_torch_s()
    _transplant_s(variables, bb, neck, head)

    rng = np.random.RandomState(0)
    x = rng.rand(1, 128, 128, 3).astype(np.float32)

    # flax forward (eval)
    cls_f, reg_f = det.net.apply(variables, jnp.asarray(x), train=False)

    # torch forward (eval) with the same reformat as lfd.py:524-542
    bb.eval(); neck.eval(); head.eval()
    with torch.no_grad():
        tx = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())
        feats = bb(tx)
        feats = neck(feats)
        cls_outs, reg_outs = head(feats)
        cls_t = torch.cat(
            [o.permute(0, 2, 3, 1).reshape(1, -1, o.shape[1]) for o in cls_outs], dim=1
        ).numpy()
        reg_t = torch.cat(
            [o.permute(0, 2, 3, 1).reshape(1, -1, o.shape[1]) for o in reg_outs], dim=1
        ).numpy()

    np.testing.assert_allclose(np.asarray(cls_f), cls_t, rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(reg_f), reg_t, rtol=1e-3, atol=2e-4)


def _spice_variables(variables):
    """Make a randomly initialized WIDERFACE-S produce sparse, well-spread
    detections: final cls logits ~ N(-6, ~3) so ~2% of points score > 0.5
    with scores far from any threshold boundary (flip-proof comparisons)."""
    import jax

    params = jax.device_get(variables["params"])
    head = params["head"]
    head["shared_cls"]["final"]["kernel"] = (
        np.asarray(head["shared_cls"]["final"]["kernel"]) * 30.0
    )
    head["shared_cls"]["final"]["bias"] = (
        np.asarray(head["shared_cls"]["final"]["bias"]) - 6.0
    )
    head["shared_reg"]["final"]["kernel"] = (
        np.asarray(head["shared_reg"]["final"]["kernel"]) * 5.0
    )
    return dict(variables, params=params)


def _build_ref_full_model(lfd, bb, neck, head):
    from lfd.model.losses import FocalLoss, IoULoss

    return lfd.model.LFD(
        backbone=bb, neck=neck, head=head, num_classes=1,
        regression_ranges=((4, 20), (20, 40), (40, 80), (80, 160), (160, 320)),
        gray_range_factors=(0.9, 1.1), range_assign_mode="dist",
        point_strides=tuple(neck.num_output_strides_list),
        classification_loss_func=FocalLoss(),
        regression_loss_func=IoULoss(eps=1e-6),
        distance_to_bbox_mode="sigmoid",
    )


def test_e2e_predict_parity_on_bundled_images():
    """THE oracle VERDICT r1 asked for: the reference's actual
    `predict_for_single_image` (`lfd/model/lfd.py:544-655`, torch CPU with
    faithful stubs for its CUDA exts) vs this repo's predict, same
    transplanted weights, on the reference's bundled test images —
    identical [label, score, x1, y1, w, h] rows. Covers forward, native-
    size point grids, sigmoid decode, multiclass NMS and row formatting."""
    torch = pytest.importorskip("torch")
    import cv2

    from ref_harness import load_reference, simple_normalize_pipeline

    lfd = load_reference()
    det, variables = _build_flax_s()
    variables = _spice_variables(variables)
    bb, neck, head = _build_torch_s()
    _transplant_s(variables, bb, neck, head)
    ref_model = _build_ref_full_model(lfd, bb, neck, head)

    # two shared odd-sized shapes keep the jit-compile count at 2
    sizes = {1: (449, 257), 2: (449, 257), 4: (449, 257),
             3: (577, 319), 5: (577, 319)}
    total = 0
    for idx in (1, 2, 3, 4, 5):
        img = cv2.imread(
            f"{REF}/WIDERFACE_train/test_images/image{idx}.jpg",
            cv2.IMREAD_UNCHANGED,
        )
        w, h = sizes[idx]
        img = cv2.resize(img, (w, h))

        ref_rows = ref_model.predict_for_single_image(
            img, aug_pipeline=simple_normalize_pipeline,
            classification_threshold=0.5, nms_threshold=0.3,
        )
        got_rows = det.predict_for_single_image(
            variables, img, aug_pipeline=simple_normalize_pipeline,
            classification_threshold=0.5, nms_threshold=0.3,
            size_divisor=1,  # native size, like the reference
        )
        ref_arr = np.asarray(sorted(ref_rows, key=lambda r: -r[1]), np.float64)
        got_arr = np.asarray(sorted(got_rows, key=lambda r: -r[1]), np.float64)
        assert len(ref_rows) == len(got_rows), (
            idx, len(ref_rows), len(got_rows)
        )
        if len(ref_rows):
            np.testing.assert_array_equal(got_arr[:, 0], ref_arr[:, 0])
            np.testing.assert_allclose(got_arr[:, 1], ref_arr[:, 1], rtol=2e-3, atol=1e-4)
            np.testing.assert_allclose(got_arr[:, 2:], ref_arr[:, 2:], rtol=1e-2, atol=0.6)
        total += len(ref_rows)
    assert total >= 5, f"vacuous parity run: only {total} detections across images"


def test_get_loss_parity_vs_reference():
    """Same weights + same batch => same loss scalars as the reference's
    `get_loss` (`lfd/model/lfd.py:284-395`): closes the loop on target
    assignment, gray-zone filtering, focal/IoU numerics and avg factors."""
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp

    from ref_harness import load_reference

    lfd = load_reference()
    det, variables = _build_flax_s()
    variables = _spice_variables(variables)
    bb, neck, head = _build_torch_s()
    _transplant_s(variables, bb, neck, head)
    ref_model = _build_ref_full_model(lfd, bb, neck, head)

    rng = np.random.RandomState(7)
    B, H, W = 2, 160, 160
    images = rng.rand(B, H, W, 3).astype(np.float32) * 2 - 1
    # boxes spanning several detection scales, xywh
    ann = [
        (np.asarray([[20, 30, 18, 12], [60, 80, 70, 64], [10, 100, 36, 40]], np.float32),
         np.zeros((3,), np.int64)),
        (np.asarray([[5, 5, 150, 140], [90, 20, 24, 28]], np.float32),
         np.zeros((2,), np.int64)),
    ]

    # reference: eval-mode forward + get_loss
    ref_model.eval()
    with torch.no_grad():
        tx = torch.from_numpy(np.transpose(images, (0, 3, 1, 2)).copy())
        outs = ref_model(tx)
        ref_losses = ref_model.get_loss(outs, ann)
    ref_vals = {k: float(v) for k, v in ref_losses["loss_values"].items()}

    # ours: same batch, padded-GT format
    Nmax = 4
    gt = np.zeros((B, Nmax, 4), np.float32)
    labels = np.zeros((B, Nmax), np.int32)
    mask = np.zeros((B, Nmax), bool)
    for i, (bxs, lbs) in enumerate(ann):
        gt[i, : len(bxs)] = bxs
        labels[i, : len(lbs)] = lbs
        mask[i, : len(bxs)] = True
    our_outs = det(variables, jnp.asarray(images), train=False)
    got = det.get_loss(
        our_outs, jnp.asarray(gt), jnp.asarray(labels), jnp.asarray(mask), (H, W)
    )
    got_vals = {k: float(v) for k, v in got["loss_values"].items()}

    assert int(got_vals["num_pos"]) > 0
    for k in ("classification_loss", "regression_loss", "loss"):
        np.testing.assert_allclose(got_vals[k], ref_vals[k], rtol=2e-3, err_msg=k)


def test_train_step_trajectory_parity_vs_reference():
    """Same weights + same batch + plain SGD => the same 3-step loss
    TRAJECTORY as the live reference (torch autograd vs our custom-VJP
    focal loss and IoU-loss autodiff, BN in train mode, target assignment
    under gradient). Catches gradient-semantics drift that single-forward
    parity cannot."""
    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp

    from ref_harness import load_reference

    lfd = load_reference()
    det, variables = _build_flax_s()
    bb, neck, head = _build_torch_s()
    _transplant_s(variables, bb, neck, head)
    ref_model = _build_ref_full_model(lfd, bb, neck, head)

    rng = np.random.RandomState(3)
    B, H, W = 2, 128, 128
    images = rng.rand(B, H, W, 3).astype(np.float32) * 2 - 1
    ann = [
        (np.asarray([[20, 30, 18, 12], [60, 80, 50, 44]], np.float32),
         np.zeros((2,), np.int64)),
        (np.asarray([[10, 10, 30, 26]], np.float32), np.zeros((1,), np.int64)),
    ]
    lr = 0.01

    # --- reference: torch SGD, train mode (BN batch stats + running update)
    ref_model.train()
    opt = torch.optim.SGD(ref_model.parameters(), lr=lr)
    tx = torch.from_numpy(np.transpose(images, (0, 3, 1, 2)).copy())
    ref_losses = []
    for _ in range(3):
        outs = ref_model(tx)
        ld = ref_model.get_loss(outs, ann)
        loss = ld["loss"]
        opt.zero_grad()
        loss.backward()
        opt.step()
        ref_losses.append(float(loss))

    # --- ours: same plain SGD on the jitted loss
    gt = np.zeros((B, 2, 4), np.float32)
    labels = np.zeros((B, 2), np.int32)
    mask = np.zeros((B, 2), bool)
    for i, (bxs, lbs) in enumerate(ann):
        gt[i, : len(bxs)] = bxs
        mask[i, : len(bxs)] = True
    gt_j, lb_j, mk_j = jnp.asarray(gt), jnp.asarray(labels), jnp.asarray(mask)
    img_j = jnp.asarray(images)

    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    @jax.jit
    def step(params, batch_stats):
        def loss_fn(p):
            outs, mut = det.forward(
                {"params": p, "batch_stats": batch_stats}, img_j, train=True
            )
            ld = det.get_loss(outs, gt_j, lb_j, mk_j, (H, W))
            return ld["loss"], mut["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        new_params = jax.tree.map(lambda p, g: p - lr * g, params, grads)
        return new_params, new_bs, loss

    got_losses = []
    for _ in range(3):
        params, batch_stats, loss = step(params, batch_stats)
        got_losses.append(float(loss))

    np.testing.assert_allclose(got_losses, ref_losses, rtol=5e-3)


def test_fcos_head_weight_parity():
    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp

    from lfdtpu.models import FCOSHead

    lh = _load_ref("ref_fcos_head_p", "lfd/model/head/fcos_head.py")
    thead = lh.FCOSHead(num_classes=3, num_input_channels=32,
                        num_head_channels=32, num_heads=2, num_layers=2,
                        norm_cfg=None)
    fhead = FCOSHead(num_classes=3, num_heads=2, num_head_channels=32,
                     num_layers=2, norm_cfg=None)
    rng = np.random.RandomState(0)
    feats = [rng.rand(1, 16, 16, 32).astype(np.float32),
             rng.rand(1, 8, 8, 32).astype(np.float32)]
    v = fhead.init(jax.random.PRNGKey(0), [jnp.asarray(f) for f in feats])
    p = v["params"]

    def copy_conv(tconv, fconv):
        k = np.asarray(fconv["kernel"])
        tconv.weight.copy_(torch.from_numpy(np.transpose(k, (3, 2, 0, 1)).copy()))
        if tconv.bias is not None and "bias" in fconv:
            tconv.bias.copy_(torch.from_numpy(np.asarray(fconv["bias"]).copy()))

    with torch.no_grad():
        # towers: reference ModuleList [conv, relu] * num_layers (no norm)
        tc = [m for m in thead._classification_path if isinstance(m, torch.nn.Conv2d)]
        tr = [m for m in thead._regression_path if isinstance(m, torch.nn.Conv2d)]
        for i in range(2):
            copy_conv(tc[i], p["cls_tower"][f"conv{i}"]["Conv_0"])
            copy_conv(tr[i], p["reg_tower"][f"conv{i}"]["Conv_0"])
        copy_conv(thead._classification, p["classification"])
        copy_conv(thead._centerness, p["centerness"])
        copy_conv(thead._regression, p["regression"])
        for i in range(2):
            thead._scales[i]._scale.copy_(
                torch.tensor(float(np.asarray(p[f"scale{i}"]["scale"])))
            )

    cls_f, reg_f, ctr_f = fhead.apply(v, [jnp.asarray(f) for f in feats])
    thead.eval()
    with torch.no_grad():
        tfeats = [torch.from_numpy(np.transpose(f, (0, 3, 1, 2)).copy()) for f in feats]
        cls_t, reg_t, ctr_t = thead(tfeats)
    for ff, tt in zip(cls_f + reg_f + ctr_f, cls_t + reg_t + ctr_t):
        np.testing.assert_allclose(
            np.asarray(ff), np.transpose(tt.numpy(), (0, 2, 3, 1)),
            rtol=1e-3, atol=1e-4,
        )


def test_resnet18_weight_parity():
    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp

    from lfdtpu.models import ResNet

    rr = _load_ref("ref_resnet_p", "lfd/model/backbone/resnet.py")
    trn = rr.ResNet(depth=18)
    frn = ResNet(depth=18, norm_cfg=dict(type="BN"))
    x = np.random.RandomState(0).rand(1, 64, 64, 3).astype(np.float32)
    v = frn.init(jax.random.PRNGKey(0), jnp.asarray(x))
    p, bs = v["params"], v.get("batch_stats", {})

    def entry(tree, stats):
        conv = tree["Conv_0"]
        norm = dict(tree["Norm_0"]["BatchNorm_0"])
        if stats is not None and "Norm_0" in stats:
            norm.update(stats["Norm_0"]["BatchNorm_0"])
        return conv, norm

    pairs = []
    pairs.append((entry(p["stem0"], bs.get("stem0")), (trn.conv1, trn.bn1)))
    blocks = [2, 2, 2, 2]
    for si in range(1, 5):
        layer = getattr(trn, f"layer{si}")
        for j in range(blocks[si - 1]):
            blk = p[f"stage{si}_block{j}"]
            blks = bs.get(f"stage{si}_block{j}", {})
            tb = layer[j]
            pairs.append((entry(blk["ConvNormAct_0"], blks.get("ConvNormAct_0")), (tb.conv1, tb.bn1)))
            pairs.append((entry(blk["ConvNormAct_1"], blks.get("ConvNormAct_1")), (tb.conv2, tb.bn2)))
            if tb.downsample is not None:
                pairs.append((entry(blk["ConvNormAct_2"], blks.get("ConvNormAct_2")),
                              (tb.downsample[0], tb.downsample[1])))

    with torch.no_grad():
        for (conv, norm), (tconv, tnorm) in pairs:
            k = np.asarray(conv["kernel"])
            tconv.weight.copy_(torch.from_numpy(np.transpose(k, (3, 2, 0, 1)).copy()))
            tnorm.weight.copy_(torch.from_numpy(np.asarray(norm["scale"]).copy()))
            tnorm.bias.copy_(torch.from_numpy(np.asarray(norm["bias"]).copy()))
            tnorm.running_mean.copy_(torch.from_numpy(np.asarray(norm["mean"]).copy()))
            tnorm.running_var.copy_(torch.from_numpy(np.asarray(norm["var"]).copy()))

    feats_f = frn.apply(v, jnp.asarray(x))
    trn.eval()
    with torch.no_grad():
        feats_t = trn(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy()))
    for ff, tt in zip(feats_f, feats_t):
        np.testing.assert_allclose(
            np.asarray(ff), np.transpose(tt.numpy(), (0, 2, 3, 1)),
            rtol=1e-3, atol=1e-4,
        )
