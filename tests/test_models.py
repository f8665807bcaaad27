# Parameter-count and shape parity against the reference WIDERFACE configs
# (expected numbers computed from the reference torch modules:
# lfd/model/backbone/lfd_resnet.py, neck/simple_neck.py, head/lfd_head.py).
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lfdtpu.models import (
    LFDResNet, SimpleNeck, LFDHead, FCOSHead, FPN, SimpleFPN, ResNet,
    lfd_resnet_output_info, resnet_output_info,
)

# (name, body_arch, body_channels, out_indices, stem/block mode,
#  expected (backbone_params, neck_params, head_params, channels, strides))
WIDERFACE_CFGS = {
    "S": (
        [4, 2, 2, 3], [64, 64, 64, 128],
        ((0, 3), (1, 1), (2, 1), (3, 0), (3, 2)), "faster",
        (1472832, 58624, 33930, [64, 64, 64, 128, 128], [8, 16, 32, 64, 64]),
    ),
    "XS": (
        [4, 2, 2, 3], [64, 64, 64, 64],
        ((0, 3), (1, 1), (2, 1), (3, 0), (3, 2)), "faster",
        (878016, 42240, 33930, [64, 64, 64, 64, 64], [8, 16, 32, 64, 64]),
    ),
    "M": (
        [3, 2, 1, 1, 1], [64, 64, 64, 128, 128],
        ((0, 2), (1, 1), (2, 0), (3, 0), (4, 0)), "fast",
        (1063488, 58624, 33930, [64, 64, 64, 128, 128], [4, 8, 16, 32, 64]),
    ),
    "L": (
        [4, 2, 2, 1, 1], [64, 64, 64, 128, 128],
        ((0, 3), (1, 1), (2, 1), (3, 0), (4, 0)), "fast",
        (1219904, 58624, 33930, [64, 64, 64, 128, 128], [4, 8, 16, 32, 64]),
    ),
}


def n_params(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


def _build(name):
    arch, chans, out_idx, mode, _ = WIDERFACE_CFGS[name]
    bb = LFDResNet(
        block_mode=mode, stem_mode=mode, body_mode=None,
        stem_channels=64, body_architecture=tuple(arch),
        body_channels=tuple(chans), out_indices=out_idx,
        norm_cfg=dict(type="BatchNorm2d"),
    )
    neck = SimpleNeck(
        num_neck_channels=128,
        num_input_strides_list=tuple(bb.num_output_strides_list),
        norm_cfg=dict(type="BatchNorm2d"),
    )
    head = LFDHead(
        num_classes=1, num_heads=5, num_head_channels=128, num_conv_layers=2,
        norm_cfg=dict(type="GroupNorm", num_groups=16),
        share_head_flag=True, merge_path_flag=True,
        classification_loss_type="FocalLoss", regression_loss_type="IoULoss",
    )
    return bb, neck, head


@pytest.mark.parametrize("name", list(WIDERFACE_CFGS))
def test_widerface_config_parity(name):
    arch, chans, out_idx, mode, exp = WIDERFACE_CFGS[name]
    exp_bb, exp_neck, exp_head, exp_ch, exp_strides = exp
    bb, neck, head = _build(name)
    assert bb.num_output_channels_list == exp_ch
    assert bb.num_output_strides_list == exp_strides

    x = jnp.zeros((1, 128, 128, 3))
    vars_bb = bb.init(jax.random.PRNGKey(0), x)
    assert n_params(vars_bb["params"]) == exp_bb
    feats = bb.apply(vars_bb, x)
    # shapes match the reference torch run at 128x128
    for f, c, s in zip(feats, exp_ch, exp_strides):
        assert f.shape == (1, 128 // s, 128 // s, c)

    vars_neck = neck.init(jax.random.PRNGKey(0), feats)
    assert n_params(vars_neck["params"]) == exp_neck
    nfeats = neck.apply(vars_neck, feats)
    assert all(f.shape[-1] == 128 for f in nfeats)

    vars_head = head.init(jax.random.PRNGKey(0), nfeats)
    assert n_params(vars_head["params"]) == exp_head
    cls_outs, reg_outs = head.apply(vars_head, nfeats)
    assert len(cls_outs) == 5
    assert cls_outs[0].shape[-1] == 1 and reg_outs[0].shape[-1] == 4


def test_head_share_flag_shares_params():
    head_shared = LFDHead(num_classes=2, num_heads=3, num_head_channels=32,
                          share_head_flag=True, merge_path_flag=False,
                          norm_cfg=None)
    head_sep = LFDHead(num_classes=2, num_heads=3, num_head_channels=32,
                       share_head_flag=False, merge_path_flag=False,
                       norm_cfg=None)
    feats = [jnp.zeros((1, 8, 8, 32)) for _ in range(3)]
    v1 = head_shared.init(jax.random.PRNGKey(0), feats)
    v2 = head_sep.init(jax.random.PRNGKey(0), feats)
    assert n_params(v2["params"]) > 2.5 * n_params(v1["params"])


def test_fcos_head_outputs_and_bias_init():
    head = FCOSHead(num_classes=3, num_heads=2, num_head_channels=32, num_layers=2,
                    norm_cfg=dict(type="GroupNorm", num_groups=8))
    feats = [jnp.zeros((1, 8, 8, 32)), jnp.zeros((1, 4, 4, 32))]
    v = head.init(jax.random.PRNGKey(0), feats)
    cls_outs, reg_outs, ctr_outs = head.apply(v, feats)
    assert cls_outs[0].shape == (1, 8, 8, 3)
    assert reg_outs[1].shape == (1, 4, 4, 4)
    assert ctr_outs[0].shape == (1, 8, 8, 1)
    # prior-prob bias init -log((1-0.01)/0.01) (fcos_head.py:116-119)
    b = v["params"]["classification"]["bias"]
    np.testing.assert_allclose(np.asarray(b), -np.log(99.0), rtol=1e-6)
    # exp applied in head: zero-input regression output is exp(bias)=1
    assert np.all(np.asarray(reg_outs[0]) > 0)


def test_fpn_shapes():
    fpn = FPN(num_input_strides_list=(8, 16, 32), num_output_channels=64,
              num_outputs=5)
    feats = [jnp.zeros((1, 32, 32, 16)), jnp.zeros((1, 16, 16, 32)),
             jnp.zeros((1, 8, 8, 64))]
    v = fpn.init(jax.random.PRNGKey(0), feats)
    outs = fpn.apply(v, feats)
    assert fpn.num_output_strides_list == [8, 16, 32, 64, 128]
    assert [o.shape[1] for o in outs] == [32, 16, 8, 4, 2]
    assert all(o.shape[-1] == 64 for o in outs)


def test_simple_fpn_shapes():
    fpn = SimpleFPN(num_input_strides_list=(8, 16), num_output_channels=32,
                    num_outputs=3, neighbouring_mode=True)
    feats = [jnp.zeros((1, 16, 16, 24)), jnp.zeros((1, 8, 8, 48))]
    v = fpn.init(jax.random.PRNGKey(0), feats)
    outs = fpn.apply(v, feats)
    assert [o.shape[1] for o in outs] == [16, 8, 4]


def test_resnet18_shapes():
    rn = ResNet(depth=18, out_indices=((1, 1), (2, 1), (3, 1), (4, 1)),
                norm_cfg=dict(type="BN"))
    assert rn.num_output_channels_list == [64, 128, 256, 512]
    assert rn.num_output_strides_list == [4, 8, 16, 32]
    x = jnp.zeros((1, 64, 64, 3))
    v = rn.init(jax.random.PRNGKey(0), x)
    feats = rn.apply(v, x)
    assert [f.shape for f in feats] == [
        (1, 16, 16, 64), (1, 8, 8, 128), (1, 4, 4, 256), (1, 2, 2, 512)
    ]
    # torch resnet18 body has 11,176,512 conv/bn params (no fc)
    assert n_params(v["params"]) == 11176512


def test_resnet50_param_count():
    rn = ResNet(depth=50, norm_cfg=dict(type="BN"))
    x = jnp.zeros((1, 64, 64, 3))
    v = rn.init(jax.random.PRNGKey(0), x)
    # reference ResNet depth=50 has 23,508,032 params (no fc)
    assert n_params(v["params"]) == 23508032


def test_lfd_head_v1_shapes():
    from lfdtpu.models import LFDHeadV1

    head = LFDHeadV1(num_classes=2, num_heads=3, num_head_channels=32,
                     num_conv_layers=2, conv_kernel_size=3,
                     norm_cfg=dict(type="BatchNorm2d"),
                     classification_loss_type="FocalLoss",
                     regression_loss_type="IoULoss")
    feats = [jnp.zeros((1, 2 ** (3 - i), 2 ** (3 - i), 32)) for i in range(3)]
    v = head.init(jax.random.PRNGKey(0), feats)
    cls_outs, reg_outs = head.apply(v, feats, mutable=["batch_stats"])[0]
    assert len(cls_outs) == 3
    assert cls_outs[0].shape[-1] == 2 and reg_outs[0].shape[-1] == 4
    # shared trunks + per-level finals: only one cls_trunk in params
    assert "cls_trunk" in v["params"] and "cls_final0" in v["params"]
    assert "cls_final2" in v["params"]


def test_frozen_stages_zero_grads():
    bb = LFDResNet(block_mode="faster", stem_mode="fast", body_mode=None,
                   stem_channels=8, body_architecture=(1, 1), body_channels=(8, 16),
                   out_indices=((0, 0), (1, 0)), norm_cfg=dict(type="BatchNorm2d"),
                   frozen_stages=1)
    x = jnp.ones((1, 32, 32, 3))
    v = bb.init(jax.random.PRNGKey(0), x, train=True)

    def loss(params):
        outs, _ = bb.apply({"params": params, "batch_stats": v["batch_stats"]},
                           x, train=True, mutable=["batch_stats"])
        return sum(jnp.sum(o) for o in outs)

    g = jax.grad(loss)(v["params"])
    # stem and stage0 frozen -> zero grads; stage1 live
    assert float(jnp.abs(g["stem0"]["Conv_0"]["kernel"]).max()) == 0.0
    assert float(jnp.abs(g["stage0_block0"]["ConvNormAct_0"]["Conv_0"]["kernel"]).max()) == 0.0
    assert float(jnp.abs(g["stage1_block0"]["ConvNormAct_0"]["Conv_0"]["kernel"]).max()) > 0.0
