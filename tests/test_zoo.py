# Zoo builders must reproduce the reference workload configs exactly:
# param counts computed from the reference torch modules instantiated with
# each workload script's literals.
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lfdtpu import zoo

# name: (backbone_params, neck_params, head_params, strides)
EXPECTED = {
    "WIDERFACE-XS": (822624, 42240, 33930, [8, 16, 32, 64, 64]),
    "WIDERFACE-S": (1472832, 58624, 33930, [8, 16, 32, 64, 64]),
    "WIDERFACE-M": (1004864, 58624, 33930, [4, 8, 16, 32, 64]),
    "WIDERFACE-L": (1152832, 58624, 33930, [4, 8, 16, 32, 64]),
    "TT100K-S": (808000, 41984, 73014, [8, 16, 32, 64]),
    "TT100K-L": (1739456, 50176, 73014, [4, 8, 16, 32]),
    "TL-S": (935216, 56576, 33674, [4, 8, 16, 32, 64]),
    "TL-L": (2346944, 66816, 33674, [4, 8, 16, 32, 64]),
}


def n_params(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


@pytest.mark.parametrize("name", list(EXPECTED))
def test_zoo_parity(name):
    exp_bb, exp_neck, exp_head, exp_strides = EXPECTED[name]
    det = zoo.ZOO[name]()
    assert list(det.point_strides) == exp_strides
    x = jnp.zeros((1, 128, 128, 3))
    v_bb = det.backbone.init(jax.random.PRNGKey(0), x)
    assert n_params(v_bb["params"]) == exp_bb
    feats = det.backbone.apply(v_bb, x)
    v_neck = det.neck.init(jax.random.PRNGKey(0), feats)
    assert n_params(v_neck["params"]) == exp_neck
    nfeats = det.neck.apply(v_neck, feats)
    v_head = det.head.init(jax.random.PRNGKey(0), nfeats)
    assert n_params(v_head["params"]) == exp_head


def test_zoo_decode_specs():
    assert zoo.widerface_lfd("XS").decode_spec().reg_mode == "sigmoid"
    assert zoo.tt100k_lfd("S").decode_spec().use_softmax  # CE head
    assert zoo.tt100k_lfd("S").cls_channels == 46
    assert zoo.trafficlight_lfd("S").num_classes == 1
