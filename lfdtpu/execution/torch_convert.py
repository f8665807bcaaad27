# Convert reference torch checkpoints (.pth) into lfdtpu variables.
#
# The reference saves `{'state_dict': model.state_dict(), ...}` (its
# `lfd/execution/utils.py:41-53`, with an optional DataParallel 'module.'
# prefix). Its LFD models register `_backbone` (LFDResNet: `_stem`
# Sequential + `stage{i}` Sequentials of blocks with `_conv1/_norm1/...`
# and `_downsample`, `lfd_resnet.py:354-473`), `_neck` (SimpleNeck:
# `neck{i}` Sequentials, `simple_neck.py:47`) and `_head` (LFDHead:
# `head{k}_{merge,classification,regression}_path` Sequentials +
# `_scales.{i}._scale`, `lfd_head.py:65-82`).
#
# This module maps those keys onto the flax module tree by NAME (not
# traversal order, which differs between the frameworks), transposing conv
# kernels OIHW->HWIO for NHWC TPU convs. Strict by construction: every
# mapped path must exist in the target tree with the matching shape, and
# unconverted reference keys / unfilled flax conv+norm leaves are errors.

from __future__ import annotations

import re

import numpy as np


def _iter_leaf_paths(tree, prefix=()):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _iter_leaf_paths(v, prefix + (k,))
        else:
            yield prefix + (k,)


def _assert_target_filled(w):
    """Completeness in BOTH directions: beyond the leftover-torch-keys
    check, every leaf of the target tree must have been written. Catches a
    same-channel-width but SMALLER checkpoint (e.g. WIDERFACE-M into an L
    model) that would otherwise convert cleanly and leave extra blocks at
    random init."""
    missing = [
        "params/" + "/".join(p)
        for p in _iter_leaf_paths(w.params)
        if ("params",) + p not in w.written
    ]
    missing += [
        "stats/" + "/".join(p)
        for p in _iter_leaf_paths(w.batch_stats)
        if ("stats",) + p not in w.written
    ]
    assert not missing, (
        f"checkpoint does not cover the target model: {len(missing)} "
        f"unfilled leaves, e.g. {missing[:8]}"
    )


def _strip_module_prefix(state_dict):
    if state_dict and next(iter(state_dict)).startswith("module."):
        return {k[len("module."):]: v for k, v in state_dict.items()}
    return dict(state_dict)


def _group_params(state_dict):
    """{module path: {param name: numpy array}} (torch key = path.param)."""
    groups = {}
    for k, v in state_dict.items():
        if k.endswith("num_batches_tracked"):
            continue
        path, param = k.rsplit(".", 1)
        groups.setdefault(path, {})[param] = np.asarray(v)
    return groups


def _seq_conv_norm_pairs(groups, container):
    """Walk Sequential children `container.{i}` in index order and pair
    each conv with the norm that immediately follows it (param-free layers
    like ReLU don't appear in a state_dict)."""
    pat = re.compile(re.escape(container) + r"\.(\d+)$")
    children = sorted(
        ((int(m.group(1)), p) for p in groups if (m := pat.match(p))),
    )
    pairs = []
    for _, path in children:
        g = groups[path]
        if g["weight"].ndim == 4:
            pairs.append([path, None])
        else:
            assert pairs and pairs[-1][1] is None, (
                f"norm layer {path} does not follow a conv"
            )
            pairs[-1][1] = path
    return pairs


class _Writer:
    """Writes leaves into a (params, batch_stats) tree copy, tracking
    which torch module paths were consumed and which flax paths written."""

    def __init__(self, variables):
        import jax

        self.params = jax.device_get(variables["params"])
        self.batch_stats = jax.device_get(variables.get("batch_stats", {}))
        self.written = set()
        self.consumed = set()

    def _set(self, tree, parts, value, torch_path):
        node = tree
        for p in parts[:-1]:
            assert p in node, (
                f"flax path {'/'.join(parts)} not in target tree "
                f"(while converting {torch_path})"
            )
            node = node[p]
        leaf = parts[-1]
        assert leaf in node, f"flax leaf {'/'.join(parts)} missing ({torch_path})"
        old = np.asarray(node[leaf])
        assert old.shape == value.shape, (
            f"{'/'.join(parts)}: shape {value.shape} != target {old.shape} "
            f"(from {torch_path})"
        )
        node[leaf] = value.astype(old.dtype)
        self.written.add(("params" if tree is self.params else "stats",) + tuple(parts))

    def conv(self, groups, torch_path, flax_parts, conv_name="Conv_0"):
        g = groups[torch_path]
        self.consumed.add(torch_path)
        kernel = np.transpose(g["weight"], (2, 3, 1, 0))  # OIHW -> HWIO
        self._set(self.params, flax_parts + (conv_name, "kernel"), kernel, torch_path)
        if "bias" in g:
            self._set(self.params, flax_parts + (conv_name, "bias"), g["bias"], torch_path)

    def norm(self, groups, torch_path, flax_parts):
        g = groups[torch_path]
        self.consumed.add(torch_path)
        if "running_mean" in g:  # BatchNorm
            base = flax_parts + ("Norm_0", "BatchNorm_0")
            self._set(self.params, base + ("scale",), g["weight"], torch_path)
            self._set(self.params, base + ("bias",), g["bias"], torch_path)
            self._set(self.batch_stats, base + ("mean",), g["running_mean"], torch_path)
            self._set(self.batch_stats, base + ("var",), g["running_var"], torch_path)
        else:  # GroupNorm
            base = flax_parts + ("Norm_0", "GroupNorm_0")
            self._set(self.params, base + ("scale",), g["weight"], torch_path)
            self._set(self.params, base + ("bias",), g["bias"], torch_path)

    def conv_norm(self, groups, conv_path, norm_path, flax_parts, conv_name="Conv_0"):
        self.conv(groups, conv_path, flax_parts, conv_name)
        if norm_path is not None:
            self.norm(groups, norm_path, flax_parts)


def convert_reference_state_dict(state_dict, detector, variables):
    """Convert a reference torch state_dict into this repo's variables.

    state_dict: torch-style flat dict (tensors or arrays) with
    `_backbone./_neck./_head.` prefixes (optionally under 'module.').
    detector: the lfdtpu detector whose architecture matches (e.g.
    `zoo.widerface_lfd("S")`). variables: its init'd variables (shape
    template). Returns new `{"params", "batch_stats"}`.
    """
    from ..models.heads import LFDHead

    head_mod = detector.head
    assert isinstance(head_mod, LFDHead), (
        "converter supports LFDHead models (all reference workload configs); "
        f"got {type(head_mod).__name__}"
    )

    state_dict = _strip_module_prefix(
        {k: np.asarray(v) for k, v in state_dict.items()}
    )
    groups = _group_params(state_dict)
    w = _Writer(variables)

    # ---- backbone: stem ----
    for n, (conv_path, norm_path) in enumerate(
        _seq_conv_norm_pairs(groups, "_backbone._stem")
    ):
        w.conv_norm(groups, conv_path, norm_path, ("backbone", f"stem{n}"))

    # ---- backbone: stages ----
    blk = re.compile(r"_backbone\.stage(\d+)\.(\d+)\._conv(\d+)$")
    blocks = sorted(
        {(int(m.group(1)), int(m.group(2))) for p in groups if (m := blk.match(p))}
    )
    for i, j in blocks:
        tprefix = f"_backbone.stage{i}.{j}"
        fparts = ("backbone", f"stage{i}_block{j}")
        k = 1
        while f"{tprefix}._conv{k}" in groups:
            norm_path = f"{tprefix}._norm{k}"
            w.conv_norm(
                groups, f"{tprefix}._conv{k}",
                norm_path if norm_path in groups else None,
                fparts + (f"ConvNormAct_{k - 1}",),
            )
            k += 1
        if f"{tprefix}._downsample.0" in groups:
            pairs = _seq_conv_norm_pairs(groups, f"{tprefix}._downsample")
            assert len(pairs) == 1, pairs
            w.conv_norm(groups, pairs[0][0], pairs[0][1], fparts + ("_Shortcut_0",))

    # ---- neck ----
    n = 0
    while f"_neck.neck{n}.0" in groups:
        for conv_path, norm_path in _seq_conv_norm_pairs(groups, f"_neck.neck{n}"):
            w.conv_norm(groups, conv_path, norm_path, ("neck", f"neck{n}"))
        n += 1

    # ---- head ----
    shared = head_mod.share_head_flag
    merged = head_mod.merge_path_flag
    heads = range(1 if shared else head_mod.num_heads)
    for k in heads:
        name = "shared" if shared else f"head{k}"
        if merged:
            for m, (conv_path, norm_path) in enumerate(
                _seq_conv_norm_pairs(groups, f"_head.head{k}_merge_path")
            ):
                w.conv_norm(groups, conv_path, norm_path,
                            ("head", f"{name}_merge", f"conv{m}"))
        for branch, fbranch in (("classification", "cls"), ("regression", "reg")):
            pairs = _seq_conv_norm_pairs(groups, f"_head.head{k}_{branch}_path")
            for m, (conv_path, norm_path) in enumerate(pairs):
                final = m == len(pairs) - 1
                assert final or not merged, (
                    f"merge-path head has multi-conv {branch} path"
                )
                if final:
                    assert norm_path is None, f"norm after final {branch} conv"
                    # the 1x1 final layer is a bare nn.Conv named 'final'
                    w._set(
                        w.params,
                        ("head", f"{name}_{fbranch}", "final", "kernel"),
                        np.transpose(groups[conv_path]["weight"], (2, 3, 1, 0)),
                        conv_path,
                    )
                    w._set(
                        w.params,
                        ("head", f"{name}_{fbranch}", "final", "bias"),
                        groups[conv_path]["bias"], conv_path,
                    )
                    w.consumed.add(conv_path)
                else:
                    w.conv_norm(groups, conv_path, norm_path,
                                ("head", f"{name}_{fbranch}", f"conv{m}"))
    if shared:
        # object-reuse duplicates (`lfd_head.py:74-77`): verify + consume
        for k in range(1, head_mod.num_heads):
            for p, g in groups.items():
                m = re.match(rf"_head\.head{k}_(\w+)_path\.(.+)$", p)
                if m:
                    ref = groups.get(f"_head.head0_{m.group(1)}_path.{m.group(2)}")
                    assert ref is not None and all(
                        np.array_equal(g[t], ref[t]) for t in g
                    ), f"share_head_flag model but {p} differs from head0"
                    w.consumed.add(p)
    s = 0
    while f"_head._scales.{s}" in groups:
        w._set(w.params, ("head", f"scale{s}", "scale"),
               groups[f"_head._scales.{s}"]["_scale"].reshape(()),
               f"_head._scales.{s}")
        w.consumed.add(f"_head._scales.{s}")
        s += 1

    leftover = sorted(set(groups) - w.consumed)
    assert not leftover, f"unconverted reference modules: {leftover[:8]}"
    _assert_target_filled(w)
    return {"params": w.params, "batch_stats": w.batch_stats}


def load_reference_checkpoint(pth_path, detector, variables, weights_only=True):
    """Load a reference `.pth` file (torch serialization) and convert it.

    Requires torch importable (CPU is enough). weights_only=True (default)
    refuses pickled code objects — reference checkpoints hold only tensors
    and basic-typed meta, so this is safe; pass False only for trusted
    files that need it."""
    import torch

    ckpt = torch.load(pth_path, map_location="cpu", weights_only=weights_only)
    state_dict = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    state_dict = {k: v.numpy() for k, v in state_dict.items()}
    return convert_reference_state_dict(state_dict, detector, variables)


def convert_torchvision_resnet(state_dict, variables):
    """Convert a torchvision/mmdet-style ResNet state_dict (conv1/bn1 +
    layer{s}.{j}.conv{k}/bn{k}/downsample) into flax `models.ResNet`
    variables — the reference's ImageNet-pretrained backbone flow
    (`resnet.py:314-340` loads exactly these checkpoints). Classifier
    (`fc.*`) keys are ignored. Deep-stem checkpoints (mmdet `stem.{i}`
    naming, three 3x3 conv+norm pairs) are supported."""
    state_dict = _strip_module_prefix(
        {k: np.asarray(v) for k, v in state_dict.items() if not k.startswith("fc.")}
    )
    groups = _group_params(state_dict)
    w = _Writer(variables)

    if "stem.0" in groups:  # deep stem: three 3x3 conv+norm pairs
        for n, (conv_path, norm_path) in enumerate(
            _seq_conv_norm_pairs(groups, "stem")
        ):
            w.conv_norm(groups, conv_path, norm_path, (f"stem{n}",))
    else:
        assert "conv1" in groups, "expected conv1/bn1 or a deep stem"
        w.conv(groups, "conv1", ("stem0",))
        w.norm(groups, "bn1", ("stem0",))

    blk = re.compile(r"layer(\d+)\.(\d+)\.conv1$")
    blocks = sorted(
        {(int(m.group(1)), int(m.group(2))) for p in groups if (m := blk.match(p))}
    )
    for s, j in blocks:
        tprefix = f"layer{s}.{j}"
        fparts = (f"stage{s}_block{j}",)
        k = 1
        while f"{tprefix}.conv{k}" in groups:
            w.conv_norm(groups, f"{tprefix}.conv{k}", f"{tprefix}.bn{k}",
                        fparts + (f"ConvNormAct_{k - 1}",))
            k += 1
        if f"{tprefix}.downsample.0" in groups:
            # downsample is the (k-1)-th ConvNormAct after the main convs
            w.conv_norm(groups, f"{tprefix}.downsample.0", f"{tprefix}.downsample.1",
                        fparts + (f"ConvNormAct_{k - 1}",))

    leftover = sorted(set(groups) - w.consumed)
    assert not leftover, f"unconverted resnet modules: {leftover[:8]}"
    _assert_target_filled(w)
    return {"params": w.params, "batch_stats": w.batch_stats}
