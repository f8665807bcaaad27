# Execution utilities (reference `lfd/execution/utils.py`): metering,
# logging, env collection, seeds, exception hook, checkpoint IO.

from __future__ import annotations

import logging
import os
import pickle
import random
import sys
import traceback

import jax
import numpy as np

__all__ = [
    "AverageMeter",
    "get_root_logger",
    "collect_envs",
    "customize_exception_hook",
    "set_random_seed",
    "save_checkpoint",
    "load_checkpoint",
]


class AverageMeter:
    """Named running averages with weighted / sum modes
    (`lfd/execution/utils.py:276-321`).

    update(name, value, weight): accumulates value*weight and weight.
    get_average(name, 'weighted_sum') -> sum(v*w)/sum(w)
    get_average(name, 'sum')          -> sum(v*w)/count   (used for speed)
    """

    def __init__(self):
        self._sums = {}
        self._weights = {}
        self._counts = {}

    def update(self, name, value, weight=1.0):
        value = float(value)
        weight = float(weight)
        self._sums[name] = self._sums.get(name, 0.0) + value * weight
        self._weights[name] = self._weights.get(name, 0.0) + weight
        self._counts[name] = self._counts.get(name, 0) + 1

    def get_all_names(self):
        return list(self._sums.keys())

    def get_average(self, name, avg_mode="weighted_sum"):
        if name not in self._sums:
            return 0.0
        if avg_mode == "weighted_sum":
            w = self._weights[name]
            return self._sums[name] / w if w else 0.0
        if avg_mode == "sum":
            c = self._counts[name]
            return self._sums[name] / c if c else 0.0
        raise ValueError(f"unknown avg_mode {avg_mode}")

    def clear(self):
        self._sums.clear()
        self._weights.clear()
        self._counts.clear()


def get_root_logger(log_path=None, level=logging.INFO, name="lfdtpu"):
    """Console + optional file logger (process-0 only for multi-host,
    mirroring the reference's rank-aware handlers, `utils.py:148-239`)."""
    logger = logging.getLogger(name)
    if logger.handlers:
        return logger
    logger.setLevel(level)
    fmt = logging.Formatter("%(asctime)s - %(levelname)s - %(message)s")
    is_primary = jax.process_index() == 0
    sh = logging.StreamHandler()
    sh.setFormatter(fmt)
    sh.setLevel(level if is_primary else logging.ERROR)
    logger.addHandler(sh)
    if log_path and is_primary:
        os.makedirs(os.path.dirname(os.path.abspath(log_path)), exist_ok=True)
        fh = logging.FileHandler(log_path)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger


def collect_envs():
    """Environment summary (`utils.py:125-145`), JAX edition."""
    import jaxlib

    envs = {
        "python": sys.version.replace("\n", ""),
        "jax": jax.__version__,
        "jaxlib": jaxlib.__version__,
        "backend": jax.default_backend(),
        "device_count": jax.device_count(),
        "process_count": jax.process_count(),
        "devices": ", ".join(str(d) for d in jax.devices()),
    }
    try:
        import flax, optax

        envs["flax"] = flax.__version__
        envs["optax"] = optax.__version__
    except Exception:
        pass
    return envs


def customize_exception_hook(exception_log_path):
    """sys.excepthook that appends tracebacks to a file
    (`utils.py:242-257`)."""

    def hook(exc_type, exc_value, exc_traceback):
        os.makedirs(os.path.dirname(os.path.abspath(exception_log_path)), exist_ok=True)
        with open(exception_log_path, "a") as f:
            f.write("".join(traceback.format_exception(exc_type, exc_value, exc_traceback)))
        sys.__excepthook__(exc_type, exc_value, exc_traceback)

    return hook


def set_random_seed(seed):
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


def _to_numpy_tree(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(path, state_dict, meta=None):
    """Checkpoint = meta (basic-typed config) + numpy-ified state trees
    (`executor.py:101-113`, `utils.py:75-122`). Pickle keeps the dataset-pack
    spirit; trees round-trip exactly."""
    parent = os.path.dirname(os.path.abspath(path))
    os.makedirs(parent, exist_ok=True)
    payload = {"meta": meta or {}, "state": _to_numpy_tree(state_dict)}
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f, pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)


def load_checkpoint(path, strict=True, target_structure=None, logger=None):
    """Returns (state, meta). With a target_structure, missing/unexpected
    keys are reported like the reference loader (`utils.py:19-72`)."""
    with open(path, "rb") as f:
        payload = pickle.load(f)
    state, meta = payload["state"], payload.get("meta", {})
    if target_structure is not None:
        tgt_paths = {"/".join(str(k) for k in p) for p, _ in jax.tree_util.tree_flatten_with_path(target_structure)[0][0:]}
        src_paths = {"/".join(str(k) for k in p) for p, _ in jax.tree_util.tree_flatten_with_path(state)[0][0:]}
        missing = tgt_paths - src_paths
        unexpected = src_paths - tgt_paths
        msg = ""
        if missing:
            msg += f"missing keys: {sorted(missing)[:8]}... "
        if unexpected:
            msg += f"unexpected keys: {sorted(unexpected)[:8]}..."
        if msg:
            if strict:
                raise ValueError(msg)
            (logger.warning if logger else print)(msg)
    return state, meta


def load_backbone_weights(params, ckpt_path, prefix="backbone", logger=None):
    """Initialize backbone params from a full-model checkpoint, stripping a
    leading subtree prefix if present (the reference strips a 'backbone.'
    key prefix from pretrained state_dicts, `lfd_resnet.py:314-340`).

    params: the target backbone params subtree. Returns a new subtree with
    matching leaves replaced; missing/unexpected keys are reported.
    """
    state, _meta = load_checkpoint(ckpt_path, strict=False, logger=logger)
    src = state.get("params", state)
    if prefix and prefix in src:
        src = src[prefix]

    import jax

    flat_tgt = dict(jax.tree_util.tree_flatten_with_path(params)[0])
    flat_src = dict(jax.tree_util.tree_flatten_with_path(src)[0])
    missing = [k for k in flat_tgt if k not in flat_src]
    unexpected = [k for k in flat_src if k not in flat_tgt]
    if (missing or unexpected) and logger is not None:
        logger.warning(
            f"backbone init: {len(missing)} missing, {len(unexpected)} unexpected keys"
        )
    merged = {
        k: np.asarray(flat_src[k]).astype(np.asarray(v).dtype)
        if k in flat_src else v
        for k, v in flat_tgt.items()
    }
    leaves = [merged[k] for k, _ in jax.tree_util.tree_flatten_with_path(params)[0]]
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(params), leaves
    )
