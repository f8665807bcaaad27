# Device mesh + sharding helpers.
#
# The reference's entire distributed story is single-process
# torch.nn.DataParallel over a gpu_list (`lfd/execution/executor.py:39`).
# The TPU-native equivalent: a 1-D `data` mesh; batches are sharded on dim 0
# with NamedSharding, parameters are replicated, and XLA emits the gradient
# all-reduce over ICI (multi-host: same program over DCN after
# jax.distributed.initialize). Detection models this size need no tensor/
# pipeline parallelism (SURVEY.md §2.12); an optional `spatial` axis is
# provided for sharding very large inputs (the 4K analogue of sequence
# parallelism, SURVEY.md §5).

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"


def make_mesh(devices=None, spatial=1):
    """1-D data mesh (optionally x spatial) over the given / all devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    assert n % spatial == 0
    arr = np.asarray(devices).reshape(n // spatial, spatial)
    if spatial == 1:
        return Mesh(arr.reshape(-1), (DATA_AXIS,))
    return Mesh(arr, (DATA_AXIS, SPATIAL_AXIS))


def batch_sharding(mesh):
    """Shard dim 0 (batch) over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh):
    return NamedSharding(mesh, P())


def shard_batch(mesh, *arrays):
    """Host numpy arrays -> device arrays sharded on dim 0.

    Single-device meshes use a plain device_put: the NamedSharding path is
    dramatically slower per call on remote-attached backends (measured
    seconds vs ms) and is a no-op at size 1 anyway."""
    if mesh.size == 1:
        dev = mesh.devices.reshape(-1)[0]
        out = tuple(jax.device_put(a, dev) for a in arrays)
    else:
        s = batch_sharding(mesh)
        out = tuple(jax.device_put(a, s) for a in arrays)
    return out if len(out) > 1 else out[0]


def prefetch_to_device(batch_iterator, mesh, size=2,
                       keys=("images", "gt_bboxes", "gt_labels", "gt_mask")):
    """Wrap a host batch iterator: device_put the next `size` batches ahead
    so H2D transfer overlaps the current step's compute (jax transfers are
    async). Yields the original batch dicts with `keys` replaced by
    device-resident (sharded) arrays."""
    import collections

    buf = collections.deque()

    def put(batch):
        arrays = shard_batch(mesh, *[batch[k] for k in keys])
        if len(keys) == 1:
            arrays = (arrays,)
        out = dict(batch)
        out.update(zip(keys, arrays))
        # shared-memory loaders recycle their slot once device_put has
        # copied the host buffers (ShmDataLoader)
        loader = batch.get("_loader") if isinstance(batch, dict) else None
        if loader is not None:
            loader.release_slot(batch)
        return out

    it = iter(batch_iterator)
    try:
        for _ in range(size):
            buf.append(put(next(it)))
    except StopIteration:
        pass
    while buf:
        yield buf.popleft()
        try:
            buf.append(put(next(it)))
        except StopIteration:
            pass


def spatial_image_sharding(mesh):
    """Shard NHWC images over (data, spatial-H): for 4K batch>1 inference
    that exceeds one chip's HBM (SURVEY.md §5 long-context analogue)."""
    assert SPATIAL_AXIS in mesh.axis_names
    return NamedSharding(mesh, P(DATA_AXIS, SPATIAL_AXIS))
