"""Mesh construction and sharding specs.

The reference has no in-repo distribution code — multi-GPU was delegated to
PyTorch Lightning's DDP (SURVEY §2.2). Here distribution is first-class and
TPU-native: a 2-axis ``(data, model)`` mesh, batch sharded over ``data``
(pure DP gradient all-reduce compiles to one psum over ICI), and the
reference-frame axis optionally sharded over ``model`` (the workload's
sequence axis — frames are embarrassingly parallel per step, SURVEY §5.7).
XLA's SPMD partitioner inserts all collectives; there is no hand-written
communication at this scale, matching how the hardware wants to be driven.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: int = -1, model: int = 1, devices: Optional[Sequence] = None
) -> Mesh:
    """Builds a ``(data, model)`` mesh.

    ``data=-1`` consumes all remaining devices on the data axis.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        if n % model != 0:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} needs more than {n} devices")
    dev_array = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(dev_array, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh, frames_axis: Optional[int] = None) -> NamedSharding:
    """Sharding for a batch array: leading axis over ``data``; optionally a
    frames axis over ``model`` (sequence parallelism over refs)."""
    if frames_axis is None:
        return NamedSharding(mesh, P("data"))
    spec = [None] * (frames_axis + 1)
    spec[0] = "data"
    spec[frames_axis] = "model"
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, shard_frames: bool = False) -> dict:
    """Device-puts the array leaves of a host batch with DP(+SP) shardings.

    Non-array leaves (names, index strings) pass through untouched.
    """
    out = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray) and v.ndim >= 1:
            if shard_frames and v.ndim >= 2 and k in ("x", "m", "y", "flow_gt"):
                sh = batch_sharding(mesh, frames_axis=1)
            else:
                sh = batch_sharding(mesh)
            out[k] = jax.device_put(v, sh)
        else:
            out[k] = v
    return out
