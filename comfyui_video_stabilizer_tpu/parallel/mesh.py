"""Device-mesh helpers for multi-chip runs.

The reference is single-process CPU (SURVEY 2.10); the TPU framework
scales the frame/time axis as its data-parallel dimension ("context
parallelism" for video: whole-clip reductions become collectives) and
optionally the row axis for spatial sharding of the warp.
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    n_devices: int | None = None,
    axis_names: Sequence[str] = ("data", "spatial"),
    spatial: int | None = None,
) -> Mesh:
    """Build a (data x spatial) mesh over the available devices.

    The 'data' axis shards the frame/time dimension — the
    embarrassingly parallel dimension for clips with N >= devices —
    so the DEFAULT is data-major: all devices on 'data', spatial=1
    (sharding a spec over a size-1 axis is a no-op, so every
    ('data', 'spatial') PartitionSpec in parallel/ stays valid).
    Pass ``spatial`` explicitly to trade frame shards for row shards
    when clips are shorter than the device count or a single frame's
    working set dominates HBM (e.g. 8K frames).
    """
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if spatial is None:
        spatial = 1
    if spatial < 1 or n % spatial:
        raise ValueError(f"spatial={spatial} must divide the device count {n}")
    data = n // spatial
    dev_array = np.asarray(devices).reshape(data, spatial)
    return Mesh(dev_array, axis_names=tuple(axis_names))
