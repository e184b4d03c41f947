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
) -> Mesh:
    """Build a (data x spatial) mesh over the available devices.

    The 'data' axis shards the frame/time dimension (the dominant
    parallelism for clip processing); 'spatial' shards image rows for
    the memory-bound stages.  With a prime or small device count the
    spatial axis degenerates to 1, which is always correct.
    """
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    spatial = 1
    for cand in (4, 2):
        if n % cand == 0 and n // cand >= 2:
            spatial = cand
            break
    data = n // spatial
    dev_array = np.asarray(devices).reshape(data, spatial)
    return Mesh(dev_array, axis_names=tuple(axis_names))
