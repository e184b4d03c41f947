"""Pallas TPU fast path for the batched homography warp.

TPU has no hardware gather, so the XLA gather sampler in ``warp.py``
is scalarized and slow on device.  Stabilization warps, however, are
near-identity: within a small output tile every source tap lies inside
a narrow window around a per-tile integer base offset.  Because the
matrices are host values (the trajectory solve runs on host), the
per-tile source origins and the residual window radius are computed on
host, and the kernel samples via static shift-FMA over the window —
no gather anywhere.

This module is filled in progressively; ``warp_clip_pallas`` returns
None when the configuration is not (yet) supported, in which case the
caller falls back to the XLA path.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np


def warp_clip_pallas(
    frames: np.ndarray,
    matrices: np.ndarray,
    coeffs: np.ndarray,
    out_size: Tuple[int, int],
    interp: str,
    border: Sequence[float],
):
    return None  # Pallas path lands after the XLA reference path is proven.
