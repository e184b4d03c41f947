"""Pallas TPU kernel for the DIS residual cost volume + sub-pixel argmin.

A streamed XLA cost volume materializes (2r+1)^2 candidate SSD fields
through HBM: each candidate's patch-aggregated cost is kept for the
parabola neighbor-selection pass and read again by four select
accumulators — ~50 full-field HBM passes per level for radius 2.  On
the small pyramid levels the flow solver runs on (<= ~135 x 240 at
1080p), the ENTIRE level fits in VMEM, so this kernel computes all
candidates, the streaming argmin, the neighbor selection, and the
parabolic sub-pixel refinement in one pass over one (pair) grid axis:
HBM traffic drops to one read of I/J and one write of (fx, fy, cmin).

Semantics are IDENTICAL to :func:`cost_volume_subpixel_xla` below —
the kernel and the XLA mirror literally share the candidate-scan and
sub-pixel helpers, and bitwise equality is asserted in
tests/test_flow.py via interpret mode (device lowering is checked
against interpret in the device smoke).  Note one deliberate border
convention: candidate shift clamping is composed into a single edge
pad of the *inputs* (``Jw[clip(m + d)]``), which within patch//2 px of
the frame borders differs slightly from padding the *difference* field
per candidate (``Jw[clip(clip(m) + d)]``); the band is EPE-gated by
the oracle tests rather than matched term-for-term.

Replaces the cost-volume stage of the cv2.DISOpticalFlow equivalent
(/root/reference/nodes/video_stabilizer_flow.py:82-87 delegates this
to OpenCV's C++ inverse-search loop).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget for the per-candidate cost stack (the dominant scratch)
_COST_STACK_BUDGET = 8 * 1024 * 1024


def _lanes(n: int) -> int:
    return -(-n // 128) * 128


def fits_vmem(h: int, w: int, radius: int, patch: int) -> bool:
    """True when one level fits the whole-level-per-program layout."""
    k = 2 * radius + 1
    wp = _lanes(w + patch - 1)
    stack = k * k * h * wp * 4
    bufs = 4 * (h + patch - 1 + 2 * radius) * _lanes(w + patch - 1 + 2 * radius) * 4
    return stack + bufs <= _COST_STACK_BUDGET


def _tree(xp: jnp.ndarray, patch: int) -> jnp.ndarray:
    """Overlapping box-sum shift-add tree (shrinks by patch-1 per axis);
    same op order as ops/flow_dis._make_agg minus its internal pad."""
    step = 1
    while step < patch:
        xp = xp[..., : -step, :] + xp[..., step:, :]
        step *= 2
    step = 1
    while step < patch:
        xp = xp[..., : -step] + xp[..., step:]
        step *= 2
    return xp * (1.0 / (patch * patch))


def _scan_candidates(iagg, jbuf, hp, wp, radius, patch, store):
    """Streaming candidate-cost argmin, shared by the Pallas kernel and
    the XLA mirror (identical op order => bitwise-equal outputs).

    ``iagg`` is the pre-normalized agg-input field; ``jbuf`` the edge-
    padded candidate buffer in 0..255 units.  ``store(i, c)`` persists
    candidate i's aggregated cost field for the sub-pixel pass.
    Returns (cmin, best).
    """
    cmin = None
    best = None
    for i, (dy, dx) in enumerate(
        (dy, dx)
        for dy in range(-radius, radius + 1)
        for dx in range(-radius, radius + 1)
    ):
        sh = jbuf[..., dy + radius : dy + radius + hp,
                  dx + radius : dx + radius + wp] * (1.0 / 255.0)
        d = iagg - sh
        c = _tree(d * d, patch)
        store(i, c)
        if cmin is None:
            cmin = c
            best = jnp.zeros(c.shape, jnp.int32)
        else:
            take = c < cmin
            cmin = jnp.where(take, c, cmin)
            best = jnp.where(take, i, best)
    return cmin, best


def _subpixel_from_costs(cost_at, cmin, best, k, radius):
    """Neighbor selection + parabolic refinement + edge zeroing, shared
    by the kernel and the XLA mirror.  ``cost_at(i)`` returns candidate
    i's stored cost field.  Returns (fx, fy)."""
    by = best // k
    bx = best - by * k
    tgt_y0 = (jnp.maximum(by - 1, 0) * k) + bx
    tgt_y1 = (jnp.minimum(by + 1, k - 1) * k) + bx
    tgt_x0 = by * k + jnp.maximum(bx - 1, 0)
    tgt_x1 = by * k + jnp.minimum(bx + 1, k - 1)
    cy0 = jnp.zeros_like(cmin)
    cy1 = jnp.zeros_like(cmin)
    cx0 = jnp.zeros_like(cmin)
    cx1 = jnp.zeros_like(cmin)
    for i in range(k * k):
        c = cost_at(i)
        cy0 = jnp.where(tgt_y0 == i, c, cy0)
        cy1 = jnp.where(tgt_y1 == i, c, cy1)
        cx0 = jnp.where(tgt_x0 == i, c, cx0)
        cx1 = jnp.where(tgt_x1 == i, c, cx1)

    def parab(cm, cl, cr):
        denom = cl + cr - 2.0 * cm
        off = jnp.where(denom > 1e-9, 0.5 * (cl - cr) / jnp.maximum(denom, 1e-9), 0.0)
        return jnp.clip(off, -0.5, 0.5)

    suby = parab(cmin, cy0, cy1)
    subx = parab(cmin, cx0, cx1)
    suby = jnp.where((by == 0) | (by == k - 1), 0.0, suby)
    subx = jnp.where((bx == 0) | (bx == k - 1), 0.0, subx)
    fy = by.astype(jnp.float32) - radius + suby
    fx = bx.astype(jnp.float32) - radius + subx
    return fx, fy


def _make_kernel(*, h, w, radius, patch):
    k = 2 * radius + 1
    hp = h + patch - 1           # agg-input rows (pad patch//2, patch//2-1)
    wp = w + patch - 1

    def kernel(iagg_ref, jbuf_ref, fx_ref, fy_ref, cmin_ref, costs):
        iagg = iagg_ref[0] * (1.0 / 255.0)          # (hp, wp)

        def store(i, c):
            costs[i] = c

        cmin, best = _scan_candidates(iagg, jbuf_ref[0], hp, wp, radius, patch, store)
        fx, fy = _subpixel_from_costs(lambda i: costs[i], cmin, best, k, radius)
        fy_ref[0] = fy
        fx_ref[0] = fx
        cmin_ref[0] = cmin

    return kernel


@functools.partial(jax.jit, static_argnames=("radius", "patch", "interpret"))
def cost_volume_subpixel(I, Jw, radius: int, patch: int, interpret: bool = False):
    """Residual cost volume + parabolic sub-pixel argmin, one kernel.

    I, Jw: (B, H, W) float32 grays in 0..255 units (un-normalized).
    Returns (fx, fy, cmin) each (B, H, W) float32 — the integer+subpixel
    displacement per axis and the aggregated cost at the minimum,
    exactly the quantities the XLA mirror derives from its streamed
    candidate fields.  Caller must have checked :func:`fits_vmem`.
    """
    B, H, W = I.shape
    k = 2 * radius + 1
    pt, pb = patch // 2, patch // 2 - 1
    # agg-input I: diff-field edge pad composed into the source
    iagg = jnp.pad(I.astype(jnp.float32), ((0, 0), (pt, pb), (pt, pb)), mode="edge")
    # J buffer: candidate shift + its edge clamp + the agg pad, all
    # composed into one edge pad (replication is idempotent)
    jbuf = jnp.pad(
        Jw.astype(jnp.float32),
        ((0, 0), (pt + radius, pb + radius), (pt + radius, pb + radius)),
        mode="edge",
    )
    kernel = _make_kernel(h=H, w=W, radius=radius, patch=patch)
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H + patch - 1, iagg.shape[2]), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, jbuf.shape[1], jbuf.shape[2]), lambda i: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, H, W), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, H, W), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, H, W), lambda i: (i, 0, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((k * k, H, W), jnp.float32)],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, W), jnp.float32),
            jax.ShapeDtypeStruct((B, H, W), jnp.float32),
            jax.ShapeDtypeStruct((B, H, W), jnp.float32),
        ],
        interpret=interpret,
    )(iagg, jbuf)
    return out[0], out[1], out[2]


@functools.partial(jax.jit, static_argnames=("radius", "patch"))
def cost_volume_subpixel_xla(I, Jw, radius: int, patch: int):
    """Pure-XLA mirror of :func:`cost_volume_subpixel` — shares the
    candidate-scan and sub-pixel helpers, so op order and f32
    arithmetic are identical by construction (the interpret-mode
    equality test in tests/test_flow.py pins the pairing).  Serves CPU
    backends and levels too large for the whole-level-per-program VMEM
    layout."""
    B, H, W = I.shape
    k = 2 * radius + 1
    pt, pb = patch // 2, patch // 2 - 1
    hp, wp = H + patch - 1, W + patch - 1
    iagg = jnp.pad(I.astype(jnp.float32), ((0, 0), (pt, pb), (pt, pb)),
                   mode="edge") * (1.0 / 255.0)
    jbuf = jnp.pad(
        Jw.astype(jnp.float32),
        ((0, 0), (pt + radius, pb + radius), (pt + radius, pb + radius)),
        mode="edge",
    )
    costs: list = []
    cmin, best = _scan_candidates(
        iagg, jbuf, hp, wp, radius, patch, lambda _i, c: costs.append(c)
    )
    fx, fy = _subpixel_from_costs(costs.__getitem__, cmin, best, k, radius)
    return fx, fy, cmin


def use_pallas() -> bool:
    """Kernel path on single-device TPU runs.  Under a sharding mesh
    the XLA mirror runs instead: the estimation jits are GSPMD-
    partitioned there, and a pallas_call cannot be auto-partitioned
    (utils/meshinfo.py)."""
    from ..utils.meshinfo import mesh_active

    if mesh_active():
        return False
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False
