"""Pallas TPU kernel: per-feature window extraction as DMA copies.

Replaces the one-hot selection matmuls of ops/lk.py::
_extract_windows_batched on device (the TPU re-design of the implicit
window reads inside cv2.calcOpticalFlowPyrLK / cv2.goodFeaturesToTrack,
/root/reference/nodes/video_stabilizer_classic.py:76-96).  The one-hot
form was exact and MXU-friendly but HBM-bound: its (chunk, F, wext, Hp)
selection tensors and (chunk, F, wext, Wp) row strips moved ~1 GB of
intermediates per 8-frame chunk at 480p (~45-70 ms/level, the Classic
path's last whale, docs/roadmap.md).

Here the padded frame rides the normal input pipeline into VMEM once
(~2.7 MB at the 960-cap working size) and each feature's window is one
VMEM->VMEM DMA plus two dynamic rolls:

* Mosaic requires DMA slice starts AND shapes aligned to the (8, 128)
  tile grid (measured on device: unaligned variants fail to compile),
  so the copy fetches the aligned superset block — rows from
  (cy//8)*8, columns from (cx//128)*128, shape (SH, 256) with
  SH = roundup(wext+7, 8) — covering the wanted window for any
  residual (dy, dx) in [0,8) x [0,128).
* The residuals are removed by one dynamic sublane roll + one dynamic
  lane roll (amounts normalized to [0, size): negative dynamic rolls
  miscompile on the current libtpu — same invariant as
  ops/warp_pallas.py), then a static (wext, wext) slice stores the
  exact window.

DMAs are double-buffered across features so the copy engine runs ahead
of the roll/store work.  Corner indices ride as scalar-prefetch
operands (SMEM), already clamped to [0, Hp - wext] by the caller
(ops/lk.py does).  Both the one-hot path and this kernel are exact
slices, hence interchangeable bit-for-bit (tests/test_classic.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SW = 256  # aligned copy width: 128 residual + wext <= 128 lanes, 2 tiles


def _make_kernel(wext: int, fblk: int, sh: int):
    def kernel(cy_ref, cx_ref, img_ref, out_ref, win, sems):
        b = pl.program_id(0)
        fb = pl.program_id(1)

        def copy_for(i, slot):
            f = fb * fblk + i
            ybase = pl.multiple_of((cy_ref[b, f] // 8) * 8, 8)
            xbase = pl.multiple_of((cx_ref[b, f] // 128) * 128, 128)
            return pltpu.make_async_copy(
                img_ref.at[0, pl.ds(ybase, sh), pl.ds(xbase, SW)],
                win.at[slot],
                sems.at[slot],
            )

        # all copies in flight before any is consumed: the per-feature
        # compute (two ~14-vreg rolls + a store) is far cheaper than one
        # DMA's latency, so a shallow pipeline would stall on every wait
        def issue(i, carry):
            copy_for(i, i).start()
            return carry

        jax.lax.fori_loop(0, fblk, issue, 0, unroll=fblk)

        def step(i, carry):
            copy_for(i, i).wait()
            f = fb * fblk + i
            dy = jax.lax.rem(cy_ref[b, f], 8)
            dx = jax.lax.rem(cx_ref[b, f], 128)
            # roll UP/LEFT by the residual == roll by (size - d) % size
            ry = jax.lax.rem(sh - dy, sh)
            rx = jax.lax.rem(SW - dx, SW)
            rolled = pltpu.roll(pltpu.roll(win[i], rx, 1), ry, 0)
            out_ref[0, i] = rolled[:wext, :wext]
            return carry

        jax.lax.fori_loop(0, fblk, step, 0, unroll=fblk)

    return kernel


@functools.partial(jax.jit, static_argnames=("wext", "interpret"))
def extract_windows_dma(padded, cy, cx, wext: int, interpret: bool = False):
    """(B, Hp, Wp) padded stack + clamped (B, F) int32 corners ->
    (B, F, wext, wext) float32 windows, bit-exact slices.

    F is padded to a multiple of the feature block internally; callers
    get exactly (B, F, wext, wext) back.
    """
    try:
        if jax.devices()[0].platform not in ("tpu", "axon"):
            interpret = True  # CPU test runs (the product gate is ops/lk.py)
    except Exception:
        pass
    B, Hp, Wp = padded.shape
    F = cy.shape[1]
    fblk = min(32, max(8, F))
    Fp = -(-F // fblk) * fblk
    padf = Fp - F
    if padf:
        cy = jnp.pad(cy, ((0, 0), (0, padf)))
        cx = jnp.pad(cx, ((0, 0), (0, padf)))

    sh = -(-(wext + 7) // 8) * 8
    # grow the stack so every aligned superset block stays in bounds:
    # max ybase + sh <= Hp2, max xbase + SW <= Wp2
    hp2 = -(-(Hp - wext + sh) // 8) * 8
    wp2 = -(-(Wp - wext + SW) // 128) * 128
    padded = jnp.pad(
        padded.astype(jnp.float32), ((0, 0), (0, hp2 - Hp), (0, wp2 - Wp))
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, Fp // fblk),
        in_specs=[
            pl.BlockSpec((1, hp2, wp2), lambda b, f, cy, cx: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, fblk, wext, wext), lambda b, f, cy, cx: (b, f, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((fblk, sh, SW), jnp.float32),
            pltpu.SemaphoreType.DMA((fblk,)),
        ],
    )
    out = pl.pallas_call(
        _make_kernel(wext, fblk, sh),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Fp, wext, wext), jnp.float32),
        interpret=interpret,
    )(cy.astype(jnp.int32), cx.astype(jnp.int32), padded)
    return out[:, :F]
