"""Pallas TPU kernel for the GFTT corner-score map.

Fuses the structure-tensor aggregation + min-eigenvalue + 3x3 NMS of
ops/lk.py::_min_eig_map/_nms_candidates (the TPU re-design of
cv2.goodFeaturesToTrack, /root/reference/nodes/
video_stabilizer_classic.py:76-84) into ONE pass over the gradient
products.  The XLA form pays ~10 log-step shift passes per cumsum on
the (B, H, W) product arrays (two cumsum axes x three arrays) plus a
separate reduce_window launch for the NMS pool; at 63 pairs of 960x540
grays that measured ~40 ms of the Classic path.  Here each row tile is
DMA'd into VMEM once and the 21x21 box sums, the eigenvalue formula
and the NMS pool all run on the VPU without touching HBM again.

Layout: grid (B, row_tiles).  The three gradient-product arrays arrive
reflect-101 pre-padded by the box radius (10) plus one extra zero
row/col for the NMS halo, so every in-kernel index is static and the
kernel never reasons about image edges beyond a validity mask:

  padded[i, j] = reflect_pad(prod, 10)[i-1, j-1]   (zeros outside)

  rowbox[r]  = sum_{d=0..20} padded[r+d]           (21 sublane rolls)
  box[:, c]  = sum_{d=0..20} rowbox[:, c+d]        (21 lane rolls)
  eig        = 0.5 ((a+c) - sqrt((a-c)^2 + 4 b^2))
  e_m        = eig where inside the image else -inf (NMS border = -inf,
               matching reduce_window's 'SAME' -inf init)
  keep       = e_m >= max_{3x3}(e_m)

All rolls use non-negative shifts (the current libtpu miscompiles
negative dynamic sublane rolls — docs/roadmap.md); the wrap garbage
lands only in rows/cols the validity mask already forces to -inf.

Box summation order differs from the XLA cumsum form by f32 rounding
(~1e-6 relative), which can only reorder exact score ties; the greedy
acceptance consumes whichever scoring program ran, so the device/host
greedy parity tests stay self-consistent (tests/test_classic.py).
Parity with the XLA scorer is asserted in tests/test_gftt_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RADIUS = 10          # (BLOCK_SIZE - 1) // 2 for the 21x21 aggregation
TH = 104             # output rows per tile (scratch rows = TH + 22)
_NEG = float("-inf")


def _rollsum(x, n, axis):
    """sum_{d=0..n-1} roll(x, -d, axis) with non-negative shifts.

    Built by doubling (T_2k = T_k + roll(T_k, -k)) so the window sum is
    O(log n) rolls with a handful of live temporaries — the naive
    21-term form kept every rolled copy alive and blew the 16 MB
    scoped-VMEM stack at 1024-lane tiles."""
    size = x.shape[axis]
    sums = {1: x}                     # T_k = sum_{d<k} roll(x, -d)
    k = 1
    while k * 2 <= n:
        sums[k * 2] = sums[k] + pltpu.roll(sums[k], size - k, axis=axis)
        k *= 2
    out = sums[k]
    done = k
    while done < n:
        step = 1
        while step * 2 <= n - done:
            step *= 2
        out = out + pltpu.roll(sums[step], size - done, axis=axis)
        done += step
    return out


def _rollmax3(x, axis):
    """max over offsets {-1, 0, +1} along `axis`."""
    size = x.shape[axis]
    return jnp.maximum(
        jnp.maximum(x, pltpu.roll(x, size - 1, axis=axis)),
        pltpu.roll(x, 1, axis=axis),
    )


def _make_kernel(*, h, w, th, wp):
    # TH + 22 rows are consumed; DMA slice heights must be 8-aligned,
    # so the scratch carries TH + 24 (= 128) rows and the trailing two
    # hold the next tile's rows (or the zero tail) — never read.
    rows = th + 2 * RADIUS + 4

    def kernel(pa_hbm, pb_hbm, pc_hbm, out_ref, pa_s, pb_s, pc_s, sem):
        b = pl.program_id(0)
        t = pl.program_id(1)
        row0 = t * th
        copies = []
        for src, dst, slot in ((pa_hbm, pa_s, 0), (pb_hbm, pb_s, 1),
                               (pc_hbm, pc_s, 2)):
            dma = pltpu.make_async_copy(
                src.at[b, pl.ds(row0, rows), :], dst, sem.at[slot]
            )
            dma.start()
            copies.append(dma)
        for dma in copies:
            dma.wait()

        # 21x21 box sums: rowbox valid for local rows 0..th+1
        a = _rollsum(_rollsum(pa_s[...], 21, 0), 21, 1)
        bb = _rollsum(_rollsum(pb_s[...], 21, 0), 21, 1)
        c = _rollsum(_rollsum(pc_s[...], 21, 0), 21, 1)
        eig = 0.5 * ((a + c) - jnp.sqrt((a - c) ** 2 + 4.0 * bb * bb))

        # local (r, j) holds image pixel (t*th + r - 1, j - 1)
        gy = jax.lax.broadcasted_iota(jnp.int32, eig.shape, 0) + (row0 - 1)
        gx = jax.lax.broadcasted_iota(jnp.int32, eig.shape, 1) - 1
        inside = (gy >= 0) & (gy < h) & (gx >= 0) & (gx < w)
        e_m = jnp.where(inside, eig, _NEG)

        pooled = _rollmax3(_rollmax3(e_m, 0), 1)
        scores = jnp.where((e_m >= pooled) & inside, e_m, _NEG)
        # shift local->image coords: drop the r=0 halo row and the
        # j=0 halo col (lane roll by -1 == +wp-1)
        out_ref[0] = pltpu.roll(scores, wp - 1, axis=1)[1 : th + 1, :]

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def gftt_scores(pa, pb, pc, *, interpret: bool = False):
    """NMS'd min-eig score maps from the Sobel gradient products.

    pa/pb/pc: (B, H, W) f32 = dx*dx, dx*dy, dy*dy (un-padded; reflect
    semantics are applied here).  Returns (B, H, W) scores with failed
    NMS / border pixels at -inf — same contract as
    ops/lk.py::_nms_candidates minus the quality-level threshold, which
    the caller applies (it needs the global max).
    """
    B, H, W = pa.shape
    n_t = -(-H // TH)
    hp = n_t * TH + 2 * RADIUS + 4
    wp = -(-(W + 2 * RADIUS + 2) // 128) * 128

    def prep(x):
        x = jnp.pad(x, ((0, 0), (RADIUS, RADIUS), (RADIUS, RADIUS)),
                    mode="reflect")
        return jnp.pad(
            x, ((0, 0), (1, hp - (H + 2 * RADIUS) - 1),
                (1, wp - (W + 2 * RADIUS) - 1)))

    rows = TH + 2 * RADIUS + 4
    out = pl.pallas_call(
        _make_kernel(h=H, w=W, th=TH, wp=wp),
        grid=(B, n_t),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)] * 3,
        out_specs=pl.BlockSpec((1, TH, wp), lambda b, t: (b, t, 0)),
        out_shape=jax.ShapeDtypeStruct((B, n_t * TH, wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((rows, wp), jnp.float32),
            pltpu.VMEM((rows, wp), jnp.float32),
            pltpu.VMEM((rows, wp), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
    )(prep(pa), prep(pb), prep(pc))
    return out[:, :H, :W]
