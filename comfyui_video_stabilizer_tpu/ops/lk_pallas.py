"""Pallas TPU kernel for the pyramidal-LK Gauss-Newton iterations.

Replaces the iteration loop of ops/lk.py::_lk_level (the TPU re-design
of cv2.calcOpticalFlowPyrLK, /root/reference/nodes/
video_stabilizer_classic.py:88-96), which was the Classic path's whale:
each iteration sampled every feature's 31x31 patch as a pair of tiny
batched matmuls ((31,49)@(49,49)@(49,31) per feature) that tile onto
the 128x128 MXU at ~2% utilization, and the lockstep convergence state
spanned ALL pairs, so one straggler track burned an iteration for the
whole clip.

This kernel flips the layout: features ride the LANE axis (128 per
grid block), window pixels ride (row, sublane).  The per-feature
dynamic subpixel sample becomes a static shift band — the integer
offset of a live track is bounded by the extracted window
(0..WEXT-WIN), so the bilinear row blend is sum_d w_d(f) * W[d:d+31]
over 19 static slices with per-lane weights (w_d nonzero only at the
track's own floor offset), and likewise for columns over sublanes.
Pure VPU work, no gathers, no matmuls; convergence is tracked per
128-feature block, so early levels exit in a handful of iterations
instead of the global 50.

Window extraction, template sampling and the 2x2 normal equations stay
in XLA (they run once per level); see ops/lk.py::_lk_level_all_pallas
for the prep/post halves and the exact-parity contract with the XLA
iteration loop (tests/test_classic.py, tests/test_lk_pallas.py).

Mosaic constrains block shapes to (8k, 128) in the minor two dims, so
the per-feature scalars travel as ONE packed (16, FB) block (row map
below) and the kernel writes an (8, FB) output block whose first two
rows are (x, y).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

FB = 128  # features per grid block (one lane register row)

# packed scalar rows (input `scal` (B, 16, Fp)):
ROW_A, ROW_B, ROW_C, ROW_INVD, ROW_RUN = 0, 1, 2, 3, 4
ROW_BASE_X, ROW_BASE_Y, ROW_GUESS_X, ROW_GUESS_Y = 5, 6, 7, 8
N_ROWS = 16


def _make_kernel(*, win: int, wext: int, iters: int, eps: float):
    band = wext - win + 1          # static shift band (19 for 31/49)
    half = win // 2
    lo = 0.5
    hi = wext - win - 0.5

    def kernel(jw_ref, t_ref, gx_ref, gy_ref, scal_ref, out_ref):
        jw = jw_ref[0]                     # (wext, wext, FB)
        T = t_ref[0]                       # (win, win, FB)
        gxT = gx_ref[0]
        gyT = gy_ref[0]
        sc = scal_ref[0]                   # (16, FB)
        a = sc[ROW_A : ROW_A + 1, :]       # (1, FB)
        b = sc[ROW_B : ROW_B + 1, :]
        c = sc[ROW_C : ROW_C + 1, :]
        invd = sc[ROW_INVD : ROW_INVD + 1, :]
        run = sc[ROW_RUN : ROW_RUN + 1, :] > 0.5
        base_x = sc[ROW_BASE_X : ROW_BASE_X + 1, :]
        base_y = sc[ROW_BASE_Y : ROW_BASE_Y + 1, :]
        g_x0 = sc[ROW_GUESS_X : ROW_GUESS_X + 1, :]
        g_y0 = sc[ROW_GUESS_Y : ROW_GUESS_Y + 1, :]

        eps2 = jnp.float32(eps * eps)
        zrow = jnp.zeros((1, FB), jnp.float32)

        # Loop state packed into ONE (8, FB) f32 tile (rows: g_x, g_y,
        # done, prev_step2, stall, 3x pad) + an i32 iteration counter.
        # Mosaic's scf.while legalization requires every yielded vector
        # to keep the layout of its init; sliced (1, FB) rows pick up
        # sublane-offset layouts mid-body, so the carry is rebuilt with
        # a fresh concatenate each iteration (canonical layout both
        # sides).  done/stall ride as floats (exact for counts <= 50).
        def body(state):
            it, st = state
            g_x = st[0:1, :]
            g_y = st[1:2, :]
            done = st[2:3, :] > 0.5
            prev2 = st[3:4, :]
            stall = st[4:5, :]
            ly = jnp.clip(g_y - half - base_y, lo, hi)
            lx = jnp.clip(g_x - half - base_x, lo, hi)
            ey = jnp.floor(ly)
            ex = jnp.floor(lx)
            fy = ly - ey
            fx = lx - ex
            eyi = ey.astype(jnp.int32)
            exi = ex.astype(jnp.int32)

            # bilinear row blend: per-lane weight mass lands on the
            # track's own floor offset (and +1); all slices are static
            rb = None
            for d in range(band):
                wd = jnp.where(eyi == d, 1.0 - fy,
                               jnp.where(eyi == d - 1, fy, 0.0))
                contrib = jw[d : d + win, :, :] * wd[None]
                rb = contrib if rb is None else rb + contrib
            cb = None
            for e in range(band):
                we = jnp.where(exi == e, 1.0 - fx,
                               jnp.where(exi == e - 1, fx, 0.0))
                contrib = rb[:, e : e + win, :] * we[None]
                cb = contrib if cb is None else cb + contrib

            r = cb - T
            bx = jnp.sum(gxT * r, axis=(0, 1))[None]
            by = jnp.sum(gyT * r, axis=(0, 1))[None]
            dx = -(c * bx - b * by) * invd
            dy = -(-b * bx + a * by) * invd
            mask = run & jnp.logical_not(done)
            g_xn = g_x + jnp.where(mask, dx, 0.0)
            g_yn = g_y + jnp.where(mask, dy, 0.0)
            g_xn = jnp.clip(g_xn, base_x + half + lo, base_x + half + hi)
            g_yn = jnp.clip(g_yn, base_y + half + lo, base_y + half + hi)
            step2 = dx * dx + dy * dy
            small = step2 <= eps2
            stall = jnp.where(step2 >= 0.98 * prev2, stall + 1.0, 0.0)
            done = done | small | jnp.logical_not(run) | (stall >= 5.0)
            done_f = jnp.where(done, 1.0, 0.0)
            st_new = jnp.concatenate(
                [g_xn, g_yn, done_f, step2, stall, zrow, zrow, zrow], axis=0
            )
            return it + 1, st_new

        def cond(state):
            it, st = state
            return (it < iters) & (jnp.min(st[2:3, :]) < 0.5)

        init = (
            jnp.int32(0),
            jnp.concatenate(
                [g_x0, g_y0, zrow, jnp.full((1, FB), 1.0e30, jnp.float32),
                 zrow, zrow, zrow, zrow], axis=0
            ),
        )
        _, st = jax.lax.while_loop(cond, body, init)
        out_ref[0] = st

    return kernel


@functools.partial(
    jax.jit, static_argnames=("win", "iters", "eps", "interpret")
)
def lk_gn_iterate(
    jw_A, T_A, gx_A, gy_A, scal,
    *, win: int, iters: int, eps: float, interpret: bool = False,
):
    """Run the batched GN loop; returns g (B, 8, Fp) float32 whose first
    two rows per pair are the tracked (x, y).

    jw_A: (B, wext, wext, Fp) search windows, features on the minor axis
    T_A/gx_A/gy_A: (B, win, win, Fp) sampled template + Scharr gradients
    scal: (B, 16, Fp) packed per-feature scalars (ROW_* map above)
    Fp must be a multiple of FB; padded features must have runnable=0.
    """
    B, wext, _, Fp = jw_A.shape
    assert Fp % FB == 0, Fp
    kernel = _make_kernel(win=win, wext=wext, iters=iters, eps=eps)

    def blk(*shape):
        return pl.BlockSpec(
            shape,
            lambda i, j, _nd=len(shape): (i,) + (0,) * (_nd - 2) + (j,),
            memory_space=pltpu.VMEM,
        )

    return pl.pallas_call(
        kernel,
        grid=(B, Fp // FB),
        in_specs=[
            blk(1, wext, wext, FB),
            blk(1, win, win, FB),
            blk(1, win, win, FB),
            blk(1, win, win, FB),
            blk(1, N_ROWS, FB),
        ],
        out_specs=blk(1, 8, FB),
        out_shape=jax.ShapeDtypeStruct((B, 8, Fp), jnp.float32),
        interpret=interpret,
    )(jw_A, T_A, gx_A, gy_A, scal)
