"""Single-jit, mesh-sharded stabilization step.

The host-orchestrated pipelines in ``models/`` favor exact reference
parity (host float64 trajectory math); this module is the pure-device
counterpart: ONE jitted program covering the sequence-global patterns
of SURVEY 2.10 — pairwise estimation with an implicit halo exchange
(shifted slicing of the frame-sharded clip), path integration as a
log-depth associative scan, fps-windowed smoothing as a temporal
convolution, global bounding-box reductions, and the batched warp —
so the whole clip stabilizes across a ``jax.sharding.Mesh`` with XLA
inserting the collectives.

Estimation inside the jit uses the batched FFT phase-correlation
backend (translation model): it is exact for the dominant use case of
the single-jit path (throughput-critical translational shake) and
keeps the step free of host round-trips; the full LK/DIS estimators
remain available through the host pipelines.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_LUMA = np.array([0.299, 0.587, 0.114], np.float32)


def _constrain(x: jnp.ndarray, spec: Tuple) -> jnp.ndarray:
    """Apply a sharding constraint when running under a mesh context.

    Keeps the FFT stage on whole (H, W) planes per shard (XLA CPU's FFT
    thunk requires major-contiguous layouts) while the pixel stages
    shard rows.  A no-op without a mesh so entry() stays single-chip.
    """
    try:
        mesh = jax.sharding.get_abstract_mesh()
        if mesh is None or not mesh.axis_names:
            return x
        return jax.lax.with_sharding_constraint(x, P(*spec))
    except Exception:
        return x


def _phase_correlate_pairs(grays: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W) -> per-pair translation deltas (N-1, 2) via FFT."""
    prev = grays[:-1]
    curr = grays[1:]
    prev = prev - prev.mean(axis=(1, 2), keepdims=True)
    curr = curr - curr.mean(axis=(1, 2), keepdims=True)
    B, H, W = prev.shape
    f1 = jnp.fft.rfft2(prev)
    f2 = jnp.fft.rfft2(curr)
    cross = f1 * jnp.conj(f2)
    mag = jnp.abs(cross)
    r = jnp.fft.irfft2(cross / jnp.where(mag < 1e-12, 1.0, mag), s=(H, W))
    flat = r.reshape(B, -1)
    peak = jnp.argmax(flat, axis=-1)
    py = (peak // W).astype(jnp.float32)
    px = (peak % W).astype(jnp.float32)
    py = jnp.where(py > H / 2, py - H, py)
    px = jnp.where(px > W / 2, px - W, px)
    return -jnp.stack([px, py], axis=-1)


def _smooth(path: jnp.ndarray, window: int) -> jnp.ndarray:
    pad = window // 2
    padded = jnp.pad(path, ((pad, pad), (0, 0)), mode="edge")
    kernel = jnp.full((window,), 1.0 / window, path.dtype)
    return jax.vmap(
        lambda col: jnp.convolve(col, kernel, mode="valid"), in_axes=1, out_axes=1
    )(padded)


def _translation_warp(frames: jnp.ndarray, offsets: jnp.ndarray, border: jnp.ndarray):
    """Warp each frame by its (tx, ty) with bilinear sampling + mask.

    Expressed with static rolls of the integer part + a 4-tap blend of
    the fraction, so it stays collective-friendly when H is sharded.
    """
    n, h, w, c = frames.shape
    tx = offsets[:, 0]
    ty = offsets[:, 1]
    x0 = jnp.floor(tx)
    y0 = jnp.floor(ty)
    fx = (tx - x0)[:, None, None, None]
    fy = (ty - y0)[:, None, None, None]

    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)[None]
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)[None]
    sx = xx - tx[:, None, None]
    sy = yy - ty[:, None, None]

    # one dynamic slice per frame via vmap (the production pixel path is
    # ops/warp; this keeps the single-jit step gather-free and shardable).
    # Shift budget of THIS sidecar step (not the production engine):
    # integer corrections beyond +-PAD px clamp, which under-corrects
    # clips shakier than +-16 px.  The production pipelines have no such
    # cap (ops/warp plans per-clip); this single-jit demonstration step
    # trades range for a static, mesh-shardable shape.  The flow
    # solve's own integer pre-shift cap is pad_t=32 WORKING-res px
    # (ops/flow_dis._warp_similarity_device) — larger inter-frame
    # motion than that exceeds DIS's own search design.
    PAD = 16

    def one(frame, ix, iy, fxs, fys):
        ixc = jnp.clip(ix.astype(jnp.int32), -PAD, PAD)
        iyc = jnp.clip(iy.astype(jnp.int32), -PAD, PAD)
        padded = jnp.pad(frame, ((PAD, PAD), (PAD, PAD), (0, 0)))
        base = jax.lax.dynamic_slice(
            padded,
            (PAD - iyc, PAD - ixc, 0),
            (h + 1, w + 1, c),
        )
        v = (
            base[:-1, :-1] * (1 - fys) * (1 - fxs)
            + base[:-1, 1:] * (1 - fys) * fxs
            + base[1:, :-1] * fys * (1 - fxs)
            + base[1:, 1:] * fys * fxs
        )
        return v

    warped = jax.vmap(one)(frames, x0, y0, fx[:, 0, 0], fy[:, 0, 0])
    shift_ok = (jnp.abs(x0) <= 16) & (jnp.abs(y0) <= 16)
    inside = (
        (sx >= 0) & (sx <= w - 1) & (sy >= 0) & (sy <= h - 1)
    ) & shift_ok[:, None, None]
    warped = jnp.where(inside[..., None], warped, border[None, None, None, :])
    mask = 1.0 - inside.astype(jnp.float32)
    return warped, mask


def stabilize_step(
    frames: jnp.ndarray,
    strength: float,
    window: int,
    border: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Whole-clip translational stabilization, single traced program."""
    grays = jnp.einsum("nhwc,c->nhw", frames, jnp.asarray(_LUMA))
    grays = _constrain(grays, ("data", None, None))
    deltas = _phase_correlate_pairs(grays)
    deltas = _constrain(deltas, (None, None))

    # path integration: log-depth scan keeps the sharded time axis busy
    path = jnp.concatenate(
        [jnp.zeros((1, 2), deltas.dtype), jax.lax.associative_scan(jnp.add, deltas, axis=0)]
    )
    target = path + strength * (_smooth(path, window) - path)
    corrections = target - path

    # crop_and_pad recenter: global reduction over the sharded clip
    n, h, w, _ = frames.shape
    x0 = jnp.max(-corrections[:, 0])
    y0 = jnp.max(-corrections[:, 1])
    x1 = jnp.min(-corrections[:, 0] + w)
    y1 = jnp.min(-corrections[:, 1] + h)
    offset = jnp.stack([w * 0.5 - (x0 + x1) * 0.5, h * 0.5 - (y0 + y1) * 0.5])
    total = corrections + offset[None]

    frames = _constrain(frames, ("data", "spatial", None, None))
    warped, masks = _translation_warp(frames, total, border)
    warped = _constrain(warped, ("data", "spatial", None, None))
    masks = _constrain(masks, ("data", "spatial", None))
    return warped, masks, total


@functools.partial(jax.jit, static_argnames=("window",))
def jit_stabilize_step(frames, strength, window, border):
    return stabilize_step(frames, strength, window, border)


# ---------------------------------------------------------------------------
# Similarity-model sharded step
# ---------------------------------------------------------------------------

def _similarity_from_params(tx, ty, ang, logs):
    """(B,) params -> (B, 3, 3) similarity matrices."""
    s = jnp.exp(logs)
    ca = s * jnp.cos(ang)
    sa = s * jnp.sin(ang)
    z = jnp.zeros_like(tx)
    o = jnp.ones_like(tx)
    return jnp.stack(
        [jnp.stack([ca, -sa, tx], -1),
         jnp.stack([sa, ca, ty], -1),
         jnp.stack([z, z, o], -1)],
        axis=-2,
    )


def _params_from_similarity(M):
    """(B, 3, 3) -> (tx, ty, angle, log-scale), each (B,)."""
    ang = jnp.arctan2(M[:, 1, 0], M[:, 0, 0])
    s = jnp.sqrt(M[:, 0, 0] ** 2 + M[:, 1, 0] ** 2)
    return M[:, 0, 2], M[:, 1, 2], ang, jnp.log(jnp.maximum(s, 1e-6))


def _estimate_similarity_pairs(grays: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W) -> per-pair similarity (N-1, 3, 3), fully in-graph.

    Translation seed from FFT phase correlation, then a dense
    patch-aggregated Gauss-Newton flow refinement (ops/flow_dis's
    _lk_step) behind the integer pre-shift, robust-fit to a global
    similarity (IRLS, _fit_similarity_dense).  Pairs shard over the
    mesh's 'data' axis; every op here is batched over pairs, so GSPMD
    parallelizes it without host involvement.  (The host pipelines keep
    the full coarse-to-fine DIS estimator; this single-jit step trades
    its large-motion range for zero host round-trips.)
    """
    from ..ops import flow_dis as FD

    deltas = _phase_correlate_pairs(grays)          # (B, 2) translation seed
    B = deltas.shape[0]
    # seed maps I coords -> J coords (J(seed @ x) ~= I(x)); empirically
    # validated against warp_clip-generated ground truth in
    # tests/test_parallel.py
    seed = jnp.zeros((B, 3, 3), jnp.float32) + jnp.eye(3, dtype=jnp.float32)
    seed = seed.at[:, 0, 2].set(deltas[:, 0]).at[:, 1, 2].set(deltas[:, 1])

    J = grays[1:]
    I = grays[:-1]
    agg = FD._make_agg(8)
    M = seed
    for _ in range(2):  # fit -> prewarp -> refit: geometric convergence
        Jw = FD._warp_similarity_device(J, M, pad_t=32, radius=4)
        flow_lk, _, _ = FD._lk_step(I * (1.0 / 255.0), Jw * (1.0 / 255.0), agg)
        cmin = agg(((I - Jw) * (1.0 / 255.0)) ** 2)
        conf = 1.0 / (1.0 + cmin * 65025.0)
        residual = FD._compose_flow(M, flow_lk)
        Mn = FD._fit_similarity_dense(residual, conf, 4)
        # guard: keep the previous estimate when the dense fit is degenerate
        sc2 = Mn[:, 0, 0] ** 2 + Mn[:, 1, 0] ** 2
        ok = jnp.isfinite(Mn).all(axis=(1, 2)) & (sc2 > 0.25) & (sc2 < 4.0)
        M = jnp.where(ok[:, None, None], Mn, M)
    return M


def stabilize_step_similarity(
    frames: jnp.ndarray,
    strength: float,
    window: int,
    border: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Whole-clip SIMILARITY stabilization as one traced program.

    Sequence-global patterns over the mesh: pairwise estimation
    (data-sharded pairs), path integration as an associative MATRIX
    scan (3x3 composition is associative, so the sharded time axis
    integrates in log depth), parameter-space smoothing, a global
    recenter reduction, and a gather-free masked-shift similarity warp
    whose static row/column shifts become halo exchanges when H is
    sharded.
    """
    from ..ops import flow_dis as FD

    n, h, w, _ = frames.shape
    grays = jnp.einsum("nhwc,c->nhw", frames, jnp.asarray(_LUMA)) * 255.0
    grays = _constrain(grays, ("data", None, None))
    pair_M = _estimate_similarity_pairs(grays)      # maps frame k -> k+1 view

    # camera path: P_0 = I, P_k = M_{k-1} @ P_{k-1} (log-depth matmul scan)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (1, 3, 3))
    path_M = jnp.concatenate(
        [eye, jax.lax.associative_scan(lambda a, b: jnp.einsum("...ij,...jk->...ik", b, a), pair_M, axis=0)]
    )
    tx, ty, ang, logs = _params_from_similarity(path_M)
    params = jnp.stack([tx, ty, ang, logs], axis=-1)
    target = params + strength * (_smooth(params, window) - params)
    diff = target - params                           # correction in param space
    corr_M = _similarity_from_params(diff[:, 0], diff[:, 1], diff[:, 2], diff[:, 3])

    # crop_and_pad recenter: translate so the global content box centers
    cx = jnp.stack([corr_M[:, 0, 2], corr_M[:, 1, 2]], axis=-1)
    x0 = jnp.max(-cx[:, 0])
    y0 = jnp.max(-cx[:, 1])
    x1 = jnp.min(-cx[:, 0] + w)
    y1 = jnp.min(-cx[:, 1] + h)
    offset = jnp.stack([w * 0.5 - (x0 + x1) * 0.5, h * 0.5 - (y0 + y1) * 0.5])
    corr_M = corr_M.at[:, 0, 2].add(offset[0]).at[:, 1, 2].add(offset[1])

    # warp: sampling map out(x) = frame(Minv @ x)
    Minv = jnp.linalg.inv(corr_M)
    frames = _constrain(frames, ("data", "spatial", None, None))
    chans = jnp.moveaxis(frames, -1, 1).reshape(n * 3, h, w)
    Minv3 = jnp.repeat(Minv, 3, axis=0)
    warped = FD._warp_similarity_device(chans, Minv3, pad_t=32, radius=4)
    warped = jnp.moveaxis(warped.reshape(n, 3, h, w), 1, -1)

    # closed-form coverage mask from the inverse map
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)[None]
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)[None]
    sx = Minv[:, 0, 0][:, None, None] * xx + Minv[:, 0, 1][:, None, None] * yy + Minv[:, 0, 2][:, None, None]
    sy = Minv[:, 1, 0][:, None, None] * xx + Minv[:, 1, 1][:, None, None] * yy + Minv[:, 1, 2][:, None, None]
    inside = (sx >= 0) & (sx <= w - 1) & (sy >= 0) & (sy <= h - 1)
    warped = jnp.where(inside[..., None], warped, border[None, None, None, :])
    masks = 1.0 - inside.astype(jnp.float32)
    warped = _constrain(warped, ("data", "spatial", None, None))
    masks = _constrain(masks, ("data", "spatial", None))
    return warped, masks, corr_M


@functools.partial(jax.jit, static_argnames=("window",))
def jit_stabilize_step_similarity(frames, strength, window, border):
    return stabilize_step_similarity(frames, strength, window, border)


def sharded_stabilize_similarity(
    frames: np.ndarray,
    mesh: Mesh,
    strength: float = 1.0,
    window: int = 5,
    border: Tuple[float, float, float] = (0.5, 0.5, 0.5),
):
    """Similarity-model single-jit step with the clip sharded over the mesh."""
    in_spec = P("data", "spatial", None, None)
    frames_sharded = jax.device_put(
        np.asarray(frames, np.float32), NamedSharding(mesh, in_spec)
    )
    border_arr = jnp.asarray(border, jnp.float32)
    with jax.sharding.set_mesh(mesh):
        out = jit_stabilize_step_similarity(
            frames_sharded, jnp.float32(strength), int(window), border_arr
        )
    return tuple(np.asarray(o) for o in out)


def sharded_stabilize(
    frames: np.ndarray,
    mesh: Mesh,
    strength: float = 1.0,
    window: int = 5,
    border: Tuple[float, float, float] = (0.5, 0.5, 0.5),
):
    """Run the single-jit step with the clip sharded over the mesh.

    frames: (N, H, W, 3); N sharded over 'data', H over 'spatial'.
    """
    in_spec = P("data", "spatial", None, None)
    frames_sharded = jax.device_put(
        np.asarray(frames, np.float32), NamedSharding(mesh, in_spec)
    )
    border_arr = jnp.asarray(border, jnp.float32)
    with jax.sharding.set_mesh(mesh):
        out = jit_stabilize_step(frames_sharded, jnp.float32(strength), int(window), border_arr)
    return tuple(np.asarray(o) for o in out)
