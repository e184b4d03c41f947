"""Mesh sharding for the PRODUCTION stabilization pipelines.

The flagship engines (models/stabilize.py driven by models/flow.py /
models/classic.py) are host-orchestrated: batched device programs for
estimation and warping around a host float64 trajectory solve.  Multi-
chip scaling therefore means running those device programs with the
frame/pair axis sharded over a ``jax.sharding.Mesh`` and letting GSPMD
insert the collectives:

* estimation — ``grays`` is placed with the frame axis on the mesh's
  ``data`` axis; the adjacent-pair shifted slices inside the fused DIS
  solve become halo exchanges, and every per-pair stage (pyramids,
  cost volumes, IRLS fits, RANSAC) partitions over pairs.
* trajectory solve — host math on the (tiny) fetched fit results,
  unchanged (SURVEY 2.10: the sequence-global reductions that need
  cross-shard communication are the estimation/warp reductions, which
  live on device).
* warp + masks — frames stay sharded through the XLA sampling path.

This mirrors the reference's sequence-global structure
(/root/reference/nodes/video_stabilizer_classic.py:288-290,
stabilizer_utils.py:368-374,1010-1052) without forking the engine: the
same ``stabilize_flow`` code runs, sharded, under ``set_mesh``.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.classic import stabilize_classic
from ..models.flow import stabilize_flow
from ..models.stabilize import StabilizationResult
from ..utils.video_io import FrameAdapter, VideoContext


def input_partition_spec(mesh: Mesh, n: int, h: int) -> P:
    """Frame-axis sharding when the clip divides the data axis; else
    fall back to spatial (row) sharding, else replicate.

    ``device_put`` rejects uneven shards, and padding the clip would
    change estimation/smoothing semantics near the end — so a 9-frame
    clip on an 8-way mesh partitions its ROWS instead (every per-pixel
    stage still distributes; only the tiny per-pair reductions
    replicate)."""
    if n % int(mesh.shape["data"]) == 0:
        return P("data", None, None, None)
    if "spatial" in mesh.axis_names and h % int(mesh.shape["spatial"]) == 0:
        return P(None, "spatial", None, None)
    return P(None, None, None, None)


def sharded_video_context(frames: np.ndarray, mesh: Mesh, fps: float = 16.0) -> VideoContext:
    """VideoContext whose frames are device_put sharded over the mesh."""
    frames = np.ascontiguousarray(frames, np.float32)
    n, h, w, c = frames.shape
    sharded = jax.device_put(frames, NamedSharding(mesh, input_partition_spec(mesh, n, h)))
    return VideoContext(
        frames=sharded,
        adapter=FrameAdapter(np.dtype(np.float32), False, "0_1", "numpy", False),
        width=w,
        height=h,
        channels=c,
        fps=fps,
        template_kind="sequence",
        template_meta={},
    )


def stabilize_flow_sharded(
    frames: np.ndarray,
    mesh: Mesh,
    *,
    framing_mode: str = "crop_and_pad",
    transform_mode: str = "similarity",
    camera_lock: bool = False,
    strength: float = 0.9,
    smooth: float = 0.6,
    keep_fov: float = 0.6,
    padding_rgb: Tuple[int, int, int] = (127, 127, 127),
    frame_rate: float = 16.0,
) -> StabilizationResult:
    """Run the production Flow engine with the clip sharded over the mesh."""
    ctx = sharded_video_context(frames, mesh, fps=frame_rate)
    with jax.sharding.set_mesh(mesh):
        return stabilize_flow(
            ctx, framing_mode, transform_mode, camera_lock,
            strength, smooth, keep_fov, padding_rgb, frame_rate,
        )


def stabilize_classic_sharded(
    frames: np.ndarray,
    mesh: Mesh,
    *,
    framing_mode: str = "crop_and_pad",
    transform_mode: str = "similarity",
    camera_lock: bool = False,
    strength: float = 0.9,
    smooth: float = 0.6,
    keep_fov: float = 0.6,
    padding_rgb: Tuple[int, int, int] = (127, 127, 127),
    frame_rate: float = 16.0,
) -> StabilizationResult:
    """Run the production Classic engine with the clip sharded over the mesh."""
    ctx = sharded_video_context(frames, mesh, fps=frame_rate)
    with jax.sharding.set_mesh(mesh):
        return stabilize_classic(
            ctx, framing_mode, transform_mode, camera_lock,
            strength, smooth, keep_fov, padding_rgb, frame_rate,
        )


def sharded_stabilize_flow_check(mesh: Mesh) -> None:
    """Dry-run validation: the sharded production engine must execute
    end-to-end on the mesh and agree with the single-device run."""
    rng = np.random.default_rng(0)
    n, h, w = max(8, mesh.devices.size * 2), 64, 96
    base = rng.random((h + 40, w + 40), np.float32)
    # mild synthetic shake so estimation has real work
    frames = np.empty((n, h, w, 3), np.float32)
    for i in range(n):
        dy, dx = int(3 * np.sin(i / 2.0)), int(4 * np.cos(i / 3.0))
        crop = base[20 + dy : 20 + dy + h, 20 + dx : 20 + dx + w]
        frames[i] = np.stack([crop, crop * 0.8 + 0.1, 1.0 - crop], axis=-1)

    res = stabilize_flow_sharded(frames, mesh)
    out = np.asarray(res.frames)
    masks = np.asarray(res.masks)
    assert out.shape == frames.shape, out.shape
    assert masks.shape == frames.shape[:3], masks.shape
    assert np.isfinite(out).all() and np.isfinite(masks).all()
    assert res.meta["flow_backend"] == "DIS", res.meta.get("flow_fallback_reason")

    # parity with the unsharded engine (same code, no mesh)
    from ..utils.video_io import normalize_video_input

    ref = stabilize_flow(
        normalize_video_input(frames), "crop_and_pad", "similarity", False,
        0.9, 0.6, 0.6, (127, 127, 127), 16.0,
    )
    # The sharded and single-device runs are different XLA compilations
    # of the same f32 estimation program.  Reassociation can flip a
    # borderline RANSAC inlier, which flips a count-tied hypothesis
    # winner, which shifts one pair's refit by ~1e-2 px — physically
    # nothing, but unboundable at ulp scale.  Gate on what must hold:
    # identical mode decisions and confidences, matrices within
    # 0.05 px / 1e-3 linear terms, pixels within 0.02 at the 99.999th
    # percentile.
    pt_s = res.meta["estimated_motion"]["per_transition"]
    pt_r = ref.meta["estimated_motion"]["per_transition"]
    assert [e["mode"] for e in pt_s] == [e["mode"] for e in pt_r]
    ms = np.asarray([e["matrix"] for e in pt_s])
    mr = np.asarray([e["matrix"] for e in pt_r])
    assert np.abs(ms[:, :2, 2] - mr[:, :2, 2]).max() < 0.05, "translation drift"
    assert np.abs(ms[:, :2, :2] - mr[:, :2, :2]).max() < 1e-3, "linear drift"
    diff = np.abs(out - np.asarray(ref.frames))
    assert np.quantile(diff, 0.99999) < 0.02, float(np.quantile(diff, 0.99999))
