"""TPU-native video stabilization framework.

A ground-up JAX/XLA/Pallas re-design of the capability set of
nomadoor/ComfyUI-Video-Stabilizer (reference: /root/reference): Classic
(sparse feature tracking) and Flow (dense DIS-style optical flow)
stabilizers, the motion_meta v2 producer/consumer contract, Motion Apply
with shutter-sampled motion blur, deterministic shake generators, and
inverse restoration — with every per-frame OpenCV loop replaced by
batched whole-clip TPU kernels.

Layering (bottom up):
  ops/       TPU compute kernels (warp, flow, LK, RANSAC, resize, FFT)
  models/    motion models + pipeline engines (classic/flow/apply/shake)
  meta/      motion_meta v2 JSON contract (host, pure python/numpy)
  utils/     I/O adaptation, color parsing, progress plumbing
  parallel/  multi-chip sharding (jax.sharding.Mesh / shard_map)
  nodes/     ComfyUI V3 node shells (work standalone via a shim)
"""

from __future__ import annotations

__version__ = "0.1.0"

from .meta.motion_meta import (  # noqa: F401
    MotionMeta,
    FrameTransform,
    build_motion_meta_v2,
    validate_motion_meta,
    resolve_motion_meta,
    motion_meta_from_stabilization_warp,
    applied_motion_meta_from_stabilization_warp,
)


def apply_inverse_stabilization(*args, **kwargs):
    """Exported legacy inverse engine (lazy: pulls in jax).

    Mirror of the reference's ``__all__``-exported
    ``_apply_inverse_stabilization`` (stabilizer_utils.py:27,929-1007),
    whose consumer is the validation harness; the Inverse node routes
    through Motion Apply by the 003:51 bit-exactness contract.  See
    models/inverse.py for the full wiring-parity note.
    """
    from .models.inverse import apply_inverse_stabilization as _impl

    return _impl(*args, **kwargs)


async def comfy_entrypoint():
    """ComfyUI extension entrypoint (kept lazy: nodes import jax)."""
    from .nodes import comfy_entrypoint as _entry

    return await _entry()
