"""Node suite registration (L6 host integration).

Mirrors the reference extension entrypoint (/root/reference/
__init__.py:22-39): six nodes + the Inverse -> Motion Apply
node-replacement migration on load.
"""

from __future__ import annotations

from .comfy_compat import ComfyExtension
from .inverse_node import VideoStabilizerInverse
from .motion_apply_node import VideoStabilizerMotionApply
from .replacements import register_node_replacements
from .shake_nodes import (
    VideoStabilizerShakeGenerator,
    VideoStabilizerShakeGeneratorManual,
)
from .stabilizer_nodes import VideoStabilizerClassic, VideoStabilizerFlow

__all__ = [
    "VideoStabilizerClassic",
    "VideoStabilizerFlow",
    "VideoStabilizerMotionApply",
    "VideoStabilizerShakeGenerator",
    "VideoStabilizerShakeGeneratorManual",
    "VideoStabilizerInverse",
    "VideoStabilizerSuiteExtension",
    "comfy_entrypoint",
    "ALL_NODES",
]

ALL_NODES = [
    VideoStabilizerClassic,
    VideoStabilizerFlow,
    VideoStabilizerMotionApply,
    VideoStabilizerShakeGenerator,
    VideoStabilizerShakeGeneratorManual,
    VideoStabilizerInverse,
]


class VideoStabilizerSuiteExtension(ComfyExtension):
    async def get_node_list(self) -> list:
        return list(ALL_NODES)

    async def on_load(self) -> None:
        await register_node_replacements()


async def comfy_entrypoint() -> VideoStabilizerSuiteExtension:
    """Return the extension instance ComfyUI uses to discover nodes."""
    return VideoStabilizerSuiteExtension()
