from .warp import (  # noqa: F401
    coverage_mask,
    warp_clip,
    warp_clip_with_mask,
    warp_clip_blur,
)
