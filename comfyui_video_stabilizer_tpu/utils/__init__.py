from .color import DEFAULT_PADDING_RGB, parse_padding_color  # noqa: F401
from .video_io import (  # noqa: F401
    FrameAdapter,
    VideoContext,
    convert_masks_for_output,
    normalize_video_input,
    reconstruct_video,
    resolve_fps,
)
