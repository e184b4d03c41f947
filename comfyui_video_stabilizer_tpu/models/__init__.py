from . import geometry, shake  # noqa: F401
