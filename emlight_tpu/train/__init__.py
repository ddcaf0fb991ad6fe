from . import checkpoint, data, regression  # noqa: F401
