from . import exr, geometry, hdr  # noqa: F401
