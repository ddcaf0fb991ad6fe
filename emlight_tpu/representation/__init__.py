from .extract import AnchorExtractor, extract_anchors, extract_anchors_batch  # noqa: F401
from .splat import (  # noqa: F401
    DEFAULT_SPLAT_SIZE,
    render_anchor_params,
    render_sg,
    to_nchw,
)
