"""Torch oracle of the GenProjector SPADE stack — moved into the package
(emlight_tpu/train/torch_ref.py) so the checkpoint-parity CLI can use it;
re-exported here for the import tests."""

from emlight_tpu.train.torch_ref import (  # noqa: F401
    TEncoder,
    TGenerator,
    TMultiscaleD,
    TNLayerD,
    TSPADE,
    TSPADEResnetBlock,
    TSphereConv,
    randomize,
)
