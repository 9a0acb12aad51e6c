"""Data pipeline (layer L4): streaming datasets, source exemplars, offline
preprocessing tools."""

from dynaboa_tpu.data.streams import (
    PW3DStream,
    InternetStream,
    SyntheticStream,
    crop_and_normalize,
)

__all__ = ["PW3DStream", "InternetStream", "SyntheticStream",
           "crop_and_normalize"]
