"""Adaptation engine (layer L5): the jitted dynamic-bilevel step, retrieval,
state/checkpointing and streaming runners."""

from dynaboa_tpu.engine.bilevel import AdaptState, BilevelEngine, Frame
from dynaboa_tpu.engine.retrieval import (
    ExemplarBank,
    RetrievalStore,
    retrieve,
    build_store,
    synthetic_store,
)

__all__ = [
    "AdaptState", "BilevelEngine", "Frame", "ExemplarBank", "RetrievalStore",
    "retrieve", "build_store", "synthetic_store",
]
