"""Compute-path ops: DSP tables, the batched JAX granule chain (with the
packed and fused device interfaces), and the numpy float64 golden oracle."""

from .granule import (
    DecodeState,
    GranuleBatch,
    decode_chunk,
    decode_chunk_batch,
    decode_chunk_impl,
    init_state,
)

__all__ = [
    "DecodeState",
    "GranuleBatch",
    "decode_chunk",
    "decode_chunk_batch",
    "decode_chunk_impl",
    "init_state",
]
