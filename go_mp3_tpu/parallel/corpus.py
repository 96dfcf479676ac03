"""Multi-stream corpus decoding: N files -> batched granule decode on a mesh.

The host parses each stream serially (its bitstream is inherently
sequential), interleaving streams into fixed [S, T] granule chunks; the
device decodes all streams of a chunk in one sharded call. Ragged stream
lengths are handled by per-stream `valid` counts (shorter streams pad).
"""

from __future__ import annotations

import io
from dataclasses import dataclass

import numpy as np

from ..bitstream import Source
from ..bitstream.parser import FrameReader
from ..consts import (
    SAMPLES_PER_GR,
    EOFError_,
    SyncSearchLimitError,
    UnexpectedEOFError,
)
from ..models.pipeline import GranuleMeta, granules_from_frame, pack_granule_batch
from ..ops.granule import GranuleBatch, decode_chunk_batch
from .mesh import init_states


def parse_stream_granules(data: bytes, limit: int | None = None) -> list[GranuleMeta]:
    """Parse a whole MP3 byte stream into granule metadata records."""
    src = Source(io.BytesIO(data))
    src.skip_tags()
    fr = FrameReader()
    out: list[GranuleMeta] = []
    while limit is None or len(out) < limit:
        try:
            f = fr.read(src, src.pos)
        except (EOFError_, UnexpectedEOFError, SyncSearchLimitError):
            break
        out.extend(granules_from_frame(f))
    return out


@dataclass
class CorpusResult:
    pcm: list[bytes]  # per-stream s16le stereo PCM
    granules: int  # total granules decoded
    samples: int  # total output samples (per channel)


def decode_corpus(
    streams: list[list[GranuleMeta]],
    chunk_t: int = 128,
    decode_fn=None,
) -> CorpusResult:
    """Decode pre-parsed streams with the batched device path.

    decode_fn defaults to the single-host vmapped decoder
    (ops.granule.decode_chunk_batch); pass the result of
    mesh.make_sharded_decoder(mesh) to spread streams across chips.
    """
    if decode_fn is None:
        decode_fn = decode_chunk_batch
    n_streams = len(streams)
    states = init_states(n_streams)
    pcm_parts: list[list[bytes]] = [[] for _ in range(n_streams)]
    max_len = max(len(s) for s in streams)
    total = sum(len(s) for s in streams)

    for start in range(0, max_len, chunk_t):
        batches = []
        valids = []
        for s in streams:
            part = s[start : start + chunk_t]
            batch, valid = pack_granule_batch(part, pad_to=chunk_t)
            batches.append(batch)
            valids.append(valid)
        stacked = GranuleBatch(
            *[np.stack([getattr(b, f) for b in batches]) for f in GranuleBatch._fields]
        )
        valid_arr = np.array(valids, dtype=np.int32)
        pcm, states = decode_fn(stacked, states, valid_arr)
        pcm_host = np.asarray(pcm)
        for i, v in enumerate(valids):
            if v:
                pcm_parts[i].append(pcm_host[i, : v * SAMPLES_PER_GR].tobytes())

    return CorpusResult(
        pcm=[b"".join(p) for p in pcm_parts],
        granules=total,
        samples=total * SAMPLES_PER_GR,
    )
