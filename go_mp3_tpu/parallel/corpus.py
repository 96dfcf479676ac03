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


def decode_corpus_fast(
    stream_bytes: list[bytes],
    chunk_t: int = 256,
    fetch: bool = True,
    mesh=None,
    drain: int | None = None,
):
    """High-throughput corpus decode: the production pipeline.

    C++ packed parse (gmp_parse_packed8: int8 tail spectra + exact int16
    head plane + byte sidecar — the minimal-byte device interface) ->
    asynchronous
    line-major uploads (measured ~32% cheaper through compressing links
    than granule-major) -> ONE jitted lax.scan over all chunks with the
    DSP state as carry (amortizes per-execute dispatch latency).

    This is the same pipeline bench.py measures; `decode_corpus` below
    keeps the pure-Python parse for auditability.

    Returns CorpusResult when fetch=True (PCM pulled to host — on a slow
    device link this readback can dominate; pass fetch=False to keep the
    PCM on device and get (pcms [C,S,chunk_t*576,2] int16 jax.Array,
    valids [C,S] np.ndarray) for on-device consumption).

    Falls back to the int16 packed interface if a (pathological) stream
    clips the int8 tail plane (|value| > 127 past per-channel line 64).

    drain: segment size in chunks. By default the whole corpus's PCM
    ([C, S, chunk_t*576, 2] int16) lives in device memory until fetched —
    ~45 MB per chunk at the default shapes, capping corpus length by HBM.
    With drain=k the corpus decodes in segments of k chunks through ONE
    compiled k-chunk scan (DSP state carried across segments), and each
    segment's PCM is fetched while the NEXT segment computes — device
    memory stays O(k), flat in corpus length. Requires fetch=True.

    Pass a jax.sharding.Mesh (1-D, axis 'streams' — see mesh.make_mesh) to
    shard the stream axis across chips: streams are independent, so the
    whole scan partitions with zero cross-device communication. len(streams)
    must then divide evenly by the mesh size.
    """
    import jax
    import jax.numpy as jnp

    from ..native.lib import (
        HEAD_WIDTH,
        SIDE8_WIDTH,
        SIDE_WIDTH,
        SP8_TAIL_WIDTH,
        NativeParser,
    )
    from ..ops.granule import decode_chunk_packed8_impl, decode_chunk_packed_impl

    n_streams = len(stream_bytes)
    if n_streams == 0:
        return CorpusResult(pcm=[], granules=0, samples=0)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from .mesh import STREAM_AXIS

        def put_streamwise(a, axis):
            spec = [None] * a.ndim
            spec[axis] = STREAM_AXIS
            return jax.device_put(a, NamedSharding(mesh, P(*spec)))
    else:
        def put_streamwise(a, axis):
            return jax.device_put(a)

    def parse_all(int8: bool):
        parsers = [NativeParser(d) for d in stream_bytes]
        if int8:
            sp8 = np.empty((n_streams, chunk_t, SP8_TAIL_WIDTH), np.int8)
            head = np.empty((n_streams, chunk_t, HEAD_WIDTH), np.int16)
            side = np.empty((n_streams, chunk_t, SIDE8_WIDTH), np.uint8)
        else:
            sp16 = np.empty((n_streams, chunk_t, 1152), np.int16)
            side16 = np.empty((n_streams, chunk_t, SIDE_WIDTH), np.int16)
        sp_chunks, aux_chunks, valid_rows = [], [], []
        try:
            while True:
                valids = np.zeros(n_streams, np.int32)
                for s, p in enumerate(parsers):
                    if int8:
                        n = p.parse_packed8_into(sp8[s], head[s], side[s])
                    else:
                        n = p.parse_packed_into(sp16[s], side16[s])
                    valids[s] = n
                    if n < chunk_t:
                        if int8:
                            sp8[s, n:] = 0
                            head[s, n:] = 0
                            side[s, n:] = 0
                        else:
                            sp16[s, n:] = 0
                            side16[s, n:] = 0
                if not valids.any():
                    break
                sp = sp8 if int8 else sp16
                # line-major for the transfer; re-transposed on device
                sp_chunks.append(
                    put_streamwise(
                        np.ascontiguousarray(sp.transpose(0, 2, 1)), 0
                    )
                )
                aux_chunks.append(
                    (head.copy(), side.copy()) if int8 else (side16.copy(),)
                )
                valid_rows.append(valids.copy())
        finally:
            for p in parsers:
                p.close()
        return sp_chunks, aux_chunks, valid_rows

    try:
        int8 = True
        sp_chunks, aux_chunks, valid_rows = parse_all(int8=True)
    except OverflowError:
        int8 = False
        sp_chunks, aux_chunks, valid_rows = parse_all(int8=False)

    if not sp_chunks:
        return CorpusResult(pcm=[b""] * n_streams, granules=0, samples=0)

    valids = np.stack(valid_rows)  # [C, S]
    states = init_states(n_streams)
    if mesh is not None:
        states = jax.tree_util.tree_map(lambda a: put_streamwise(a, 0), states)

    if int8:
        chunk_impl = decode_chunk_packed8_impl
        aux_all = tuple(
            put_streamwise(np.stack([a[i] for a in aux_chunks]), 1)
            for i in range(2)
        )
    else:
        chunk_impl = decode_chunk_packed_impl
        aux_all = (
            put_streamwise(np.stack([a[0] for a in aux_chunks]), 1),
        )
    batched = jax.vmap(chunk_impl)

    @jax.jit
    def scan_corpus(sp_chunks, aux_all, states, valids):
        sp_all = jnp.stack([jnp.swapaxes(c, 1, 2) for c in sp_chunks])

        def step(st, xs):
            sp, v = xs[0], xs[-1]
            pcm, st = batched(sp, *xs[1:-1], st, v)
            return st, pcm

        states, pcms = jax.lax.scan(
            step, states, (sp_all, *aux_all, valids)
        )
        return pcms, states

    def emit(parts, host, valids_seg):
        for c in range(valids_seg.shape[0]):
            for s in range(n_streams):
                v = int(valids_seg[c, s])
                if v:
                    parts[s].append(
                        host[c, s, : v * SAMPLES_PER_GR].tobytes()
                    )

    n_chunks = len(sp_chunks)
    if drain is not None and fetch and drain < n_chunks:
        # segment the corpus through ONE k-chunk compiled scan; fetch each
        # segment's PCM while the next segment computes (the device works
        # under the blocking host-side np.asarray of the previous segment)
        k = drain
        parts: list[list[bytes]] = [[] for _ in range(n_streams)]
        pad_sp = jnp.zeros_like(sp_chunks[0])
        pad_aux = tuple(jnp.zeros_like(a[0]) for a in aux_all)
        pending = None  # (pcms on device, valids of that segment)
        for lo in range(0, n_chunks, k):
            seg = slice(lo, min(lo + k, n_chunks))
            n_pad = k - (seg.stop - seg.start)
            sp_seg = sp_chunks[seg] + [pad_sp] * n_pad
            aux_seg = tuple(
                jnp.concatenate(
                    [a[seg]] + [p[None]] * n_pad, axis=0
                ) if n_pad else a[seg]
                for a, p in zip(aux_all, pad_aux)
            )
            v_seg = np.zeros((k, n_streams), np.int32)
            v_seg[: seg.stop - seg.start] = valids[seg]
            pcms_dev, states = scan_corpus(sp_seg, aux_seg, states, v_seg)
            if pending is not None:
                emit(parts, np.asarray(pending[0]), pending[1])
            pending = (pcms_dev, v_seg)
        if pending is not None:
            emit(parts, np.asarray(pending[0]), pending[1])
        total = int(valids.sum())
        return CorpusResult(
            pcm=[b"".join(p) for p in parts],
            granules=total,
            samples=total * SAMPLES_PER_GR,
        )

    pcms, _ = scan_corpus(sp_chunks, aux_all, states, valids)
    if not fetch:
        return pcms, valids

    host = np.asarray(pcms)  # [C, S, chunk_t*576, 2]
    parts = [[] for _ in range(n_streams)]
    emit(parts, host, valids)
    total = int(valids.sum())
    return CorpusResult(
        pcm=[b"".join(p) for p in parts],
        granules=total,
        samples=total * SAMPLES_PER_GR,
    )


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
