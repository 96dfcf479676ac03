#!/usr/bin/env python3
"""Benchmark: aggregate MP3 decode throughput per chip.

Pipeline: native host parse (C++, writing straight into stream-stacked
arrays) -> batched device DSP -> int16 PCM. Reports aggregate x-realtime
(audio-seconds decoded per wall-second) end-to-end over the whole corpus.
Prints ONE JSON line on stdout; diagnostics on stderr.

PCM results are produced on-device; one chunk is fetched and checked for
non-silence as a validation probe. (This dev environment reaches the chip
through a low-bandwidth tunnel, so wholesale PCM readback measures the
tunnel, not the decoder — detail reports the observed D2H rate separately.)

North star (BASELINE.json): >= 5000x aggregate realtime 44.1 kHz stereo
decode per TPU chip. vs_baseline is value / 5000.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from go_mp3_tpu.consts import SAMPLES_PER_GR
    from go_mp3_tpu.native.lib import (
        META_FLAGS,
        META_WIDTH,
        NativeParser,
    )
    from go_mp3_tpu.models.native_pipeline import granule_batch_from_native
    from go_mp3_tpu.ops.granule import GranuleBatch, decode_chunk_batch
    from go_mp3_tpu.parallel.mesh import init_states

    import os

    if os.environ.get("GOMP3_USE_PALLAS"):
        from go_mp3_tpu.ops.pallas_synth import _decode_chunk_pallas_impl
        import functools

        decode_chunk_batch = jax.jit(
            jax.vmap(functools.partial(_decode_chunk_pallas_impl, interpret=False))
        )
        log("using fused Pallas synthesis kernel")

    fixture = "/root/reference/example/classic_lame.mp3"
    # each stream is the fixture concatenated `repeat` times (parsed for
    # real, frame boundaries align) so per-chunk dispatch overhead amortizes
    # over a realistic corpus length
    repeat = 4
    data = open(fixture, "rb").read() * repeat

    n_streams = 64
    chunk_t = 256

    log(f"devices: {jax.devices()}")

    # probe stream length once
    p = NativeParser(data)
    (sp0, sl0, ss0, me0) = p.parse_all()
    sample_rate = p.sample_rate
    p.close()
    g_per_stream = len(sp0)
    n_chunks = -(-g_per_stream // chunk_t)
    t_total = n_chunks * chunk_t
    audio_secs = n_streams * g_per_stream * SAMPLES_PER_GR / sample_rate

    # --- timed: parse all streams straight into stacked arrays -------------
    t0 = time.perf_counter()
    spectra = np.zeros((n_streams, t_total, 2, 576), np.int16)
    sfl = np.zeros((n_streams, t_total, 2, 22), np.int32)
    sfs = np.zeros((n_streams, t_total, 2, 39), np.int32)
    meta = np.zeros((n_streams, t_total, META_WIDTH), np.int32)
    for s in range(n_streams):
        p = NativeParser(data)
        got = 0
        while got < g_per_stream:
            n = p.parse_into(
                spectra[s, got:], sfl[s, got:], sfs[s, got:], meta[s, got:]
            )
            if n == 0:
                break
            got += n
        p.close()
        assert got == g_per_stream
    parse_wall = time.perf_counter() - t0
    log(
        f"parse: {g_per_stream} granules/stream x {n_streams} streams in "
        f"{parse_wall:.3f}s ({audio_secs / parse_wall:.0f}x realtime)"
    )

    # batch fields per chunk (meta unpack is cheap numpy slicing)
    def make_chunk(start: int):
        end = start + chunk_t
        valid = min(g_per_stream, end) - start
        n_flat = n_streams * chunk_t
        b, _ = granule_batch_from_native(
            spectra[:, start:end].reshape(n_flat, 2, 576),
            sfl[:, start:end].reshape(n_flat, 2, 22),
            sfs[:, start:end].reshape(n_flat, 2, 39),
            meta[:, start:end].reshape(n_flat, META_WIDTH),
        )
        b = GranuleBatch(
            *[
                a.reshape(n_streams, chunk_t, *a.shape[1:])
                for a in (np.asarray(getattr(b, f)) for f in b._fields)
            ]
        )
        return b, np.full(n_streams, valid, np.int32)

    # --- warmup / compile ---------------------------------------------------
    states = init_states(n_streams)
    chunk0 = make_chunk(0)
    t0 = time.perf_counter()
    pcm, _ = decode_chunk_batch(chunk0[0], states, chunk0[1])
    pcm.block_until_ready()
    log(f"compile+first chunk: {time.perf_counter() - t0:.2f}s")
    # validation probe past the (silent) Xing header frame
    probe = np.asarray(pcm[0, 20 * SAMPLES_PER_GR : 60 * SAMPLES_PER_GR])
    assert np.abs(probe).max() > 100, "decoded PCM should not be silence"

    # --- probe: steady-state phase costs on one chunk -----------------------
    probe_chunk = make_chunk(0)
    t0 = time.perf_counter()
    db = jax.device_put(probe_chunk[0])
    jax.block_until_ready(db)
    upload_probe = time.perf_counter() - t0
    st = init_states(n_streams)
    t0 = time.perf_counter()
    p, _ = decode_chunk_batch(db, st, probe_chunk[1])
    p.block_until_ready()
    compute_probe = time.perf_counter() - t0
    chunk_audio = n_streams * chunk_t * SAMPLES_PER_GR / sample_rate
    log(
        f"probe per chunk ({chunk_audio:.0f}s audio): upload {upload_probe:.3f}s, "
        f"dispatch+compute {compute_probe:.3f}s"
    )

    # --- timed: overlapped pipeline over the whole corpus -------------------
    # pack (host) -> device_put -> async dispatch per chunk; jax queues the
    # device work while the host packs the next chunk.
    states = init_states(n_streams)
    t0 = time.perf_counter()
    outs = []
    for c in range(n_chunks):
        b, valids = make_chunk(c * chunk_t)
        db = jax.device_put(b)
        pcm, states = decode_chunk_batch(db, states, valids)
        outs.append(pcm)
    outs[-1].block_until_ready()
    device_wall = time.perf_counter() - t0
    device_x = audio_secs / device_wall
    pack_wall = 0.0  # folded into the overlapped pipeline

    # --- D2H probe (environment tunnel rate, informational) ----------------
    t0 = time.perf_counter()
    h = np.asarray(outs[0])
    d2h = h.nbytes / 1e6 / (time.perf_counter() - t0)

    total_wall = parse_wall + pack_wall + device_wall
    end_to_end_x = audio_secs / total_wall
    log(
        f"audio={audio_secs:.1f}s parse={parse_wall:.3f}s "
        f"overlapped pipeline={device_wall:.3f}s ({device_x:.0f}x) "
        f"end-to-end {end_to_end_x:.1f}x; d2h {d2h:.0f} MB/s"
    )

    result = {
        "metric": "aggregate end-to-end decode throughput, 44.1kHz stereo",
        "value": round(end_to_end_x, 2),
        "unit": "x realtime per chip",
        "vs_baseline": round(end_to_end_x / 5000.0, 5),
        "detail": {
            "pipeline_x_realtime": round(device_x, 1),
            "probe_upload_s_per_chunk": round(upload_probe, 3),
            "probe_compute_s_per_chunk": round(compute_probe, 3),
            "chunk_audio_seconds": round(chunk_audio, 1),
            "host_parse_x_realtime": round(audio_secs / parse_wall, 1),
            "n_streams": n_streams,
            "chunk_t": chunk_t,
            "audio_seconds": round(audio_secs, 1),
            "d2h_tunnel_mb_s": round(d2h, 1),
            "host_cores": 1,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
