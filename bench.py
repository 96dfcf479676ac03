#!/usr/bin/env python3
"""Benchmark: aggregate end-to-end MP3 decode throughput per chip.

End-to-end = native host parse (C++, threaded across streams) -> granule
batch packing (vectorized numpy) -> batched device DSP -> int16 PCM on
device. Reports aggregate x-realtime (audio-seconds decoded per
wall-second). Prints ONE JSON line on stdout; diagnostics on stderr.

North star (BASELINE.json): >= 5000x aggregate realtime 44.1 kHz stereo
decode per TPU chip. vs_baseline is value / 5000.
"""

from __future__ import annotations

import concurrent.futures as cf
import json
import sys
import time

import numpy as np


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    import jax

    from go_mp3_tpu.consts import SAMPLES_PER_GR
    from go_mp3_tpu.models.native_pipeline import (
        granule_batch_from_native,
        parse_stream_native,
    )
    from go_mp3_tpu.ops.granule import GranuleBatch, decode_chunk_batch
    from go_mp3_tpu.parallel.mesh import init_states

    fixture = "/root/reference/example/classic_lame.mp3"
    data = open(fixture, "rb").read()

    n_streams = 32
    chunk_t = 256
    threads = 8

    log(f"devices: {jax.devices()}")

    # --- host parse: n_streams copies, C++ parser across a thread pool ----
    t0 = time.perf_counter()
    with cf.ThreadPoolExecutor(max_workers=threads) as ex:
        parsed = list(ex.map(lambda _: parse_stream_native(data), range(n_streams)))
    parse_wall = time.perf_counter() - t0
    (sp0, sl0, ss0, me0), sample_rate = parsed[0]
    granules_per_stream = len(sp0)
    audio_secs = n_streams * granules_per_stream * SAMPLES_PER_GR / sample_rate
    log(
        f"parse: {granules_per_stream} granules/stream x {n_streams} streams "
        f"in {parse_wall:.3f}s ({audio_secs / parse_wall:.0f}x realtime, "
        f"{threads} threads)"
    )

    # --- pack: stack full streams, then slice chunks (all numpy views) ----
    t0 = time.perf_counter()
    full_batches = []
    for (sp, sl, ss, me), _ in parsed:
        b, _v = granule_batch_from_native(sp, sl, ss, me)
        full_batches.append(b)
    stream_arrays = GranuleBatch(
        *[
            np.stack([getattr(b, f) for b in full_batches])
            for f in GranuleBatch._fields
        ]
    )
    chunks = []
    for start in range(0, granules_per_stream, chunk_t):
        end = min(start + chunk_t, granules_per_stream)
        valid = end - start
        fields = []
        for f in GranuleBatch._fields:
            a = getattr(stream_arrays, f)[:, start:end]
            if valid < chunk_t:
                pad_shape = (n_streams, chunk_t - valid, *a.shape[2:])
                a = np.concatenate([a, np.zeros(pad_shape, a.dtype)], axis=1)
            fields.append(np.ascontiguousarray(a))
        chunks.append(
            (GranuleBatch(*fields), np.full(n_streams, valid, np.int32))
        )
    pack_wall = time.perf_counter() - t0
    log(f"pack: {len(chunks)} chunks of [S={n_streams}, T={chunk_t}] in {pack_wall:.3f}s")

    # --- device decode: warmup/compile ------------------------------------
    states = init_states(n_streams)
    t0 = time.perf_counter()
    pcm, _ = decode_chunk_batch(chunks[0][0], states, chunks[0][1])
    pcm.block_until_ready()
    log(f"compile+first chunk: {time.perf_counter() - t0:.2f}s")

    # --- device decode (timed, all chunks) --------------------------------
    states = init_states(n_streams)
    t0 = time.perf_counter()
    outs = []
    for stacked, valids in chunks:
        pcm, states = decode_chunk_batch(stacked, states, valids)
        outs.append(pcm)
    outs[-1].block_until_ready()
    device_wall = time.perf_counter() - t0
    device_x = audio_secs / device_wall

    total_wall = parse_wall + pack_wall + device_wall
    end_to_end_x = audio_secs / total_wall

    log(
        f"audio={audio_secs:.1f}s device_wall={device_wall:.3f}s "
        f"(device-only {device_x:.0f}x), end-to-end {end_to_end_x:.1f}x"
    )

    result = {
        "metric": "aggregate end-to-end decode throughput, 44.1kHz stereo",
        "value": round(end_to_end_x, 2),
        "unit": "x realtime per chip",
        "vs_baseline": round(end_to_end_x / 5000.0, 5),
        "detail": {
            "device_dsp_x_realtime": round(device_x, 1),
            "host_parse_x_realtime": round(audio_secs / parse_wall, 1),
            "pack_x_realtime": round(audio_secs / pack_wall, 1),
            "n_streams": n_streams,
            "chunk_t": chunk_t,
            "audio_seconds": round(audio_secs, 1),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
