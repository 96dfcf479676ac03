#!/usr/bin/env python3
"""Benchmark: aggregate MP3 decode throughput per chip.

Pipeline: the native C++ parser fills three flat arrays per chunk
(int8 tail spectra [S,T,1024] + exact int16 head plane [S,T,128] + byte
sidecar [S,T,168] — gmp_parse_packed8, unpacked on device with zero
gather/scatter). The whole corpus then decodes in ONE jitted lax.scan
over chunks (state carried on-device), amortizing per-execute dispatch
latency. The program is AOT-compiled from shapes before timing
(one-time, amortized across a fleet).

Two pipeline schedules are both measured and the better one carries the
headline (per-run numbers for each land in detail):
  strict   parse ALL chunks, then device_put burst, then execute
  overlap  device_put each chunk as soon as it is parsed (async), so
           transfers ride under the remaining parse — on this 1-core
           host the transfer client's busy-polling steals parse cycles,
           so which schedule wins is weather-dependent.

Corpus: 48 MPEG-1 44.1 kHz stereo VBR streams + 16 MPEG-2 22.05 kHz
mono speech streams with PER-LANE DISTINCT CONTENT: each lane is the
base file (classic_lame.mp3 x4 / mpeg2.mp3) rotated at a different
frame boundary, so a compressing link cannot dedupe lanes against each
other and the wire numbers hold for diverse fleets. Ragged lengths are
validity-masked per chunk.

Measurement rules for this environment (hard-won; see CLAUDE.md):
block_until_ready can signal at ENQUEUE rather than completion, so the
timed region ends at an actual FETCH of the (tiny) energies output — the
only proof the transfers and the computation really finished. The wire
behind the relay runs ~50-110 MB/s true H2D (content-dependent — it
compresses) and both it and the shared single-core host swing
minute-to-minute, so runs repeat (stopping early when a run is clearly
unthrottled or the link is visibly draining) and the minimum is
reported.

decoder_ceiling_x_realtime is what the decoder itself sustains with the
data local (no tunnel): single-core parse + SCAN-AMORTIZED device
compute, run serially. The compute term times the real corpus-scan
executable over resident device data (production pays dispatch once per
corpus, not per chunk) divided by the chunk count.

PCM results stay on-device; a slice is fetched and checked for
non-silence as a validation probe. (The dev tunnel's D2H is ~4-30 MB/s,
so wholesale PCM readback measures the tunnel, not the decoder — detail
reports the observed D2H rate separately.)

Prints ONE JSON line on stdout; diagnostics on stderr.

North star (BASELINE.json): >= 5000x aggregate realtime 44.1 kHz stereo
decode per TPU chip. vs_baseline is value / 5000.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def rotate_at_frame(data: bytes, frame_starts, k: int) -> bytes:
    """Rotate a stream at frame k's byte boundary: distinct content per
    lane, still a valid MP3 stream (the wrap point is one resync)."""
    off = int(frame_starts[k % len(frame_starts)])
    return data[off:] + data[:off]


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from go_mp3_tpu.consts import SAMPLES_PER_GR
    from go_mp3_tpu.native.lib import (
        HEAD_WIDTH,
        SIDE8_WIDTH,
        SP8_TAIL_WIDTH,
        NativeParser,
        index_stream,
    )
    from go_mp3_tpu.ops.granule import decode_chunk_packed8_impl
    from go_mp3_tpu.parallel.mesh import init_states

    chunk_fn = decode_chunk_packed8_impl

    classic = open("/root/reference/example/classic_lame.mp3", "rb").read() * 4
    mpeg2 = open("/root/reference/example/mpeg2.mp3", "rb").read()

    n_classic, n_mpeg2 = 48, 16
    n_streams = n_classic + n_mpeg2
    chunk_t = int(os.environ.get("GOMP3_CHUNK_T", "256"))

    # per-lane distinct content: rotate each lane at a different frame
    starts_c, _, _ = index_stream(classic)
    starts_m, _, _ = index_stream(mpeg2)
    stream_data = [
        rotate_at_frame(classic, starts_c, 1 + 29 * s) for s in range(n_classic)
    ] + [
        rotate_at_frame(mpeg2, starts_m, 1 + 43 * s) for s in range(n_mpeg2)
    ]

    log(f"devices: {jax.devices()}")

    # probe per-lane lengths/rates once (untimed; rotations differ slightly)
    spp = np.zeros((8192, SP8_TAIL_WIDTH), np.int8)
    escp = np.zeros((8192, HEAD_WIDTH), np.int16)
    sdp = np.zeros((8192, SIDE8_WIDTH), np.uint8)
    gr_by_stream, sr_by_stream = [], []
    for data in stream_data:
        p = NativeParser(data)
        total = 0
        while True:
            n = p.parse_packed8_into(spp, escp, sdp)
            if n == 0:
                break
            total += n
        gr_by_stream.append(total)
        sr_by_stream.append(p.sample_rate)
        p.close()
    audio_secs = sum(
        g * SAMPLES_PER_GR / sr for g, sr in zip(gr_by_stream, sr_by_stream)
    )
    n_chunks = max(-(-g // chunk_t) for g in gr_by_stream)
    wire_bpg = SP8_TAIL_WIDTH + 2 * HEAD_WIDTH + SIDE8_WIDTH

    # single-execute corpus decode: scan the chunk sequence on-device.
    # Spectra arrive LINE-MAJOR ([S,1024,T] — measured 32% cheaper through
    # the relay's compressing link than granule-major; lines cluster zeros
    # and magnitudes across time) and are re-transposed on device. The tiny
    # head/sidecar arrays ship as two corpus-wide batched transfers
    # (per-chunk small puts pay disproportionate per-transfer overhead).
    batched_chunk = jax.vmap(chunk_fn)

    @jax.jit
    def decode_corpus(sp_chunks, es_chunks, sd_chunks, states, valids):
        # sp_chunks: C x [S,1024,T] i8 tails; es_chunks: C x [S,T,128] i16
        # head planes; sd_chunks: C x [S,T,168] u8 — all per-chunk arrays so
        # every byte can be device_put the moment its chunk is parsed.
        # Returns per-stream energies (the full PCM cannot be skipped by
        # XLA — the energies and the carried DSP state depend on it — but
        # only [C,S] scalars come back out, the shape an on-device consumer
        # would see; PCM correctness is pinned by the validation probe and
        # the test suite's parity gates).
        sp_all = jnp.stack([jnp.swapaxes(c, 1, 2) for c in sp_chunks])
        es_all = jnp.stack(es_chunks)
        sd_all = jnp.stack(sd_chunks)

        def step(st, xs):
            sp, es, sd, v = xs
            pcm, st = batched_chunk(sp, es, sd, st, v)
            energy = jnp.sum(jnp.abs(pcm.astype(jnp.int32)), axis=(1, 2))
            return st, energy

        states, energies = jax.lax.scan(
            step, states, (sp_all, es_all, sd_all, valids)
        )
        return energies, states  # energies: [C, S] int32

    # chunk buffer pool, allocated once and reused across parse attempts
    # (page-faulting ~300 MB of fresh np.empty pages per attempt would be
    # measured as parse time; a production pipeline reuses ring buffers)
    pool = [
        (
            np.empty((n_streams, chunk_t, SP8_TAIL_WIDTH), np.int8),
            np.empty((n_streams, chunk_t, HEAD_WIDTH), np.int16),
            np.empty((n_streams, chunk_t, SIDE8_WIDTH), np.uint8),
        )
        for _ in range(n_chunks)
    ]

    # Parse probe: the host term of decoder_ceiling_x_realtime. Sampled at
    # TWO separated points of the run (here, on the cleanest host state
    # before any transfer threads exist, and again after the timed runs),
    # min over all samples: the shared host's weather varies minute to
    # minute and a single burst of samples can land entirely inside a bad
    # one. Process-CPU time additionally excludes hypervisor steal — the
    # cost a dedicated core would pay.
    sp0 = np.zeros((n_streams, chunk_t, SP8_TAIL_WIDTH), np.int8)
    es0 = np.zeros((n_streams, chunk_t, HEAD_WIDTH), np.int16)
    sd0 = np.zeros((n_streams, chunk_t, SIDE8_WIDTH), np.uint8)
    probe_parse_min = [float("inf"), float("inf")]

    def parse_probe(reps: int):
        for _ in range(reps):
            parsers = [NativeParser(d) for d in stream_data]
            t0 = time.perf_counter()
            c0 = time.process_time()
            for s, p in enumerate(parsers):
                p.parse_packed8_into(sp0[s], es0[s], sd0[s])
            probe_parse_min[0] = min(
                probe_parse_min[0], time.perf_counter() - t0
            )
            probe_parse_min[1] = min(
                probe_parse_min[1], time.process_time() - c0
            )
            for p in parsers:
                p.close()
        return tuple(probe_parse_min)

    parse_probe(3)

    # --- untimed: AOT-compile + load the corpus program ---------------------
    # (legitimately one-time: a fleet reuses the loaded program per corpus;
    # compilation needs only shapes, no transfers)
    states = init_states(n_streams)
    valids0 = np.zeros((n_chunks, n_streams), np.int32)
    t0 = time.perf_counter()
    sds = lambda shape, dt: jax.ShapeDtypeStruct(shape, dt)
    shapes = (
        [sds((n_streams, SP8_TAIL_WIDTH, chunk_t), np.int8)
         for _ in range(n_chunks)],
        [sds((n_streams, chunk_t, HEAD_WIDTH), np.int16)
         for _ in range(n_chunks)],
        [sds((n_streams, chunk_t, SIDE8_WIDTH), np.uint8)
         for _ in range(n_chunks)],
        jax.tree_util.tree_map(
            lambda x: sds(x.shape, x.dtype), states
        ),
        sds(valids0.shape, np.int32),
    )
    compiled = decode_corpus.lower(*shapes).compile()
    log(f"compile+load: {time.perf_counter() - t0:.2f}s (one-time, untimed)")

    # --- timed: the full pipeline, end to end --------------------------------
    # parse -> device_put -> one scan execute -> FETCH of the [C,S] energies
    # (the fetch round-trip is the only proof the whole pipeline, transfers
    # included, actually completed — block_until_ready can signal at
    # enqueue). Both schedules measured; min is the honest steady-state
    # capability of the decoder through this link.
    def one_run(overlap: bool):
        states = init_states(n_streams)
        t_start = time.perf_counter()
        parsers = [NativeParser(d) for d in stream_data]
        valids = np.zeros((n_chunks, n_streams), np.int32)
        sp_chunks, es_chunks, sd_chunks, host_arrs = [], [], [], []
        t0 = time.perf_counter()
        for c, (spectra, head, side) in enumerate(pool):
            for s, p in enumerate(parsers):
                n = p.parse_packed8_into(spectra[s], head[s], side[s])
                valids[c, s] = n
                if n < chunk_t:
                    spectra[s, n:] = 0
                    head[s, n:] = 0
                    side[s, n:] = 0
            spT = np.ascontiguousarray(spectra.transpose(0, 2, 1))
            if overlap:
                # async enqueue: all three planes ride under the remaining
                # chunks' parse (the transfer client busy-polls on this
                # 1-core host, so this can also SLOW the parse — measured,
                # not assumed; see detail runs_wall_s per schedule)
                sp_chunks.append(jax.device_put(spT))
                es_chunks.append(jax.device_put(head.copy()))
                sd_chunks.append(jax.device_put(side.copy()))
            else:
                host_arrs.append((spT, head.copy(), side.copy()))
        parse_wall = time.perf_counter() - t0
        for p in parsers:
            p.close()
        if not overlap:
            sp_chunks = [jax.device_put(a) for a, _, _ in host_arrs]
            es_chunks = [jax.device_put(b) for _, b, _ in host_arrs]
            sd_chunks = [jax.device_put(c) for _, _, c in host_arrs]
        energies, _ = compiled(sp_chunks, es_chunks, sd_chunks, states, valids)
        en = np.asarray(energies)  # the fence: pipeline provably done
        total_wall = time.perf_counter() - t_start
        del sp_chunks, es_chunks, sd_chunks, host_arrs, energies
        return total_wall, parse_wall, en

    runs = {"strict": [], "overlap": []}
    en = None
    order = ["overlap", "strict", "overlap", "strict"]
    for rep, mode in enumerate(order):
        if rep:
            parse_probe(1)  # widen the probe's weather sampling window
        total_wall, parse_wall, en = one_run(overlap=(mode == "overlap"))
        runs[mode].append((total_wall, parse_wall))
        log(
            f"run {rep} [{mode}]: wall {total_wall:.3f}s "
            f"(parse {parse_wall:.3f}s inside)"
        )
        flat = [w for rs in runs.values() for w, _ in rs]
        if rep >= 1 and min(flat) < 4.0:
            break  # clearly unthrottled; repeats only sample worse weather
        if rep >= 2 and flat[-1] > flat[-2] > min(flat) * 1.5:
            break  # link is draining: further repeats cannot beat the min
    best = {m: min(rs) for m, rs in runs.items() if rs}
    best_mode = min(best, key=lambda m: best[m][0])
    total_wall, parse_wall = best[best_mode]

    # [C, S] — decoded audio must be non-silent
    assert (en[:2] > 0).all(), "every stream's first chunks should be non-silent"

    end_to_end_x = audio_secs / total_wall

    # --- untimed probes: per-phase steady-state costs (min over repeats:
    # the shared host makes single samples unreliable) --------------------
    probe_parse, probe_parse_cpu = parse_probe(4)
    t0 = time.perf_counter()
    dsp = jax.device_put(sp0)
    des = jax.device_put(es0)
    dsd = jax.device_put(sd0)
    jax.block_until_ready((dsp, des, dsd))
    for a in (dsp, des, dsd):
        np.asarray(a[0, 0, :4])
    probe_upload = time.perf_counter() - t0

    # scan-amortized device compute: re-run the (already loaded) corpus
    # program on resident data and fetch the energies — the per-chunk cost
    # production actually pays (dispatch amortized over the whole corpus)
    sp_res = [jax.device_put(np.ascontiguousarray(p0.transpose(0, 2, 1)))
              for p0, _, _ in pool]
    es_res = [jax.device_put(h) for _, h, _ in pool]
    sd_res = [jax.device_put(s_) for _, _, s_ in pool]
    jax.block_until_ready((sp_res, es_res, sd_res))
    valids_full = np.full((n_chunks, n_streams), chunk_t, np.int32)
    probe_scan = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        e2, _ = compiled(sp_res, es_res, sd_res, init_states(n_streams),
                         valids_full)
        np.asarray(e2)
        probe_scan = min(probe_scan, time.perf_counter() - t0)
    probe_compute = probe_scan / n_chunks
    probe_parse, probe_parse_cpu = parse_probe(2)  # fourth sampling point

    chunk_audio = sum(chunk_t * SAMPLES_PER_GR / sr for sr in sr_by_stream)
    log(
        f"probe per chunk ({chunk_audio:.0f}s audio): parse {probe_parse:.3f}s, "
        f"upload {probe_upload:.3f}s (fetch-fenced), "
        f"compute {probe_compute:.3f}s (scan-amortized, "
        f"{probe_scan:.3f}s / {n_chunks} chunks)"
    )

    # validation probe: decode one chunk and check PCM past the (silent)
    # Xing header frame
    chunk_decode = jax.jit(batched_chunk)
    z_valid = np.full(n_streams, chunk_t, np.int32)
    pcm, _ = chunk_decode(dsp, des, dsd, init_states(n_streams), z_valid)
    probe = np.asarray(pcm[0, 20 * SAMPLES_PER_GR : 60 * SAMPLES_PER_GR])
    assert np.abs(probe).max() > 100, "decoded PCM should not be silence"

    # --- D2H probe (environment tunnel rate, informational) ----------------
    t0 = time.perf_counter()
    h = np.asarray(pcm[0])
    d2h = h.nbytes / 1e6 / (time.perf_counter() - t0)
    del pcm

    log(
        f"audio={audio_secs:.1f}s wall={total_wall:.3f}s [{best_mode}] "
        f"(host parse {parse_wall:.3f}s + transfer + exec) "
        f"end-to-end {end_to_end_x:.1f}x; d2h {d2h:.0f} MB/s"
    )

    result = {
        "metric": "aggregate end-to-end decode throughput, 44.1kHz stereo",
        "value": round(end_to_end_x, 2),
        "unit": "x realtime per chip",
        "vs_baseline": round(end_to_end_x / 5000.0, 5),
        "detail": {
            "probe_parse_s_per_chunk": round(probe_parse, 3),
            "probe_parse_cpu_s_per_chunk": round(probe_parse_cpu, 3),
            "probe_upload_s_per_chunk": round(probe_upload, 3),
            "probe_compute_s_per_chunk_scan_amortized": round(
                probe_compute, 4
            ),
            "probe_scan_total_s": round(probe_scan, 3),
            "chunk_audio_seconds": round(chunk_audio, 1),
            "host_parse_x_realtime": round(audio_secs / parse_wall, 1)
            if parse_wall
            else None,
            # what the decoder itself sustains when the data is local
            # (single-core parse at process-CPU cost — a dedicated core
            # pays no hypervisor steal — plus scan-amortized on-chip
            # compute, run serially; no tunnel):
            "decoder_ceiling_x_realtime": round(
                audio_secs / ((probe_parse_cpu + probe_compute) * n_chunks),
                1,
            ),
            "wire_bytes_per_granule": wire_bpg,
            "schedule": best_mode,
            "runs_wall_s": {
                m: [round(w, 3) for w, _ in rs] for m, rs in runs.items()
            },
            "n_streams": n_streams,
            "corpus": (
                f"{n_classic}x classic_lame(x4) + {n_mpeg2}x mpeg2, "
                "per-lane frame-boundary rotations (distinct content)"
            ),
            "chunk_t": chunk_t,
            "n_chunks": n_chunks,
            "audio_seconds": round(audio_secs, 1),
            "d2h_tunnel_mb_s": round(d2h, 1),
            "parse_wall_s": round(parse_wall, 3),
            "host_cores": 1,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
