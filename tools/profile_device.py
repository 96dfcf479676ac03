#!/usr/bin/env python3
"""Profile the device compute path on the real chip.

Measures, fetch-fenced (block_until_ready can signal at enqueue on this
platform — every timing ends at an np.asarray of a small result):
  - per-stage cost of the chunk function (unpack / requantize+stereo /
    antialias+imdct+overlap / polyphase) at bench shapes [S, T, ...]
  - the full chunk function, single execute (includes dispatch)
  - the full corpus scan, amortized per chunk (the production shape)

Run without JAX_PLATFORMS override to hit the TPU; compiles are untimed.
Env: GOMP3_S (streams, default 64), GOMP3_CHUNK_T (default 256),
GOMP3_SCAN_CHUNKS (default 13).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def fence(x) -> None:
    np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:4]


def timed(fn, n=3):
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        r = fn()
        fence(r)
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    global jax
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from go_mp3_tpu.native.lib import (
        HEAD_WIDTH,
        SIDE8_WIDTH,
        SP8_TAIL_WIDTH,
        NativeParser,
    )
    from go_mp3_tpu.ops import granule as G
    from go_mp3_tpu.parallel.mesh import init_states

    S = int(os.environ.get("GOMP3_S", "64"))
    T = int(os.environ.get("GOMP3_CHUNK_T", "256"))
    C = int(os.environ.get("GOMP3_SCAN_CHUNKS", "13"))
    print(f"devices: {jax.devices()}  S={S} T={T} C={C}", file=sys.stderr)

    # real parsed data (one chunk of classic), replicated across streams
    data = open("/root/reference/example/classic_lame.mp3", "rb").read() * 4
    sp8 = np.zeros((T, SP8_TAIL_WIDTH), np.int8)
    esc = np.zeros((T, HEAD_WIDTH), np.int16)
    sd8 = np.zeros((T, SIDE8_WIDTH), np.uint8)
    p = NativeParser(data)
    n = p.parse_packed8_into(sp8, esc, sd8)
    p.close()
    assert n == T, n

    sp_b = np.broadcast_to(sp8, (S, T, SP8_TAIL_WIDTH)).copy()
    esc_b = np.broadcast_to(esc, (S, T, HEAD_WIDTH)).copy()
    sd8_b = np.broadcast_to(sd8, (S, T, SIDE8_WIDTH)).copy()
    states = init_states(S)
    valid = np.full(S, T, np.int32)

    # ---- upload everything FIRST (program loads degrade later H2D) -------
    dsp = jax.device_put(sp_b)
    des = jax.device_put(esc_b)
    dsd = jax.device_put(sd8_b)
    dstates = jax.device_put(states)
    dvalid = jax.device_put(valid)
    scan_sp = jax.device_put(
        np.broadcast_to(sp_b.transpose(0, 2, 1), (C, S, SP8_TAIL_WIDTH, T)).copy()
    )
    scan_es = jax.device_put(np.broadcast_to(esc_b, (C, S, T, HEAD_WIDTH)).copy())
    scan_sd = jax.device_put(np.broadcast_to(sd8_b, (C, S, T, SIDE8_WIDTH)).copy())
    scan_valid = np.full((C, S), T, np.int32)
    jax.block_until_ready((dsp, des, dsd, scan_sp, scan_es, scan_sd))
    fence(dsp)

    # ---- stage variants ----------------------------------------------------
    def v_unpack(sp, es, sd, st, v):
        b = G.batch_from_packed8(sp, es, sd)
        return jnp.sum(b.spectra.astype(jnp.int32))

    def v_requant(sp, es, sd, st, v):
        b = G.batch_from_packed8(sp, es, sd)
        x = G._requantize(b)
        x = G._stereo(b, x)
        return jnp.sum(x)

    def v_imdct(sp, es, sd, st, v):
        b = G.batch_from_packed8(sp, es, sd)
        x = G._requantize(b)
        x = G._stereo(b, x)
        x = G._antialias(b, x)
        raw = G._imdct(b, x)
        out18, uppers = G._overlap_fold(raw, st.store)
        return jnp.sum(out18)

    def v_full(sp, es, sd, st, v):
        pcm, st2 = G.decode_chunk_packed8_impl(sp, es, sd, st, v)
        return jnp.sum(jnp.abs(pcm.astype(jnp.int32)))

    variants = {}
    for name, fn in (
        ("unpack", v_unpack),
        ("+requant+stereo", v_requant),
        ("+aa+imdct+overlap", v_imdct),
        ("full chunk", v_full),
    ):
        t0 = time.perf_counter()
        jf = jax.jit(jax.vmap(fn))
        r = jf(dsp, des, dsd, dstates, dvalid)
        fence(r)
        print(f"compile {name}: {time.perf_counter()-t0:.1f}s", file=sys.stderr)
        variants[name] = jf

    print(f"single-execute chunk costs (fetch-fenced, min of 5), S={S} T={T}:")
    for name, jf in variants.items():
        t = timed(lambda jf=jf: jf(dsp, des, dsd, dstates, dvalid), n=5)
        print(f"  {name:20s} {t*1e3:8.1f} ms")

    # ---- scan-amortized (the production shape: dispatch paid once) --------
    # Per-stage scans isolate true on-chip stage costs; the single-execute
    # numbers above are dispatch-dominated (~30+ ms round-trip).
    def make_scan(stage_fn, with_state):
        batched = jax.vmap(stage_fn)

        @jax.jit
        def scan_corpus(sp_all, es_all, sd_all, st, valids):
            def step(s, xs):
                sp, es, sd, v = xs
                spT = jnp.swapaxes(sp, 1, 2)
                if with_state:
                    pcm, s = batched(spT, es, sd, s, v)
                    out = jnp.sum(jnp.abs(pcm.astype(jnp.int32)), axis=(1, 2))
                else:
                    out = batched(spT, es, sd, s, v)
                return s, out
            st, en = jax.lax.scan(step, st, (sp_all, es_all, sd_all, valids))
            return en

        return scan_corpus

    stage_scans = {}
    for name, fn in (
        ("unpack", v_unpack),
        ("+requant+stereo", v_requant),
        ("+aa+imdct+overlap", v_imdct),
        ("full chunk", None),
    ):
        t0 = time.perf_counter()
        sc = make_scan(
            G.decode_chunk_packed8_impl if fn is None else fn, fn is None
        )
        en = sc(scan_sp, scan_es, scan_sd, dstates, scan_valid)
        fence(en)
        print(f"compile scan {name}: {time.perf_counter()-t0:.1f}s",
              file=sys.stderr)
        stage_scans[name] = sc

    print(f"scan-amortized per-chunk costs ({C} chunks per execute):")
    for name, sc in stage_scans.items():
        t = timed(
            lambda sc=sc: sc(scan_sp, scan_es, scan_sd, dstates, scan_valid),
            n=3,
        )
        print(
            f"  {name:20s} {t*1e3:8.1f} ms total  {t/C*1e3:7.2f} ms/chunk"
        )


if __name__ == "__main__":
    main()
