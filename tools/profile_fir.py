#!/usr/bin/env python3
"""On-chip experiments: FIR formulation + matmul precision.

Variants (scan over C chunks, fetch-fenced, min of 3):
  base            current chain (16 taps, 32-column slices per tap)
  fir-fullwidth   taps stay 64-wide (odd/even halves masked into a 64-wide
                  D vector), halves folded once at the end — no 32-column
                  slices, so no per-tap lane-relayout copies. Reassociates
                  the tap sum (even-k + odd-k) — maxdiff vs base reported.
  prec-oh-high    one-hot matmul sites at Precision.HIGH (bf16x3 — exact
                  for 0/1 weights if operands split exactly) — bitwise
                  compared against base.
  prec-all-high   every matmul at HIGH — maxdiff vs base reported.

Env: GOMP3_S, GOMP3_CHUNK_T, GOMPS_SCAN_CHUNKS as usual.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def fence(x) -> None:
    import jax
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

    scan_spT = jax.device_put(
        np.broadcast_to(sp_b.transpose(0, 2, 1), (C, S, SP8_TAIL_WIDTH, T)).copy()
    )
    scan_es = jax.device_put(np.broadcast_to(esc_b, (C, S, T, HEAD_WIDTH)).copy())
    scan_sd = jax.device_put(np.broadcast_to(sd8_b, (C, S, T, SIDE8_WIDTH)).copy())
    dstates = jax.device_put(init_states(S))
    jax.block_until_ready((scan_spT, scan_es, scan_sd))
    fence(scan_spT)

    # 64-wide D vectors: tap k contributes only to its own half
    d64 = np.zeros((16, 64), np.float32)
    dtbl = np.asarray(G.T.SYNTH_DTBL, np.float32)
    for k in range(16):
        off = 0 if k % 2 == 0 else 32
        d64[k, off : off + 32] = dtbl[32 * k : 32 * (k + 1)]
    D64 = jnp.asarray(d64)

    def polyphase_fullwidth(x18, v_fifo_in):
        t_dim = x18.shape[0]
        v = jnp.einsum("tcjs,ij->tcsi", x18, G._SYNTH_N_WIN, precision=G._HI)
        rows = t_dim * 18
        vf = v.transpose(1, 0, 2, 3).reshape(2, rows, 64)
        vh = jnp.concatenate([v_fifo_in[:, ::-1], vf], axis=1)
        acc64 = jnp.zeros((2, rows, 64), jnp.float32)
        for k in range(16):
            acc64 = acc64 + vh[:, 16 - k : 16 - k + rows, :] * D64[k]
        acc = acc64[..., :32] + acc64[..., 32:]
        return acc, vh

    def chain(sp, es, sd, st, poly):
        b = G.batch_from_packed8(sp, es, sd)
        x = G._requantize(b)
        x = G._stereo(b, x)
        x = G._antialias(b, x)
        raw = G._imdct(b, x)
        out18, uppers = G._overlap_fold(raw, st.store)
        x18 = out18 * G._FREQ_INV
        pcm_f, vh = poly(x18, st.v_fifo)
        t_dim = sp.shape[0]
        samp = jnp.clip(pcm_f * 32767.0, -32767.0, 32767.0).astype(jnp.int32)
        pcm = samp.astype(jnp.int16).reshape(2, t_dim * 576)
        store_out = uppers[-1]
        vfo = vh[:, t_dim * 18 : t_dim * 18 + 16][:, ::-1]
        return pcm, G.DecodeState(store=store_out, v_fifo=vfo)

    def make_run(poly):
        @jax.jit
        def run(sps, ess, sds, st0):
            def step(st, xs):
                sp, es, sd = xs
                sp = jnp.swapaxes(sp, 1, 2)
                pcm, st2 = jax.vmap(
                    lambda a, b_, c, s: chain(a, b_, c, s, poly)
                )(sp, es, sd, st)
                e = jnp.sum(jnp.abs(pcm.astype(jnp.int32)), axis=(1, 2))
                return st2, (e, pcm[:2])  # keep 2 streams' PCM for diffs
            st, (es_, pcms) = jax.lax.scan(step, st0, (sps, ess, sds))
            return es_, pcms
        return run

    results = {}

    def measure(name):
        run = make_run(
            polyphase_fullwidth if "fullwidth" in name else G._polyphase
        )
        t0 = time.perf_counter()
        r = run(scan_spT, scan_es, scan_sd, dstates)
        fence(r)
        print(f"compile {name}: {time.perf_counter()-t0:.1f}s", file=sys.stderr)
        t = timed(lambda: run(scan_spT, scan_es, scan_sd, dstates), n=3)
        print(f"  {name:16s} {t*1e3:7.1f} ms total  {t/C*1e3:6.2f} ms/chunk")
        results[name] = (np.asarray(r[0]), np.asarray(r[1]))

    HIGH, HIGHEST = jax.lax.Precision.HIGH, jax.lax.Precision.HIGHEST

    measure("base")
    measure("fir-fullwidth")
    G._HI_OH = HIGH
    measure("prec-oh-high")
    G._HI = HIGH
    measure("prec-all-high")
    G._HI, G._HI_OH = HIGHEST, HIGHEST

    base_e, base_p = results["base"]
    for name in ("fir-fullwidth", "prec-oh-high", "prec-all-high"):
        e, p_ = results[name]
        md = int(np.abs(p_.astype(np.int32) - base_p.astype(np.int32)).max())
        print(f"  {name:16s} energies equal: {bool((e == base_e).all())}, "
              f"pcm maxdiff vs base: {md} LSB")


if __name__ == "__main__":
    main()
