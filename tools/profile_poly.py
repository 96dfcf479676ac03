#!/usr/bin/env python3
"""Fine-grained on-chip profile of the polyphase stage + unpack transpose.

Splits the `full - imdct` 6.8 ms/chunk (profile_device.py) into:
  v einsum / vf+vh assembly / FIR taps / clip+pcm+state tail
and times unpack-layout variants. All scans over C chunks, fetch-fenced.
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
    states = init_states(S)

    scan_spT = jax.device_put(
        np.broadcast_to(sp_b.transpose(0, 2, 1), (C, S, SP8_TAIL_WIDTH, T)).copy()
    )
    scan_sp = jax.device_put(np.broadcast_to(sp_b, (C, S, T, SP8_TAIL_WIDTH)).copy())
    scan_es = jax.device_put(np.broadcast_to(esc_b, (C, S, T, HEAD_WIDTH)).copy())
    scan_sd = jax.device_put(np.broadcast_to(sd8_b, (C, S, T, SIDE8_WIDTH)).copy())
    dstates = jax.device_put(states)
    jax.block_until_ready((scan_spT, scan_sp, scan_es, scan_sd))
    fence(scan_spT)

    valid = np.full(S, T, np.int32)

    # ---------- polyphase sub-stages (each includes everything before it) --
    def upto_x18(sp, es, sd, st):
        b = G.batch_from_packed8(sp, es, sd)
        x = G._requantize(b)
        x = G._stereo(b, x)
        x = G._antialias(b, x)
        raw = G._imdct(b, x)
        out18, uppers = G._overlap_fold(raw, st.store)
        return out18 * G._FREQ_INV, uppers

    def v_x18(sp, es, sd, st, v):
        x18, _ = upto_x18(sp, es, sd, st)
        return jnp.sum(x18), st

    def v_veinsum(sp, es, sd, st, v):
        x18, _ = upto_x18(sp, es, sd, st)
        vv = jnp.einsum("tcjs,ij->tcsi", x18, G._SYNTH_N_WIN,
                        precision=G._HI)
        return jnp.sum(vv), st

    def v_vh(sp, es, sd, st, v):
        x18, _ = upto_x18(sp, es, sd, st)
        vv = jnp.einsum("tcjs,ij->tcsi", x18, G._SYNTH_N_WIN,
                        precision=G._HI)
        t_dim = x18.shape[0]
        vf = vv.transpose(1, 0, 2, 3).reshape(2, t_dim * 18, 64)
        vh = jnp.concatenate([st.v_fifo[:, ::-1], vf], axis=1)
        return jnp.sum(vh), st

    def v_fir(sp, es, sd, st, v):
        x18, _ = upto_x18(sp, es, sd, st)
        pcm_f, vh = G._polyphase(x18, st.v_fifo)
        return jnp.sum(pcm_f), st

    def v_full(sp, es, sd, st, v):
        pcm, st2 = G.decode_chunk_packed8_impl(
            sp, es, sd, st, jnp.int32(T)
        )
        return jnp.sum(jnp.abs(pcm.astype(jnp.int32))), st2

    def make_scan(stage):
        @jax.jit
        def run(sps, ess, sds, st0):
            def step(st, xs):
                sp, es, sd = xs
                sp = jnp.swapaxes(sp, 1, 2)
                out, st2 = jax.vmap(
                    lambda a, b, c, s: stage(a, b, c, s, None)
                )(sp, es, sd, st)
                # carry state only if stage returns a new one
                return (st2 if not isinstance(st2, type(None)) else st), out
            st, outs = jax.lax.scan(step, st0, (sps, ess, sds))
            return outs
        return run

    for name, fn in (
        ("x18 (pre-poly)", v_x18),
        ("+v einsum", v_veinsum),
        ("+vf/vh assembly", v_vh),
        ("+FIR", v_fir),
        ("full", v_full),
    ):
        run = make_scan(fn)
        t0 = time.perf_counter()
        r = run(scan_spT, scan_es, scan_sd, dstates)
        fence(r)
        print(f"compile {name}: {time.perf_counter()-t0:.1f}s", file=sys.stderr)
        t = timed(lambda: run(scan_spT, scan_es, scan_sd, dstates), n=3)
        print(f"  {name:18s} {t*1e3:7.1f} ms total  {t/C*1e3:6.2f} ms/chunk")

    # ---------- unpack transpose variants ---------------------------------
    def u_current(sp_lm, es, sd):
        sp = jnp.swapaxes(sp_lm, 1, 2)  # [S,T,1024] from line-major
        b = jax.vmap(G.batch_from_packed8)(sp, es, sd)
        return jnp.sum(b.spectra.astype(jnp.int32))

    def u_granmajor(sp_gm, es, sd):
        b = jax.vmap(G.batch_from_packed8)(sp_gm, es, sd)
        return jnp.sum(b.spectra.astype(jnp.int32))

    def u_widen_first(sp_lm, es, sd):
        wide = sp_lm.astype(jnp.int16)  # widen in line-major, then transpose
        sp = jnp.swapaxes(wide, 1, 2)
        t_dim = sp.shape[1]
        head = es.reshape(*es.shape[:2], 2, G.HEAD_LINES)
        tail = sp.reshape(sp.shape[0], t_dim, 2, 576 - G.HEAD_LINES)
        spec = jnp.concatenate([head, tail], axis=-1)
        return jnp.sum(spec.astype(jnp.int32))

    for name, fn, arr in (
        ("unpack line-major->T (current)", u_current, scan_spT),
        ("unpack granule-major (no transpose)", u_granmajor, scan_sp),
        ("unpack widen-then-transpose", u_widen_first, scan_spT),
    ):
        @jax.jit
        def run(arrs, ess, sds, fn=fn):
            def step(c, xs):
                a, es, sd = xs
                return c, fn(a, es, sd)
            _, outs = jax.lax.scan(step, 0, (arrs, ess, sds))
            return outs
        t0 = time.perf_counter()
        r = run(arr, scan_es, scan_sd)
        fence(r)
        print(f"compile {name}: {time.perf_counter()-t0:.1f}s", file=sys.stderr)
        t = timed(lambda: run(arr, scan_es, scan_sd), n=3)
        print(f"  {name:38s} {t*1e3:7.1f} ms total  {t/C*1e3:6.2f} ms/chunk")


if __name__ == "__main__":
    main()
