#!/usr/bin/env python3
"""On-chip: chunk_t=512 vs 256 (per-granule compute), + IMDCT substage split.

The scan carries per-chunk overheads (state extract, output slicing,
loop bookkeeping) and bigger batches may utilize the MXU better; T=512
halves the chunk count at 2x the chunk size. Reports ms per GRANULE-ROW
so the two are comparable. Also splits the aa+imdct+overlap stage.
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
    print(f"devices: {jax.devices()}  S={S}", file=sys.stderr)

    data = open("/root/reference/example/classic_lame.mp3", "rb").read() * 4
    sp8 = np.zeros((512, SP8_TAIL_WIDTH), np.int8)
    esc = np.zeros((512, HEAD_WIDTH), np.int16)
    sd8 = np.zeros((512, SIDE8_WIDTH), np.uint8)
    p = NativeParser(data)
    n = p.parse_packed8_into(sp8, esc, sd8)
    p.close()
    assert n == 512, n

    def scan_arrays(T, C):
        spc = np.broadcast_to(sp8[:T], (S, T, SP8_TAIL_WIDTH))
        esct = np.broadcast_to(esc[:T], (S, T, HEAD_WIDTH))
        sdt = np.broadcast_to(sd8[:T], (S, T, SIDE8_WIDTH))
        a = jax.device_put(
            np.broadcast_to(
                spc.transpose(0, 2, 1), (C, S, SP8_TAIL_WIDTH, T)
            ).copy()
        )
        b = jax.device_put(np.broadcast_to(esct, (C, S, T, HEAD_WIDTH)).copy())
        c = jax.device_put(np.broadcast_to(sdt, (C, S, T, SIDE8_WIDTH)).copy())
        jax.block_until_ready((a, b, c))
        return a, b, c

    def v_full(sp, es, sd, st, T):
        pcm, st2 = G.decode_chunk_packed8_impl(sp, es, sd, st, jnp.int32(T))
        return jnp.sum(jnp.abs(pcm.astype(jnp.int32))), st2

    def make_run(T, stage):
        @jax.jit
        def run(sps, ess, sds, st0):
            def step(st, xs):
                sp, es, sd = xs
                sp = jnp.swapaxes(sp, 1, 2)
                out, st2 = jax.vmap(
                    lambda a, b, c, s: stage(a, b, c, s, T)
                )(sp, es, sd, st)
                return st2, out
            st, outs = jax.lax.scan(step, st0, (sps, ess, sds))
            return outs
        return run

    dstates = jax.device_put(init_states(S))

    for T, C in ((256, 13), (512, 7)):
        arrs = scan_arrays(T, C)
        run = make_run(T, v_full)
        t0 = time.perf_counter()
        r = run(*arrs, dstates)
        fence(r)
        print(f"compile full T={T}: {time.perf_counter()-t0:.1f}s",
              file=sys.stderr)
        t = timed(lambda: run(*arrs, dstates), n=3)
        per_gr_row = t / (C * T) * 1e6
        print(f"  full chain T={T:3d} C={C:2d}  {t*1e3:7.1f} ms total  "
              f"{t/C*1e3:6.2f} ms/chunk  {per_gr_row:.2f} us/granule-row")
        del arrs

    # ---- IMDCT substage split at T=256 ------------------------------------
    arrs = scan_arrays(256, 13)

    def upto_stereo(sp, es, sd, st):
        b = G.batch_from_packed8(sp, es, sd)
        x = G._requantize(b)
        return b, G._stereo(b, x)

    def v_stereo(sp, es, sd, st, T):
        _, x = upto_stereo(sp, es, sd, st)
        return jnp.sum(x), st

    def v_aa(sp, es, sd, st, T):
        b, x = upto_stereo(sp, es, sd, st)
        return jnp.sum(G._antialias(b, x)), st

    def v_imdct(sp, es, sd, st, T):
        b, x = upto_stereo(sp, es, sd, st)
        x = G._antialias(b, x)
        return jnp.sum(G._imdct(b, x)), st

    def v_overlap(sp, es, sd, st, T):
        b, x = upto_stereo(sp, es, sd, st)
        x = G._antialias(b, x)
        raw = G._imdct(b, x)
        out18, uppers = G._overlap_fold(raw, st.store)
        return jnp.sum(out18 * G._FREQ_INV), st

    for name, fn in (
        ("requant+stereo", v_stereo),
        ("+antialias", v_aa),
        ("+imdct", v_imdct),
        ("+overlap+freqinv", v_overlap),
    ):
        run = make_run(256, fn)
        t0 = time.perf_counter()
        r = run(*arrs, dstates)
        fence(r)
        print(f"compile {name}: {time.perf_counter()-t0:.1f}s", file=sys.stderr)
        t = timed(lambda: run(*arrs, dstates), n=3)
        print(f"  {name:18s} {t*1e3:7.1f} ms total  {t/13*1e3:6.2f} ms/chunk")


if __name__ == "__main__":
    main()
