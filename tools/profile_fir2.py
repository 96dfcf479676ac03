#!/usr/bin/env python3
"""On-chip: FIR with pre-split vh columns (row-only tap slices).

The per-tap [off:off+32] column slices of the 64-wide vh are the
relayout-copy suspects; splitting vh into vA/vB once moves all tap
slicing to the row axis. Same k order and products — bit-exactness
checked. Scan over C chunks, dynamic valids, fetch-fenced.
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def fence(x) -> None:
    import jax
    np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:4]


def timed(fn, n=4):
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

    S, T, C = 64, 256, 13
    print(f"devices: {jax.devices()}", file=sys.stderr)

    data = open("/root/reference/example/classic_lame.mp3", "rb").read() * 4
    sp8 = np.zeros((T, SP8_TAIL_WIDTH), np.int8)
    esc = np.zeros((T, HEAD_WIDTH), np.int16)
    sd8 = np.zeros((T, SIDE8_WIDTH), np.uint8)
    p = NativeParser(data)
    n = p.parse_packed8_into(sp8, esc, sd8)
    p.close()
    assert n == T, n

    a = jax.device_put(
        np.broadcast_to(
            np.broadcast_to(sp8, (S, T, SP8_TAIL_WIDTH)).transpose(0, 2, 1),
            (C, S, SP8_TAIL_WIDTH, T),
        ).copy()
    )
    b_ = jax.device_put(np.broadcast_to(esc, (C, S, T, HEAD_WIDTH)).copy())
    c_ = jax.device_put(np.broadcast_to(sd8, (C, S, T, SIDE8_WIDTH)).copy())
    st0 = jax.device_put(init_states(S))
    jax.block_until_ready((a, b_, c_))
    fence(a)
    valids_np = np.full((C, S), T, np.int32)
    valids_np[-1] = np.linspace(40, T, S, dtype=np.int32)
    valids = jax.device_put(valids_np)

    D = jnp.asarray(np.asarray(G.T.SYNTH_DTBL, np.float32).reshape(16, 32))

    def polyphase_split(x18, v_fifo_in):
        t_dim = x18.shape[0]
        v = jnp.einsum("tcjs,ij->tcsi", x18, G._SYNTH_N_WIN, precision=G._HI)
        rows = t_dim * 18
        vf = v.transpose(1, 0, 2, 3).reshape(2, rows, 64)
        vh = jnp.concatenate([v_fifo_in[:, ::-1], vf], axis=1)
        vA = vh[..., :32]
        vB = vh[..., 32:]
        acc = jnp.zeros((2, rows, 32), jnp.float32)
        for k in range(16):
            src = vA if k % 2 == 0 else vB
            acc = acc + src[:, 16 - k : 16 - k + rows, :] * D[k]
        return acc, vh

    def make_run(poly):
        def chain(sp, es, sd, st, valid):
            b = G.batch_from_packed8(sp, es, sd)
            x = G._requantize(b)
            x = G._stereo(b, x)
            x = G._antialias(b, x)
            raw = G._imdct(b, x)
            out18, uppers = G._overlap_fold(raw, st.store)
            x18 = out18 * G._FREQ_INV
            pcm_f, vh = poly(x18, st.v_fifo)
            t_dim = sp.shape[0]
            samp = jnp.clip(
                pcm_f * 32767.0, -32767.0, 32767.0
            ).astype(jnp.int32)
            pcm = samp.astype(jnp.int16).reshape(2, t_dim * 576)
            t_sel = (jnp.arange(t_dim) == valid - 1).astype(jnp.float32)
            store_out = jnp.einsum(
                "t,tcbs->cbs", t_sel, uppers, precision=G._HI
            )
            store_out = jnp.where(valid > 0, store_out, st.store)
            r_sel = (
                jnp.arange(vh.shape[1])[None, :]
                == (valid * 18 + jnp.arange(16))[:, None]
            ).astype(jnp.float32)
            fifo = jnp.einsum("kr,cri->cki", r_sel, vh, precision=G._HI)
            return pcm, G.DecodeState(store=store_out, v_fifo=fifo[:, ::-1])

        @jax.jit
        def run(sps, ess, sds, st0, vals):
            def step(st, xs):
                sp, es, sd, v = xs
                sp = jnp.swapaxes(sp, 1, 2)
                pcm, st2 = jax.vmap(chain)(sp, es, sd, st, v)
                en = jnp.sum(jnp.abs(pcm.astype(jnp.int32)), axis=(1, 2))
                return st2, en
            st, ens = jax.lax.scan(step, st0, (sps, ess, sds, vals))
            return ens, st
        return run

    results = {}
    for name, poly in (("base", G._polyphase), ("fir-splitcols", polyphase_split)):
        run = make_run(poly)
        t0 = time.perf_counter()
        r = run(a, b_, c_, st0, valids)
        fence(r)
        print(f"compile {name}: {time.perf_counter()-t0:.1f}s", file=sys.stderr)
        t = timed(lambda run=run: run(a, b_, c_, st0, valids), n=4)
        print(f"  {name:14s} {t*1e3:7.1f} ms total  {t/C*1e3:6.2f} ms/chunk")
        results[name] = jax.tree_util.tree_map(np.asarray, r)

    e0, _ = results["base"]
    e1, _ = results["fir-splitcols"]
    print(f"  energies equal: {bool((e0 == e1).all())}")


if __name__ == "__main__":
    main()
