#!/usr/bin/env python3
"""On-chip: MXU-transpose unpack + v-einsum output-order variants.

  unpack-current   swapaxes on the int8 line-major plane
  unpack-mxu       transpose via int8 one-hot dot_general (s32 accum is
                   exact; the MXU writes the [T, L] layout directly)
  v-ctsi           polyphase v einsum emitting "ctsi" so the
                   [T,2,18,64] -> [2, rows, 64] relayout folds into the
                   dot's output (same contraction, bit-exact)
Full-chain scans with dynamic valids, fetch-fenced, min of 4.
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

    EYE_T = jnp.asarray(np.eye(T, dtype=np.int8))

    def unpack_mxu(sp_lm):
        # sp_lm: [L=1024, T] int8 -> [T, L] via one-hot int8 matmul with
        # exact s32 accumulation (the MXU emits the transposed layout)
        out = jax.lax.dot_general(
            EYE_T, sp_lm,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # [T, L] int32
        return out.astype(jnp.int8)

    def v_ctsi(x18, v_fifo_in):
        t_dim = x18.shape[0]
        v = jnp.einsum("tcjs,ij->ctsi", x18, G._SYNTH_N_WIN, precision=G._HI)
        rows = t_dim * 18
        vf = v.reshape(2, rows, 64)
        vh = jnp.concatenate([v_fifo_in[:, ::-1], vf], axis=1)
        v_a = vh[..., :32]
        v_b = vh[..., 32:]
        acc = jnp.zeros((2, rows, 32), jnp.float32)
        D = G._SYNTH_DTBL
        for k in range(16):
            src = v_a if k % 2 == 0 else v_b
            acc = acc + src[:, 16 - k : 16 - k + rows, :] * D[32 * k : 32 * (k + 1)]
        return acc, vh

    def make_run(mxu_unpack, poly):
        def chain(sp_lm, es, sd, st, valid):
            if mxu_unpack:
                sp = unpack_mxu(sp_lm)
            else:
                sp = jnp.swapaxes(sp_lm, 0, 1)
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
                pcm, st2 = jax.vmap(chain)(sp, es, sd, st, v)
                en = jnp.sum(jnp.abs(pcm.astype(jnp.int32)), axis=(1, 2))
                return st2, en
            st, ens = jax.lax.scan(step, st0, (sps, ess, sds, vals))
            return ens, st
        return run

    results = {}
    for name, mxu, poly in (
        ("base", False, G._polyphase),
        ("unpack-mxu", True, G._polyphase),
        ("v-ctsi", False, v_ctsi),
        ("both", True, v_ctsi),
    ):
        run = make_run(mxu, poly)
        t0 = time.perf_counter()
        r = run(a, b_, c_, st0, valids)
        fence(r)
        print(f"compile {name}: {time.perf_counter()-t0:.1f}s", file=sys.stderr)
        t = timed(lambda run=run: run(a, b_, c_, st0, valids), n=4)
        print(f"  {name:12s} {t*1e3:7.1f} ms total  {t/C*1e3:6.2f} ms/chunk")
        results[name] = np.asarray(r[0])

    base = results["base"]
    for name in ("unpack-mxu", "v-ctsi", "both"):
        print(f"  {name:12s} energies equal: {bool((results[name] == base).all())}")


if __name__ == "__main__":
    main()
