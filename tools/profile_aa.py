#!/usr/bin/env python3
"""On-chip: antialias reformulation + per-operand dot precision.

Variants (dynamic-valid corpus scan, fetch-fenced, min of 4):
  base          current chain
  aa-rollrev    antialias as full-width elementwise ops over reversed /
                subband-shifted copies (same products, same mul/sub
                order — bit-exactness checked) instead of 8-wide strided
                slices + two .at[].set updates
  prec-asym     one-hot dots at precision=(HIGH, DEFAULT): the 0/1
                operand is exact in ONE bf16 pass, the data operand
                still bf16x3 — bitwise compared against base
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
    from go_mp3_tpu.ops import tables as TT
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

    # ---- roll+reverse antialias --------------------------------------------
    CS, CA = np.asarray(TT.CS), np.asarray(TT.CA)  # [8]
    cs_l = np.ones((32, 18), np.float32)
    ca_l = np.zeros((32, 18), np.float32)
    cs_u = np.ones((32, 18), np.float32)
    ca_u = np.zeros((32, 18), np.float32)
    for l in range(10, 18):  # lower side of boundary sb (i = 17 - l)
        cs_l[:31, l] = CS[17 - l]
        ca_l[:31, l] = CA[17 - l]
    for l in range(0, 8):  # upper side of boundary sb-1 (i = l)
        cs_u[1:, l] = CS[l]
        ca_u[1:, l] = CA[l]
    CS_L, CA_L = jnp.asarray(cs_l), jnp.asarray(ca_l)
    CS_U, CA_U = jnp.asarray(cs_u), jnp.asarray(ca_u)
    LINE18 = np.arange(18)
    LOW_ROWS = jnp.asarray((LINE18 >= 10)[None, :] & (np.arange(32) < 31)[:, None])
    UP_ROWS = jnp.asarray((LINE18 < 8)[None, :] & (np.arange(32) >= 1)[:, None])

    def antialias_rollrev(b, x):
        xb = x.reshape(*x.shape[:2], 32, 18)
        rev = xb[..., ::-1]
        z = jnp.zeros_like(rev[..., :1, :])
        nbr_dn = jnp.concatenate([rev[..., 1:, :], z], axis=-2)
        nbr_up = jnp.concatenate([z, rev[..., :-1, :]], axis=-2)
        lower_new = xb * CS_L - nbr_dn * CA_L
        upper_new = xb * CS_U + nbr_up * CA_U
        cls = b.block_class[..., None, None]  # [T, 2, 1, 1]
        sb = jnp.arange(32)[:, None]
        # boundary activity by class: long = all 31, mixed = boundary 0 only
        act_low_b = jnp.where(
            cls == TT.CLASS_SHORT,
            jnp.zeros((32, 1), bool),
            jnp.where(cls == TT.CLASS_MIXED, sb < 1, sb < 31),
        )
        act_up_b = jnp.where(
            cls == TT.CLASS_SHORT,
            jnp.zeros((32, 1), bool),
            jnp.where(cls == TT.CLASS_MIXED, sb == 1, sb >= 1),
        )
        out = jnp.where(
            act_low_b & LOW_ROWS,
            lower_new,
            jnp.where(act_up_b & UP_ROWS, upper_new, xb),
        )
        return out.reshape(x.shape)

    def chain(sp, es, sd, st, aa):
        b = G.batch_from_packed8(sp, es, sd)
        x = G._requantize(b)
        x = G._stereo(b, x)
        x = aa(b, x)
        raw = G._imdct(b, x)
        out18, uppers = G._overlap_fold(raw, st.store)
        x18 = out18 * G._FREQ_INV
        pcm_f, vh = G._polyphase(x18, st.v_fifo)
        t_dim = sp.shape[0]
        samp = jnp.clip(pcm_f * 32767.0, -32767.0, 32767.0).astype(jnp.int32)
        pcm = samp.astype(jnp.int16).reshape(2, t_dim * 576)
        return pcm, G.DecodeState(
            store=uppers[-1],
            v_fifo=vh[:, t_dim * 18 : t_dim * 18 + 16][:, ::-1],
        )

    def make_run(aa):
        @jax.jit
        def run(sps, ess, sds, st0):
            def step(st, xs):
                sp, es, sd = xs
                sp = jnp.swapaxes(sp, 1, 2)
                pcm, st2 = jax.vmap(
                    lambda q, w, e, s: chain(q, w, e, s, aa)
                )(sp, es, sd, st)
                en = jnp.sum(jnp.abs(pcm.astype(jnp.int32)), axis=(1, 2))
                return st2, (en, pcm[:2])
            st, (ens, pcms) = jax.lax.scan(step, st0, (sps, ess, sds))
            return ens, pcms
        return run

    results = {}

    def measure(name, aa):
        run = make_run(aa)
        t0 = time.perf_counter()
        r = run(a, b_, c_, st0)
        fence(r)
        print(f"compile {name}: {time.perf_counter()-t0:.1f}s", file=sys.stderr)
        t = timed(lambda: run(a, b_, c_, st0), n=4)
        print(f"  {name:12s} {t*1e3:7.1f} ms total  {t/C*1e3:6.2f} ms/chunk")
        results[name] = (np.asarray(r[0]), np.asarray(r[1]))

    measure("base", G._antialias)
    measure("aa-rollrev", antialias_rollrev)
    # asym precision ONLY for _expand_bands (its rhs is the 0/1 operand);
    # _select_by_variant has the one-hot on the LHS and a REAL-valued
    # table on the rhs (band starts like 418 are not bf16-exact), so it
    # keeps plain HIGH.
    orig_select = G._select_by_variant

    def select_hi(vh, table):
        return jnp.einsum(
            "tv,vn->tn", vh, table.astype(jnp.float32),
            precision=jax.lax.Precision.HIGH,
        )

    G._select_by_variant = select_hi
    G._HI_OH = (jax.lax.Precision.HIGH, jax.lax.Precision.DEFAULT)
    measure("prec-asym", G._antialias)
    G._HI_OH = jax.lax.Precision.HIGH
    G._select_by_variant = orig_select

    be, bp = results["base"]
    for name in ("aa-rollrev", "prec-asym"):
        e, p_ = results[name]
        md = int(np.abs(p_.astype(np.int32) - bp.astype(np.int32)).max())
        print(f"  {name:12s} energies equal: {bool((e == be).all())}, "
              f"pcm maxdiff vs base: {md} LSB")


if __name__ == "__main__":
    main()
