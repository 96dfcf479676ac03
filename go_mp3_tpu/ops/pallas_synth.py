"""Fused Pallas TPU kernel for the polyphase synthesis filterbank.

Covers the hottest stage of the granule chain (frame.go:630-688 re-expressed
as matrixing + 16-tap FIR over the v-vector FIFO, see ops/granule.py): one
kernel computes, entirely in VMEM,

    V = S @ Nwin^T          (matrixing, MXU)
    pcm[r, i] = sum_k V[r-k, off_k + i] * D[32k + i]   (FIR, VPU)

for all T*18 synthesis steps of a chunk with both channels packed into the
128-lane dimension (ch0 lanes 0:63, ch1 lanes 64:127 of the matrixed V), so
the MXU matmul runs at full lane width and V never round-trips to HBM.

The kernel is exposed through `polyphase_pallas` with the same contract as
the XLA formulation in granule.py (`_polyphase`), and `decode_chunk_pallas`
swaps it into the full chunk decoder. On non-TPU backends the kernel runs in
interpreter mode so tests validate it everywhere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # TPU-only module; import lazily-safe
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    _HAS_PLTPU = False

from ..consts import SAMPLES_PER_GR
from . import tables as T
from .granule import DecodeState, GranuleBatch

# Block-diagonal matrixing weights [64, 128]:
#   w2[0:32, 0:64] = Nwin^T for channel 0, w2[32:64, 64:128] for channel 1
_NWIN_T = T.SYNTH_N_WIN.T.astype(np.float32)  # [32, 64]
_W2 = np.zeros((64, 128), np.float32)
_W2[0:32, 0:64] = _NWIN_T
_W2[32:64, 64:128] = _NWIN_T

_D16 = T.SYNTH_DTBL.reshape(16, 32)  # D[32k + i]


def _pick_tile(rows: int) -> int:
    """Largest row-tile (multiple of 18, <= 288 rows) dividing `rows`, so the
    per-iteration VMEM working set stays small."""
    for g in (16, 8, 4, 2, 1):
        if rows % (18 * g) == 0:
            return 18 * g
    return rows


def _synth_kernel(s2_ref, w2_ref, vh0_ref, d_ref, out_ref, vh_scratch):
    """s2: [R, 64] (ch0 lanes 0:32 | ch1 32:64) time-major synthesis inputs;
    vh0: [16, 128] packed v-history (oldest first); d: [16, 32];
    out: [R, 64] windowed sums (ch0 | ch1); vh_scratch: [R+16, 128] VMEM
    staging for the v-history. The post-`valid` FIFO tail is reconstructed
    OUTSIDE the kernel (a 16-row matmul) so no scalar operand crosses the
    pallas_call boundary — scalar blocks don't batch under vmap.

    The matrixing + FIR runs in sequential row tiles over the scratch ref so
    only one tile's working set is live (the full-chunk form blows the
    scoped-VMEM budget at T=256)."""
    rows = s2_ref.shape[0]
    tile = _pick_tile(rows)
    n_tiles = rows // tile
    vh_scratch[0:16] = vh0_ref[:]

    def body(t, carry):
        base = t * tile
        v = jnp.dot(
            s2_ref[pl.ds(base, tile)],
            w2_ref[:],
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [tile, 128]
        vh_scratch[pl.ds(16 + base, tile)] = v
        acc0 = jnp.zeros((tile, 32), jnp.float32)
        acc1 = jnp.zeros((tile, 32), jnp.float32)
        for k in range(16):
            off = 0 if k % 2 == 0 else 32
            dk = d_ref[k, :]
            window = vh_scratch[pl.ds(16 + base - k, tile)]
            acc0 = acc0 + window[:, off : off + 32] * dk
            acc1 = acc1 + window[:, 64 + off : 64 + off + 32] * dk
        out_ref[pl.ds(base, tile)] = jnp.concatenate([acc0, acc1], axis=1)
        return carry

    jax.lax.fori_loop(0, n_tiles, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def polyphase_pallas(
    x18: jax.Array,
    v_fifo_in: jax.Array,
    valid: jax.Array | None = None,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Drop-in fused replacement for granule._polyphase.

    x18: [T, 2, 32, 18] hybrid output. Returns (pcm_f32 [2, T*18, 32],
    v_fifo_out [2, 16, 64] taken after `valid` granules (default: all T))."""
    t_dim = x18.shape[0]
    rows = t_dim * 18
    if valid is None:
        valid = jnp.int32(t_dim)
    s = jnp.swapaxes(x18, -1, -2)  # [T, 2, 18, 32]
    # pack channels into lanes: [R, 64]
    s2 = jnp.concatenate(
        [
            s[:, 0].reshape(rows, 32),
            s[:, 1].reshape(rows, 32),
        ],
        axis=1,
    )
    # packed v-history, oldest-first: [16, 128]
    vh0 = jnp.concatenate(
        [v_fifo_in[0, ::-1], v_fifo_in[1, ::-1]], axis=1
    )

    assert _HAS_PLTPU, "pallas TPU support unavailable"
    w2 = jnp.asarray(_W2)
    scratch_shapes = [pltpu.VMEM((rows + 16, 128), jnp.float32)]
    out = pl.pallas_call(
        _synth_kernel,
        out_shape=jax.ShapeDtypeStruct((rows, 64), jnp.float32),
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(s2, w2, vh0, jnp.asarray(_D16))

    # FIFO tail after `valid` granules, reconstructed outside the kernel:
    # virtual v-history row i (i in [-16, rows)) is vh0[16+i] for i < 0 and
    # s2[i] @ w2 otherwise — re-matrixing the <=16 needed rows costs one tiny
    # MXU call and keeps the kernel free of scalar operands.
    start = valid.astype(jnp.int32) * 18
    idx = start - 16 + jnp.arange(16, dtype=jnp.int32)  # [-16, rows)
    s_rows = jnp.take(s2, jnp.clip(idx, 0, rows - 1), axis=0)  # [16, 64]
    v_rows = jnp.dot(
        s_rows, w2, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    old = jnp.take(vh0, jnp.clip(idx + 16, 0, 15), axis=0)
    vtail = jnp.where((idx < 0)[:, None], old, v_rows)

    pcm = jnp.stack([out[:, :32], out[:, 32:]], axis=0)  # [2, R, 32]
    v_fifo_out = jnp.stack(
        [vtail[::-1, :64], vtail[::-1, 64:]], axis=0
    )  # [2, 16, 64], newest first
    return pcm, v_fifo_out


def _decode_chunk_pallas_impl(
    b: GranuleBatch, state: DecodeState, valid: jax.Array, interpret: bool
):
    """decode_chunk with the fused Pallas synthesis stage."""
    from . import granule as G

    x = G._requantize(b)
    x = G._stereo(b, x)
    x = G._antialias(b, x)
    raw = G._imdct(b, x)
    out18, uppers = G._overlap_fold(raw, state.store)
    x18 = out18 * G._FREQ_INV

    pcm_f, v_fifo_out = polyphase_pallas(
        x18, state.v_fifo, valid=valid, interpret=interpret
    )

    t_dim = b.spectra.shape[0]
    samp = jnp.clip(pcm_f * 32767.0, -32767.0, 32767.0).astype(jnp.int32)
    pcm = samp.astype(jnp.int16).reshape(2, t_dim * SAMPLES_PER_GR)
    pcm = jnp.swapaxes(pcm, 0, 1)
    mono_rows = jnp.repeat(
        b.mono, SAMPLES_PER_GR, total_repeat_length=t_dim * SAMPLES_PER_GR
    )
    pcm = jnp.where(mono_rows[:, None], pcm[:, :1], pcm)

    store_out = jax.lax.dynamic_index_in_dim(
        uppers, jnp.maximum(valid - 1, 0), axis=0, keepdims=False
    )
    store_out = jnp.where(valid > 0, store_out, state.store)
    return pcm, DecodeState(store=store_out, v_fifo=v_fifo_out)


def decode_chunk_packed8_pallas_impl(
    tail8: jax.Array,
    head16: jax.Array,
    side8: jax.Array,
    state: DecodeState,
    valid: jax.Array,
    interpret: bool = False,
):
    """Pallas-synthesis decode over the int8-quantized host interface
    (same contract as granule.decode_chunk_packed8_impl)."""
    from .granule import batch_from_packed8

    return _decode_chunk_pallas_impl(
        batch_from_packed8(tail8, head16, side8), state, valid, interpret
    )


decode_chunk_pallas = jax.jit(
    functools.partial(_decode_chunk_pallas_impl, interpret=False)
)
decode_chunk_pallas_interpret = jax.jit(
    functools.partial(_decode_chunk_pallas_impl, interpret=True)
)
