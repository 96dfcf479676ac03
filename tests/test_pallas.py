"""Fused Pallas synthesis kernel vs the XLA formulation (interpret mode on
CPU; the same kernel compiles natively on TPU)."""

import numpy as np

import jax.numpy as jnp

from go_mp3_tpu.models.pipeline import pack_granule_batch
from go_mp3_tpu.ops.granule import decode_chunk, init_state
from go_mp3_tpu.ops.pallas_synth import (
    decode_chunk_pallas_interpret,
    polyphase_pallas,
)
from go_mp3_tpu.parallel.corpus import parse_stream_granules


def test_polyphase_kernel_matches_xla():
    from go_mp3_tpu.ops.granule import _polyphase

    rng = np.random.default_rng(7)
    t_dim = 8
    x18 = jnp.asarray(rng.standard_normal((t_dim, 2, 32, 18)), jnp.float32)
    v0 = jnp.asarray(rng.standard_normal((2, 16, 64)), jnp.float32)

    ref_pcm, vh = _polyphase(x18, v0)
    ker_pcm, v_out = polyphase_pallas(x18, v0, interpret=True)

    np.testing.assert_allclose(
        np.asarray(ker_pcm), np.asarray(ref_pcm), rtol=1e-5, atol=1e-5
    )
    # reference v_fifo extraction (granule.decode_chunk_impl logic)
    ref_fifo = np.asarray(vh)[:, t_dim * 18 : t_dim * 18 + 16][:, ::-1]
    np.testing.assert_allclose(np.asarray(v_out), ref_fifo, rtol=1e-6)


def test_polyphase_kernel_valid_state():
    """Padded chunks must return the state after `valid` granules."""
    from go_mp3_tpu.ops.granule import _polyphase

    rng = np.random.default_rng(8)
    x18 = jnp.asarray(rng.standard_normal((8, 2, 32, 18)), jnp.float32)
    v0 = jnp.asarray(rng.standard_normal((2, 16, 64)), jnp.float32)
    valid = 5
    _, v_out = polyphase_pallas(x18, v0, valid=jnp.int32(valid), interpret=True)
    _, vh = _polyphase(x18, v0)
    ref_fifo = np.asarray(vh)[:, valid * 18 : valid * 18 + 16][:, ::-1]
    np.testing.assert_allclose(np.asarray(v_out), ref_fifo, rtol=1e-6)


def test_full_chunk_decoder_with_pallas(fixture_classic_lame):
    """decode_chunk_pallas produces the same PCM and state as decode_chunk
    on real data, including padded chunks."""
    granules = parse_stream_granules(fixture_classic_lame, limit=40)
    batch, valid = pack_granule_batch(granules, pad_to=48)
    state = init_state()
    pcm_ref, st_ref = decode_chunk(batch, state, jnp.int32(valid))
    pcm_ker, st_ker = decode_chunk_pallas_interpret(
        batch, state, jnp.int32(valid)
    )
    a = np.asarray(pcm_ref[: valid * 576]).astype(np.int32)
    b = np.asarray(pcm_ker[: valid * 576]).astype(np.int32)
    assert np.abs(a - b).max() <= 1
    np.testing.assert_allclose(
        np.asarray(st_ref.v_fifo), np.asarray(st_ker.v_fifo), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(st_ref.store), np.asarray(st_ker.store)
    )
