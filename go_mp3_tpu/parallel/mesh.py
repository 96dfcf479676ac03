"""Device-mesh sharding for multi-stream decode.

MP3 streams are independent (SURVEY.md §2: the only applicable parallelism is
data parallelism over streams), so the multi-chip strategy is: shard the
leading stream axis of the vmapped granule decoder across a 1-D mesh. No
cross-device collectives are required on the data path; aggregate throughput
metrics reduce with a psum if wanted.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.granule import (
    DecodeState,
    GranuleBatch,
    decode_chunk_impl,
    decode_chunk_packed_impl,
)

STREAM_AXIS = "streams"


def make_mesh(devices=None) -> Mesh:
    """1-D mesh over all (or the given) devices, stream-parallel."""
    if devices is None:
        devices = jax.devices()
    import numpy as np

    return Mesh(np.asarray(devices), (STREAM_AXIS,))


def make_sharded_decoder(mesh: Mesh):
    """jit-compiled [S, T, ...] batch decoder with S sharded over the mesh.

    Returns a function (batch, states, valid) -> (pcm [S, T*576, 2], states)
    whose inputs/outputs are annotated with NamedShardings so XLA partitions
    the whole computation across chips with zero communication.
    """
    batched = jax.vmap(decode_chunk_impl)
    s_lead = NamedSharding(mesh, P(STREAM_AXIS))
    in_shardings = (
        jax.tree_util.tree_map(lambda _: s_lead, GranuleBatch(*(range(14)))),
        DecodeState(store=s_lead, v_fifo=s_lead),
        s_lead,
    )
    out_shardings = (
        s_lead,
        DecodeState(store=s_lead, v_fifo=s_lead),
    )
    return jax.jit(
        batched, in_shardings=in_shardings, out_shardings=out_shardings
    )


def make_sharded_packed_decoder(mesh: Mesh):
    """Like make_sharded_decoder, but over the packed two-array host
    interface (spectra [S,T,1152] i16 + sidecar [S,T,144] i16): the cheapest
    H2D layout, unpacked on device. S is sharded over the mesh; zero
    cross-chip communication (streams are independent)."""
    batched = jax.vmap(decode_chunk_packed_impl)
    s_lead = NamedSharding(mesh, P(STREAM_AXIS))
    in_shardings = (
        s_lead,
        s_lead,
        DecodeState(store=s_lead, v_fifo=s_lead),
        s_lead,
    )
    out_shardings = (
        s_lead,
        DecodeState(store=s_lead, v_fifo=s_lead),
    )
    return jax.jit(
        batched, in_shardings=in_shardings, out_shardings=out_shardings
    )


def init_states(n_streams: int) -> DecodeState:
    """Stacked zero DecodeStates for a stream batch."""
    return DecodeState(
        store=jnp.zeros((n_streams, 2, 32, 18), jnp.float32),
        v_fifo=jnp.zeros((n_streams, 2, 16, 64), jnp.float32),
    )
