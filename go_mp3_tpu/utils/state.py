"""Decode-state checkpoint/resume helpers.

The reference carries decode state implicitly ({bit reservoir bytes, IMDCT
overlap store, polyphase vVec, byte position} — SURVEY.md §5); this module
makes that state an explicit, serializable value so a decode can be
checkpointed, shipped to another host, and resumed sample-exactly.
"""

from __future__ import annotations

import io
import json
from dataclasses import dataclass

import numpy as np

from ..ops.granule import DecodeState


@dataclass
class DecoderCheckpoint:
    """Everything needed to resume a stream decode at a granule boundary."""

    position: int  # decoded-byte position
    frame_index: int  # next frame to parse
    store: np.ndarray  # [2, 32, 18] f32
    v_fifo: np.ndarray  # [2, 16, 64] f32
    reservoir: bytes  # previous assembled main-data buffer

    def to_bytes(self) -> bytes:
        buf = io.BytesIO()
        header = {
            "position": self.position,
            "frame_index": self.frame_index,
            "reservoir_len": len(self.reservoir),
        }
        hdr = json.dumps(header).encode()
        buf.write(len(hdr).to_bytes(4, "little"))
        buf.write(hdr)
        buf.write(self.reservoir)
        np.save(buf, self.store)
        np.save(buf, self.v_fifo)
        return buf.getvalue()

    @classmethod
    def from_bytes(cls, data: bytes) -> "DecoderCheckpoint":
        buf = io.BytesIO(data)
        n = int.from_bytes(buf.read(4), "little")
        header = json.loads(buf.read(n))
        reservoir = buf.read(header["reservoir_len"])
        store = np.load(buf)
        v_fifo = np.load(buf)
        return cls(
            position=header["position"],
            frame_index=header["frame_index"],
            store=store,
            v_fifo=v_fifo,
            reservoir=reservoir,
        )


def state_to_numpy(state: DecodeState) -> tuple[np.ndarray, np.ndarray]:
    return np.asarray(state.store), np.asarray(state.v_fifo)


def state_from_numpy(store: np.ndarray, v_fifo: np.ndarray) -> DecodeState:
    import jax.numpy as jnp

    return DecodeState(store=jnp.asarray(store), v_fifo=jnp.asarray(v_fifo))
