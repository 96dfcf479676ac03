"""Host->device pipeline: pack parsed frames into GranuleBatches and decode
them in fixed-size chunks on the accelerator.

This is the framework's "flagship model": the jitted chunk decoder from
go_mp3_tpu.ops.granule driven by the host parser, with per-stream DSP state
(DecodeState) carried across chunks — the explicit, serializable form of the
reference's cross-frame state (frame.go:48-49, 110-113).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

from ..bitstream.parser import ParsedFrame
from ..consts import SAMPLES_PER_GR
from ..ops import tables as T
from ..ops.granule import DecodeState, GranuleBatch, decode_chunk, init_state

DEFAULT_CHUNK = 128  # granules per device call (one XLA compilation)


@dataclass
class GranuleMeta:
    """Host-side staging for one granule (numpy, pre-device)."""

    spectra: np.ndarray  # int32 [2, 576]
    scalefac_l: np.ndarray  # int32 [2, 22]
    scalefac_s: np.ndarray  # int32 [2, 13, 3]
    global_gain: np.ndarray  # int32 [2]
    scalefac_scale: np.ndarray
    preflag: np.ndarray
    subblock_gain: np.ndarray  # int32 [2, 3]
    block_type: np.ndarray  # int32 [2]
    block_class: np.ndarray  # int32 [2]
    variant: int
    ms_flag: bool
    is_flag: bool
    count1_r: int
    mono: bool


def granules_from_frame(f: ParsedFrame) -> list[GranuleMeta]:
    """Split one parsed frame into per-granule metadata records."""
    h, si, md = f.header, f.side_info, f.main_data
    nch = h.number_of_channels
    variant = h.low_sampling_frequency * 3 + h.sampling_frequency
    out = []
    for gr in range(h.granules):
        block_class = np.zeros(2, dtype=np.int32)
        spectra = md.is_[gr].copy()
        for ch in range(nch):
            block_class[ch] = T.block_class(
                si.win_switch_flag[gr][ch],
                si.block_type[gr][ch],
                si.mixed_block_flag[gr][ch],
            )
            # Pre-apply the short-block reorder on host (frame.go:257-302):
            # the device path consumes POST-REORDER spectra (ops/granule.py).
            if block_class[ch] == T.CLASS_SHORT:
                spectra[ch] = spectra[ch][T.REORDER_PERM_SHORT[variant]]
            elif block_class[ch] == T.CLASS_MIXED:
                spectra[ch] = spectra[ch][T.REORDER_PERM_MIXED[variant]]
        g = GranuleMeta(
            spectra=spectra,
            scalefac_l=md.scalefac_l[gr].copy(),
            scalefac_s=md.scalefac_s[gr].copy(),
            global_gain=np.array(si.global_gain[gr], dtype=np.int32),
            scalefac_scale=np.array(si.scalefac_scale[gr], dtype=np.int32),
            preflag=np.array(si.preflag[gr], dtype=np.int32),
            subblock_gain=np.array(si.subblock_gain[gr], dtype=np.int32),
            block_type=np.array(si.block_type[gr], dtype=np.int32),
            block_class=block_class,
            variant=variant,
            ms_flag=h.use_ms_stereo,
            is_flag=h.use_intensity_stereo,
            count1_r=si.count1[gr][1] if nch == 2 else si.count1[gr][0],
            mono=(nch == 1),
        )
        out.append(g)
    return out


def pack_granule_batch(
    granules: list[GranuleMeta], pad_to: int | None = None
) -> tuple[GranuleBatch, int]:
    """Stack granule metadata into a GranuleBatch, zero-padded to `pad_to`.

    Returns (batch, valid_count)."""
    n = len(granules)
    t_dim = pad_to if pad_to is not None else n
    assert t_dim >= n

    def stack(get, shape, dtype=np.int32):
        arr = np.zeros((t_dim, *shape), dtype=dtype)
        for i, g in enumerate(granules):
            arr[i] = get(g)
        return arr

    # Arrays stay numpy; jit converts once at dispatch (keeping this path
    # free of per-field device round-trips).
    batch = GranuleBatch(
        spectra=stack(lambda g: g.spectra, (2, SAMPLES_PER_GR), np.int16),
        scalefac_l=stack(lambda g: g.scalefac_l, (2, 22)),
        scalefac_s=stack(lambda g: g.scalefac_s, (2, 13, 3)),
        global_gain=stack(lambda g: g.global_gain, (2,)),
        scalefac_scale=stack(lambda g: g.scalefac_scale, (2,)),
        preflag=stack(lambda g: g.preflag, (2,)),
        subblock_gain=stack(lambda g: g.subblock_gain, (2, 3)),
        block_type=stack(lambda g: g.block_type, (2,)),
        block_class=stack(lambda g: g.block_class, (2,)),
        variant=stack(lambda g: g.variant, ()),
        ms_flag=stack(lambda g: g.ms_flag, (), np.bool_),
        is_flag=stack(lambda g: g.is_flag, (), np.bool_),
        count1_r=stack(lambda g: g.count1_r, ()),
        mono=stack(lambda g: g.mono, (), np.bool_),
    )
    return batch, n


@dataclass
class StreamDecoder:
    """Chunked device decoding of one stream with carried DSP state."""

    chunk_size: int = DEFAULT_CHUNK
    state: DecodeState = field(default_factory=init_state)
    _pending: list[GranuleMeta] = field(default_factory=list)

    def reset(self) -> None:
        self.state = init_state()
        self._pending.clear()

    def feed_frame(self, f: ParsedFrame) -> None:
        self._pending.extend(granules_from_frame(f))

    def ready_granules(self) -> int:
        return len(self._pending)

    def decode_pending(self, flush: bool = False) -> bytes:
        """Decode buffered granules in full chunks (all of them if flush)."""
        out = b""
        while len(self._pending) >= self.chunk_size or (
            flush and self._pending
        ):
            take = min(self.chunk_size, len(self._pending))
            chunk, rest = self._pending[:take], self._pending[take:]
            batch, valid = pack_granule_batch(chunk, pad_to=self.chunk_size)
            pcm, self.state = decode_chunk(
                batch, self.state, jnp.int32(valid)
            )
            out += np.asarray(pcm[: valid * SAMPLES_PER_GR]).tobytes()
            self._pending = rest
        return out
