"""Native-parser -> GranuleBatch packing (zero Python-per-granule work).

The native parser (go_mp3_tpu.native) emits contiguous int32 arrays; this
module reshapes/slices them straight into GranuleBatch fields with vectorized
numpy, replacing the per-granule Python staging in models.pipeline for the
high-throughput corpus path.
"""

from __future__ import annotations

import numpy as np

from ..native import lib as native
from ..ops.granule import GranuleBatch


def granule_batch_from_native(
    spectra: np.ndarray,
    sfl: np.ndarray,
    sfs: np.ndarray,
    meta: np.ndarray,
    pad_to: int | None = None,
) -> tuple[GranuleBatch, int]:
    """Build a GranuleBatch from native parser arrays; returns (batch, valid)."""
    n = spectra.shape[0]
    t_dim = pad_to if pad_to is not None else n
    assert t_dim >= n

    def pad(a: np.ndarray) -> np.ndarray:
        if t_dim == n:
            return np.ascontiguousarray(a)
        out = np.zeros((t_dim, *a.shape[1:]), dtype=a.dtype)
        out[:n] = a
        return out

    m = meta
    batch = GranuleBatch(
        spectra=pad(spectra),
        scalefac_l=pad(sfl),
        scalefac_s=pad(sfs.reshape(n, 2, 13, 3)),
        global_gain=pad(m[:, native.META_GLOBAL_GAIN : native.META_GLOBAL_GAIN + 2]),
        scalefac_scale=pad(m[:, native.META_SF_SCALE : native.META_SF_SCALE + 2]),
        preflag=pad(m[:, native.META_PREFLAG : native.META_PREFLAG + 2]),
        subblock_gain=pad(
            m[:, native.META_SUBBLOCK_GAIN : native.META_SUBBLOCK_GAIN + 6].reshape(
                n, 2, 3
            )
        ),
        block_type=pad(m[:, native.META_BLOCK_TYPE : native.META_BLOCK_TYPE + 2]),
        block_class=pad(m[:, native.META_BLOCK_CLASS : native.META_BLOCK_CLASS + 2]),
        variant=pad(m[:, native.META_VARIANT]),
        ms_flag=pad((m[:, native.META_FLAGS] & 1).astype(bool)),
        is_flag=pad(((m[:, native.META_FLAGS] >> 1) & 1).astype(bool)),
        count1_r=pad(m[:, native.META_COUNT1_R]),
        mono=pad(((m[:, native.META_FLAGS] >> 2) & 1).astype(bool)),
    )
    return batch, n


def parse_stream_native(data: bytes):
    """Parse a whole stream with the native parser; returns the raw arrays
    (spectra, sfl, sfs, meta) plus the sample rate."""
    p = native.NativeParser(data)
    arrays = p.parse_all()
    sr = p.sample_rate
    p.close()
    return arrays, sr
