"""Synthetic granule fuzz: three-way parity across the full semantic space.

The real fixtures never exercise intensity stereo or mixed blocks (and MS
stereo only rarely), so this test fabricates random granules covering every
block class x stereo mode x band variant and checks the numpy-float64 golden
chain, the batched JAX chain, and (when built) the C++ exact chain against
each other within ISO full-compliance bounds.
"""

import random

import numpy as np
import pytest

from go_mp3_tpu.bitstream.frameheader import FrameHeader
from go_mp3_tpu.bitstream.maindata import MainData
from go_mp3_tpu.bitstream.parser import ParsedFrame
from go_mp3_tpu.bitstream.sideinfo import SideInfo
from go_mp3_tpu.models.pipeline import StreamDecoder, granules_from_frame
from go_mp3_tpu.ops.reference_dsp import GoldenDecoder

try:
    from go_mp3_tpu.native import lib as native

    HAVE_NATIVE = native.available()
except Exception:
    HAVE_NATIVE = False


def make_header(lsf: int, sfreq: int, mode: int, mode_ext: int) -> FrameHeader:
    version = 3 if lsf == 0 else 2
    word = (
        0xFFE00000
        | (version << 19)
        | (1 << 17)  # layer III
        | (1 << 16)  # no CRC
        | (9 << 12)
        | (sfreq << 10)
        | (mode << 6)
        | (mode_ext << 4)
    )
    return FrameHeader(word)


def random_frame(rng: random.Random, lsf, sfreq, mode, mode_ext, block_spec):
    """Fabricate a coherent (header, side_info, main_data) triple."""
    h = make_header(lsf, sfreq, mode, mode_ext)
    nch = h.number_of_channels
    si = SideInfo()
    md = MainData()
    for gr in range(h.granules):
        for ch in range(nch):
            ws, bt, mixed = block_spec
            si.win_switch_flag[gr][ch] = ws
            si.block_type[gr][ch] = bt
            si.mixed_block_flag[gr][ch] = mixed
            # realistic energy: real encoders keep output near unit scale;
            # extreme gain+magnitude combos (100x over full scale) only
            # amplify f32-vs-f64 rounding, they don't occur in streams
            si.global_gain[gr][ch] = rng.randint(140, 205)
            si.scalefac_scale[gr][ch] = rng.randint(0, 1)
            si.preflag[gr][ch] = rng.randint(0, 1) if lsf == 0 else 0
            si.subblock_gain[gr][ch] = [rng.randint(0, 7) for _ in range(3)]
            count1 = rng.choice([0, 96, 240, 396, 576])
            si.count1[gr][ch] = count1
            md.scalefac_l[gr][ch] = [rng.randint(0, 11) for _ in range(22)]
            md.scalefac_s[gr][ch] = np.array(
                [[rng.randint(0, 7) for _ in range(3)] for _ in range(13)],
                dtype=np.int32,
            )
            spec = np.array(
                [rng.randint(-30, 30) for _ in range(576)], dtype=np.int32
            )
            # occasional big (linbits-range) values in the low bands
            for _ in range(4):
                spec[rng.randrange(64)] = rng.choice([-2000, -300, 300, 2000])
            spec[count1:] = 0
            md.is_[gr][ch] = spec
        # part2_3_length only gates the huffman read; DSP ignores it
    return ParsedFrame(h, si, md, 0)


CASES = []
for lsf, sfreq in ((0, 0), (0, 1), (0, 2), (1, 0), (1, 1), (1, 2)):
    for mode, mode_ext in ((0, 0), (1, 1), (1, 2), (1, 3), (3, 0)):
        for block_spec in ((0, 0, 0), (1, 1, 0), (1, 3, 0), (1, 2, 0), (1, 2, 1)):
            CASES.append((lsf, sfreq, mode, mode_ext, block_spec))


@pytest.mark.parametrize("seed", [1, 2, 3, 12])
def test_three_way_parity(seed):
    # One synthetic stream per case, 3 frames each (state carry within the
    # stream). Channel mode and sample rate stay constant within a stream,
    # as in any real MP3: the reference's per-nch state loops leave ch1
    # state stale during mono frames, so a stream that switches modes
    # mid-flight has no well-defined behavior to match (the batched device
    # path evolves both channels every granule).
    rng = random.Random(seed)
    g_pcm = b""
    case_granules = []
    j_parts = []
    for case in CASES:
        gd = GoldenDecoder()
        sd = StreamDecoder(chunk_size=64)
        granules = []
        for _ in range(3):
            f = random_frame(rng, *case)
            g_pcm += gd.decode_frame(f.header, f.side_info, f.main_data)
            granules.extend(granules_from_frame(f))
            sd.feed_frame(f)
        case_granules.append(granules)
        j_parts.append(sd.decode_pending(flush=True))
    j_pcm = b"".join(j_parts)

    a = np.frombuffer(g_pcm, dtype="<i2").astype(np.int32)
    b = np.frombuffer(j_pcm, dtype="<i2").astype(np.int32)
    assert len(a) == len(b)

    # On synthetic white-noise spectra the reference's own float32
    # arithmetic differs from the float64 golden by several LSB (measured:
    # the C++ exact path, which replicates the reference bit-for-bit, shows
    # the same spread) — cancellation in the IMDCT/polyphase sums amplifies
    # f32 rounding. Bounds here are therefore RMS (the ISO-style metric,
    # which stays inside full compliance on every surveyed seed) plus a
    # maxdiff calibrated over 24 seeds (observed max 66, seed 12) + ~10%
    # headroom — tightened from 96 now that test_stage_parity.py bounds
    # every individual stage, so a multi-LSB stage regression fails a
    # named test and this gate only guards cross-stage composition;
    # the strict <=2 LSB gate lives in test_dsp_parity.py over real streams.
    def check(x, y, label):
        d = np.abs(x - y)
        rms = float(np.sqrt(((x - y).astype(np.float64) ** 2).mean()))
        assert rms < 0.289, f"{label} rms {rms}"
        assert d.max() <= 72, f"{label} maxdiff {d.max()}"

    check(a, b, "jax vs golden")

    if HAVE_NATIVE:
        from go_mp3_tpu.native.lib import META_WIDTH, NativeDsp

        def meta_from(g):
            m = np.zeros(META_WIDTH, np.int32)
            m[native.META_VARIANT] = g.variant
            m[native.META_FLAGS] = (
                (1 if g.ms_flag else 0)
                | (2 if g.is_flag else 0)
                | (4 if g.mono else 0)
            )
            m[native.META_COUNT1_R] = g.count1_r
            m[native.META_GLOBAL_GAIN : native.META_GLOBAL_GAIN + 2] = g.global_gain
            m[native.META_SF_SCALE : native.META_SF_SCALE + 2] = g.scalefac_scale
            m[native.META_PREFLAG : native.META_PREFLAG + 2] = g.preflag
            m[native.META_BLOCK_TYPE : native.META_BLOCK_TYPE + 2] = g.block_type
            m[native.META_BLOCK_CLASS : native.META_BLOCK_CLASS + 2] = g.block_class
            m[
                native.META_SUBBLOCK_GAIN : native.META_SUBBLOCK_GAIN + 6
            ] = g.subblock_gain.reshape(-1)
            return m

        dsp = NativeDsp()
        c_parts = []
        for granules in case_granules:
            dsp.reset()
            spectra = np.ascontiguousarray(
                np.stack([g.spectra for g in granules]).astype(np.int16)
            )
            sfl = np.ascontiguousarray(
                np.stack([g.scalefac_l for g in granules]).astype(np.int32)
            )
            sfs = np.ascontiguousarray(
                np.stack(
                    [g.scalefac_s.reshape(2, 39) for g in granules]
                ).astype(np.int32)
            )
            meta = np.ascontiguousarray(
                np.stack([meta_from(g) for g in granules])
            )
            c_parts.append(dsp.decode(spectra, sfl, sfs, meta).reshape(-1))
        c = np.concatenate(c_parts).astype(np.int32)
        check(a, c, "exact vs golden")
        check(b, c, "jax vs exact")
