"""Frame header parse/validate/resync (model: frameheader_test.go)."""

import io

import pytest

from go_mp3_tpu.bitstream.frameheader import FrameHeader, read_header
from go_mp3_tpu.bitstream.source import Source
from go_mp3_tpu.consts import (
    MAX_SYNC_SEARCH_BYTES,
    EOFError_,
    Layer,
    Mode,
    SyncSearchLimitError,
    UnexpectedEOFError,
    Version,
)
from util_synth import mpeg1_layer3_header, silent_frame


def hdr(word: int) -> FrameHeader:
    return FrameHeader(word)


def test_field_extraction():
    h = hdr(mpeg1_layer3_header(bitrate_index=9, sampling_frequency=0, mode=0))
    assert h.version == Version.MPEG1
    assert h.layer == Layer.LAYER3
    assert h.protection_bit == 1
    assert h.bitrate_index == 9
    assert h.bitrate == 128000
    assert h.sampling_frequency_value() == 44100
    assert h.mode == Mode.STEREO
    assert h.number_of_channels == 2
    assert h.granules == 2
    assert h.samples_per_frame == 1152
    assert h.bytes_per_frame == 1152 * 4
    assert h.side_info_size == 32
    assert h.frame_size() == 417
    assert h.is_valid()


def test_mpeg2_derived_fields():
    # MPEG-2 (version bits = 10), 22.05 kHz, mono
    word = (
        0xFFE00000 | (2 << 19) | (1 << 17) | (1 << 16) | (4 << 12)
        | (0 << 10) | (3 << 6)
    )
    h = hdr(word)
    assert h.version == Version.MPEG2
    assert h.low_sampling_frequency == 1
    assert h.sampling_frequency_value() == 22050
    assert h.granules == 1
    assert h.side_info_size == 9
    assert h.number_of_channels == 1
    assert h.bitrate == 32000  # MPEG-2 L3 index 4


def test_invalid_headers_rejected():
    good = mpeg1_layer3_header()
    assert hdr(good).is_valid()
    assert not hdr(good & ~0xFFE00000).is_valid()  # no sync
    assert not hdr((good & ~(3 << 19)) | (1 << 19)).is_valid()  # reserved ver
    assert not hdr(good | (15 << 12)).is_valid()  # bitrate index 15
    assert not hdr(good | (3 << 10)).is_valid()  # reserved sfreq
    assert not hdr((good & ~(3 << 17)) | (2 << 17)).is_valid()  # layer 2
    assert not hdr((good & ~(3 << 17)) | (3 << 17)).is_valid()  # layer 1
    assert not hdr((good & ~3) | 2).is_valid()  # emphasis 2


def test_ms_and_intensity_stereo_flags():
    base = mpeg1_layer3_header(mode=1)  # joint stereo
    assert hdr(base | (2 << 4)).use_ms_stereo
    assert not hdr(base | (2 << 4)).use_intensity_stereo
    assert hdr(base | (1 << 4)).use_intensity_stereo
    assert hdr(base | (3 << 4)).use_ms_stereo
    # Non-joint-stereo never uses either
    assert not hdr(mpeg1_layer3_header(mode=0) | (3 << 4)).use_ms_stereo


def test_read_header_clean():
    frame = silent_frame()
    src = Source(io.BytesIO(frame))
    h, pos = read_header(src, 0)
    assert h.is_valid()
    assert pos == 0


def test_read_header_resync_over_junk():
    junk = b"\x00" * 100
    frame = silent_frame()
    src = Source(io.BytesIO(junk + frame))
    h, pos = read_header(src, 0)
    assert h.is_valid()
    assert pos == 100


def test_read_header_sync_limit():
    src = Source(io.BytesIO(b"\x00" * (MAX_SYNC_SEARCH_BYTES + 100)))
    with pytest.raises(SyncSearchLimitError):
        read_header(src, 0)


def test_read_header_eof():
    with pytest.raises(EOFError_):
        read_header(Source(io.BytesIO(b"")), 0)
    with pytest.raises(UnexpectedEOFError):
        read_header(Source(io.BytesIO(b"\xff\xfb")), 0)


def test_layer12_false_sync_rejected():
    """Layer 1/2 headers must not satisfy the resync (they'd be false syncs
    for an MP3-only decoder)."""
    l2 = (mpeg1_layer3_header() & ~(3 << 17)) | (2 << 17)
    src = Source(io.BytesIO(l2.to_bytes(4, "big") + b"\x00" * 64))
    with pytest.raises(UnexpectedEOFError):
        read_header(src, 0)


def test_free_bitrate_rejected():
    word = mpeg1_layer3_header(bitrate_index=9) & ~(0xF << 12)
    src = Source(io.BytesIO(word.to_bytes(4, "big")))
    with pytest.raises(Exception, match="free bitrate"):
        read_header(src, 0)
