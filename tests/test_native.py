"""Native (C++) parser and exact DSP: parity with the Python/golden paths."""

import numpy as np
import pytest

from go_mp3_tpu import Decoder

try:
    from go_mp3_tpu.native import lib as native

    HAVE_NATIVE = native.available()
except Exception:
    HAVE_NATIVE = False

pytestmark = pytest.mark.skipif(not HAVE_NATIVE, reason="native lib not built")


def test_native_parser_matches_python(fixture_classic_lame, fixture_mpeg2):
    """Granule records from the C++ parser are bit-identical to the Python
    parser's on both fixtures."""
    from go_mp3_tpu.models.native_pipeline import (
        granule_batch_from_native,
        parse_stream_native,
    )
    from go_mp3_tpu.models.pipeline import pack_granule_batch
    from go_mp3_tpu.parallel.corpus import parse_stream_granules

    for data in (fixture_classic_lame, fixture_mpeg2):
        (sp, sl, ss, me), _sr = parse_stream_native(data)
        nb, nv = granule_batch_from_native(sp, sl, ss, me)
        pg = parse_stream_granules(data)
        pb, pv = pack_granule_batch(pg)
        assert nv == pv == len(pg)
        for f in nb._fields:
            assert np.array_equal(
                np.asarray(getattr(nb, f)), np.asarray(getattr(pb, f))
            ), f


def test_native_index_matches_python(fixture_classic_lame):
    from go_mp3_tpu.native.lib import index_stream

    starts, bpf, sr = index_stream(fixture_classic_lame)
    d = Decoder(fixture_classic_lame, backend="golden")
    assert bpf == d.bytes_per_frame()
    assert sr == d.sample_rate()
    assert len(starts) * bpf == d.length()
    assert list(starts) == d._frame_starts


def test_exact_backend_full_compliance(fixture_classic_lame, fixture_mpeg2):
    """C++ exact DSP vs float64 golden: within 1 LSB everywhere."""
    for data in (fixture_classic_lame, fixture_mpeg2):
        de = Decoder(data, backend="exact")
        dg = Decoder(data, backend="golden")
        n = 60 * de.bytes_per_frame()
        a = np.frombuffer(de.read(n), "<i2").astype(np.int32)
        b = np.frombuffer(dg.read(n), "<i2").astype(np.int32)
        assert len(a) == len(b)
        assert np.abs(a - b).max() <= 1


def test_exact_backend_deterministic_seek(fixture_classic_lame):
    d = Decoder(fixture_classic_lame, backend="exact")
    d.seek(11 * 4608)
    first = d.read(4608)
    d.seek(0)
    d.read(64)
    d.seek(11 * 4608)
    assert d.read(4608) == first


def test_device_backend_uses_native_and_matches_exact(fixture_classic_lame):
    dn = Decoder(fixture_classic_lame, backend="device")
    assert dn._native is not None
    de = Decoder(fixture_classic_lame, backend="exact")
    a = np.frombuffer(dn.read(30 * 4608), "<i2").astype(np.int32)
    b = np.frombuffer(de.read(30 * 4608), "<i2").astype(np.int32)
    assert np.abs(a - b).max() <= 2


def test_native_parse_from_offset(fixture_classic_lame):
    """NativeParser(data, offset) parses from a frame boundary (seek path)."""
    from go_mp3_tpu.native.lib import NativeParser, index_stream

    starts, bpf, _ = index_stream(fixture_classic_lame)
    p = NativeParser(fixture_classic_lame, offset=int(starts[10]))
    n, sp, sl, ss, me = p.parse(8)
    assert n == 8
    full = NativeParser(fixture_classic_lame)
    fsp, _, _, _ = full.parse_all()
    gr_per_frame = bpf // (576 * 4)
    # The first frames after an offset restart decode against an empty bit
    # reservoir (exactly the reference's seek warm-up situation); after two
    # frames (> 511 reservoir bytes) the spectra converge to the linear parse.
    warm = 2 * gr_per_frame
    lin = fsp[10 * gr_per_frame : 10 * gr_per_frame + 8]
    assert np.array_equal(sp[warm:8], lin[warm:8])
