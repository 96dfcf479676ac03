"""Sample-exact checkpoint/resume of a decode in progress (SURVEY.md §5:
the reference's implicit state tuple made explicit and serializable)."""

import numpy as np
import pytest

from go_mp3_tpu import Decoder

try:
    from go_mp3_tpu.native import lib as native

    HAVE_NATIVE = native.available()
except Exception:
    HAVE_NATIVE = False


def roundtrip(data: bytes, backend: str):
    d1 = Decoder(data, backend=backend)
    part1 = d1.read(7 * 4608 + 1234)  # mid-frame position
    ck = d1.checkpoint()
    rest_original = d1.read(10 * 4608)

    d2 = Decoder(data, backend=backend)
    d2.resume(ck)
    rest_resumed = d2.read(10 * 4608)
    assert rest_resumed == rest_original  # byte-identical continuation
    assert d2.tell() == d1.tell()
    return part1


def test_checkpoint_golden(fixture_classic_lame):
    roundtrip(fixture_classic_lame, "golden")


@pytest.mark.skipif(not HAVE_NATIVE, reason="native lib not built")
def test_checkpoint_exact(fixture_classic_lame):
    roundtrip(fixture_classic_lame, "exact")


def test_checkpoint_device(fixture_classic_lame):
    roundtrip(fixture_classic_lame, "device")


def test_checkpoint_python_device_path(fixture_mpeg2):
    """Force the pure-Python parser with the device DSP."""
    d1 = Decoder(fixture_mpeg2, backend="device", use_native=False)
    assert d1._native is None
    d1.read(5 * 2304)
    ck = d1.checkpoint()
    rest = d1.read(8 * 2304)
    d2 = Decoder(fixture_mpeg2, backend="device", use_native=False)
    d2.resume(ck)
    assert d2.read(8 * 2304) == rest


def test_checkpoint_beats_seek(fixture_classic_lame):
    """Resume is exact; seek only approximately recovers state (its first
    granule after the warm-up frame can differ)."""
    d = Decoder(fixture_classic_lame, backend="golden")
    d.read(20 * 4608)
    ck = d.checkpoint()
    exact_next = d.read(4608)

    d2 = Decoder(fixture_classic_lame, backend="golden")
    d2.resume(ck)
    assert d2.read(4608) == exact_next


@pytest.mark.parametrize(
    "backend",
    ["golden", "device"]
    + (["exact"] if HAVE_NATIVE else []),
)
def test_checkpoint_bytes_roundtrip(fixture_classic_lame, backend):
    """Checkpoints round-trip through the wire format (utils.state):
    byte-identical continuation after ship-to-another-decoder."""
    d = Decoder(fixture_classic_lame, backend=backend)
    d.read(3 * 4608 + 100)
    blob = d.checkpoint_bytes()
    assert isinstance(blob, bytes)
    rest = d.read(6 * 4608)

    d2 = Decoder(fixture_classic_lame, backend=backend)
    d2.resume_bytes(blob)
    assert d2.read(6 * 4608) == rest
    assert d2.tell() == d.tell()


def test_checkpoint_bytes_preserves_state_exactly(fixture_mpeg2):
    """The wire format is dtype-preserving and bit-exact on the DSP state,
    and round-trips every scalar field."""
    from go_mp3_tpu.utils.state import (
        checkpoint_from_bytes,
        checkpoint_to_bytes,
    )

    d = Decoder(fixture_mpeg2, backend="golden", use_native=False)
    d.read(5 * 2304)
    ck = d.checkpoint()
    ck2 = checkpoint_from_bytes(checkpoint_to_bytes(ck))
    kind, store, vvec = ck2["dsp"]
    assert kind == ck["dsp"][0]
    assert store.dtype == ck["dsp"][1].dtype
    assert vvec.dtype == ck["dsp"][2].dtype
    np.testing.assert_array_equal(store, ck["dsp"][1])
    np.testing.assert_array_equal(vvec, ck["dsp"][2])
    for key in ("pos", "at_end", "backend", "source_pos", "have_frame"):
        assert ck2[key] == ck[key]
    assert ck2["buf"] == bytes(ck["buf"])
    assert ck2["reservoir"] == bytes(ck["reservoir"])
