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


def test_checkpoint_serializable(fixture_classic_lame):
    """Checkpoints round-trip through np.savez (disk-persistable)."""
    import io

    d = Decoder(fixture_classic_lame, backend="golden")
    d.read(3 * 4608)
    ck = d.checkpoint()
    kind, a, b = ck["dsp"]
    buf = io.BytesIO()
    np.savez(
        buf,
        store=a,
        vfifo=b,
        reservoir=np.frombuffer(ck["reservoir"], np.uint8),
        buf=np.frombuffer(ck["buf"], np.uint8),
        meta=np.array([ck["pos"], ck["source_pos"], int(ck["at_end"]),
                       int(ck["have_frame"])]),
    )
    buf.seek(0)
    z = np.load(buf)
    ck2 = {
        "backend": "golden",
        "dsp": (kind, z["store"], z["vfifo"]),
        "reservoir": z["reservoir"].tobytes(),
        "buf": z["buf"].tobytes(),
        "pos": int(z["meta"][0]),
        "source_pos": int(z["meta"][1]),
        "at_end": bool(z["meta"][2]),
        "have_frame": bool(z["meta"][3]),
    }
    rest = d.read(4 * 4608)
    d2 = Decoder(fixture_classic_lame, backend="golden")
    d2.resume(ck2)
    assert d2.read(4 * 4608) == rest
