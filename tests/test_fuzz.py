"""Robustness corpus: malformed inputs must never crash the decoder
(model: fuzzing_test.go — errors are fine, panics are not)."""

import random

import pytest

from go_mp3_tpu import Decoder, MP3Error
from util_synth import id3v2_tag, mpeg1_layer3_header, silent_frame


def try_decode(data: bytes) -> None:
    """NewDecoder + full read; only MP3Error-family exceptions allowed."""
    try:
        d = Decoder(data, backend="golden")
        d.read_all()
    except MP3Error:
        pass


CRAFTED = [
    b"",
    b"\xff\xfb",  # bare sync
    b"\xff\xfb\x90\x00",  # header only, no side info
    mpeg1_layer3_header().to_bytes(4, "big") + b"\x00" * 10,  # truncated side info
    # header claiming CRC but stream ends
    (mpeg1_layer3_header(protection=0)).to_bytes(4, "big") + b"\x00",
    # free-bitrate header (bitrate_index 0)
    (mpeg1_layer3_header() & ~(0xF << 12)).to_bytes(4, "big") + b"\x00" * 500,
    # reserved sampling frequency slipped past sync
    (0xFFFB9C00).to_bytes(4, "big") + b"\x00" * 500,
    # ID3 tag with absurd size
    b"ID3\x04\x00\x00\x7f\x7f\x7f\x7f" + b"\x00" * 100,
    id3v2_tag(10),  # tag only, no audio
    # side info demanding reservoir data that doesn't exist
    silent_frame()[:4] + b"\xff" * 413,
    # max main_data_begin with garbage payload
    silent_frame()[:4] + b"\xff\xc0" + b"\xaa" * 411,
]


@pytest.mark.parametrize("idx", range(len(CRAFTED)))
def test_crafted_inputs_no_crash(idx):
    try_decode(CRAFTED[idx])


# The reference's historical crash corpus: 10 hand-minimized inputs from
# issues #3/#22/#23/#24, transcribed byte-for-byte from fuzzing_test.go:22-103
# ('0' = 0x30, Go  = \x7f). The only requirement is "no panic".
HISTORICAL = [
    # #3
    (b"\xff\xfa500000000000\xff\xff0000"
     + b"0" * 120 + b"0000"),
    (b"\xff\xfb\x100004000094\xff000000"
     + b"0" * 20
     + b"00\x7f0\xff\xee\x7f\xff\xee\x7f\xff\xff\x7f\xff\xff\xee\x7f\xff\xff0"
     + b"\xff\xff00\xff\xee\x7f\xff0000\x7f00\xff00\xee0"
     + b"000\xff000\xff\xff\xee\x7f0\xff0000\x7f\xff0"
     + b"00\xff0"),
    (b"\xff\xfb\x100004000094\xff000000"
     + b"0" * 20
     + b"00\x7f0\xff\xee\x7f\xff\xee\x7f\xff\xff\x7f\xff\xff\xee\x7f\xff\xff\x7f"
     + b"\xff\xff\x7f0\xff\xee\x7f\xff0000\x7f00\xff\xff\xee\xee0"
     + b"0\xee\x7f\xff000\xff\xff\xee\x7f0\xff0000\x7f\xff0"
     + b"0\xff\xff0"),
    (b"\xff\xfa\x1000000000000000000"
     + b"0" * 20
     + b"000000000000000000\xff\xff"
     + b"0\x7f\xff\xff\x7f\xff\xff\x7f\xff\xff\xfc0\xff\xef\xbf0\xef\xbf00"
     + b"0\xff\xee\x7f\xff\xff\x7f\xff\xff\xee\x7f\xff\xff\x7f\xff\xff\x7f\xff00"
     + b"\xff\xff00"),
    (b"\xff\xfa00000031000000000n"
     + b"s0f00000000000000000"
     + b"0" * 100
     + b"00000000\x7f\xff\xff000\xff\xee"),
    (b"\xff\xfa\x1000000000000000000"
     + b"0" * 40
     + b"00000000000000\xbf0\xef\xbf00"
     + b"0\xff\xee0\xff\xff\x7f\xff\xff\xee\x7f\xff\xff\x7f\xff\xff\x7f\xff00"
     + b"\xff0\xee0"),
    (b"\xff\xfa\x100000050000000000\x7f"
     + b"0" * 20
     + b"0000000000\xee\x7f0\xff\xff\xff\xff\x7f\xff\xff"
     + b"\xee\x7f\xff\xff\x7f\xff\xff\x7f\xff\xff\xfc\xee\xff\xef\xbf0\xef\xbf00"
     + b"0\xff\xee\x7f\xff\xff\x7f\xff\xff\xee\x7f\xff\xff\x7f\xff\xff\x7f\xff0\t"
     + b"\xff\xff\xee\xee"),
    # #22
    (b"\xff\xfa%00000000000000000"
     + b"000000000000s0000000"
     + b"0" * 80),
    # #23
    (b"\xff\xfb%S000000v000\x00\x010000"
     + b"0" * 20
     + b"0000\xf4000000000000000"
     + b"0" * 60),
    # #24
    (b"\xff\xfb0x000000\xf9000\x00\x030000"
     + b"000000000000\xf70000000"
     + b"\x900000000000000000000"
     + b"0" * 260 + b"0000000000000"),
]


@pytest.mark.parametrize("idx", range(len(HISTORICAL)))
def test_historical_crash_inputs_no_crash(idx):
    """fuzzing_test.go corpus against the Python decoder path."""
    try_decode(HISTORICAL[idx])


@pytest.mark.parametrize("idx", range(len(HISTORICAL)))
def test_historical_crash_inputs_native_no_crash(idx):
    """fuzzing_test.go corpus against the native C++ parser."""
    from go_mp3_tpu.native import lib as native

    if not native.available():
        pytest.skip("native lib not built")
    try:
        p = native.NativeParser(HISTORICAL[idx])
        p.parse_all()
        p.close()
    except (ValueError, RuntimeError):
        pass


def test_random_mutations_no_crash(fixture_classic_lame):
    """Bit-flip mutations of a real stream (deterministic seed)."""
    rng = random.Random(0xC0FFEE)
    base = bytearray(fixture_classic_lame[:40_000])
    for _ in range(25):
        mutated = bytearray(base)
        for _ in range(rng.randint(1, 50)):
            pos = rng.randrange(len(mutated))
            mutated[pos] ^= 1 << rng.randrange(8)
        try_decode(bytes(mutated))


def test_random_garbage_no_crash():
    rng = random.Random(1234)
    for size in (1, 7, 100, 5000):
        try_decode(bytes(rng.randrange(256) for _ in range(size)))


def test_truncations_no_crash(fixture_mpeg2):
    for cut in (1, 5, 100, 417, 1000, 4096):
        try_decode(fixture_mpeg2[:cut])


def test_native_parser_fuzz(fixture_classic_lame):
    """The C++ parser must survive the same corpus without crashing the
    process (errors surface as ValueError/empty output)."""
    from go_mp3_tpu.native import lib as native

    if not native.available():
        pytest.skip("native lib not built")
    rng = random.Random(99)
    base = bytearray(fixture_classic_lame[:40_000])
    inputs = [bytes(c) for c in CRAFTED]
    for _ in range(25):
        m = bytearray(base)
        for _ in range(rng.randint(1, 60)):
            pos = rng.randrange(len(m))
            m[pos] ^= 1 << rng.randrange(8)
        inputs.append(bytes(m))
    for data in inputs:
        try:
            p = native.NativeParser(data)
            p.parse_all()
            p.close()
        except (ValueError, RuntimeError):
            pass


def test_mutated_streams_native_python_parity(fixture_classic_lame, fixture_mpeg2):
    """On bit-flipped streams the C++ and Python parsers must still produce
    IDENTICAL granule records (not merely both survive): resync points,
    reservoir skips and rollback behavior all have to match."""
    import numpy as np

    from go_mp3_tpu.models.pipeline import pack_granule_batch
    from go_mp3_tpu.native import lib as native
    from go_mp3_tpu.parallel.corpus import parse_stream_granules

    if not native.available():
        pytest.skip("native lib not built")

    for base_data, seeds in (
        (fixture_classic_lame, range(12)),
        (fixture_mpeg2, range(12, 24)),
    ):
        for seed in seeds:
            rng = random.Random(seed)
            m = bytearray(base_data[:40_000])
            for _ in range(rng.randint(1, 40)):
                pos = rng.randrange(len(m))
                m[pos] ^= 1 << rng.randrange(8)
            m = bytes(m)
            try:
                pg = parse_stream_granules(m)
                pb, _ = pack_granule_batch(pg)
            except MP3Error:
                continue  # python treats the stream as fatal: nothing to compare
            p = native.NativeParser(m)
            try:
                nsp, nsl, nss, nme = p.parse_all()
            finally:
                p.close()
            psp = np.asarray(pb.spectra)
            assert len(nsp) == len(psp), (seed, len(nsp), len(psp))
            assert np.array_equal(nsp, psp), seed
            assert np.array_equal(nsl, np.asarray(pb.scalefac_l)), seed


def test_mutated_streams_packed8_int16_parity(
    fixture_classic_lame, fixture_mpeg2
):
    """The packed8 interface (int8 tail + head plane — what the corpus
    pipeline ships) must reconstruct the int16 parse's spectra exactly on
    bit-flipped streams too, and its OverflowError fallback must only
    fire when a tail line really exceeds int8 range. (tools/fuzz_soak.py
    runs the extended version of this gate.)"""
    import numpy as np

    from go_mp3_tpu.consts import HEAD_LINES
    from go_mp3_tpu.native import lib as native
    from tools.fuzz_soak import packed8_all

    if not native.available():
        pytest.skip("native lib not built")

    for base_data, seeds in (
        (fixture_classic_lame, range(6)),
        (fixture_mpeg2, range(6, 12)),
    ):
        for seed in seeds:
            rng = random.Random(900 + seed)
            m = bytearray(base_data[:40_000])
            for _ in range(rng.randint(1, 40)):
                pos = rng.randrange(len(m))
                m[pos] ^= 1 << rng.randrange(8)
            m = bytes(m)
            p = native.NativeParser(m)
            try:
                sp16, _, _, _ = p.parse_all()
            except ValueError:
                assert packed8_all(m) in (None, "error"), seed
                continue
            finally:
                p.close()
            r = packed8_all(m)
            assert r != "error", seed
            n = sp16.shape[0]
            ref = sp16.reshape(n, 2, 576)
            if r is None:
                tail_ref = ref[:, :, HEAD_LINES:]
                assert ((tail_ref > 127) | (tail_ref < -128)).any(), seed
                continue
            spec8, _ = r
            assert spec8.shape[0] == n, seed
            assert np.array_equal(spec8, ref), seed
