"""Robustness corpus: malformed inputs must never crash the decoder
(model: fuzzing_test.go — errors are fine, panics are not)."""

import io
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
