"""Bit reader semantics (model: internal/bits/bits_test.go)."""

from go_mp3_tpu.bitstream.bits import BitReader, append


def test_single_bits_msb_first():
    r = BitReader(bytes([0b10110001]))
    assert [r.bit() for _ in range(8)] == [1, 0, 1, 1, 0, 0, 0, 1]


def test_multi_bit_reads():
    r = BitReader(bytes([0xAB, 0xCD, 0xEF]))
    assert r.bits(4) == 0xA
    assert r.bits(8) == 0xBC
    assert r.bits(12) == 0xDEF


def test_bits_zero_is_noop():
    r = BitReader(b"\xff")
    assert r.bits(0) == 0
    assert r.bit_pos_total() == 0


def test_cross_byte_unaligned():
    r = BitReader(bytes([0b11001010, 0b10110101]))
    assert r.bits(3) == 0b110
    assert r.bits(7) == 0b0101010
    assert r.bits(6) == 0b110101


def test_out_of_bounds_is_sticky_and_non_advancing():
    r = BitReader(b"\xff")
    assert r.bits(8) == 0xFF
    pos = r.bit_pos_total()
    assert r.bits(1) == 0
    assert r.err is not None
    assert r.bit_pos_total() == pos  # did not advance
    assert r.bit() == 0
    assert r.bit_pos_total() == pos


def test_bits_overrun_midway():
    r = BitReader(b"\xff")
    r.bits(4)
    assert r.bits(8) == 0  # only 4 remain
    assert r.err is not None
    assert r.bit_pos_total() == 4


def test_set_pos_and_bit_pos():
    r = BitReader(bytes([0x00, 0xF0]))
    r.set_pos(8)
    assert r.bits(4) == 0xF
    assert r.bit_pos_total() == 12


def test_tail_and_append():
    r = BitReader(b"abcdef")
    assert r.tail(3) == b"def"
    assert r.tail(0) == b""
    r2 = append(r, b"gh")
    assert r2.vec == b"abcdefgh"
    assert r2.bit_pos_total() == 0


def test_len_in_bytes():
    assert BitReader(b"1234").len_in_bytes() == 4
