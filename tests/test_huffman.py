"""Huffman codebook integrity + decode semantics (model: huffman_test.go)."""

import pytest

from go_mp3_tpu.bitstream.bits import BitReader
from go_mp3_tpu.bitstream.huffman import decode
from go_mp3_tpu.bitstream.huffman_tables import TABLES


def bits_from_string(s: str) -> BitReader:
    s = s.replace(" ", "")
    padded = s + "0" * (-len(s) % 8)
    data = bytes(
        int(padded[i : i + 8], 2) for i in range(0, len(padded), 8)
    )
    return BitReader(data)


def test_all_codebooks_prefix_free_and_complete():
    seen = set()
    for codebook, linbits in TABLES:
        if codebook is None:
            continue
        if id(codebook) in seen:
            continue
        seen.add(id(codebook))
        kraft = sum(2.0 ** -length for length, _, _, _ in codebook)
        assert abs(kraft - 1.0) < 1e-12
        # prefix-freeness: no codeword is a prefix of another
        codes = sorted((length, code) for length, code, _, _ in codebook)
        for i, (l1, c1) in enumerate(codes):
            for l2, c2 in codes[i + 1 :]:
                if l2 > l1 and (c2 >> (l2 - l1)) == c1:
                    pytest.fail(f"prefix violation: ({l1},{c1}) < ({l2},{c2})")


def test_table1_known_codewords():
    """ISO 11172-3 Table B.7 codebook 1: (0,0)=1, (1,0)=01, (1,1)=000, (0,1)=001."""
    assert decode(bits_from_string("1"), 1)[:2] == (0, 0)
    assert decode(bits_from_string("01"), 1)[:2] == (1, 0)
    assert decode(bits_from_string("000"), 1)[:2] == (1, 1)
    assert decode(bits_from_string("001"), 1)[:2] == (0, 1)


def test_sign_bits():
    # (1,0) = "01", then sign bit 1 for x -> -1
    r = bits_from_string("01" + "1")
    assert decode(r, 1)[:2] == (-1, 0)
    # (1,1) = "000", signs x=1 (neg), y=0 (pos)
    r = bits_from_string("000" + "1" + "0")
    assert decode(r, 1)[:2] == (-1, 1)


def test_empty_tables_consume_nothing():
    for t in (0, 4, 14):
        r = bits_from_string("10101010")
        assert decode(r, t) == (0, 0, 0, 0)
        assert r.bit_pos_total() == 0


def test_linbits_escape():
    """Table 16 has linbits=1: x==15 consumes one extra magnitude bit."""
    codebook, linbits = TABLES[16]
    assert linbits == 1
    # find the (15, 0) codeword
    entry = next(e for e in codebook if e[2] == 15 and e[3] == 0)
    length, code, x, y = entry
    code_str = format(code, f"0{length}b")
    # escape bit = 1 -> x = 15 + 1 = 16, sign bit 0 -> positive
    r = bits_from_string(code_str + "1" + "0")
    got = decode(r, 16)
    assert got[:2] == (16, 0)
    # table 23 shares the codebook with linbits=13
    r = bits_from_string(code_str + "1" * 13 + "0")
    got = decode(r, 23)
    assert got[:2] == (15 + (1 << 13) - 1, 0)


def test_count1_quadruples():
    """Table 33 is the fixed 4-bit book: value bits are (v,w,x,y), each
    nonzero value followed by its sign bit."""
    # all zeros: "1111"? codebook 33 maps 4-bit codes; find code for value 0
    codebook, _ = TABLES[33]
    by_value = {y: (length, code) for length, code, x, y in codebook}
    l0, c0 = by_value[0]
    r = bits_from_string(format(c0, f"0{l0}b"))
    assert decode(r, 33) == (0, 0, 0, 0)
    # value 0b1111 = all ones, with sign bits 1,0,1,0 -> v=-1,w=1,x=-1,y=1
    l15, c15 = by_value[15]
    r = bits_from_string(format(c15, f"0{l15}b") + "1010")
    x, y, v, w = decode(r, 33)
    assert (v, w, x, y) == (-1, 1, -1, 1)


def test_table32_quadruple_book():
    codebook, _ = TABLES[32]
    # codebook 32 ("A") also packs values in y
    values = sorted(y for _, _, _, y in codebook)
    assert values == list(range(16))


def test_exhausted_reader_sets_sticky_error():
    r = BitReader(b"")
    x, y, v, w = decode(r, 1)
    # walker over sticky zeros lands on the all-zeros path's leaf
    assert r.err is not None


def test_roundtrip_all_books():
    """Encode each codeword then decode it back (with positive signs)."""
    for t in range(34):
        entry = TABLES[t]
        if entry[0] is None:
            continue
        codebook, linbits = entry
        for length, code, x, y in codebook:
            s = format(code, f"0{length}b")
            if t > 31:
                v_, w_, x_, y_ = (y >> 3) & 1, (y >> 2) & 1, (y >> 1) & 1, y & 1
                s += "0" * (v_ + w_ + x_ + y_)
                got_x, got_y, got_v, got_w = decode(bits_from_string(s), t)
                assert (got_v, got_w, got_x, got_y) == (v_, w_, x_, y_)
            else:
                if linbits and x == 15:
                    s += "0" * linbits
                if x:
                    s += "0"
                if linbits and y == 15:
                    s += "0" * linbits
                if y:
                    s += "0"
                got_x, got_y, _, _ = decode(bits_from_string(s), t)
                assert (got_x, got_y) == (x, y), (t, length, code)
