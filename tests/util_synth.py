"""Synthetic bitstream builders for hermetic tests (no real files needed).

Modeled on the reference's approach of constructing a minimal valid MPEG-1
Layer III frame plus tag blocks in code (trailing_tags_test.go:15-98), but
built from the header field definitions rather than copied bytes.
"""

from __future__ import annotations


def mpeg1_layer3_header(
    bitrate_index: int = 9,  # 128 kbps
    sampling_frequency: int = 0,  # 44.1 kHz
    padding: int = 0,
    mode: int = 0,  # stereo
    protection: int = 1,  # 1 = no CRC
) -> int:
    """Assemble a valid MPEG-1 Layer III header word."""
    return (
        0xFFE00000
        | (3 << 19)  # version: MPEG-1
        | (1 << 17)  # layer: III
        | (protection << 16)
        | (bitrate_index << 12)
        | (sampling_frequency << 10)
        | (padding << 9)
        | (mode << 6)
    )


def silent_frame(
    bitrate_index: int = 9,
    sampling_frequency: int = 0,
    mode: int = 0,
) -> bytes:
    """A complete, valid MPEG-1 Layer III frame whose side info is all zeros
    (part2_3_length == 0 for every granule/channel), which decodes to silence.

    At 128 kbps / 44.1 kHz this is 417 bytes (144 * 128000 / 44100 = 417)."""
    word = mpeg1_layer3_header(bitrate_index, sampling_frequency, 0, mode)
    bitrates = {9: 128000, 10: 160000, 11: 192000, 12: 224000, 14: 320000}
    freqs = {0: 44100, 1: 48000, 2: 32000}
    size = (144 * bitrates[bitrate_index]) // freqs[sampling_frequency]
    frame = bytearray(size)
    frame[0:4] = word.to_bytes(4, "big")
    return bytes(frame)


def id3v1_tag() -> bytes:
    tag = bytearray(128)
    tag[0:3] = b"TAG"
    tag[3:8] = b"title"
    return bytes(tag)


def id3v2_tag(payload_size: int) -> bytes:
    """ID3v2 block with a syncsafe-encoded payload size."""
    assert payload_size < (1 << 28)
    hdr = bytearray(10)
    hdr[0:3] = b"ID3"
    hdr[3] = 4  # version
    hdr[4] = 0
    hdr[5] = 0  # flags
    hdr[6] = (payload_size >> 21) & 0x7F
    hdr[7] = (payload_size >> 14) & 0x7F
    hdr[8] = (payload_size >> 7) & 0x7F
    hdr[9] = payload_size & 0x7F
    return bytes(hdr) + bytes(payload_size)


def apev2_tag(n_items: int = 1) -> bytes:
    """Minimal APEv2 tag block (header + tiny items + footer)."""
    items = b""
    for i in range(n_items):
        key = f"key{i}".encode()
        val = b"value"
        items += (
            len(val).to_bytes(4, "little") + (0).to_bytes(4, "little")
            + key + b"\x00" + val
        )
    size = len(items) + 32  # tag size includes footer
    def block(flags: int) -> bytes:
        return (
            b"APETAGEX"
            + (2000).to_bytes(4, "little")
            + size.to_bytes(4, "little")
            + n_items.to_bytes(4, "little")
            + flags.to_bytes(4, "little")
            + bytes(8)
        )
    return block(0xA0000000) + items + block(0x80000000)
