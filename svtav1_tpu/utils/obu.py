"""OBU framing (AV1 spec §5.3; reference writer:
Source/Lib/Encoder/Codec/EbEntropyCoding.c write_obu_header)."""

from __future__ import annotations

from .bitio import leb128_encode, leb128_decode

OBU_SEQUENCE_HEADER = 1
OBU_TEMPORAL_DELIMITER = 2
OBU_FRAME_HEADER = 3
OBU_TILE_GROUP = 4
OBU_METADATA = 5
OBU_FRAME = 6
OBU_REDUNDANT_FRAME_HEADER = 7
OBU_TILE_LIST = 8
OBU_PADDING = 15


def wrap_obu(obu_type: int, payload: bytes, *, temporal_id: int = 0,
             spatial_id: int = 0) -> bytes:
    """OBU header (+ extension if tid/sid nonzero) + leb128 size + payload."""
    ext = 1 if (temporal_id or spatial_id) else 0
    header = bytes([(obu_type << 3) | (ext << 2) | 0x02])  # has_size_field=1
    if ext:
        header += bytes([(temporal_id << 5) | (spatial_id << 3)])
    return header + leb128_encode(len(payload)) + payload


def parse_obus(data: bytes):
    """Yield (obu_type, temporal_id, spatial_id, payload) for each OBU."""
    pos = 0
    while pos < len(data):
        byte = data[pos]
        if byte & 0x80:
            raise ValueError("obu_forbidden_bit set")
        obu_type = (byte >> 3) & 0xF
        ext = (byte >> 2) & 1
        has_size = (byte >> 1) & 1
        pos += 1
        tid = sid = 0
        if ext:
            tid = data[pos] >> 5
            sid = (data[pos] >> 3) & 3
            pos += 1
        if has_size:
            size, pos = leb128_decode(data, pos)
        else:
            size = len(data) - pos
        yield obu_type, tid, sid, data[pos:pos + size]
        pos += size
