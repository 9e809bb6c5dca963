"""Protobuf wire-format primitives (encoding spec, protobuf.dev)."""

from __future__ import annotations

_MASK64 = (1 << 64) - 1

# Wire types
VARINT = 0
I64 = 1
LEN = 2
I32 = 5


def encode_varint(value: int) -> bytes:
    """Unsigned base-128 varint. Negative ints enter as two's-complement
    64-bit (the proto int32/int64 encoding: always 10 bytes for
    negatives)."""
    v = value & _MASK64
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def decode_varint(buf: bytes, pos: int) -> tuple[int, int]:
    """-> (unsigned value, new pos)."""
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result & _MASK64, pos
        shift += 7
        if shift > 70:
            raise ValueError("varint too long")


def to_signed64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def to_signed32(v: int) -> int:
    v &= (1 << 32) - 1
    return v - (1 << 32) if v >= (1 << 31) else v


def encode_tag(field_number: int, wire_type: int) -> bytes:
    return encode_varint((field_number << 3) | wire_type)


def iter_fields(buf: bytes):
    """Yield (field_number, wire_type, value) over a serialized message.
    LEN fields yield their raw bytes; VARINT the unsigned int; I64/I32
    raw fixed bytes."""
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = decode_varint(buf, pos)
        fn, wt = tag >> 3, tag & 7
        if wt == VARINT:
            v, pos = decode_varint(buf, pos)
        elif wt == LEN:
            ln, pos = decode_varint(buf, pos)
            v = buf[pos:pos + ln]
            if len(v) != ln:
                raise ValueError("truncated LEN field")
            pos += ln
        elif wt == I64:
            v = buf[pos:pos + 8]
            pos += 8
        elif wt == I32:
            v = buf[pos:pos + 4]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield fn, wt, v
