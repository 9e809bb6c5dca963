"""Reflection-backed message runtime (proto3 subset).

Semantics implemented (protobuf language guide):

* plain scalar fields: implicit presence — serialized only when != the
  proto3 default, reads return the default when unset;
* oneof members / `optional` fields / message fields: explicit presence —
  serialized whenever set, even to the default value (an empty submessage
  still emits its LEN-0 record so the receiver's oneof case is set);
* setting one member of a oneof clears its siblings;
* repeated fields: unpacked encode (one tag per element — always valid;
  packed is an encoding option, not a requirement), both packed and
  unpacked accepted on decode for numeric types;
* unknown fields on parse are skipped (not retained).
"""

from __future__ import annotations

from google.protobuf import wire
from google.protobuf.descriptor import FieldDescriptor as FD

_WIRE_BY_TYPE = {
    FD.TYPE_INT64: wire.VARINT, FD.TYPE_UINT64: wire.VARINT,
    FD.TYPE_INT32: wire.VARINT, FD.TYPE_UINT32: wire.VARINT,
    FD.TYPE_BOOL: wire.VARINT, FD.TYPE_ENUM: wire.VARINT,
    FD.TYPE_SINT32: wire.VARINT, FD.TYPE_SINT64: wire.VARINT,
    FD.TYPE_STRING: wire.LEN, FD.TYPE_BYTES: wire.LEN,
    FD.TYPE_MESSAGE: wire.LEN,
    FD.TYPE_DOUBLE: wire.I64, FD.TYPE_FIXED64: wire.I64,
    FD.TYPE_SFIXED64: wire.I64,
    FD.TYPE_FLOAT: wire.I32, FD.TYPE_FIXED32: wire.I32,
    FD.TYPE_SFIXED32: wire.I32,
}


def _encode_scalar(f, v) -> bytes:
    t = f.type
    if t in (FD.TYPE_INT32, FD.TYPE_INT64, FD.TYPE_UINT32, FD.TYPE_UINT64,
             FD.TYPE_ENUM):
        return wire.encode_varint(int(v))
    if t == FD.TYPE_BOOL:
        return wire.encode_varint(1 if v else 0)
    if t == FD.TYPE_SINT32 or t == FD.TYPE_SINT64:
        iv = int(v)
        return wire.encode_varint((iv << 1) ^ (iv >> 63))
    if t == FD.TYPE_STRING:
        b = v.encode("utf-8")
        return wire.encode_varint(len(b)) + b
    if t == FD.TYPE_BYTES:
        b = bytes(v)
        return wire.encode_varint(len(b)) + b
    if t == FD.TYPE_MESSAGE:
        b = v.SerializeToString()
        return wire.encode_varint(len(b)) + b
    if t == FD.TYPE_DOUBLE:
        import struct

        return struct.pack("<d", v)
    if t == FD.TYPE_FLOAT:
        import struct

        return struct.pack("<f", v)
    if t in (FD.TYPE_FIXED64, FD.TYPE_SFIXED64):
        import struct

        return struct.pack("<q" if t == FD.TYPE_SFIXED64 else "<Q", int(v))
    if t in (FD.TYPE_FIXED32, FD.TYPE_SFIXED32):
        import struct

        return struct.pack("<i" if t == FD.TYPE_SFIXED32 else "<I", int(v))
    raise TypeError(f"unsupported field type {t}")


def _decode_scalar(f, wt, raw, msg_cls):
    t = f.type
    if t == FD.TYPE_STRING:
        return raw.decode("utf-8")
    if t == FD.TYPE_BYTES:
        return bytes(raw)
    if t == FD.TYPE_MESSAGE:
        sub = msg_cls()
        sub.ParseFromString(bytes(raw))
        return sub
    if t == FD.TYPE_BOOL:
        return bool(raw)
    if t == FD.TYPE_INT64:
        return wire.to_signed64(raw)
    if t == FD.TYPE_INT32:
        return wire.to_signed32(raw)
    if t in (FD.TYPE_UINT32, FD.TYPE_UINT64, FD.TYPE_ENUM):
        return int(raw)
    if t == FD.TYPE_SINT32 or t == FD.TYPE_SINT64:
        return (raw >> 1) ^ -(raw & 1)
    import struct

    if t == FD.TYPE_DOUBLE:
        return struct.unpack("<d", raw)[0]
    if t == FD.TYPE_FLOAT:
        return struct.unpack("<f", raw)[0]
    if t == FD.TYPE_FIXED64:
        return struct.unpack("<Q", raw)[0]
    if t == FD.TYPE_SFIXED64:
        return struct.unpack("<q", raw)[0]
    if t == FD.TYPE_FIXED32:
        return struct.unpack("<I", raw)[0]
    if t == FD.TYPE_SFIXED32:
        return struct.unpack("<i", raw)[0]
    raise TypeError(f"unsupported field type {t}")


class Message:
    DESCRIPTOR = None  # set on generated subclasses

    def __init__(self, **kwargs):
        object.__setattr__(self, "_values", {})
        for k, v in kwargs.items():
            if v is None:
                continue
            setattr(self, k, v)

    # -- attribute protocol -------------------------------------------------
    def __getattr__(self, name):
        # only called when not found normally
        d = type(self).DESCRIPTOR
        f = d.fields_by_name.get(name) if d else None
        if f is None:
            raise AttributeError(name)
        vals = self._values
        if name in vals:
            return vals[name]
        if f.is_repeated:
            lst: list = []
            vals[name] = lst  # stored so .append()/.extend() stick
            return lst
        if f.type == FD.TYPE_MESSAGE:
            # read-only default instance; NOT stored (reading must not set
            # presence). Mutating it does not attach — gencode clients here
            # never rely on auto-vivification.
            return f.message_type._concrete_class()
        return f.default_value()

    def __setattr__(self, name, value):
        if name.startswith("_"):
            object.__setattr__(self, name, value)
            return
        d = type(self).DESCRIPTOR
        f = d.fields_by_name.get(name)
        if f is None:
            raise AttributeError(f"{d.full_name} has no field {name!r}")
        if f.is_repeated:
            value = list(value)
        if f.containing_oneof is not None:
            for sib in f.containing_oneof.fields:
                self._values.pop(sib.name, None)
        self._values[name] = value

    # -- protobuf API surface -----------------------------------------------
    def HasField(self, name):
        f = type(self).DESCRIPTOR.fields_by_name[name]
        if f.is_repeated:
            raise ValueError("HasField on repeated field")
        return name in self._values

    def WhichOneof(self, oneof_name):
        o = type(self).DESCRIPTOR.oneofs_by_name[oneof_name]
        for f in o.fields:
            if f.name in self._values:
                return f.name
        return None

    def CopyFrom(self, other):
        self._values = dict(other._values)

    def Clear(self):
        self._values = {}

    def SerializeToString(self) -> bytes:
        out = bytearray()
        for f in sorted(type(self).DESCRIPTOR.fields, key=lambda x: x.number):
            if f.name not in self._values:
                continue
            v = self._values[f.name]
            wt = _WIRE_BY_TYPE[f.type]
            if f.is_repeated:
                for item in v:
                    out += wire.encode_tag(f.number, wt)
                    out += _encode_scalar(f, item)
            else:
                if not f.has_presence and v == f.default_value():
                    continue  # proto3 implicit presence: omit defaults
                out += wire.encode_tag(f.number, wt)
                out += _encode_scalar(f, v)
        return bytes(out)

    def ParseFromString(self, data: bytes) -> int:
        self._values = {}
        self.MergeFromString(data)
        return len(data)

    def MergeFromString(self, data: bytes) -> int:
        d = type(self).DESCRIPTOR
        for fn, wt, raw in wire.iter_fields(data):
            f = d.fields_by_number.get(fn)
            if f is None:
                continue  # unknown field: skip
            sub_cls = (f.message_type._concrete_class
                       if f.type == FD.TYPE_MESSAGE else None)
            expected = _WIRE_BY_TYPE[f.type]
            if f.is_repeated:
                lst = self._values.setdefault(f.name, [])
                if wt == wire.LEN and expected == wire.VARINT:
                    # packed numeric encoding
                    pos = 0
                    while pos < len(raw):
                        u, pos = wire.decode_varint(raw, pos)
                        lst.append(_decode_scalar(f, wire.VARINT, u, sub_cls))
                else:
                    lst.append(_decode_scalar(f, wt, raw, sub_cls))
            else:
                val = _decode_scalar(f, wt, raw, sub_cls)
                if f.containing_oneof is not None:
                    for sib in f.containing_oneof.fields:
                        self._values.pop(sib.name, None)
                self._values[f.name] = val
        return len(data)

    def ByteSize(self) -> int:
        return len(self.SerializeToString())

    def __eq__(self, other):
        return (type(self) is type(other)
                and self.SerializeToString() == other.SerializeToString())

    def __repr__(self):
        d = type(self).DESCRIPTOR
        parts = ", ".join(f"{k}={v!r}" for k, v in self._values.items())
        return f"{d.name}({parts})"
