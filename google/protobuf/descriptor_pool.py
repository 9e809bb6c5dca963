"""Descriptor pool: parse a serialized FileDescriptorProto and build the
descriptor object graph.

The parser reads descriptor.proto's own wire encoding directly (field
numbers from the public descriptor.proto schema) with the generic reader
in ``wire`` — no bootstrap gencode needed for the subset gencode uses:
file { name=1, package=2, message_type=4, enum_type=5 },
DescriptorProto { name=1, field=2, nested_type=3, enum_type=4,
oneof_decl=8 }, FieldDescriptorProto { name=1, number=3, label=4,
type=5, type_name=6, oneof_index=9, json_name=10, proto3_optional=17 },
EnumDescriptorProto { name=1, value=2 }, EnumValueDescriptorProto
{ name=1, number=2 }.
"""

from __future__ import annotations

from google.protobuf import wire
from google.protobuf.descriptor import (
    Descriptor,
    EnumDescriptor,
    EnumValueDescriptor,
    FieldDescriptor,
    FileDescriptor,
    OneofDescriptor,
)


def _parse_enum(buf: bytes, prefix: str, file) -> EnumDescriptor:
    name = ""
    values = []
    for fn, _wt, v in wire.iter_fields(buf):
        if fn == 1:
            name = v.decode()
        elif fn == 2:
            vname, vnum = "", 0
            for f2, _w2, v2 in wire.iter_fields(v):
                if f2 == 1:
                    vname = v2.decode()
                elif f2 == 2:
                    vnum = wire.to_signed32(v2)
            values.append(EnumValueDescriptor(vname, vnum, len(values)))
    return EnumDescriptor(name, f"{prefix}.{name}", values, file=file)


def _parse_field(buf: bytes) -> FieldDescriptor:
    kw = dict(name="", number=0, type=0, label=1, type_name="",
              json_name="", oneof_index=None, proto3_optional=False)
    for fn, _wt, v in wire.iter_fields(buf):
        if fn == 1:
            kw["name"] = v.decode()
        elif fn == 3:
            kw["number"] = wire.to_signed32(v)
        elif fn == 4:
            kw["label"] = v
        elif fn == 5:
            kw["type"] = v
        elif fn == 6:
            kw["type_name"] = v.decode()
        elif fn == 9:
            kw["oneof_index"] = wire.to_signed32(v)
        elif fn == 10:
            kw["json_name"] = v.decode()
        elif fn == 17:
            kw["proto3_optional"] = bool(v)
    return FieldDescriptor(**kw)


def _parse_message(buf: bytes, prefix: str, file) -> Descriptor:
    name = ""
    fields: list[FieldDescriptor] = []
    oneof_names: list[str] = []
    nested_raw: list[bytes] = []
    enums_raw: list[bytes] = []
    for fn, _wt, v in wire.iter_fields(buf):
        if fn == 1:
            name = v.decode()
        elif fn == 2:
            fields.append(_parse_field(v))
        elif fn == 3:
            nested_raw.append(v)
        elif fn == 4:
            enums_raw.append(v)
        elif fn == 8:
            oname = ""
            for f2, _w2, v2 in wire.iter_fields(v):
                if f2 == 1:
                    oname = v2.decode()
            oneof_names.append(oname)
    full_name = f"{prefix}.{name}"
    oneofs = [OneofDescriptor(n) for n in oneof_names]
    for f in fields:
        # proto3 `optional` is a synthetic single-field oneof: track
        # presence but don't treat it as a user-visible oneof.
        if f.oneof_index is not None and not f.proto3_optional:
            o = oneofs[f.oneof_index]
            f.containing_oneof = o
            o.fields.append(f)
    desc = Descriptor(name, full_name, fields, oneofs, file=file)
    desc.nested_types = [_parse_message(b, full_name, file) for b in nested_raw]
    for nd in desc.nested_types:
        nd.containing_type = desc
    desc.enum_types = [_parse_enum(b, full_name, file) for b in enums_raw]
    return desc


class DescriptorPool:
    def __init__(self):
        self._files: dict[str, FileDescriptor] = {}
        self._messages: dict[str, Descriptor] = {}
        self._enums: dict[str, EnumDescriptor] = {}

    def AddSerializedFile(self, serialized: bytes) -> FileDescriptor:
        fname, package = "", ""
        messages_raw: list[bytes] = []
        enums_raw: list[bytes] = []
        for fn, _wt, v in wire.iter_fields(serialized):
            if fn == 1:
                fname = v.decode()
            elif fn == 2:
                package = v.decode()
            elif fn == 4:
                messages_raw.append(v)
            elif fn == 5:
                enums_raw.append(v)
        if fname in self._files:
            return self._files[fname]
        file = FileDescriptor(fname, package, serialized_pb=serialized)
        prefix = package if package else ""
        for raw in messages_raw:
            d = _parse_message(raw, prefix, file)
            file.message_types_by_name[d.name] = d
            self._register_message(d)
        for raw in enums_raw:
            e = _parse_enum(raw, prefix, file)
            file.enum_types_by_name[e.name] = e
            self._enums[e.full_name] = e
        self._resolve_types()
        self._files[fname] = file
        return file

    def _register_message(self, d: Descriptor) -> None:
        self._messages[d.full_name] = d
        for e in d.enum_types:
            self._enums[e.full_name] = e
        for nd in d.nested_types:
            self._register_message(nd)

    def _resolve_types(self) -> None:
        for d in self._messages.values():
            for f in d.fields:
                if not f.type_name:
                    continue
                key = f.type_name.lstrip(".")
                if f.type == FieldDescriptor.TYPE_MESSAGE:
                    f.message_type = self._messages.get(key)
                    if f.message_type is None:
                        raise KeyError(f"unresolved message type {key}")
                elif f.type == FieldDescriptor.TYPE_ENUM:
                    f.enum_type = self._enums.get(key)
                    if f.enum_type is None:
                        raise KeyError(f"unresolved enum type {key}")

    def FindMessageTypeByName(self, full_name: str) -> Descriptor:
        return self._messages[full_name]

    def FindEnumTypeByName(self, full_name: str) -> EnumDescriptor:
        return self._enums[full_name]


_default_pool = DescriptorPool()


def Default() -> DescriptorPool:
    return _default_pool
