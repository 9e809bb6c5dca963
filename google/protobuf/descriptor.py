"""Descriptor object model (reflection subset).

Gencode assigns ``_serialized_start`` / ``_serialized_end`` /
``_loaded_options`` onto these after building, so instances are plain
attribute bags rather than frozen.
"""

from __future__ import annotations

_USE_C_DESCRIPTORS = False


class FieldDescriptor:
    # Type numbers per descriptor.proto FieldDescriptorProto.Type
    TYPE_DOUBLE = 1
    TYPE_FLOAT = 2
    TYPE_INT64 = 3
    TYPE_UINT64 = 4
    TYPE_INT32 = 5
    TYPE_FIXED64 = 6
    TYPE_FIXED32 = 7
    TYPE_BOOL = 8
    TYPE_STRING = 9
    TYPE_GROUP = 10
    TYPE_MESSAGE = 11
    TYPE_BYTES = 12
    TYPE_UINT32 = 13
    TYPE_ENUM = 14
    TYPE_SFIXED32 = 15
    TYPE_SFIXED64 = 16
    TYPE_SINT32 = 17
    TYPE_SINT64 = 18

    LABEL_OPTIONAL = 1
    LABEL_REQUIRED = 2
    LABEL_REPEATED = 3

    def __init__(self, name, number, type, label, type_name="",
                 json_name="", oneof_index=None, proto3_optional=False):
        self.name = name
        self.number = number
        self.type = type
        self.label = label
        self.type_name = type_name          # ".pkg.Message" for 11/14
        self.json_name = json_name or name
        self.oneof_index = oneof_index
        self.proto3_optional = proto3_optional
        self.message_type = None            # resolved Descriptor
        self.enum_type = None               # resolved EnumDescriptor
        self.containing_oneof = None        # resolved OneofDescriptor

    @property
    def is_repeated(self):
        return self.label == self.LABEL_REPEATED

    @property
    def has_presence(self):
        """proto3 explicit presence: messages, oneof members, optionals."""
        return (self.type == self.TYPE_MESSAGE
                or self.containing_oneof is not None
                or self.proto3_optional)

    def default_value(self):
        if self.is_repeated:
            return []
        t = self.type
        if t in (self.TYPE_STRING,):
            return ""
        if t == self.TYPE_BYTES:
            return b""
        if t == self.TYPE_BOOL:
            return False
        if t in (self.TYPE_DOUBLE, self.TYPE_FLOAT):
            return 0.0
        if t == self.TYPE_MESSAGE:
            return None
        return 0


class OneofDescriptor:
    def __init__(self, name):
        self.name = name
        self.fields: list[FieldDescriptor] = []


class Descriptor:
    def __init__(self, name, full_name, fields, oneofs, file=None):
        self.name = name
        self.full_name = full_name
        self.fields = fields
        self.fields_by_name = {f.name: f for f in fields}
        self.fields_by_number = {f.number: f for f in fields}
        self.oneofs = oneofs
        self.oneofs_by_name = {o.name: o for o in oneofs}
        self.nested_types = []
        self.enum_types = []
        self.file = file
        self.containing_type = None
        self._concrete_class = None


class EnumValueDescriptor:
    def __init__(self, name, number, index):
        self.name = name
        self.number = number
        self.index = index


class EnumDescriptor:
    def __init__(self, name, full_name, values, file=None):
        self.name = name
        self.full_name = full_name
        self.values = values
        self.values_by_name = {v.name: v for v in values}
        self.values_by_number = {v.number: v for v in values}
        self.file = file


class FileDescriptor:
    def __init__(self, name, package, serialized_pb=b""):
        self.name = name
        self.package = package
        self.serialized_pb = serialized_pb
        self.message_types_by_name: dict[str, Descriptor] = {}
        self.enum_types_by_name: dict[str, EnumDescriptor] = {}
        self._loaded_options = None
