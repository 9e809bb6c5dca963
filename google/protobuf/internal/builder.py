"""Gencode hooks: materialize descriptor globals, message classes, and
top-level enum value constants into a ``*_pb2`` module's namespace —
the two calls every modern protoc Python gencode makes."""

from __future__ import annotations

from google.protobuf.message import Message


def _descriptor_globals(desc, globals_dict, prefix=""):
    key = f"_{prefix}{desc.name.upper()}"
    globals_dict[key] = desc
    for e in desc.enum_types:
        globals_dict[f"_{prefix}{desc.name.upper()}_{e.name.upper()}"] = e
    for nd in desc.nested_types:
        _descriptor_globals(nd, globals_dict, prefix=f"{prefix}{desc.name.upper()}_")


def BuildMessageAndEnumDescriptors(file_des, globals_dict):
    for desc in file_des.message_types_by_name.values():
        _descriptor_globals(desc, globals_dict)
    for e in file_des.enum_types_by_name.values():
        globals_dict[f"_{e.name.upper()}"] = e


def _build_class(desc, module_name, globals_dict, parent_scope=None):
    cls = type(desc.name, (Message,), {
        "DESCRIPTOR": desc,
        "__module__": module_name,
    })
    desc._concrete_class = cls
    if parent_scope is None:
        globals_dict[desc.name] = cls
    else:
        setattr(parent_scope, desc.name, cls)
    for nd in desc.nested_types:
        _build_class(nd, module_name, globals_dict, parent_scope=cls)
    return cls


def BuildTopDescriptorsAndMessages(file_des, module_name, globals_dict):
    for desc in file_des.message_types_by_name.values():
        _build_class(desc, module_name, globals_dict)
    # Top-level enums contribute BOTH the enum type name and flat value
    # constants (proto3 C++ scoping rules surface values at file scope).
    for e in file_des.enum_types_by_name.values():
        globals_dict[e.name] = e
        for v in e.values:
            globals_dict[v.name] = v.number
