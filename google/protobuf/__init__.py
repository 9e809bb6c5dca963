"""Minimal pure-Python protobuf runtime subset (clean-room).

Scope: exactly what protoc proto3 gencode (``*_pb2.py``) and pyspark's
transformWithState state clients need —

* ``descriptor_pool.Default().AddSerializedFile(bytes)`` parsing the
  embedded ``FileDescriptorProto``,
* ``internal.builder`` materializing message classes + enum constants
  into the gencode module's globals,
* message classes with kwargs construction, attribute access,
  ``SerializeToString`` / ``ParseFromString``,
* proto3 semantics: implicit presence for plain scalars, explicit
  presence for oneof members and ``optional`` fields, unpacked repeated
  LEN fields.

Wire format follows the public encoding spec
(https://protobuf.dev/programming-guides/encoding/). Unsupported (absent
from the schemas this repo feeds through it): groups, extensions, maps,
packed repeated scalars on the encode side, unknown-field retention.
Parsing skips unknown fields.
"""

__version__ = "6.33.0"
