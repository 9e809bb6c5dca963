"""Namespace stub for the vendored ``google.protobuf`` mini-runtime.

This container has no protobuf wheel and no network, so pyspark 4's
``transformWithStateInPandas`` worker protocol (whose generated
``StateMessage_pb2`` module imports ``google.protobuf``) could never run
here. The ``protobuf`` subpackage is a CLEAN-ROOM, pure-Python subset of
the protobuf runtime — wire format per the public protobuf encoding spec
(https://protobuf.dev/programming-guides/encoding/) — implementing exactly
the reflection surface protoc-generated ``*_pb2`` modules use. It is NOT
the Google protobuf distribution and carries none of its code.

If a real protobuf installation exists, it wins: keep this directory off
``sys.path`` ahead of site-packages in that case.
"""

__path__ = __import__("pkgutil").extend_path(__path__, __name__)
