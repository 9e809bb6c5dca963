"""Symbol database shim: gencode grabs ``Default()`` at import; the
registration calls are bookkeeping our pool already does."""

from __future__ import annotations

from google.protobuf import descriptor_pool


class SymbolDatabase:
    def __init__(self, pool=None):
        self.pool = pool or descriptor_pool.Default()

    def RegisterMessage(self, cls):
        return cls

    def RegisterFileDescriptor(self, fd):
        return fd

    def GetSymbol(self, name):
        return self.pool.FindMessageTypeByName(name)._concrete_class


_default = SymbolDatabase()


def Default() -> SymbolDatabase:
    return _default
