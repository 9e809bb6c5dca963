"""Gencode/runtime version handshake — accepted unconditionally: this
runtime implements the stable proto3 wire format, which is what the
check actually protects."""

from __future__ import annotations

import enum


class Domain(enum.Enum):
    GOOGLE_INTERNAL = 1
    PUBLIC = 2


MAJOR = 6
MINOR = 33
PATCH = 0


class VersionError(Exception):
    pass


def ValidateProtobufRuntimeVersion(gen_domain, gen_major, gen_minor,
                                   gen_patch, gen_suffix, location):
    return None
