"""Generated-code version gate — accepted unconditionally by the
mini-runtime (see package docstring); the real library raises when
gencode is newer than the runtime."""

from __future__ import annotations


class Domain:
    GOOGLE_INTERNAL = 1
    PUBLIC = 2


def ValidateProtobufRuntimeVersion(domain, major, minor, patch, suffix, location) -> None:
    return None
