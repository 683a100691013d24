"""Descriptor pool of the mini-runtime: parses serialized
FileDescriptorProto blobs handed over by generated modules."""

from __future__ import annotations

from . import miniproto


class DescriptorPool:
    def __init__(self):
        self._files: dict[str, miniproto.FileDescriptor] = {}

    def AddSerializedFile(self, serialized: bytes) -> miniproto.FileDescriptor:
        fd = miniproto.parse_file_descriptor(serialized)
        self._files[fd.name] = fd
        return fd

    def FindFileByName(self, name: str) -> miniproto.FileDescriptor:
        return self._files[name]


_default = DescriptorPool()


def Default() -> DescriptorPool:
    return _default
