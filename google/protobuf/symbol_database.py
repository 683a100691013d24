"""Symbol database of the mini-runtime. Generated modules only call
``Default()`` and keep the handle; message registration happens in
``internal.builder``."""

from __future__ import annotations

from .miniproto import _MESSAGE_REGISTRY


class SymbolDatabase:
    def GetSymbol(self, full_name: str):
        return _MESSAGE_REGISTRY["." + full_name]


_default = SymbolDatabase()


def Default() -> SymbolDatabase:
    return _default
