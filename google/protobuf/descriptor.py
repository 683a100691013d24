"""Descriptor surface of the mini-runtime (see package docstring).
``_USE_C_DESCRIPTORS`` is what the generated module checks before
assigning layout attributes to the pure-Python descriptors."""

from __future__ import annotations

from .miniproto import Descriptor, EnumDescriptor, FieldDescriptor, FileDescriptor  # noqa: F401

_USE_C_DESCRIPTORS = False
