"""Generated-code builder entry points of the mini-runtime.

A generated ``*_pb2`` module calls, in order:
  1. ``BuildMessageAndEnumDescriptors(DESCRIPTOR, globals())`` — inject
     ``_UPPERCASENAME`` descriptor objects (the module later assigns
     ``_serialized_start/_end`` layout attributes to them), and
  2. ``BuildTopDescriptorsAndMessages(DESCRIPTOR, module_name,
     globals())`` — inject the concrete message classes, enum wrappers,
     and module-level enum value constants.
"""

from __future__ import annotations

from ..miniproto import FileDescriptor, build_message_class


def _layout_key(full_name: str, package: str) -> str:
    # ".pkg.Outer.Inner" -> "_OUTER_INNER"
    local = full_name[len(package) + 2 :] if package else full_name[1:]
    return "_" + local.replace(".", "_").upper()


def BuildMessageAndEnumDescriptors(file_desc: FileDescriptor, module_globals: dict) -> None:
    for d in file_desc.message_types:
        module_globals[_layout_key(d.full_name, file_desc.package)] = d
    for e in file_desc.enum_types:
        module_globals[_layout_key(e.full_name, file_desc.package)] = e


def BuildTopDescriptorsAndMessages(
    file_desc: FileDescriptor, module_name: str, module_globals: dict
) -> None:
    # classes first (so message-typed fields resolve in any order) ...
    for d in file_desc.message_types:
        cls = build_message_class(d)
        cls.__module__ = module_name
        if "." not in d.full_name[len(file_desc.package) + 2 :]:
            module_globals[d.name] = cls
    # ... then enums: wrapper + flat value constants, as generated code
    # exposes them (stateMessage.PRE_INIT etc.)
    for e in file_desc.enum_types:
        wrapper = type(e.name, (), dict(e.values))
        module_globals[e.name] = wrapper
        for vname, vnum in e.values.items():
            module_globals[vname] = vnum
