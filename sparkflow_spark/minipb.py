"""minipb — a minimal, from-scratch, pure-python protobuf runtime.

WHY THIS EXISTS. Spark 4's ``transformWithStateInPandas`` (the state-v2
streaming API) speaks a protobuf-framed protocol to the JVM state
server: pyspark ships a generated ``StateMessage_pb2.py`` that needs
the public ``google.protobuf`` runtime, and this build environment has
no package index to install it from (and no wheel on disk to vendor).
Rather than leave the whole TWS surface gated (rounds 1-9 did), this
module implements the SUBSET of the protobuf-python API that pyspark's
TWS client layer actually uses, from the public wire-format spec
(https://protobuf.dev/programming-guides/encoding/) — NO google code is
copied; the JVM side keeps running real protobuf, which makes every
round-trip through the state server a cross-implementation conformance
check of this file.

Covered (everything ``stateful_processor_api_client.py`` +
``value/list/map_state_client.py`` + ``StateMessage_pb2.py`` touch):

- ``descriptor_pool.Default().AddSerializedFile`` — parses the
  serialized FileDescriptorProto embedded in the pb2 (itself decoded
  with this file's wire reader against the public descriptor.proto
  field numbers) into message/enum/oneof descriptors;
- ``internal.builder.BuildMessageAndEnumDescriptors`` /
  ``BuildTopDescriptorsAndMessages`` — synthesize message classes and
  module-level enum constants into the pb2's globals;
- message kwargs construction (scalars, bytes, enums, nested messages,
  repeated fields from python sequences, oneof tracking),
  default-value reads, ``SerializeToString`` / ``ParseFromString``;
- ``runtime_version.ValidateProtobufRuntimeVersion`` (PUBLIC domain,
  major-version gate) and a no-op ``symbol_database``.

NOT covered (nothing in the TWS path needs them): maps, groups,
extensions, unknown-field retention, Any/Well-Known-Types, text format,
reflection beyond attribute access, required-field validation.

``install_if_missing()`` registers these as importable
``google.protobuf.*`` modules ONLY when the real wheel is absent, so
installing the official runtime always wins untouched.
"""

from __future__ import annotations

import struct
import sys
import threading
import types

__version__ = "6.33.0"  # wire- and API-compatible subset; see module doc

# ---------------------------------------------------------------------------
# wire primitives (public encoding spec)
# ---------------------------------------------------------------------------

_WIRE_VARINT, _WIRE_I64, _WIRE_LEN, _WIRE_I32 = 0, 1, 2, 5


def write_varint(out: bytearray, value: int) -> None:
    value &= 0xFFFFFFFFFFFFFFFF  # two's-complement 64-bit, 10 bytes max
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result & 0xFFFFFFFFFFFFFFFF, pos
        shift += 7
        if shift >= 70:
            raise ValueError("minipb: malformed varint")


def _to_signed64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def _to_signed32(v: int) -> int:
    v &= 0xFFFFFFFF
    return v - (1 << 32) if v >= (1 << 31) else v


def _zigzag_enc(v: int) -> int:
    return (v << 1) ^ (v >> 63)


def _zigzag_dec(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def write_tag(out: bytearray, field_number: int, wire_type: int) -> None:
    write_varint(out, (field_number << 3) | wire_type)


def skip_field(buf: bytes, pos: int, wire_type: int) -> int:
    if wire_type == _WIRE_VARINT:
        _, pos = read_varint(buf, pos)
    elif wire_type == _WIRE_I64:
        pos += 8
    elif wire_type == _WIRE_LEN:
        n, pos = read_varint(buf, pos)
        pos += n
    elif wire_type == _WIRE_I32:
        pos += 4
    else:  # groups (3/4) never appear in modern protos
        raise ValueError(f"minipb: unsupported wire type {wire_type}")
    return pos


def _iter_fields(buf: bytes):
    """Yield (field_number, wire_type, value, next_pos) generically —
    value is the raw int for varint/i32/i64 and the bytes slice for
    length-delimited. The descriptor-proto parser below is built on
    this, so the bootstrap needs no schema."""
    pos, n = 0, len(buf)
    while pos < n:
        key, pos = read_varint(buf, pos)
        fnum, wt = key >> 3, key & 7
        if wt == _WIRE_VARINT:
            val, pos = read_varint(buf, pos)
        elif wt == _WIRE_LEN:
            ln, pos = read_varint(buf, pos)
            val = buf[pos : pos + ln]
            pos += ln
        elif wt == _WIRE_I64:
            val = buf[pos : pos + 8]
            pos += 8
        elif wt == _WIRE_I32:
            val = buf[pos : pos + 4]
            pos += 4
        else:
            raise ValueError(f"minipb: unsupported wire type {wt}")
        yield fnum, wt, val


# ---------------------------------------------------------------------------
# descriptor model + FileDescriptorProto bootstrap parser
# ---------------------------------------------------------------------------

# FieldDescriptorProto.type values (public descriptor.proto)
(
    T_DOUBLE, T_FLOAT, T_INT64, T_UINT64, T_INT32, T_FIXED64, T_FIXED32,
    T_BOOL, T_STRING, T_GROUP, T_MESSAGE, T_BYTES, T_UINT32, T_ENUM,
    T_SFIXED32, T_SFIXED64, T_SINT32, T_SINT64,
) = range(1, 19)

L_OPTIONAL, L_REQUIRED, L_REPEATED = 1, 2, 3

_SCALAR_DEFAULTS = {
    T_DOUBLE: 0.0, T_FLOAT: 0.0, T_INT64: 0, T_UINT64: 0, T_INT32: 0,
    T_FIXED64: 0, T_FIXED32: 0, T_BOOL: False, T_STRING: "", T_BYTES: b"",
    T_UINT32: 0, T_ENUM: 0, T_SFIXED32: 0, T_SFIXED64: 0, T_SINT32: 0,
    T_SINT64: 0,
}

_PACKABLE = {
    T_DOUBLE, T_FLOAT, T_INT64, T_UINT64, T_INT32, T_FIXED64, T_FIXED32,
    T_BOOL, T_UINT32, T_ENUM, T_SFIXED32, T_SFIXED64, T_SINT32, T_SINT64,
}


class FieldDescriptor:
    __slots__ = (
        "name", "number", "label", "type", "type_name", "oneof_index",
        "message_type", "enum_type",
    )

    def __init__(self, name, number, label, ftype, type_name, oneof_index):
        self.name = name
        self.number = number
        self.label = label
        self.type = ftype
        self.type_name = type_name      # fully-qualified ".pkg.Msg" for 11/14
        self.oneof_index = oneof_index  # None when not in a oneof
        self.message_type = None        # resolved Descriptor
        self.enum_type = None


class Descriptor:
    """Message descriptor. Deliberately open (plain attributes): the
    generated pb2 assigns ``_serialized_start``/``_serialized_end``."""

    def __init__(self, name, full_name):
        self.name = name
        self.full_name = full_name
        self.fields: list[FieldDescriptor] = []
        self.oneofs: list[str] = []
        self.nested_types: list[Descriptor] = []
        self.enum_types: list[EnumDescriptor] = []
        self.fields_by_number: dict[int, FieldDescriptor] = {}
        self.fields_by_name: dict[str, FieldDescriptor] = {}
        self._concrete_class = None

    def _index(self) -> None:
        self.fields_by_number = {f.number: f for f in self.fields}
        self.fields_by_name = {f.name: f for f in self.fields}


class EnumDescriptor:
    def __init__(self, name, full_name):
        self.name = name
        self.full_name = full_name
        self.values: list[tuple[str, int]] = []


class FileDescriptor:
    def __init__(self, name, package):
        self.name = name
        self.package = package
        self.message_types: list[Descriptor] = []
        self.enum_types: list[EnumDescriptor] = []
        self.serialized_pb = b""
        self._loaded_options = None


def _parse_enum_proto(buf: bytes, prefix: str) -> EnumDescriptor:
    ed = EnumDescriptor("", "")
    vals = []
    for fnum, _wt, val in _iter_fields(buf):
        if fnum == 1:
            ed.name = val.decode()
        elif fnum == 2:  # EnumValueDescriptorProto
            vname, vnum = "", 0
            for f2, _w2, v2 in _iter_fields(val):
                if f2 == 1:
                    vname = v2.decode()
                elif f2 == 2:
                    vnum = _to_signed32(v2)
            vals.append((vname, vnum))
    ed.full_name = f"{prefix}.{ed.name}"
    ed.values = vals
    return ed


def _parse_field_proto(buf: bytes) -> FieldDescriptor:
    name = type_name = ""
    number = label = ftype = 0
    oneof_index = None
    for fnum, _wt, val in _iter_fields(buf):
        if fnum == 1:
            name = val.decode()
        elif fnum == 3:
            number = _to_signed32(val)
        elif fnum == 4:
            label = _to_signed32(val)
        elif fnum == 5:
            ftype = _to_signed32(val)
        elif fnum == 6:
            type_name = val.decode()
        elif fnum == 9:
            oneof_index = _to_signed32(val)
    return FieldDescriptor(name, number, label, ftype, type_name, oneof_index)


def _parse_message_proto(buf: bytes, prefix: str) -> Descriptor:
    name = ""
    fields, nested, enums, oneofs = [], [], [], []
    raw_nested, raw_enums = [], []
    for fnum, _wt, val in _iter_fields(buf):
        if fnum == 1:
            name = val.decode()
        elif fnum == 2:
            fields.append(_parse_field_proto(val))
        elif fnum == 3:
            raw_nested.append(val)
        elif fnum == 4:
            raw_enums.append(val)
        elif fnum == 8:  # OneofDescriptorProto
            oname = ""
            for f2, _w2, v2 in _iter_fields(val):
                if f2 == 1:
                    oname = v2.decode()
            oneofs.append(oname)
    full = f"{prefix}.{name}"
    d = Descriptor(name, full)
    d.fields = fields
    d.oneofs = oneofs
    d.nested_types = [_parse_message_proto(b, full) for b in raw_nested]
    d.enum_types = [_parse_enum_proto(b, full) for b in raw_enums]
    d._index()
    return d


def parse_file_descriptor(serialized: bytes) -> FileDescriptor:
    """Decode a serialized FileDescriptorProto with the public
    descriptor.proto field numbers (name=1, package=2, message_type=4,
    enum_type=5) — the same bootstrap real protobuf performs with its
    C++/compiled descriptor."""
    name = package = ""
    raw_msgs, raw_enums = [], []
    for fnum, _wt, val in _iter_fields(serialized):
        if fnum == 1:
            name = val.decode()
        elif fnum == 2:
            package = val.decode()
        elif fnum == 4:
            raw_msgs.append(val)
        elif fnum == 5:
            raw_enums.append(val)
    fd = FileDescriptor(name, package)
    prefix = f".{package}" if package else ""
    fd.message_types = [_parse_message_proto(b, prefix) for b in raw_msgs]
    fd.enum_types = [_parse_enum_proto(b, prefix) for b in raw_enums]
    fd.serialized_pb = serialized

    # resolve message/enum type references (single-file scope — the TWS
    # proto has no imports; cross-file refs would need a pool lookup)
    by_full: dict[str, object] = {}

    def _walk(d: Descriptor):
        by_full[d.full_name] = d
        for e in d.enum_types:
            by_full[e.full_name] = e
        for nd in d.nested_types:
            _walk(nd)

    for d in fd.message_types:
        _walk(d)
    for e in fd.enum_types:
        by_full[e.full_name] = e

    def _resolve(d: Descriptor):
        for f in d.fields:
            if f.type == T_MESSAGE:
                f.message_type = by_full.get(f.type_name)
                if f.message_type is None:
                    raise ValueError(f"minipb: unresolved type {f.type_name}")
            elif f.type == T_ENUM:
                f.enum_type = by_full.get(f.type_name)
        for nd in d.nested_types:
            _resolve(nd)

    for d in fd.message_types:
        _resolve(d)
    return fd


# ---------------------------------------------------------------------------
# message runtime
# ---------------------------------------------------------------------------


class Message:
    """Instances hold values in ``_values`` keyed by field name;
    presence = key in dict. Reads of absent fields return proto3
    defaults. Reading an absent singular sub-message attaches a cached
    instance (so ``msg.sub.x = 1`` writes through, like real protobuf);
    ``_auto`` tracks read-attached names so serialization elides them
    while they are still empty — a bare read never changes the wire.
    Mutating an auto-attached sub-message (even to values that
    serialize empty, e.g. ``msg.sub.x = 0`` under proto3 implicit
    presence) propagates a SetInParent signal up the ``_parent`` chain,
    clearing each ancestor's ``_auto`` entry — so an explicitly-written
    empty sub-message is emitted as a zero-length present field, like
    real protobuf (r11 ADVICE)."""

    DESCRIPTOR: Descriptor = None  # set on subclasses

    __slots__ = ("_values", "_auto", "_parent")

    def __init__(self, **kwargs):
        object.__setattr__(self, "_values", {})
        object.__setattr__(self, "_auto", set())
        object.__setattr__(self, "_parent", None)
        for k, v in kwargs.items():
            if v is None:
                continue  # protobuf-python treats None kwargs as unset
            setattr(self, k, v)

    # -- attribute protocol ------------------------------------------------
    def __getattr__(self, name):
        # only called when not found normally (slots → always for fields)
        d = type(self).DESCRIPTOR
        f = d.fields_by_name.get(name) if d else None
        if f is None:
            raise AttributeError(f"{type(self).__name__} has no field {name!r}")
        vals = object.__getattribute__(self, "_values")
        if name in vals:
            return vals[name]
        if f.label == L_REPEATED:
            lst: list = []
            vals[name] = lst  # mutable default container, like protobuf's
            return lst
        if f.type == T_MESSAGE:
            # Cache-and-attach on first read so ``msg.sub.x = 1`` writes
            # through (real protobuf semantics) instead of mutating a
            # detached temporary. The field name is recorded in ``_auto``:
            # SerializeToString elides auto-attached sub-messages that are
            # still empty, so a mere read never changes the wire bytes.
            sub = f.message_type._concrete_class()
            vals[name] = sub
            object.__getattribute__(self, "_auto").add(name)
            object.__setattr__(sub, "_parent", (self, name))
            return sub
        return _SCALAR_DEFAULTS[f.type]

    def __setattr__(self, name, value):
        d = type(self).DESCRIPTOR
        f = d.fields_by_name.get(name)
        if f is None:
            raise AttributeError(f"{type(self).__name__} has no field {name!r}")
        if f.label == L_REPEATED:
            value = list(value)
        elif f.type == T_MESSAGE:
            if not isinstance(value, Message):
                raise TypeError(f"{name} expects a message, got {type(value)}")
        elif f.type == T_BOOL:
            value = bool(value)
        elif f.type == T_STRING:
            if isinstance(value, bytes):
                value = value.decode("utf-8")
        elif f.type == T_BYTES:
            value = bytes(value)
        vals = object.__getattribute__(self, "_values")
        auto = object.__getattribute__(self, "_auto")
        if f.oneof_index is not None:
            # setting one member clears its siblings
            for other in d.fields:
                if other.oneof_index == f.oneof_index and other.name != name:
                    vals.pop(other.name, None)
                    auto.discard(other.name)
        vals[name] = value
        auto.discard(name)  # explicit set → explicit presence
        self._set_in_parent()

    def _set_in_parent(self) -> None:
        """SetInParent semantics: any mutation of this message marks it
        present in its auto-attaching parent (recursively), so a chain
        like ``a.b.c.x = 0`` flips presence for ``b`` and ``c`` even
        when every serialized payload is empty."""
        ref = object.__getattribute__(self, "_parent")
        if ref is None:
            return
        parent, name = ref
        object.__getattribute__(parent, "_auto").discard(name)
        parent._set_in_parent()

    def __eq__(self, other):
        return (
            type(self) is type(other)
            and self.SerializeToString() == other.SerializeToString()
        )

    # -- pickle: drop the parent backref (it would drag the whole tree
    # and create tuple-mediated cycles); a pickled copy is detached,
    # with presence state already resolved into _values/_auto.
    def __getstate__(self):
        return {
            "_values": object.__getattribute__(self, "_values"),
            "_auto": object.__getattribute__(self, "_auto"),
        }

    def __setstate__(self, state):
        object.__setattr__(self, "_values", state["_values"])
        object.__setattr__(self, "_auto", state["_auto"])
        object.__setattr__(self, "_parent", None)

    def __repr__(self):
        vals = object.__getattribute__(self, "_values")
        inner = ", ".join(f"{k}={v!r}" for k, v in vals.items())
        return f"{type(self).__name__}({inner})"

    # -- wire --------------------------------------------------------------
    def SerializeToString(self) -> bytes:
        out = bytearray()
        d = type(self).DESCRIPTOR
        vals = object.__getattribute__(self, "_values")
        auto = object.__getattribute__(self, "_auto")
        for f in sorted(d.fields, key=lambda x: x.number):
            if f.name not in vals:
                continue
            v = vals[f.name]
            if (
                f.name in auto
                and f.label != L_REPEATED
                and f.type == T_MESSAGE
                and not v.SerializeToString()
            ):
                # sub-message attached by a read and never mutated: a bare
                # read must not flip the field's wire presence
                continue
            if f.label == L_REPEATED:
                if not v:
                    continue
                if f.type in _PACKABLE:
                    # proto3 default: packed
                    payload = bytearray()
                    for item in v:
                        _write_scalar(payload, f.type, item)
                    write_tag(out, f.number, _WIRE_LEN)
                    write_varint(out, len(payload))
                    out += payload
                else:
                    for item in v:
                        _write_field(out, f, item)
                continue
            # singular: emit iff explicitly set AND (in a oneof, a
            # message, or != default) — matches google's proto3
            # implicit-presence output for this API's usage
            if (
                f.oneof_index is None
                and f.type != T_MESSAGE
                and v == _SCALAR_DEFAULTS[f.type]
            ):
                continue
            _write_field(out, f, v)
        return bytes(out)

    def ParseFromString(self, data: bytes) -> int:
        object.__getattribute__(self, "_values").clear()
        object.__getattribute__(self, "_auto").clear()
        self._merge(bytes(data))
        return len(data)

    def _merge(self, buf: bytes) -> None:
        d = type(self).DESCRIPTOR
        vals = object.__getattribute__(self, "_values")
        pos, n = 0, len(buf)
        while pos < n:
            key, pos = read_varint(buf, pos)
            fnum, wt = key >> 3, key & 7
            f = d.fields_by_number.get(fnum)
            if f is None:
                pos = skip_field(buf, pos, wt)
                continue
            if f.label == L_REPEATED and f.type in _PACKABLE and wt == _WIRE_LEN:
                ln, pos = read_varint(buf, pos)
                end = pos + ln
                lst = vals.setdefault(f.name, [])
                while pos < end:
                    item, pos = _read_scalar(buf, pos, f.type)
                    lst.append(item)
                continue
            value, pos = _read_field(buf, pos, f, wt)
            if f.label == L_REPEATED:
                vals.setdefault(f.name, []).append(value)
            else:
                if f.oneof_index is not None:
                    for other in d.fields:
                        if (
                            other.oneof_index == f.oneof_index
                            and other.name != f.name
                        ):
                            vals.pop(other.name, None)
                vals[f.name] = value
                object.__getattribute__(self, "_auto").discard(f.name)

    def ByteSize(self) -> int:
        return len(self.SerializeToString())


def _write_scalar(out: bytearray, ftype: int, v) -> None:
    if ftype in (T_INT32, T_INT64, T_UINT32, T_UINT64, T_ENUM):
        write_varint(out, int(v))
    elif ftype == T_BOOL:
        write_varint(out, 1 if v else 0)
    elif ftype == T_SINT32 or ftype == T_SINT64:
        write_varint(out, _zigzag_enc(int(v)))
    elif ftype == T_DOUBLE:
        out += struct.pack("<d", float(v))
    elif ftype == T_FLOAT:
        out += struct.pack("<f", float(v))
    elif ftype in (T_FIXED64, T_SFIXED64):
        out += struct.pack("<q" if ftype == T_SFIXED64 else "<Q", int(v))
    elif ftype in (T_FIXED32, T_SFIXED32):
        out += struct.pack("<i" if ftype == T_SFIXED32 else "<I", int(v))
    else:
        raise TypeError(f"minipb: not a packable scalar type {ftype}")


def _write_field(out: bytearray, f: FieldDescriptor, v) -> None:
    t = f.type
    if t == T_MESSAGE:
        payload = v.SerializeToString()
        write_tag(out, f.number, _WIRE_LEN)
        write_varint(out, len(payload))
        out += payload
    elif t == T_STRING:
        payload = v.encode("utf-8")
        write_tag(out, f.number, _WIRE_LEN)
        write_varint(out, len(payload))
        out += payload
    elif t == T_BYTES:
        write_tag(out, f.number, _WIRE_LEN)
        write_varint(out, len(v))
        out += v
    elif t in (T_DOUBLE, T_FIXED64, T_SFIXED64):
        write_tag(out, f.number, _WIRE_I64)
        _write_scalar(out, t, v)
    elif t in (T_FLOAT, T_FIXED32, T_SFIXED32):
        write_tag(out, f.number, _WIRE_I32)
        _write_scalar(out, t, v)
    else:
        write_tag(out, f.number, _WIRE_VARINT)
        _write_scalar(out, t, v)


def _read_scalar(buf: bytes, pos: int, ftype: int):
    if ftype in (T_INT32, T_SFIXED32):
        if ftype == T_SFIXED32:
            return struct.unpack_from("<i", buf, pos)[0], pos + 4
        v, pos = read_varint(buf, pos)
        return _to_signed32(_to_signed64(v)), pos
    if ftype in (T_INT64,):
        v, pos = read_varint(buf, pos)
        return _to_signed64(v), pos
    if ftype in (T_UINT32, T_UINT64, T_ENUM):
        v, pos = read_varint(buf, pos)
        return (v & 0xFFFFFFFF) if ftype == T_UINT32 else v, pos
    if ftype == T_BOOL:
        v, pos = read_varint(buf, pos)
        return bool(v), pos
    if ftype == T_SINT32 or ftype == T_SINT64:
        v, pos = read_varint(buf, pos)
        return _zigzag_dec(v), pos
    if ftype == T_DOUBLE:
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if ftype == T_FLOAT:
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if ftype == T_FIXED64:
        return struct.unpack_from("<Q", buf, pos)[0], pos + 8
    if ftype == T_SFIXED64:
        return struct.unpack_from("<q", buf, pos)[0], pos + 8
    if ftype == T_FIXED32:
        return struct.unpack_from("<I", buf, pos)[0], pos + 4
    raise TypeError(f"minipb: unreadable scalar type {ftype}")


def _read_field(buf: bytes, pos: int, f: FieldDescriptor, wt: int):
    if f.type == T_MESSAGE:
        ln, pos = read_varint(buf, pos)
        sub = f.message_type._concrete_class()
        sub._merge(buf[pos : pos + ln])
        return sub, pos + ln
    if f.type == T_STRING:
        ln, pos = read_varint(buf, pos)
        return buf[pos : pos + ln].decode("utf-8"), pos + ln
    if f.type == T_BYTES:
        ln, pos = read_varint(buf, pos)
        return bytes(buf[pos : pos + ln]), pos + ln
    return _read_scalar(buf, pos, f.type)


def make_message_class(desc: Descriptor) -> type:
    """One concrete class per descriptor (cached on the descriptor)."""
    if desc._concrete_class is not None:
        return desc._concrete_class
    cls = type(desc.name, (Message,), {"DESCRIPTOR": desc, "__slots__": ()})
    desc._concrete_class = cls
    for nd in desc.nested_types:
        setattr(cls, nd.name, make_message_class(nd))
    for ed in desc.enum_types:
        for vname, vnum in ed.values:
            setattr(cls, vname, vnum)
    return cls


# ---------------------------------------------------------------------------
# google.protobuf-shaped facade modules
# ---------------------------------------------------------------------------


class _DescriptorPool:
    def __init__(self):
        self._files: dict[str, FileDescriptor] = {}
        self._lock = threading.Lock()

    def Add(self, fd: FileDescriptor) -> FileDescriptor:
        self._files[fd.name] = fd
        return fd

    def AddSerializedFile(self, serialized: bytes) -> FileDescriptor:
        fd = parse_file_descriptor(bytes(serialized))
        with self._lock:
            return self._files.setdefault(fd.name, fd)


_default_pool = _DescriptorPool()


class _EnumTypeWrapper:
    def __init__(self, ed: EnumDescriptor):
        self._ed = ed
        self._by_name = dict(ed.values)
        self._by_number = {n: v for v, n in ed.values}

    def Value(self, name: str) -> int:
        return self._by_name[name]

    def Name(self, number: int) -> str:
        return self._by_number[number]

    def values(self):
        return [n for _v, n in self._ed.values]

    def keys(self):
        return [v for v, _n in self._ed.values]


def _mangled(prefix: str, name: str) -> str:
    return f"{prefix}_{name.upper()}" if prefix else f"_{name.upper()}"


def build_message_and_enum_descriptors(fd: FileDescriptor, g: dict) -> None:
    def _emit(d: Descriptor, prefix: str):
        key = _mangled(prefix, d.name)
        g[key] = d
        for ed in d.enum_types:
            g[_mangled(key, ed.name)] = ed
        for nd in d.nested_types:
            _emit(nd, key)

    for ed in fd.enum_types:
        g[_mangled("", ed.name)] = ed
    for d in fd.message_types:
        _emit(d, "")


def build_top_descriptors_and_messages(
    fd: FileDescriptor, module_name: str, g: dict
) -> None:
    for d in fd.message_types:
        cls = make_message_class(d)
        cls.__module__ = module_name
        g[d.name] = cls
    for ed in fd.enum_types:
        g[ed.name] = _EnumTypeWrapper(ed)
        for vname, vnum in ed.values:
            g[vname] = vnum


class VersionError(Exception):
    pass


def validate_runtime_version(domain, major, minor, patch, suffix, location):
    # accept any 6.x gencode: the wire subset here tracks proto3
    # semantics, which are stable across 6.x public releases
    if major != 6:
        raise VersionError(
            f"minipb supports protobuf gencode major 6 only, got "
            f"{major}.{minor}.{patch} from {location}"
        )


# ---------------------------------------------------------------------------
# installer
# ---------------------------------------------------------------------------

_INSTALL_LOCK = threading.Lock()


def _new_module(name: str) -> types.ModuleType:
    m = types.ModuleType(name)
    m.__package__ = name.rsplit(".", 1)[0] if "." in name else name
    return m


def install_if_missing() -> bool:
    """Register minipb as ``google.protobuf`` IF AND ONLY IF the real
    runtime is not importable. Returns True when minipb is serving the
    name (already-installed counts), False when real protobuf exists.
    Idempotent and thread-safe; runs in both driver and executor
    workers (module import of sparkflow_spark.streaming.stateful calls
    it, and unpickling the TWS processor imports that module)."""
    with _INSTALL_LOCK:
        try:
            import google.protobuf as _gpb

            if getattr(_gpb, "_MINIPB", False):
                return True
            if getattr(_gpb, "__file__", None) is not None:
                return False  # the real runtime — never shadow it
            # importable but a bare NAMESPACE package (a stray empty
            # `google/` dir on some sys.path entry — executor work dirs
            # have been seen with one): it has no runtime inside, so
            # take the name over; drop any stale namespace submodules.
            for k in [k for k in sys.modules if k.startswith("google.protobuf")]:
                del sys.modules[k]
        except ImportError:
            pass

        g = sys.modules.get("google") or _new_module("google")
        g.__path__ = getattr(g, "__path__", [])

        pb = _new_module("google.protobuf")
        pb.__path__ = []
        pb.__version__ = __version__
        pb._MINIPB = True

        descriptor = _new_module("google.protobuf.descriptor")
        descriptor._USE_C_DESCRIPTORS = False
        descriptor.FieldDescriptor = FieldDescriptor
        descriptor.Descriptor = Descriptor
        descriptor.EnumDescriptor = EnumDescriptor
        descriptor.FileDescriptor = FileDescriptor

        descriptor_pool = _new_module("google.protobuf.descriptor_pool")
        descriptor_pool.Default = lambda: _default_pool

        runtime_version = _new_module("google.protobuf.runtime_version")

        class Domain:
            GOOGLE_INTERNAL = 1
            PUBLIC = 2

        runtime_version.Domain = Domain
        runtime_version.VersionError = VersionError
        runtime_version.ValidateProtobufRuntimeVersion = validate_runtime_version
        runtime_version.MAJOR, runtime_version.MINOR, runtime_version.PATCH = (
            6, 33, 0,
        )

        symbol_database = _new_module("google.protobuf.symbol_database")

        class _SymbolDatabase:
            def RegisterMessage(self, m):
                return m

            def RegisterFileDescriptor(self, fd):
                return fd

            def GetPrototype(self, desc):
                return make_message_class(desc)

        _sym_db = _SymbolDatabase()
        symbol_database.Default = lambda: _sym_db
        symbol_database.SymbolDatabase = _SymbolDatabase

        message_mod = _new_module("google.protobuf.message")
        message_mod.Message = Message

        class DecodeError(Exception):
            pass

        message_mod.DecodeError = DecodeError

        internal = _new_module("google.protobuf.internal")
        internal.__path__ = []
        builder = _new_module("google.protobuf.internal.builder")
        builder.BuildMessageAndEnumDescriptors = build_message_and_enum_descriptors
        builder.BuildTopDescriptorsAndMessages = build_top_descriptors_and_messages

        modules = {
            "google": g,
            "google.protobuf": pb,
            "google.protobuf.descriptor": descriptor,
            "google.protobuf.descriptor_pool": descriptor_pool,
            "google.protobuf.runtime_version": runtime_version,
            "google.protobuf.symbol_database": symbol_database,
            "google.protobuf.message": message_mod,
            "google.protobuf.internal": internal,
            "google.protobuf.internal.builder": builder,
        }
        for name, mod in modules.items():
            if name == "google" and name in sys.modules:
                continue  # keep a real/namespace google; just add .protobuf
            sys.modules[name] = mod
        g.protobuf = pb
        pb.descriptor = descriptor
        pb.descriptor_pool = descriptor_pool
        pb.runtime_version = runtime_version
        pb.symbol_database = symbol_database
        pb.message = message_mod
        pb.internal = internal
        internal.builder = builder
        return True
