"""Column-level Avro and Protobuf codecs — the event-bus payload
surface (`from_avro`/`to_avro`, `from_protobuf`/`to_protobuf`).

The public Spark functions of the same names live in the external
spark-avro / spark-protobuf modules, which are NOT part of the pyspark
distribution (calling them here raises AVRO_NOT_LOADED / PROTOBUF_NOT_
LOADED — probed in this sandbox). This module provides the same
column-level API re-expressed Spark-first on what IS always available:

- **Avro**: a from-scratch implementation of the Avro BINARY encoding
  (public spec: zigzag-varint longs, little-endian IEEE floats,
  length-prefixed utf8/bytes, union-index prefix, block-encoded
  arrays) for a flat record schema given in standard Avro JSON form.
- **Protobuf**: the repo's own minipb wire runtime (sparkflow_spark/
  minipb.py — varint/zigzag/length-delimited wire format, proto3
  implicit presence), driven by a REAL serialized FileDescriptorSet —
  the same artifact `protoc --descriptor_set_out` emits and the same
  argument shape the public `from_protobuf(binaryDescriptorSet=...)`
  takes. `build_file_descriptor_set` constructs one from a field spec
  (descriptor.proto is itself a protobuf message with public field
  numbers), so fixtures need no protoc.

Spark shape — designed for the 100 TB case:

- Codec work is embarrassingly parallel per-row CPU with ZERO shuffle:
  one Arrow-batched pandas_udf stage fused into the surrounding
  projection; partitioning/pushdown of the enclosing plan is untouched.
- Python is unavoidable here by construction (there is no JVM codec on
  the classpath — that absence is the reason this module exists), so
  the kernels ride the Arrow lane: column batches cross the boundary
  once, per-row work is pure-python over one batch in memory.
- Malformed payloads follow the public API's modes: PERMISSIVE
  (default) yields an all-NULL struct row and the pipeline keeps
  flowing; FAILFAST raises with the decode position. A 100 TB ingest
  never dies on one bad kafka record unless asked to.

Parity notes vs the reference surface: the reference
(lifeomic/sparkflow) has no codec layer — this extends the declared
contract's source/function families (SURVEY §2c X181/X182).
"""

from __future__ import annotations

import functools
import json
import struct

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DataType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)


class MalformedPayload(ValueError):
    """Raised (FAILFAST) / swallowed into NULL rows (PERMISSIVE)."""


# ---------------------------------------------------------------------------
# Avro binary primitives (public spec, "binary encoding" section)


def _zigzag_encode(n: int) -> int:
    return (n << 1) if n >= 0 else (-(n << 1) - 1)


def _zigzag_decode(z: int) -> int:
    return (z >> 1) if (z & 1) == 0 else -((z >> 1) + 1)


def _write_varint(out: bytearray, z: int) -> None:
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    z = shift = 0
    while True:
        if pos >= len(buf):
            raise MalformedPayload(f"varint runs past end at byte {pos}")
        b = buf[pos]
        pos += 1
        z |= (b & 0x7F) << shift
        if not b & 0x80:
            return z, pos
        shift += 7
        if shift > 70:
            raise MalformedPayload("varint longer than 10 bytes")


def _write_long(out: bytearray, n: int) -> None:
    _write_varint(out, _zigzag_encode(n))


def _read_long(buf: bytes, pos: int) -> tuple[int, int]:
    z, pos = _read_varint(buf, pos)
    return _zigzag_decode(z), pos


# ---------------------------------------------------------------------------
# Avro schema handling (flat record, standard Avro JSON schema form)

_AVRO_SPARK_TYPES: dict[str, DataType] = {
    "boolean": BooleanType(),
    "int": IntegerType(),
    "long": LongType(),
    "float": FloatType(),
    "double": DoubleType(),
    "string": StringType(),
    "bytes": BinaryType(),
}


def _parse_avro_schema(json_schema: str | dict) -> list[tuple[str, object, bool]]:
    """-> [(field_name, avro_type, nullable)]; avro_type is the scalar
    type name or {"array": item_type}. Nullable fields are declared in
    the standard union form ["null", T] (branch 0 = null, 1 = value —
    the declaration order is part of the wire contract)."""
    sch = json.loads(json_schema) if isinstance(json_schema, str) else json_schema
    if sch.get("type") != "record" or "fields" not in sch:
        raise ValueError("avro codec supports a top-level record schema")
    out: list[tuple[str, object, bool]] = []
    for f in sch["fields"]:
        typ = f["type"]
        nullable = False
        if isinstance(typ, list):
            if len(typ) != 2 or typ[0] != "null":
                raise ValueError(f"unsupported union {typ!r} (only ['null', T])")
            typ, nullable = typ[1], True
        if isinstance(typ, dict):
            if typ.get("type") != "array":
                raise ValueError(f"unsupported complex type {typ!r}")
            items = typ["items"]
            if not isinstance(items, str) or items not in _AVRO_SPARK_TYPES:
                raise ValueError(f"unsupported array items {items!r}")
            typ = {"array": items}
        elif typ not in _AVRO_SPARK_TYPES:
            raise ValueError(f"unsupported avro type {typ!r}")
        out.append((f["name"], typ, nullable))
    return out


def avro_spark_schema(json_schema: str | dict) -> StructType:
    """The Spark schema `from_avro` yields for this Avro schema."""
    fields = []
    for name, typ, nullable in _parse_avro_schema(json_schema):
        if isinstance(typ, dict):
            dt: DataType = ArrayType(_AVRO_SPARK_TYPES[typ["array"]])
        else:
            dt = _AVRO_SPARK_TYPES[typ]
        fields.append(StructField(name, dt, True))
    return StructType(fields)


def _encode_avro_scalar(out: bytearray, v, typ: str) -> None:
    if typ == "boolean":
        out.append(1 if v else 0)
    elif typ in ("int", "long"):
        _write_long(out, int(v))
    elif typ == "float":
        out += struct.pack("<f", float(v))
    elif typ == "double":
        out += struct.pack("<d", float(v))
    elif typ == "string":
        b = str(v).encode("utf-8")
        _write_long(out, len(b))
        out += b
    elif typ == "bytes":
        b = bytes(v)
        _write_long(out, len(b))
        out += b
    else:  # pragma: no cover - schema parser rejects these
        raise ValueError(f"unsupported avro type {typ!r}")


def _decode_avro_scalar(buf: bytes, pos: int, typ: str):
    if typ == "boolean":
        if pos >= len(buf):
            raise MalformedPayload("boolean past end")
        return buf[pos] != 0, pos + 1
    if typ in ("int", "long"):
        return _read_long(buf, pos)
    if typ in ("float", "double"):
        n = 4 if typ == "float" else 8
        if pos + n > len(buf):
            raise MalformedPayload(f"{typ} past end at byte {pos}")
        return struct.unpack("<f" if typ == "float" else "<d", buf[pos : pos + n])[0], pos + n
    if typ in ("string", "bytes"):
        ln, pos = _read_long(buf, pos)
        if ln < 0 or pos + ln > len(buf):
            raise MalformedPayload(f"{typ} length {ln} past end at byte {pos}")
        raw = buf[pos : pos + ln]
        return (raw.decode("utf-8") if typ == "string" else bytes(raw)), pos + ln
    raise ValueError(f"unsupported avro type {typ!r}")  # pragma: no cover


def encode_avro_record(values: dict, fields) -> bytes:
    """Avro binary encoding of one record; `fields` from
    _parse_avro_schema. Lengths, array counts and union indexes are all
    Avro LONGS (zigzag varints) per the spec."""
    out = bytearray()
    for name, typ, nullable in fields:
        v = values.get(name)
        if nullable:
            if v is None:
                _write_long(out, 0)  # union branch 0 = null
                continue
            _write_long(out, 1)  # branch 1 = value
        elif v is None:
            raise MalformedPayload(f"null in non-nullable avro field {name!r}")
        if isinstance(typ, dict):  # array: one block then end marker
            items = list(v)
            if items:
                _write_long(out, len(items))
                for item in items:
                    _encode_avro_scalar(out, item, typ["array"])
            _write_long(out, 0)
        else:
            _encode_avro_scalar(out, v, typ)
    return bytes(out)


def decode_avro_record(b: bytes, fields) -> dict:
    """Strict decode: any overrun, bad union index, negative block
    count or TRAILING bytes is malformed."""
    pos = 0
    out: dict = {}
    for name, typ, nullable in fields:
        if nullable:
            idx, pos = _read_long(b, pos)
            if idx == 0:
                out[name] = None
                continue
            if idx != 1:
                raise MalformedPayload(f"union index {idx} in field {name!r}")
        if isinstance(typ, dict):
            items = []
            while True:
                cnt, pos = _read_long(b, pos)
                if cnt == 0:
                    break
                if cnt < 0:
                    # negative count = block-size form; size precedes items
                    cnt = -cnt
                    _, pos = _read_long(b, pos)
                for _ in range(cnt):
                    item, pos = _decode_avro_scalar(b, pos, typ["array"])
                    items.append(item)
            out[name] = items
        else:
            out[name], pos = _decode_avro_scalar(b, pos, typ)
    if pos != len(b):
        raise MalformedPayload(f"{len(b) - pos} trailing bytes after record")
    return out


# ---------------------------------------------------------------------------
# Avro column API


def to_avro(data: Column | str, jsonFormatSchema: str) -> Column:
    """Encode a struct column to Avro binary (the public to_avro shape).
    One Arrow-batched stage, no shuffle; nulls in non-nullable fields
    raise (schema violation is a job error, matching the public API)."""
    _parse_avro_schema(jsonFormatSchema)  # validate at plan time

    @pandas_udf(BinaryType())
    def _enc(batch: pd.DataFrame) -> pd.Series:
        from sparkflow_spark.codecs import (
            _clean_row,
            _parse_avro_schema,
            encode_avro_record,
        )

        flds = _parse_avro_schema(jsonFormatSchema)
        recs = batch.to_dict("records")
        return pd.Series(
            [encode_avro_record(_clean_row(r), flds) for r in recs], dtype=object
        )

    col = F.col(data) if isinstance(data, str) else data
    return _enc(col)


def from_avro(
    data: Column | str, jsonFormatSchema: str, options: dict | None = None
) -> Column:
    """Decode Avro binary to a struct column (the public from_avro
    shape). options={"mode": "PERMISSIVE"|"FAILFAST"} — PERMISSIVE
    (default) turns malformed payloads into all-NULL struct rows."""
    _parse_avro_schema(jsonFormatSchema)  # validate at plan time
    out_schema = avro_spark_schema(jsonFormatSchema)
    mode = (options or {}).get("mode", "PERMISSIVE").upper()
    if mode not in ("PERMISSIVE", "FAILFAST"):
        raise ValueError(f"unknown mode {mode!r}")

    @pandas_udf(out_schema)
    def _dec(batch: pd.Series) -> pd.DataFrame:
        from sparkflow_spark.codecs import (
            MalformedPayload,
            _parse_avro_schema,
            decode_avro_record,
        )

        flds = _parse_avro_schema(jsonFormatSchema)
        names = [n for n, _, _ in flds]
        rows = []
        for b in batch:
            if b is None:
                rows.append({n: None for n in names})
                continue
            try:
                rows.append(decode_avro_record(bytes(b), flds))
            except MalformedPayload:
                if mode == "FAILFAST":
                    raise
                rows.append({n: None for n in names})
        return pd.DataFrame(rows, columns=names)

    col = F.col(data) if isinstance(data, str) else data
    return _dec(col)


def _clean_row(r: dict) -> dict:
    """Arrow→pandas hands back numpy scalars / NaN for SQL NULL; the
    codec wants plain python values and real None."""
    out = {}
    for k, v in r.items():
        if v is None:
            out[k] = None
        elif isinstance(v, float) and v != v:  # NaN ⇒ NULL scalar
            out[k] = None
        elif hasattr(v, "item") and not isinstance(v, (bytes, bytearray, str)):
            try:
                out[k] = v.item() if not hasattr(v, "__len__") else list(v)
            except (AttributeError, ValueError):
                out[k] = v
        else:
            out[k] = v
    return out


# ---------------------------------------------------------------------------
# Protobuf: FileDescriptorSet construction (descriptor.proto is itself
# protobuf with public field numbers — the artifact protoc emits)

_PB_TYPE_ENUM = {
    "double": 1,
    "float": 2,
    "int64": 3,
    "uint64": 4,
    "int32": 5,
    "bool": 8,
    "string": 9,
    "bytes": 12,
    "uint32": 13,
    "sint32": 17,
    "sint64": 18,
}

_PB_SPARK_TYPES = {
    "double": DoubleType(),
    "float": FloatType(),
    "int64": LongType(),
    "uint64": LongType(),
    "int32": IntegerType(),
    "bool": BooleanType(),
    "string": StringType(),
    "bytes": BinaryType(),
    "uint32": IntegerType(),
    "sint32": IntegerType(),
    "sint64": LongType(),
}


def _pb_ld(out: bytearray, field: int, payload: bytes) -> None:
    _write_varint(out, field << 3 | 2)
    _write_varint(out, len(payload))
    out += payload


def _pb_vi(out: bytearray, field: int, v: int) -> None:
    _write_varint(out, field << 3 | 0)
    _write_varint(out, v)


def build_file_descriptor_set(
    message_name: str,
    fields: list[tuple[str, int, str]],
    *,
    file_name: str = "sparkflow_codec.proto",
    package: str = "",
) -> bytes:
    """Serialized FileDescriptorSet for one proto3 message with scalar
    fields [(name, number, ptype)] — byte-compatible with
    `protoc --descriptor_set_out` for the equivalent .proto file, and
    accepted by minipb.parse_file_descriptor (and by the public
    from_protobuf(binaryDescriptorSet=...) where spark-protobuf is
    available)."""
    msg = bytearray()
    _pb_ld(msg, 1, message_name.encode())  # DescriptorProto.name
    for fname, fnum, ptype in fields:
        if ptype not in _PB_TYPE_ENUM:
            raise ValueError(f"unsupported protobuf type {ptype!r}")
        fld = bytearray()
        _pb_ld(fld, 1, fname.encode())  # FieldDescriptorProto.name
        _pb_vi(fld, 3, fnum)  # .number
        _pb_vi(fld, 4, 1)  # .label = LABEL_OPTIONAL
        _pb_vi(fld, 5, _PB_TYPE_ENUM[ptype])  # .type
        _pb_ld(msg, 2, bytes(fld))  # DescriptorProto.field
    fp = bytearray()
    _pb_ld(fp, 1, file_name.encode())  # FileDescriptorProto.name
    if package:
        _pb_ld(fp, 2, package.encode())  # .package
    _pb_ld(fp, 4, bytes(msg))  # .message_type
    _pb_ld(fp, 12, b"proto3")  # .syntax
    out = bytearray()
    _pb_ld(out, 1, bytes(fp))  # FileDescriptorSet.file
    return bytes(out)


@functools.lru_cache(maxsize=64)
def _resolve_message(desc_set: bytes, message_name: str):
    """FileDescriptorSet bytes + name -> (minipb message class,
    [(field_name, ptype_enum)] in declaration order)."""
    from sparkflow_spark import minipb

    classes: dict[str, type] = {}
    for fnum, _wt, val in minipb._iter_fields(desc_set):
        if fnum != 1:
            continue
        fd = minipb.parse_file_descriptor(bytes(val))
        for d in fd.message_types:
            classes[d.name] = minipb.make_message_class(d)
            classes[d.full_name.lstrip(".")] = classes[d.name]
    if message_name not in classes:
        raise ValueError(
            f"message {message_name!r} not found in descriptor set "
            f"(has: {sorted(set(classes))})"
        )
    cls = classes[message_name]
    flds = [(f.name, f.type) for f in sorted(cls.DESCRIPTOR.fields, key=lambda x: x.number)]
    return cls, flds


def protobuf_spark_schema(binary_descriptor_set: bytes, message_name: str) -> StructType:
    """The Spark schema `from_protobuf` yields for this message."""
    cls, _ = _resolve_message(bytes(binary_descriptor_set), message_name)
    rev = {v: k for k, v in _PB_TYPE_ENUM.items()}
    fields = []
    for f in sorted(cls.DESCRIPTOR.fields, key=lambda x: x.number):
        ptype = rev.get(f.type)
        if ptype is None:
            raise ValueError(f"unsupported field type enum {f.type} ({f.name})")
        fields.append(StructField(f.name, _PB_SPARK_TYPES[ptype], True))
    return StructType(fields)


def to_protobuf(
    data: Column | str, messageName: str, binaryDescriptorSet: bytes
) -> Column:
    """Encode a struct column to protobuf wire bytes via the minipb
    runtime (proto3 implicit presence: fields at their default are
    omitted — the wire-level contract consumers replay)."""
    desc = bytes(binaryDescriptorSet)
    _resolve_message(desc, messageName)  # validate at plan time

    @pandas_udf(BinaryType())
    def _enc(batch: pd.DataFrame) -> pd.Series:
        from sparkflow_spark.codecs import _clean_row, _resolve_message

        cls, flds = _resolve_message(desc, messageName)
        out = []
        for r in batch.to_dict("records"):
            r = _clean_row(r)
            m = cls()
            for name, _t in flds:
                v = r.get(name)
                if v is not None:
                    setattr(m, name, v)
            out.append(m.SerializeToString())
        return pd.Series(out, dtype=object)

    col = F.col(data) if isinstance(data, str) else data
    return _enc(col)


def from_protobuf(
    data: Column | str,
    messageName: str,
    binaryDescriptorSet: bytes,
    options: dict | None = None,
) -> Column:
    """Decode protobuf wire bytes to a struct column. Absent proto3
    fields read back as their defaults (0 / '' / false — implicit
    presence), unknown fields are skipped: both semantics come from the
    minipb runtime and match the public decoder. Malformed payloads:
    PERMISSIVE (default) all-NULL row / FAILFAST raise."""
    desc = bytes(binaryDescriptorSet)
    out_schema = protobuf_spark_schema(desc, messageName)
    mode = (options or {}).get("mode", "PERMISSIVE").upper()
    if mode not in ("PERMISSIVE", "FAILFAST"):
        raise ValueError(f"unknown mode {mode!r}")

    @pandas_udf(out_schema)
    def _dec(batch: pd.Series) -> pd.DataFrame:
        from sparkflow_spark.codecs import MalformedPayload, _resolve_message

        cls, flds = _resolve_message(desc, messageName)
        names = [n for n, _t in flds]
        rows = []
        for b in batch:
            if b is None:
                rows.append({n: None for n in names})
                continue
            try:
                m = cls()
                m.ParseFromString(bytes(b))
                rows.append({n: getattr(m, n) for n in names})
            except MalformedPayload:
                raise  # pragma: no cover - minipb raises its own types
            except Exception:
                if mode == "FAILFAST":
                    raise MalformedPayload(f"undecodable protobuf payload ({len(b)} bytes)")
                rows.append({n: None for n in names})
        return pd.DataFrame(rows, columns=names)

    col = F.col(data) if isinstance(data, str) else data
    return _dec(col)


# ---------------------------------------------------------------------------
# DuckDB hex-algebra replay builders (the t2 oracle side): SQL that
# reproduces the wire bytes of bounded values, so the encoded payload
# hash-checks cross-engine (the same engine-portability device as the
# dHash / WAV hex replays).


def zigzag_sql(expr: str) -> str:
    return f"(CASE WHEN ({expr}) >= 0 THEN 2*({expr}) ELSE -2*({expr})-1 END)"


def varint_hex_sql(zexpr: str, max_groups: int = 5) -> str:
    """Uppercase-hex varint encoding of a NON-NEGATIVE bigint SQL
    expression < 128**max_groups (the t2 entries bound their values;
    the python codec itself handles the full 64-bit range)."""
    z = f"({zexpr})"
    parts = []
    for i in range(max_groups):
        lo = 128**i
        hi = 128 ** (i + 1)
        group = f"(({z} // {lo}) % 128)"
        with_cont = f"({group} + CASE WHEN {z} >= {hi} THEN 128 ELSE 0 END)"
        byte = f"upper(lpad(to_hex({with_cont}), 2, '0'))"
        if i == 0:
            parts.append(byte)
        else:
            parts.append(f"CASE WHEN {z} >= {lo} THEN {byte} ELSE '' END")
    return "(" + " || ".join(parts) + ")"


def avro_long_hex_sql(expr: str) -> str:
    """Hex of the Avro long encoding (zigzag varint) of a bounded
    bigint expression."""
    return varint_hex_sql(zigzag_sql(expr))


def avro_string_hex_sql(expr: str) -> str:
    """Hex of the Avro string encoding: zigzag-varint byte length then
    utf8 bytes."""
    return f"({avro_long_hex_sql(f'octet_length(encode({expr}))')} || hex(encode({expr})))"


def pb_tag_hex(field_number: int, wire_type: int) -> str:
    """Hex literal of a (single-byte) protobuf tag."""
    key = field_number << 3 | wire_type
    if key >= 128:
        raise ValueError("tag needs multi-byte varint; keep field numbers < 16")
    return f"{key:02X}"
