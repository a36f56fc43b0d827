"""Unit tests for sparkflow_spark.minipb — the from-scratch protobuf
runtime subset that un-gates transformWithStateInPandas (X25). The JVM
state server is the cross-implementation referee at query time
(tests/test_streaming.py::test_tws_executes_and_equals_batch and the
st_tws_user_stats t2); these tests pin the wire format and the
descriptor bootstrap directly against spec-derived golden bytes."""

from __future__ import annotations

import pytest

from sparkflow_spark import minipb


def test_varint_golden_values():
    for value, expect in [
        (0, b"\x00"),
        (1, b"\x01"),
        (127, b"\x7f"),
        (128, b"\x80\x01"),
        (300, b"\xac\x02"),  # the spec's worked example
        (-1, b"\xff" * 9 + b"\x01"),  # two's-complement 64-bit, 10 bytes
        (-2, b"\xfe" + b"\xff" * 8 + b"\x01"),
    ]:
        out = bytearray()
        minipb.write_varint(out, value)
        assert bytes(out) == expect, value
        got, pos = minipb.read_varint(bytes(out), 0)
        assert pos == len(out)
        assert minipb._to_signed64(got) == value


def test_zigzag():
    for v, z in [(0, 0), (-1, 1), (1, 2), (-2, 3), (2147483647, 4294967294)]:
        assert minipb._zigzag_enc(v) == z
        assert minipb._zigzag_dec(z) == v


def _pb2():
    minipb.install_if_missing()
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    return sm


def test_pb2_loads_and_exposes_enums_and_messages():
    sm = _pb2()
    assert sm.PRE_INIT == 0 and sm.CLOSED == 5
    assert sm.HandleState.Value("INITIALIZED") == sm.INITIALIZED
    assert sm.HandleState.Name(sm.TIMER_PROCESSED) == "TIMER_PROCESSED"
    # descriptor bootstrap parsed the real serialized FileDescriptorProto
    d = sm.StateRequest.DESCRIPTOR
    assert d.fields_by_name["version"].number == 1
    assert "statefulProcessorCall" in d.fields_by_name


def test_pb2_golden_wire_and_roundtrip():
    sm = _pb2()
    req = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.INITIALIZED)
        )
    )
    wire = req.SerializeToString()
    # field 2 LEN(4) { field 1 LEN(2) { field 1 varint 2 } }
    assert wire == bytes.fromhex("12040a020802")
    back = sm.StateRequest()
    back.ParseFromString(wire)
    assert back.statefulProcessorCall.setHandleState.state == sm.INITIALIZED
    # unset oneof members read as default instances, not errors
    assert back.implicitGroupingKeyRequest.setImplicitKey.key == b""


def test_pb2_oneof_last_set_wins():
    sm = _pb2()
    req = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(),
    )
    req.implicitGroupingKeyRequest = sm.ImplicitGroupingKeyRequest(
        setImplicitKey=sm.SetImplicitKey(key=b"k")
    )
    wire = req.SerializeToString()
    back = sm.StateRequest()
    back.ParseFromString(wire)
    vals = object.__getattribute__(back, "_values")
    assert "implicitGroupingKeyRequest" in vals
    assert "statefulProcessorCall" not in vals  # sibling cleared


def test_pb2_repeated_bytes_and_negative_int64():
    sm = _pb2()
    al = sm.AppendList(value=[b"", b"ab", bytes(range(5))], fetchWithArrow=True)
    back = sm.AppendList()
    back.ParseFromString(al.SerializeToString())
    assert list(back.value) == [b"", b"ab", bytes(range(5))]
    assert back.fetchWithArrow is True
    rt = sm.RegisterTimer(expiryTimestampMs=-123456789)
    back2 = sm.RegisterTimer()
    back2.ParseFromString(rt.SerializeToString())
    assert back2.expiryTimestampMs == -123456789


def test_pb2_proto3_defaults_omitted_on_wire():
    sm = _pb2()
    # plain (non-oneof) scalars at default value serialize to nothing
    assert sm.StateResponse(statusCode=0, errorMessage="", value=b"").SerializeToString() == b""
    # but parse back as defaults
    r = sm.StateResponse()
    r.ParseFromString(b"")
    assert (r.statusCode, r.errorMessage, r.value) == (0, "", b"")


def test_unknown_fields_are_skipped():
    sm = _pb2()
    # field 15 varint 7 (unknown to SetHandleState) + field 1 varint 3
    blob = bytes([15 << 3 | 0, 7, 1 << 3 | 0, 3])
    m = sm.SetHandleState()
    m.ParseFromString(blob)
    assert m.state == 3


def test_runtime_version_gate():
    from sparkflow_spark.minipb import VersionError, validate_runtime_version

    validate_runtime_version(2, 6, 33, 0, "", "x.proto")
    with pytest.raises(VersionError):
        validate_runtime_version(2, 7, 0, 0, "", "x.proto")


def test_install_takes_over_bare_namespace_package(tmp_path, monkeypatch):
    """A stray empty google/ dir (seen on TWS driver-worker paths) must
    not be mistaken for the real runtime."""
    import subprocess
    import sys

    (tmp_path / "google").mkdir()
    code = (
        "import sys; sys.path.insert(0, sys.argv[1]); sys.path.insert(0, sys.argv[2])\n"
        "import google  # namespace package from the stray dir\n"
        "assert getattr(google, '__file__', None) is None\n"
        "from sparkflow_spark.minipb import install_if_missing\n"
        "assert install_if_missing() is True\n"
        "from google.protobuf import descriptor\n"
        "assert descriptor._USE_C_DESCRIPTORS is False\n"
        "print('NAMESPACE_OK')\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code, str(tmp_path), "/root/repo"],
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert "NAMESPACE_OK" in out.stdout, out.stderr


def test_processor_pickle_is_self_contained():
    """The TWS processor must unpickle in a worker that can NOT import
    sparkflow_spark (the JVM-spawned driver worker) and must install
    protobuf at unpickle time."""
    import subprocess
    import sys
    import tempfile

    from pyspark.serializers import CloudPickleSerializer

    from sparkflow_spark.streaming.stateful import _build_user_stats_processor

    payload = CloudPickleSerializer().dumps(_build_user_stats_processor())
    with tempfile.NamedTemporaryFile(suffix=".bin", delete=False) as fh:
        fh.write(payload)
        path = fh.name
    code = (
        "import sys, pickle\n"
        "sys.modules['sparkflow_spark'] = None  # simulate unimportable repo\n"
        "obj = pickle.load(open(sys.argv[1], 'rb'))\n"
        "import google.protobuf as g\n"
        "assert g._MINIPB, 'bootstrap did not run at unpickle'\n"
        "assert type(obj).__name__ == 'UserStatsProcessor'\n"
        "print('PICKLE_OK')\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code, path],
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert "PICKLE_OK" in out.stdout, out.stderr


def test_packed_repeated_scalars_roundtrip():
    """The TWS proto has no packed fields, but the runtime claims
    proto3 semantics — pin the packed path directly with a synthetic
    descriptor: repeated int64 serializes as ONE length-delimited
    packed record and parses back, including negative values and the
    unpacked-encoding fallback on the wire."""
    from sparkflow_spark import minipb

    d = minipb.Descriptor("P", ".t.P")
    f = minipb.FieldDescriptor("xs", 1, minipb.L_REPEATED, minipb.T_INT64, "", None)
    d.fields = [f]
    d._index()
    cls = minipb.make_message_class(d)

    m = cls(xs=[0, 1, -1, 300])
    wire = m.SerializeToString()
    # tag(1, LEN) + len + [00, 01, <10-byte -1>, ac 02]
    assert wire[0] == (1 << 3) | 2
    back = cls()
    back.ParseFromString(wire)
    assert list(back.xs) == [0, 1, -1, 300]
    # a peer that encodes the same field UNPACKED must also parse
    unpacked = bytearray()
    for v in (7, 9):
        minipb.write_tag(unpacked, 1, 0)
        minipb.write_varint(unpacked, v)
    back2 = cls()
    back2.ParseFromString(bytes(unpacked))
    assert list(back2.xs) == [7, 9]


def test_submessage_write_through_and_read_purity():
    """ADVICE r10: reading an unset singular sub-message must attach it
    (``msg.sub.x = 1`` writes through like real protobuf), while a bare
    read must NOT change the serialized bytes."""
    sm = _pb2()
    # bare read of a deep unset chain leaves the wire empty
    req = sm.StateRequest()
    _ = req.statefulProcessorCall.setHandleState.state
    assert req.SerializeToString() == b""
    # mutation through the read-attached instance is visible on the wire
    req.statefulProcessorCall.setHandleState.state = sm.INITIALIZED
    assert req.SerializeToString() == bytes.fromhex("12040a020802")
    # explicit assignment of an EMPTY sub-message still serializes
    # presence (tag + len 0) — only read-attached empties are elided
    req2 = sm.StateRequest(statefulProcessorCall=sm.StatefulProcessorCall())
    assert req2.SerializeToString() == bytes.fromhex("1200")


def test_importing_stateful_module_has_no_sys_modules_side_effect():
    """ADVICE r10: merely importing the stateful module must not
    register minipb into sys.modules — installation is deferred to the
    first TWS use. Checked in a fresh interpreter so earlier tests'
    installs can't mask a regression."""
    import subprocess
    import sys

    out = subprocess.run(
        [
            sys.executable,
            "-c",
            (
                "import sys; import sparkflow_spark.streaming.stateful; "
                "assert 'google.protobuf' not in sys.modules, 'side effect!'; "
                "print('IMPORT_PURE')"
            ),
        ],
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert "IMPORT_PURE" in out.stdout, out.stderr


def test_submessage_explicit_zero_write_sets_parent_presence():
    """ADVICE r11: a sub-message whose fields were explicitly WRITTEN
    but serialize empty (proto3 implicit presence: ``state = 0``) must
    still be emitted as a zero-length present field — child mutation
    propagates SetInParent up the auto-attach chain, unlike a bare
    read, which stays invisible."""
    sm = _pb2()
    req = sm.StateRequest()
    # explicit write of the zero enum through a read-attached chain:
    # every payload serializes empty, but presence must flip all the
    # way up — golden wire: field2(len 2){ field1(len 0) }
    req.statefulProcessorCall.setHandleState.state = sm.PRE_INIT
    assert req.SerializeToString() == bytes.fromhex("12020a00")
    # the contrast pin: the same chain READ (no write) stays empty
    req2 = sm.StateRequest()
    _ = req2.statefulProcessorCall.setHandleState.state
    assert req2.SerializeToString() == b""
    # and a pickled copy keeps resolved presence without the backref
    import pickle

    clone = pickle.loads(pickle.dumps(req))
    assert clone.SerializeToString() == bytes.fromhex("12020a00")
