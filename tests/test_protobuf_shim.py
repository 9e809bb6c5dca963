"""Wire-format unit tests for the vendored ``google.protobuf`` runtime
subset (google/protobuf/*). The integration proof is
tests/test_sessions_tws.py (a real transformWithStateInPandas query whose
state protocol round-trips every message through the JVM); these pin the
encoding rules the spec fixes, so a regression fails fast with a readable
diff instead of a hung state server.
"""

from __future__ import annotations

import pyspark.sql.streaming.proto.StateMessage_pb2 as sm
import pytest

from google.protobuf import wire


def test_varint_edges():
    cases = [0, 1, 127, 128, 300, 2**32 - 1, 2**63 - 1, -1, -2**63]
    for v in cases:
        enc = wire.encode_varint(v)
        dec, pos = wire.decode_varint(enc, 0)
        assert pos == len(enc)
        assert wire.to_signed64(dec) == v, v
    # negatives always encode to 10 bytes (two's-complement 64-bit)
    assert len(wire.encode_varint(-1)) == 10


def test_proto3_implicit_presence_omits_defaults():
    # statusCode=0 / errorMessage="" / value=b"" are all defaults: the
    # canonical proto3 encoding of this message is EMPTY.
    assert sm.StateResponse(statusCode=0, errorMessage="", value=b"").SerializeToString() == b""
    # ...and unset fields read back as defaults after a parse.
    m = sm.StateResponse()
    m.ParseFromString(b"")
    assert (m.statusCode, m.errorMessage, m.value) == (0, "", b"")


def test_oneof_empty_message_still_wires_the_case():
    r = sm.StateRequest(
        implicitGroupingKeyRequest=sm.ImplicitGroupingKeyRequest(
            removeImplicitKey=sm.RemoveImplicitKey()
        )
    )
    b = r.SerializeToString()
    assert b != b""  # the LEN-0 record must be present
    p = sm.StateRequest()
    p.ParseFromString(b)
    assert p.WhichOneof("method") == "implicitGroupingKeyRequest"
    assert p.implicitGroupingKeyRequest.WhichOneof("method") == "removeImplicitKey"


def test_oneof_set_clears_siblings():
    c = sm.ValueStateCall(stateName="s", exists=sm.Exists())
    c.get = sm.Get()
    assert c.WhichOneof("method") == "get"
    assert not c.HasField("exists")


def test_repeated_bytes_and_messages_roundtrip():
    resp = sm.StateResponseWithListGet(
        statusCode=0, value=[b"", b"a", b"bb" * 100], requireNextFetch=True
    )
    p = sm.StateResponseWithListGet()
    p.ParseFromString(resp.SerializeToString())
    assert list(p.value) == [b"", b"a", b"bb" * 100]
    assert p.requireNextFetch is True

    t = sm.StateResponseWithTimer(
        timer=[sm.TimerInfo(timestampMs=-7), sm.TimerInfo(key=b"k", timestampMs=2**40)]
    )
    p2 = sm.StateResponseWithTimer()
    p2.ParseFromString(t.SerializeToString())
    assert [x.timestampMs for x in p2.timer] == [-7, 2**40]
    assert p2.timer[1].key == b"k"


def test_unknown_fields_skipped():
    # field 99 varint + a real statusCode
    raw = wire.encode_tag(99, wire.VARINT) + wire.encode_varint(5)
    raw += wire.encode_tag(1, wire.VARINT) + wire.encode_varint(3)
    m = sm.StateResponse()
    m.ParseFromString(raw)
    assert m.statusCode == 3


def test_enum_constants_and_signed_int32():
    assert sm.PRE_INIT == 0 and sm.CLOSED == 5
    s = sm.SetHandleState(state=sm.TIMER_PROCESSED)
    p = sm.SetHandleState()
    p.ParseFromString(s.SerializeToString())
    assert p.state == sm.TIMER_PROCESSED
    # int32 negative survives the 10-byte varint path
    r = sm.StateResponse(statusCode=-2)
    p2 = sm.StateResponse()
    p2.ParseFromString(r.SerializeToString())
    assert p2.statusCode == -2


def test_unset_submessage_read_is_default_not_presence():
    m = sm.StateRequest()
    assert m.statefulProcessorCall.WhichOneof("method") is None  # read ok
    assert m.SerializeToString() == b""  # ...and did not set presence


def test_wrong_field_name_raises():
    with pytest.raises(AttributeError):
        sm.StateResponse(nonexistent=1)
