"""Unit tests for the vendored pure-Python protobuf shim
(vendor/pbshim): wire-format roundtrips, proto3 presence semantics,
unknown-field skipping, and the loud NotImplementedError guards on the
unimplemented subset. The PROTOCOL oracle is the live
transformWithStateInPandas stream in tests/test_streaming.py — the
JVM's real protobuf parser sits on the other end of every message the
shim serializes."""

from __future__ import annotations

import pytest

from ir_analyses_spark.streaming.pbvendor import ensure_protobuf_driver

pytestmark = pytest.mark.skipif(
    not ensure_protobuf_driver(), reason="no protobuf runtime available"
)


def _sm():
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    return sm


def test_generated_module_builds():
    sm = _sm()
    # file-level enum values injected at module scope, wrapper too
    assert sm.PRE_INIT == 0 and sm.CREATED == 1 and sm.CLOSED == 5
    assert sm.HandleState.INITIALIZED == 2
    # descriptor globals exist and took the _serialized_start patching
    assert sm._STATEREQUEST._serialized_start == 112


def test_known_wire_bytes():
    """Exact bytes against the protobuf spec: field1 varint, nested
    length-delimited messages — not just self-roundtrip."""
    sm = _sm()
    req = sm.StateRequest(
        version=2,
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.CREATED)
        ),
    )
    # 08 02        field 1 (version), varint 2
    # 12 04        field 2 (statefulProcessorCall), len 4
    #   0a 02      field 1 (setHandleState), len 2
    #     08 01    field 1 (state), varint 1 (CREATED)
    assert req.SerializeToString() == bytes.fromhex("080212040a020801")


def test_proto3_implicit_presence():
    sm = _sm()
    # defaults serialize to nothing...
    assert sm.StateResponse(statusCode=0, errorMessage="", value=b"").SerializeToString() == b""
    # ...but a SET (even empty) message field serializes — oneof
    # discrimination depends on it
    d = sm.ValueStateCall(stateName="", exists=sm.Exists()).SerializeToString()
    assert d == bytes.fromhex("1200")
    back = sm.ValueStateCall()
    back.ParseFromString(d)
    assert back.stateName == ""


def test_repeated_fields_roundtrip_including_empty_elements():
    sm = _sm()
    lp = sm.ListStatePut(value=[b"a", b"", b"ccc"], fetchWithArrow=True)
    back = sm.ListStatePut()
    back.ParseFromString(lp.SerializeToString())
    assert list(back.value) == [b"a", b"", b"ccc"]
    assert back.fetchWithArrow is True
    # repeated message
    it = sm.StateResponseWithMapIterator(
        kvPair=[sm.KeyAndValuePair(key=b"k1", value=b"v1"),
                sm.KeyAndValuePair(key=b"k2", value=b"v2")],
        requireNextFetch=True,
    )
    back2 = sm.StateResponseWithMapIterator()
    back2.ParseFromString(it.SerializeToString())
    assert [(p.key, p.value) for p in back2.kvPair] == [
        (b"k1", b"v1"), (b"k2", b"v2")
    ]


def test_signed_64bit_varints():
    sm = _sm()
    for v in (-1, -5, 2**62, -(2**62), 0, 1):
        back = sm.RegisterTimer()
        back.ParseFromString(
            sm.RegisterTimer(expiryTimestampMs=v).SerializeToString()
        )
        assert back.expiryTimestampMs == v, v


def test_unknown_fields_are_skipped():
    """Forward compatibility: a parser must skip fields it doesn't
    know. KeyAndValuePair(1:key, 2:value) parsed as ListStateGet
    (1:iteratorId string) ignores field 2 entirely."""
    sm = _sm()
    data = sm.KeyAndValuePair(key=b"abc", value=b"zzz").SerializeToString()
    g = sm.ListStateGet()
    g.ParseFromString(data)
    assert g.iteratorId == "abc"


def test_utf8_strings():
    sm = _sm()
    back = sm.ParseStringSchema()
    back.ParseFromString(
        sm.ParseStringSchema(schema="kēy STRING, välue LONG").SerializeToString()
    )
    assert back.schema == "kēy STRING, välue LONG"


def test_reading_never_marks_presence():
    sm = _sm()
    req = sm.StateRequest(version=1)
    _ = req.statefulProcessorCall  # read of unset submessage
    assert req.SerializeToString() == bytes.fromhex("0801")


def test_unsupported_constructs_fail_loudly():
    from google.protobuf.descriptor import FieldDescriptor

    with pytest.raises(NotImplementedError, match="proto type"):
        FieldDescriptor("f", 1, 2, 1)  # TYPE_FLOAT: outside the subset
    from google.protobuf.descriptor_pool import DescriptorPool

    # FileDescriptorProto with a dependency (field 3): refuse
    dep = b"\x1a\x05other" + b"b\x06proto3"
    with pytest.raises(NotImplementedError, match="import"):
        DescriptorPool().AddSerializedFile(dep)


def test_shim_never_shadows_real_protobuf():
    """The loader inserts the vendor dir only when google.protobuf is
    missing; once ANY protobuf imports, it returns True and changes
    nothing further."""
    import sys

    import google.protobuf  # noqa: F401

    before = list(sys.path)
    assert ensure_protobuf_driver()
    assert sys.path == before


def test_message_scoped_enum_fails_loudly():
    from google.protobuf.descriptor_pool import DescriptorPool

    # FileDescriptorProto{ message_type{ name:"M" enum_type{name:"E"} } }
    inner_enum = b"\x0a\x01E"
    msg = b"\x0a\x01M" + b"\x22" + bytes([len(inner_enum)]) + inner_enum
    blob = b"\x22" + bytes([len(msg)]) + msg + b"b\x06proto3"
    with pytest.raises(NotImplementedError, match="message-scoped enum"):
        DescriptorPool().AddSerializedFile(blob)


# ---- property battery: random values through every message type ----
try:
    from hypothesis import given, settings, strategies as st

    _HAS_HYP = True
except ImportError:  # pragma: no cover
    _HAS_HYP = False


def _value_strategy(f):
    from google.protobuf.descriptor import FieldDescriptor as FD

    if f.type in (FD.TYPE_INT32,):
        base = st.integers(min_value=-(2**31), max_value=2**31 - 1)
    elif f.type in (FD.TYPE_INT64,):
        base = st.integers(min_value=-(2**63), max_value=2**63 - 1)
    elif f.type == FD.TYPE_BOOL:
        base = st.booleans()
    elif f.type == FD.TYPE_STRING:
        base = st.text(max_size=40)
    elif f.type == FD.TYPE_BYTES:
        base = st.binary(max_size=40)
    elif f.type == FD.TYPE_ENUM:
        base = st.sampled_from([v.number for v in f.enum_type.values])
    else:  # message
        sub = f.message_type._concrete_class
        base = st.builds(lambda: sub())  # empty submessage is enough here
    if f.is_repeated:
        return st.lists(base, max_size=4)
    return base


def _canonical(msg):
    """Field dict with proto3 defaults normalized away (unset == default
    for scalars; empty repeated == unset)."""
    out = {}
    for f in msg.DESCRIPTOR.fields:
        v = getattr(msg, f.name)
        if f.is_repeated:
            if list(v):
                out[f.name] = [
                    _canonical(x) if hasattr(x, "DESCRIPTOR") else x
                    for x in v
                ]
        elif f.type == 11:  # message: presence-tracked
            if f.name in msg._values:
                out[f.name] = _canonical(v)
        elif v != f.default_value():
            out[f.name] = v
    return out


def _is_shim() -> bool:
    import google.protobuf

    return getattr(google.protobuf, "__version__", "").endswith(
        "shim-proto3-subset"
    )


if _HAS_HYP:

    @pytest.mark.skipif(
        not _is_shim(),
        reason="property battery exercises shim internals "
        "(default_value()/message._values); under the real protobuf "
        "runtime the live tws stream + spec-byte tests above are the "
        "coverage (review-caught: this would crash, not test, there)",
    )
    @settings(max_examples=200, deadline=None)
    @given(data=st.data())
    def test_random_roundtrip_every_message_type(data):
        """Serialize→parse over EVERY StateMessage type with random
        field values must reproduce the canonical field content."""
        sm = _sm()
        classes = [
            v for v in vars(sm).values()
            if isinstance(v, type) and hasattr(v, "DESCRIPTOR")
        ]
        cls = data.draw(st.sampled_from(classes))
        kwargs = {}
        for f in cls.DESCRIPTOR.fields:
            if data.draw(st.booleans(), label=f"set_{f.name}"):
                kwargs[f.name] = data.draw(
                    _value_strategy(f), label=f.name
                )
        msg = cls(**kwargs)
        wire = msg.SerializeToString()
        back = cls()
        back.ParseFromString(wire)
        assert _canonical(back) == _canonical(msg)
        # determinism: re-serialization is byte-identical
        assert back.SerializeToString() == wire


def _is_shim() -> bool:
    import google.protobuf

    return "pbshim" in (google.protobuf.__file__ or "")


def _custom_cls():
    """A shim message with a repeated varint field (StateMessage.proto
    has none) to exercise packed decoding and wire-type validation."""
    from google.protobuf.descriptor import Descriptor, FieldDescriptor
    from google.protobuf.message import Message

    fields = [
        FieldDescriptor(
            "vals", 1, FieldDescriptor.TYPE_INT64,
            FieldDescriptor.LABEL_REPEATED,
        ),
        FieldDescriptor(
            "one", 2, FieldDescriptor.TYPE_INT64,
            FieldDescriptor.LABEL_OPTIONAL,
        ),
        FieldDescriptor(
            "name", 3, FieldDescriptor.TYPE_STRING,
            FieldDescriptor.LABEL_OPTIONAL,
        ),
    ]
    d = Descriptor("Packy", "t.Packy", fields, [])
    cls = type("Packy", (Message,), {"DESCRIPTOR": d})
    d._concrete_class = cls
    return cls


def test_packed_repeated_varints_decode():
    """r8 ADVICE: proto3 serializers default repeated scalars to PACKED
    (one length-delimited payload of varints); consuming the length
    prefix as a value would silently corrupt the field."""
    if not _is_shim():
        pytest.skip("real protobuf active; shim internals not in play")
    cls = _custom_cls()
    m = cls()
    # field 1 packed: tag 0a, len 3, varints [1, 300]
    m.ParseFromString(bytes.fromhex("0a0301ac02"))
    assert list(m.vals) == [1, 300]
    # packed payloads accumulate across occurrences, and mix with the
    # unpacked form (tag 08) — both legal on the wire
    m2 = cls()
    m2.ParseFromString(bytes.fromhex("0a0301ac02" "0805"))
    assert list(m2.vals) == [1, 300, 5]


def test_wire_type_mismatch_raises():
    """A declared-type/wire-type mismatch must raise, not misparse."""
    if not _is_shim():
        pytest.skip("real protobuf active; shim internals not in play")
    from google.protobuf.message import DecodeError

    cls = _custom_cls()
    # non-repeated varint field sent length-delimited
    with pytest.raises(DecodeError, match="wire type 2"):
        cls().ParseFromString(bytes.fromhex("120161"))
    # string field sent as a varint
    with pytest.raises(DecodeError, match="wire type 0"):
        cls().ParseFromString(bytes.fromhex("1805"))
    # message field sent as a varint
    sm = _sm()
    req = sm.StateRequest()
    with pytest.raises(DecodeError, match="wire type 0"):
        # field 2 (statefulProcessorCall) with wire type 0: tag 0x10
        req.ParseFromString(bytes.fromhex("1001"))
