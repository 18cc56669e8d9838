"""Avro object-container codec: golden bytes straight from the Avro 1.11
spec, plus structural round-trips.  No Spark involved — this is the
driver-side metadata layer under the Iceberg source."""

from __future__ import annotations

import io
import json
import zlib

import pytest

from nil_spark.sources import avro_codec as av


# ---------------------------------------------------------------- primitives
@pytest.mark.parametrize(
    "value,expect",
    [
        (0, b"\x00"),
        (-1, b"\x01"),
        (1, b"\x02"),
        (-2, b"\x03"),
        (2, b"\x04"),
        (-64, b"\x7f"),
        (64, b"\x80\x01"),
        (-65, b"\x81\x01"),
    ],
)
def test_zigzag_varint_golden(value, expect):
    """The exact example table from the Avro spec's binary encoding section."""
    buf = bytearray()
    av._write_long(buf, value)
    assert bytes(buf) == expect
    assert av._read_long(io.BytesIO(expect)) == value


def test_record_payload_golden(tmp_path):
    """A {long a=27, string b='foo'} record must serialize to
    0x36 0x06 'foo' — the worked example in the Avro specification."""
    schema = {
        "type": "record",
        "name": "test",
        "fields": [{"name": "a", "type": "long"}, {"name": "b", "type": "string"}],
    }
    buf = bytearray()
    av._encode(buf, schema, {"a": 27, "b": "foo"}, {})
    assert bytes(buf) == b"\x36\x06foo"

    p = tmp_path / "golden.avro"
    av.write_container(str(p), schema, [{"a": 27, "b": "foo"}], codec="null")
    raw = p.read_bytes()
    assert raw.startswith(b"Obj\x01")
    # block = count(1)=0x02, size(5)=0x0a, payload, sync(16B) at the tail
    assert raw.endswith(b"\x02\x0a\x36\x06foo" + b"nil_spark_avro_0")
    meta, recs = av.read_container(str(p))
    assert recs == [{"a": 27, "b": "foo"}]
    assert json.loads(meta["avro.schema"]) == schema


def test_deflate_codec_is_raw_deflate(tmp_path):
    schema = {"type": "record", "name": "r", "fields": [{"name": "x", "type": "string"}]}
    rows = [{"x": "abc" * 50} for _ in range(100)]
    p = tmp_path / "d.avro"
    pn = tmp_path / "n.avro"
    av.write_container(str(p), schema, rows, codec="deflate")
    av.write_container(str(pn), schema, rows, codec="null")
    _meta, out = av.read_container(str(p))
    assert out == rows
    assert p.stat().st_size < pn.stat().st_size  # actually compressed
    # raw DEFLATE: the bytes after the block's two varints must NOT carry
    # the 2-byte zlib wrapper (0x78 ..), and must inflate with wbits=-15
    raw = p.read_bytes()
    sync = b"nil_spark_avro_0"
    block = raw[raw.index(sync) + 16 :]
    src = io.BytesIO(block)
    av._read_long(src)  # count
    size = av._read_long(src)
    body = src.read(size)
    assert zlib.decompress(body, wbits=-15)  # raises if zlib-wrapped


def test_complex_types_roundtrip(tmp_path):
    schema = {
        "type": "record",
        "name": "outer",
        "fields": [
            {"name": "u", "type": ["null", "long"]},
            {"name": "arr", "type": {"type": "array", "items": "int"}},
            {"name": "m", "type": {"type": "map", "values": "string"}},
            {"name": "fx", "type": {"type": "fixed", "name": "f16", "size": 4}},
            {
                "name": "en",
                "type": {"type": "enum", "name": "col", "symbols": ["RED", "BLUE"]},
            },
            {"name": "b", "type": "bytes"},
            {"name": "d", "type": "double"},
            {"name": "fl", "type": "float"},
            {"name": "bo", "type": "boolean"},
            # named-type reference reuse (the Iceberg manifest pattern)
            {"name": "fx2", "type": "f16"},
        ],
    }
    rows = [
        {
            "u": None,
            "arr": [1, -2, 3],
            "m": {"k1": "v1", "k2": "v2"},
            "fx": b"\x01\x02\x03\x04",
            "en": "BLUE",
            "b": b"\x00\xff",
            "d": 1.5,
            "fl": -2.25,
            "bo": True,
            "fx2": b"abcd",
        },
        {
            "u": 42,
            "arr": [],
            "m": {},
            "fx": b"\xde\xad\xbe\xef",
            "en": "RED",
            "b": b"",
            "d": -0.0,
            "fl": 0.0,
            "bo": False,
            "fx2": b"wxyz",
        },
    ]
    p = tmp_path / "c.avro"
    av.write_container(str(p), schema, rows, metadata={"custom": "yes"})
    meta, out = av.read_container(str(p))
    assert out == rows
    assert meta["custom"] == "yes"


def test_negative_block_count_decode():
    """Writers may emit array/map blocks as (-count, byte_size, items);
    the decoder must honor that form (Avro spec, complex-type encoding)."""
    schema = {"type": "array", "items": "long"}
    buf = bytearray()
    av._write_long(buf, -2)  # two items, size-prefixed block
    inner = bytearray()
    av._encode(inner, "long", 7, {})
    av._encode(inner, "long", 9, {})
    av._write_long(buf, len(inner))
    buf.extend(inner)
    av._write_long(buf, 0)
    assert av._decode(io.BytesIO(bytes(buf)), schema, {}) == [7, 9]


def test_corrupt_sync_marker_raises(tmp_path):
    schema = {"type": "record", "name": "r", "fields": [{"name": "x", "type": "long"}]}
    p = tmp_path / "ok.avro"
    av.write_container(str(p), schema, [{"x": 1}], codec="null")
    raw = bytearray(p.read_bytes())
    raw[-1] ^= 0xFF  # flip last sync byte
    bad = tmp_path / "bad.avro"
    bad.write_bytes(bytes(raw))
    with pytest.raises(ValueError, match="sync marker"):
        av.read_container(str(bad))
