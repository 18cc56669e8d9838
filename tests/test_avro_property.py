"""Property fuzz: Avro codec round-trip over random values, and the
Iceberg single-value bound serialization."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from nil_spark.sources import avro_codec as av
from nil_spark.sources.iceberg import _decode_bound, _encode_bound

SCHEMA = {
    "type": "record",
    "name": "fuzz",
    "fields": [
        {"name": "i", "type": "long"},
        {"name": "s", "type": "string"},
        {"name": "u", "type": ["null", "long"]},
        {"name": "arr", "type": {"type": "array", "items": "string"}},
        {"name": "m", "type": {"type": "map", "values": "long"}},
        {"name": "b", "type": "bytes"},
        {"name": "d", "type": "double"},
        {"name": "bo", "type": "boolean"},
    ],
}

record = st.fixed_dictionaries(
    {
        "i": st.integers(min_value=-(2**63), max_value=2**63 - 1),
        "s": st.text(max_size=40),
        "u": st.none() | st.integers(min_value=-(2**40), max_value=2**40),
        "arr": st.lists(st.text(max_size=10), max_size=5),
        "m": st.dictionaries(st.text(max_size=8), st.integers(-(2**31), 2**31), max_size=4),
        "b": st.binary(max_size=30),
        "d": st.floats(allow_nan=False),
        "bo": st.booleans(),
    }
)


@settings(max_examples=60, deadline=None)
@given(st.lists(record, max_size=8), st.sampled_from(["null", "deflate"]))
def test_container_roundtrip(tmp_path_factory, rows, codec):
    p = tmp_path_factory.mktemp("avro") / "f.avro"
    av.write_container(str(p), SCHEMA, rows, codec=codec)
    _meta, out = av.read_container(str(p))
    assert out == rows


@settings(max_examples=120, deadline=None)
@given(
    st.sampled_from(["int", "long", "float", "double", "string", "boolean"]),
    st.integers(-(2**31), 2**31 - 1),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    st.text(max_size=30),
    st.booleans(),
)
def test_bound_serialization_roundtrip(t, i, f, s, b):
    v = {"int": i, "long": i, "float": f, "double": f, "string": s, "boolean": b}[t]
    enc = _encode_bound(t, v)
    assert enc is not None
    dec = _decode_bound(t, enc)
    if t in ("float", "double"):
        assert math.isclose(dec, v, rel_tol=1e-6, abs_tol=1e-30)
    else:
        assert dec == v
