"""Minimal pure-stdlib Avro Object Container File codec.

Iceberg's table metadata tree stores manifest lists and manifests as
Avro container files.  This sandbox has no route to Maven Central (the
Spark Iceberg runtime jar cannot be resolved — see
``tests/iceberg_probe.py``) and no ``fastavro``/``avro`` wheel, so the
Iceberg source (``nil_spark/sources/iceberg.py``) carries its own codec,
implemented directly from the published Avro 1.11 specification
(https://avro.apache.org/docs/1.11.1/specification/):

 * container layout: ``Obj\\x01`` magic, file-metadata map (must carry
   ``avro.schema`` and may carry ``avro.codec``), 16-byte sync marker,
   then data blocks of ``(count:long, byte_size:long, payload, sync)``;
 * primitives: zig-zag varint ``int``/``long``, little-endian IEEE
   ``float``/``double``, length-prefixed ``bytes``/``string``, 1-byte
   ``boolean``, zero-byte ``null``;
 * complex: ``record`` (fields in declared order), ``array``/``map``
   (count-prefixed blocks, negative count carries a block byte size,
   zero terminates), ``union`` (branch index then value), ``enum``
   (symbol index), ``fixed`` (raw bytes);
 * codecs: ``null`` and ``deflate`` (raw DEFLATE, i.e. zlib with no
   header/checksum — ``wbits=-15``).

Decoding is writer-schema driven (the schema embedded in the container
header), which is the correct single-schema Avro read path: any
container produced by another implementation decodes as long as it uses
the type subset above — which covers every schema the Iceberg spec
defines for manifests and manifest lists.  Named-type references
(``r102`` etc., used heavily by Iceberg manifests) are resolved through
an environment of previously declared names.

This module is deliberately independent of Spark: the manifest tree is
tiny driver-side metadata (KBs per snapshot); the actual data files are
parquet and are read by executors via the normal Spark parquet source.
"""

from __future__ import annotations

import io
import json
import struct
import zlib
from typing import Any, BinaryIO, Iterable, Iterator

MAGIC = b"Obj\x01"
SYNC_SIZE = 16

_PRIMITIVES = {"null", "boolean", "int", "long", "float", "double", "bytes", "string"}


# ---------------------------------------------------------------- primitives
def _write_long(buf: bytearray, n: int) -> None:
    n = (n << 1) ^ (n >> 63)  # zig-zag (Python ints: n>>63 is -1 for negatives)
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            buf.append(b | 0x80)
        else:
            buf.append(b)
            return


def _read_long(src: BinaryIO) -> int:
    shift = 0
    acc = 0
    while True:
        raw = src.read(1)
        if not raw:
            raise EOFError("varint truncated")
        b = raw[0]
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


def _write_bytes(buf: bytearray, b: bytes) -> None:
    _write_long(buf, len(b))
    buf.extend(b)


def _read_exact(src: BinaryIO, n: int) -> bytes:
    b = src.read(n)
    if len(b) != n:
        raise EOFError(f"expected {n} bytes, got {len(b)}")
    return b


def _read_bytes(src: BinaryIO) -> bytes:
    return _read_exact(src, _read_long(src))


# ---------------------------------------------------------------- schema env
def _named(schema: Any) -> str | None:
    if isinstance(schema, dict) and schema.get("type") in ("record", "enum", "fixed"):
        return schema.get("name")
    return None


def _collect_names(schema: Any, env: dict[str, Any]) -> None:
    """Register every named type declared anywhere in ``schema``."""
    if isinstance(schema, list):
        for s in schema:
            _collect_names(s, env)
    elif isinstance(schema, dict):
        name = _named(schema)
        if name is not None:
            env[name] = schema
        t = schema.get("type")
        if t == "record":
            for f in schema["fields"]:
                _collect_names(f["type"], env)
        elif t == "array":
            _collect_names(schema["items"], env)
        elif t == "map":
            _collect_names(schema["values"], env)
        elif isinstance(t, (dict, list)):
            _collect_names(t, env)


def _resolve(schema: Any, env: dict[str, Any]) -> Any:
    """Resolve string schema references: primitives stay, names look up."""
    if isinstance(schema, str):
        if schema in _PRIMITIVES:
            return schema
        if schema in env:
            return env[schema]
        raise ValueError(f"unresolved Avro type reference: {schema!r}")
    if isinstance(schema, dict) and isinstance(schema.get("type"), (dict, list)):
        return _resolve(schema["type"], env)  # {"type": {...nested...}}
    return schema


# ---------------------------------------------------------------- encode
def _encode(buf: bytearray, schema: Any, value: Any, env: dict[str, Any]) -> None:
    schema = _resolve(schema, env)
    if isinstance(schema, list):  # union: pick the first branch the value fits
        idx = _union_branch(schema, value, env)
        _write_long(buf, idx)
        _encode(buf, schema[idx], value, env)
        return
    t = schema if isinstance(schema, str) else schema["type"]
    if t == "null":
        return
    if t == "boolean":
        buf.append(1 if value else 0)
    elif t in ("int", "long"):
        _write_long(buf, int(value))
    elif t == "float":
        buf.extend(struct.pack("<f", float(value)))
    elif t == "double":
        buf.extend(struct.pack("<d", float(value)))
    elif t == "bytes":
        _write_bytes(buf, bytes(value))
    elif t == "string":
        _write_bytes(buf, value.encode("utf-8"))
    elif t == "fixed":
        if len(value) != schema["size"]:
            raise ValueError("fixed size mismatch")
        buf.extend(value)
    elif t == "enum":
        _write_long(buf, schema["symbols"].index(value))
    elif t == "record":
        for f in schema["fields"]:
            _encode(buf, f["type"], value[f["name"]], env)
    elif t == "array":
        if value:
            _write_long(buf, len(value))
            for item in value:
                _encode(buf, schema["items"], item, env)
        _write_long(buf, 0)
    elif t == "map":
        if value:
            _write_long(buf, len(value))
            for k, v in value.items():
                _write_bytes(buf, k.encode("utf-8"))
                _encode(buf, schema["values"], v, env)
        _write_long(buf, 0)
    else:
        raise ValueError(f"unsupported Avro type: {t!r}")


def _union_branch(branches: list, value: Any, env: dict[str, Any]) -> int:
    for i, b in enumerate(branches):
        rb = _resolve(b, env)
        t = rb if isinstance(rb, str) else rb["type"]
        if value is None and t == "null":
            return i
        if value is not None and t != "null":
            return i
    raise ValueError(f"no union branch for {value!r} in {branches!r}")


# ---------------------------------------------------------------- decode
def _decode(src: BinaryIO, schema: Any, env: dict[str, Any]) -> Any:
    schema = _resolve(schema, env)
    if isinstance(schema, list):
        return _decode(src, schema[_read_long(src)], env)
    t = schema if isinstance(schema, str) else schema["type"]
    if t == "null":
        return None
    if t == "boolean":
        return _read_exact(src, 1) != b"\x00"
    if t in ("int", "long"):
        return _read_long(src)
    if t == "float":
        return struct.unpack("<f", _read_exact(src, 4))[0]
    if t == "double":
        return struct.unpack("<d", _read_exact(src, 8))[0]
    if t == "bytes":
        return _read_bytes(src)
    if t == "string":
        return _read_bytes(src).decode("utf-8")
    if t == "fixed":
        return _read_exact(src, schema["size"])
    if t == "enum":
        return schema["symbols"][_read_long(src)]
    if t == "record":
        return {f["name"]: _decode(src, f["type"], env) for f in schema["fields"]}
    if t == "array":
        out = []
        while True:
            n = _read_long(src)
            if n == 0:
                return out
            if n < 0:  # block size prefix variant
                _read_long(src)
                n = -n
            for _ in range(n):
                out.append(_decode(src, schema["items"], env))
    if t == "map":
        out = {}
        while True:
            n = _read_long(src)
            if n == 0:
                return out
            if n < 0:
                _read_long(src)
                n = -n
            for _ in range(n):
                k = _read_bytes(src).decode("utf-8")
                out[k] = _decode(src, schema["values"], env)
    raise ValueError(f"unsupported Avro type: {t!r}")


# ---------------------------------------------------------------- container
def write_container(
    path: str,
    schema: dict | str,
    records: Iterable[dict],
    *,
    codec: str = "deflate",
    metadata: dict[str, str] | None = None,
    sync: bytes = b"nil_spark_avro_0",
) -> None:
    """Write an Avro Object Container File holding ``records``.

    ``metadata`` entries land in the file-metadata map next to
    ``avro.schema``/``avro.codec`` (Iceberg requires e.g. ``schema`` and
    ``partition-spec`` keys on manifests).  The sync marker is fixed —
    the spec only requires the 16-byte marker to match between blocks,
    not to be random — which keeps table metadata byte-deterministic.
    """
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported codec {codec!r}")
    if len(sync) != SYNC_SIZE:
        raise ValueError("sync marker must be 16 bytes")
    env: dict[str, Any] = {}
    _collect_names(schema, env)

    header = bytearray()
    header.extend(MAGIC)
    meta = {"avro.schema": json.dumps(schema), "avro.codec": codec}
    meta.update(metadata or {})
    _write_long(header, len(meta))
    for k, v in meta.items():
        _write_bytes(header, k.encode("utf-8"))
        _write_bytes(header, v.encode("utf-8"))
    _write_long(header, 0)
    header.extend(sync)

    payload = bytearray()
    count = 0
    for rec in records:
        _encode(payload, schema, rec, env)
        count += 1
    body = bytes(payload)
    if codec == "deflate":
        body = zlib.compress(body, 9)[2:-4]  # strip zlib header+adler = raw DEFLATE

    block = bytearray()
    if count:
        _write_long(block, count)
        _write_long(block, len(body))
        block.extend(body)
        block.extend(sync)

    with open(path, "wb") as f:
        f.write(bytes(header) + bytes(block))


def read_container(path: str) -> tuple[dict[str, str], list[dict]]:
    """Read an Avro OCF; returns ``(file_metadata, records)``.

    ``file_metadata`` values are UTF-8 decoded (Iceberg stores only
    JSON/plain-text metadata values).
    """
    with open(path, "rb") as f:
        if _read_exact(f, 4) != MAGIC:
            raise ValueError(f"{path}: not an Avro object container file")
        raw_meta: dict[str, bytes] = {}
        while True:
            n = _read_long(f)
            if n == 0:
                break
            if n < 0:
                _read_long(f)
                n = -n
            for _ in range(n):
                k = _read_bytes(f).decode("utf-8")
                raw_meta[k] = _read_bytes(f)
        sync = _read_exact(f, SYNC_SIZE)

        schema = json.loads(raw_meta["avro.schema"])
        codec = raw_meta.get("avro.codec", b"null").decode("utf-8")
        if codec not in ("null", "deflate"):
            raise ValueError(f"unsupported codec {codec!r}")
        env: dict[str, Any] = {}
        _collect_names(schema, env)

        records: list[dict] = []
        while True:
            probe = f.read(1)
            if not probe:
                break
            f.seek(-1, io.SEEK_CUR)
            count = _read_long(f)
            size = _read_long(f)
            body = _read_exact(f, size)
            if codec == "deflate":
                body = zlib.decompress(body, wbits=-15)
            src = io.BytesIO(body)
            for _ in range(count):
                records.append(_decode(src, schema, env))
            if _read_exact(f, SYNC_SIZE) != sync:
                raise ValueError(f"{path}: sync marker mismatch (corrupt block)")
        meta = {k: v.decode("utf-8") for k, v in raw_meta.items()}
        return meta, records
