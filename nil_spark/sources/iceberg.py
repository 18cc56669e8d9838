"""Engine-native Apache Iceberg v2 table source (pure Python + Spark).

The north rule's input is "Iceberg tables of multi-turn transcripts".
The official Spark-Iceberg runtime jar is unreachable from this sandbox
(no route to Maven Central — proof in ``tests/iceberg_probe.py``), so,
like DuckDB and Trino, the engine carries its own implementation of the
published table spec (https://iceberg.apache.org/spec/, format v2):

 * table metadata: ``metadata/v<N>.metadata.json`` + ``version-hint.text``
   (Hadoop-catalog layout), snapshots with sequence numbers, snapshot
   log, metadata log;
 * manifest lists and manifests: Avro object container files written
   and read by :mod:`nil_spark.sources.avro_codec` with the spec's
   record schemas and field-ids (``manifest_file`` fields 500-517,
   ``manifest_entry``/``data_file`` fields 0-4 / 100-140);
 * data files: ordinary Spark-written parquet, mapped to the Iceberg
   schema via the spec's ``schema.name-mapping.default`` property
   (the blessed route for parquet lacking embedded field-ids);
 * row-level deletes: v2 *position delete* files (``file_path``,
   ``pos`` — spec field-ids 2147483546/2147483545), applied at read
   time merge-on-read style with a broadcast anti-join on
   ``(_metadata.file_path, _metadata.row_index)``; and v2 *equality
   deletes* (``equality_ids``, field-id 135) with the spec's
   sequence-number fence — rows appended after the delete survive;
 * maintenance: ``rewrite_data_files`` (compaction *replace*
   snapshots that fold per-batch small files + absorb delete files)
   and ``expire_snapshots`` (drops history, removes unreferenced
   files); ``streaming/iceberg_sink.py`` appends micro-batches with
   exactly-once batch bookkeeping in snapshot summaries;
 * scan planning: file pruning from manifest partition values
   (identity AND transformed fields — equality/range predicates are
   compared in the transformed space for the order-preserving
   year/month/day/hour/truncate transforms, equality for bucket) and
   column lower/upper bounds (spec single-value binary serialization),
   so a filtered scan opens only matching files — at 10^12-turn scale
   this replaces object-store listing with O(manifest) driver work,
   which is the point of Iceberg;
 * partition transforms (spec §Partition Transforms): identity,
   year/month/day/hour, bucket[N] (spec-pinned murmur3_32, Appendix B
   test vectors), truncate[W] — declared as ``"day(ts)"``,
   ``"bucket(16, conv_id)"``, ``"truncate(4, role)"`` in
   ``partition_by``; derived values live in the path + manifest while
   source columns stay in the data files.

Scale notes: the metadata tree is driver-side KBs per snapshot; data
file stats are collected with a parallel Spark stage over parquet
footers (footer-only reads).  Positional deletes never need sequence-
number fencing here because data file paths are unique per commit
(UUID-named), so a delete can only ever reference files that existed
when it was committed — the spec's ``data_seq <= delete_seq`` rule is
satisfied structurally; equality deletes DO carry the fence (per-file
data sequence numbers ride the broadcastable plan).  Additive schema
evolution is supported (``add_column`` — old files surface the new
column as null, no rewrite).  Out of scope (documented, not silently
wrong): column rename/drop/type promotion.

Single-writer assumption: commits are ``os.replace``-atomic on the
version hint, the Hadoop-catalog convention.  Multi-writer setups need
a real catalog service; same caveat as the reference layouts.
"""

from __future__ import annotations

import json
import os
import re
import struct
import time
import uuid
from typing import Any, Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from .avro_codec import read_container, write_container

# --------------------------------------------------------------- type maps
_SPARK_TO_ICE = {
    T.StringType: "string",
    T.IntegerType: "int",
    T.LongType: "long",
    T.FloatType: "float",
    T.DoubleType: "double",
    T.BooleanType: "boolean",
    T.BinaryType: "binary",
    T.DateType: "date",
    T.TimestampType: "timestamptz",
    T.TimestampNTZType: "timestamp",
}
_ICE_TO_SPARK = {
    "string": T.StringType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "boolean": T.BooleanType(),
    "binary": T.BinaryType(),
    "date": T.DateType(),
    "timestamptz": T.TimestampType(),
    "timestamp": T.TimestampNTZType(),
}


def _ice_schema_from_spark(schema: T.StructType) -> dict:
    """Spark StructType -> Iceberg schema JSON with assigned field-ids."""
    next_id = [0]

    def fid() -> int:
        next_id[0] += 1
        return next_id[0]

    def conv(dt: T.DataType) -> Any:
        if isinstance(dt, T.ArrayType):
            return {
                "type": "list",
                "element-id": fid(),
                "element": conv(dt.elementType),
                "element-required": not dt.containsNull,
            }
        for cls, name in _SPARK_TO_ICE.items():
            if isinstance(dt, cls):
                return name
        raise ValueError(f"unsupported Spark type for Iceberg: {dt}")

    fields = []
    for f in schema.fields:
        i = fid()
        fields.append(
            {"id": i, "name": f.name, "required": not f.nullable, "type": conv(f.dataType)}
        )
    return {"type": "struct", "schema-id": 0, "fields": fields}


def _spark_schema_from_ice(ice: dict) -> T.StructType:
    def conv(t: Any) -> T.DataType:
        if isinstance(t, dict) and t.get("type") == "list":
            return T.ArrayType(conv(t["element"]), not t.get("element-required", False))
        if isinstance(t, str) and t in _ICE_TO_SPARK:
            return _ICE_TO_SPARK[t]
        raise ValueError(f"unsupported Iceberg type: {t}")

    return T.StructType(
        [T.StructField(f["name"], conv(f["type"]), not f["required"]) for f in ice["fields"]]
    )


# Iceberg "binary single-value serialization" (spec appendix D) for bounds.
def _encode_bound(ice_type: str, v: Any) -> bytes | None:
    try:
        if ice_type == "int" or ice_type == "date":
            return struct.pack("<i", int(v))
        if ice_type in ("long", "timestamp", "timestamptz"):
            return struct.pack("<q", int(v))
        if ice_type == "float":
            return struct.pack("<f", float(v))
        if ice_type == "double":
            return struct.pack("<d", float(v))
        if ice_type == "string":
            return str(v).encode("utf-8")
        if ice_type == "boolean":
            return b"\x01" if v else b"\x00"
    except (ValueError, TypeError, struct.error):
        return None
    return None


def _decode_bound(ice_type: str, b: bytes) -> Any:
    if ice_type == "int" or ice_type == "date":
        return struct.unpack("<i", b)[0]
    if ice_type in ("long", "timestamp", "timestamptz"):
        return struct.unpack("<q", b)[0]
    if ice_type == "float":
        return struct.unpack("<f", b)[0]
    if ice_type == "double":
        return struct.unpack("<d", b)[0]
    if ice_type == "string":
        return b.decode("utf-8", errors="replace")
    if ice_type == "boolean":
        return b != b"\x00"
    return None


# --------------------------------------------------------------- Avro schemas
# ------------------------------------------------ partition transforms
#
# Iceberg partition transforms (spec §Partition Transforms): identity,
# year/month/day/hour (timestamps → ordinals since 1970), bucket[N]
# (murmur3_32 of the canonical byte form, & INT_MAX, % N — pinned by
# the spec's Appendix B test vectors, implemented in
# functions/hashing.py) and truncate[W] (ints: floored-mod width
# buckets; strings: W-char prefix).  The session timezone is pinned
# UTC by nil_spark.session.get_spark, so time transforms are
# deterministic across clusters.

_PART_FN_RE = re.compile(
    r"^\s*(year|month|day|hour|bucket|truncate)\s*\("
    r"(?:\s*(\d+)\s*,)?\s*([A-Za-z_]\w*)\s*\)\s*$"
)
_DAY_US = 86_400_000_000
_HOUR_US = 3_600_000_000


def _parse_partition_item(item: str) -> tuple[str, str, str]:
    """``'col'`` | ``'day(col)'`` | ``'bucket(16, col)'`` |
    ``'truncate(4, col)'`` → (source_col, transform, field_name)."""
    m = _PART_FN_RE.match(item)
    if not m:
        return item.strip(), "identity", item.strip()
    fn, nstr, col = m.groups()
    if fn in ("bucket", "truncate"):
        if not nstr or int(nstr) < 1:
            raise ValueError(f"{fn} transform needs a positive width: {item!r}")
        return col, f"{fn}[{int(nstr)}]", (
            f"{col}_bucket" if fn == "bucket" else f"{col}_trunc"
        )
    if nstr:
        raise ValueError(f"{fn} transform takes no width: {item!r}")
    return col, fn, f"{col}_{fn}"


def _transform_spark_col(transform: str, col, dt: T.DataType):
    """Partition-transform a source Column for the write path."""
    if transform == "identity":
        return col
    if transform in ("year", "month", "day", "hour"):
        ts = col.cast("timestamp")
        if transform == "year":
            return (F.year(ts) - F.lit(1970)).cast("int")
        if transform == "month":
            return (
                (F.year(ts) - F.lit(1970)) * 12 + F.month(ts) - F.lit(1)
            ).cast("int")
        us = _DAY_US if transform == "day" else _HOUR_US
        return F.floor(F.unix_micros(ts) / F.lit(us)).cast("int")
    if transform.startswith("truncate["):
        w = int(transform[9:-1])
        if isinstance(dt, T.StringType):
            return F.substring(col, 1, w)
        # floored modulo per spec: v - (((v % W) + W) % W)
        return (col - (((col % w) + w) % w)).cast(dt)
    if transform.startswith("bucket["):
        n = int(transform[7:-1])
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("int")
        def _bucket(s):
            import pandas as pd

            from nil_spark.functions.hashing import (
                iceberg_bucket_long,
                iceberg_bucket_str,
            )

            if pd.api.types.is_datetime64_any_dtype(s):
                mask = s.isna()
                micros = s.astype("datetime64[us]").astype("int64")
                out = pd.Series(
                    iceberg_bucket_long(micros.to_numpy(), n), index=s.index
                ).astype("object")
                out[mask] = None
                return out
            if pd.api.types.is_numeric_dtype(s):
                mask = s.isna()
                arr = s.fillna(0).astype("int64").to_numpy()
                out = pd.Series(
                    iceberg_bucket_long(arr, n), index=s.index
                ).astype("object")
                out[mask] = None
                return out
            return s.map(
                lambda x: iceberg_bucket_str(x, n)
                if isinstance(x, str)
                else None
            )

        return _bucket(col)
    raise ValueError(f"unsupported partition transform {transform!r}")


def _transform_py(transform: str, value, ice_type: str):
    """Apply a partition transform to a PYTHON literal (for manifest
    pruning).  Naive datetimes are interpreted as UTC (the engine's
    pinned session timezone).  Returns None when the literal cannot be
    transformed (caller then skips partition pruning)."""
    import datetime as _dt

    def _utc_micros(v: _dt.datetime) -> int:
        # Exact integer epoch-micros.  float seconds via .timestamp()
        # lose 1µs for ~1% of microsecond-precision values, which makes
        # bucket[N] hash a DIFFERENT value than the write path (exact
        # datetime64[us]→int64) and mis-prune the matching file.
        tz = v.tzinfo or _dt.timezone.utc
        epoch = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)
        return (v.replace(tzinfo=tz) - epoch) // _dt.timedelta(
            microseconds=1
        )

    if transform == "identity":
        return value
    if transform in ("year", "month", "day", "hour"):
        v = value
        if isinstance(v, str):
            try:
                v = _dt.datetime.fromisoformat(v)
            except ValueError:
                return None
        if isinstance(v, _dt.date) and not isinstance(v, _dt.datetime):
            v = _dt.datetime(v.year, v.month, v.day)
        if not isinstance(v, _dt.datetime):
            return None
        if transform == "year":
            return v.year - 1970
        if transform == "month":
            return (v.year - 1970) * 12 + v.month - 1
        micros = _utc_micros(v)
        us = _DAY_US if transform == "day" else _HOUR_US
        return micros // us
    if transform.startswith("truncate["):
        w = int(transform[9:-1])
        if ice_type == "string":
            return value[:w] if isinstance(value, str) else None
        try:
            v = int(value)
        except (TypeError, ValueError):
            return None
        return v - (((v % w) + w) % w)
    if transform.startswith("bucket["):
        n = int(transform[7:-1])
        from nil_spark.functions.hashing import (
            iceberg_bucket_long,
            iceberg_bucket_str,
        )

        if ice_type == "string":
            return (
                iceberg_bucket_str(value, n)
                if isinstance(value, str)
                else None
            )
        if ice_type in ("timestamp", "timestamptz"):
            v = value
            if isinstance(v, _dt.datetime):
                v = _utc_micros(v)
            if not isinstance(v, int):
                return None
            return int(iceberg_bucket_long(v, n))
        try:
            return int(iceberg_bucket_long(int(value), n))
        except (TypeError, ValueError):
            return None
    return None


def _bounds_map_schema(name: str) -> dict:
    # Iceberg encodes map<int, binary> as an Avro array of key/value
    # records (Avro maps require string keys) with logicalType "map".
    return {
        "type": "array",
        "logicalType": "map",
        "items": {
            "type": "record",
            "name": name,
            "fields": [
                {"name": "key", "type": "int", "field-id": 117},
                {"name": "value", "type": "bytes", "field-id": 118},
            ],
        },
    }


def _manifest_list_schema() -> dict:
    f = lambda name, typ, fid: {"name": name, "type": typ, "field-id": fid}
    return {
        "type": "record",
        "name": "manifest_file",
        "fields": [
            f("manifest_path", "string", 500),
            f("manifest_length", "long", 501),
            f("partition_spec_id", "int", 502),
            f("content", "int", 517),
            f("sequence_number", "long", 515),
            f("min_sequence_number", "long", 516),
            f("added_snapshot_id", "long", 503),
            f("added_files_count", "int", 504),
            f("existing_files_count", "int", 505),
            f("deleted_files_count", "int", 506),
            f("added_rows_count", "long", 512),
            f("existing_rows_count", "long", 513),
            f("deleted_rows_count", "long", 514),
        ],
    }


def _manifest_schema(partition_fields: list[dict]) -> dict:
    part_rec = {
        "type": "record",
        "name": "r102",
        "fields": [
            {"name": pf["name"], "type": ["null", "string"], "field-id": pf["field-id"]}
            for pf in partition_fields
        ],
    }
    data_file = {
        "type": "record",
        "name": "r2",
        "fields": [
            {"name": "content", "type": "int", "field-id": 134},
            {"name": "file_path", "type": "string", "field-id": 100},
            {"name": "file_format", "type": "string", "field-id": 101},
            {"name": "partition", "type": part_rec, "field-id": 102},
            {"name": "record_count", "type": "long", "field-id": 103},
            {"name": "file_size_in_bytes", "type": "long", "field-id": 104},
            {"name": "lower_bounds", "type": ["null", _bounds_map_schema("k117_v118")], "field-id": 125},
            {"name": "upper_bounds", "type": ["null", _bounds_map_schema("k117_v118_u")], "field-id": 128},
            {"name": "equality_ids", "type": ["null", {"type": "array", "items": "int"}], "field-id": 135},
        ],
    }
    return {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int", "field-id": 0},
            {"name": "snapshot_id", "type": ["null", "long"], "field-id": 1},
            {"name": "sequence_number", "type": ["null", "long"], "field-id": 3},
            {"name": "file_sequence_number", "type": ["null", "long"], "field-id": 4},
            {"name": "data_file", "type": data_file, "field-id": 2},
        ],
    }


# --------------------------------------------------------------- file stats
def _footer_stats(paths: list[str]) -> list[dict]:
    """Per-parquet-file record counts + column min/max from footers only."""
    import pyarrow.parquet as pq

    out = []
    for p in paths:
        md = pq.ParquetFile(p).metadata
        mins: dict[str, Any] = {}
        maxs: dict[str, Any] = {}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                st = col.statistics
                name = col.path_in_schema
                if st is None or not st.has_min_max or "." in name:
                    continue
                mn, mx = st.min, st.max
                if name not in mins or mn < mins[name]:
                    mins[name] = mn
                if name not in maxs or mx > maxs[name]:
                    maxs[name] = mx
        out.append(
            {
                "path": p,
                "rows": md.num_rows,
                "size": os.path.getsize(p),
                "mins": mins,
                "maxs": maxs,
            }
        )
    return out


def _collect_stats(spark: SparkSession, paths: list[str]) -> list[dict]:
    """Footer stats as a parallel Spark stage (footer-only reads scale to
    millions of files; per-task batches keep task count sane)."""
    if len(paths) <= 8:
        return _footer_stats(paths)
    n = max(1, min(len(paths) // 4, spark.sparkContext.defaultParallelism))
    rdd = spark.sparkContext.parallelize(paths, n)
    return rdd.mapPartitions(lambda it: _footer_stats(list(it))).collect()


# --------------------------------------------------------------- the table
class IcebergTable:
    """A format-v2 Iceberg table rooted at ``path`` (Hadoop layout)."""

    def __init__(self, path: str):
        self.path = os.path.abspath(path)
        self.meta_dir = os.path.join(self.path, "metadata")
        self.data_dir = os.path.join(self.path, "data")

    # ---------------------------------------------------------- metadata io
    def _current_version(self) -> int:
        hint = os.path.join(self.meta_dir, "version-hint.text")
        if not os.path.exists(hint):
            raise FileNotFoundError(f"not an Iceberg table (no version hint): {self.path}")
        with open(hint) as f:
            return int(f.read().strip())

    def metadata(self) -> dict:
        v = self._current_version()
        with open(os.path.join(self.meta_dir, f"v{v}.metadata.json")) as f:
            return json.load(f)

    def snapshots(self) -> list[dict]:
        return self.metadata().get("snapshots", [])

    def history(self) -> list[dict]:
        return self.metadata().get("snapshot-log", [])

    def schema(self) -> T.StructType:
        md = self.metadata()
        ice = next(s for s in md["schemas"] if s["schema-id"] == md["current-schema-id"])
        return _spark_schema_from_ice(ice)

    def partition_columns(self) -> list[str]:
        """IDENTITY-transform partition column names — the columns
        Spark's partitionBy strips from data files, so readers must
        reattach them from the directory path.  Transformed partition
        fields (day/bucket/truncate) are DERIVED: their source column
        stays inside the data files and the derived value lives only in
        the path + manifest."""
        return [
            pf["name"]
            for pf in self.partition_fields()
            if pf["transform"] == "identity"
        ]

    def partition_fields(self) -> list[dict]:
        """Default partition-spec fields with the source column name
        and Iceberg type resolved (``source-name`` / ``source-type``)."""
        md = self.metadata()
        spec = next(
            s
            for s in md["partition-specs"]
            if s["spec-id"] == md["default-spec-id"]
        )
        ice = next(
            s
            for s in md["schemas"]
            if s["schema-id"] == md["current-schema-id"]
        )
        by_id = {f["id"]: f for f in ice["fields"]}
        out = []
        for pf in spec["fields"]:
            f = dict(pf)
            src = by_id[pf["source-id"]]
            f["source-name"] = src["name"]
            f["source-type"] = src["type"]
            out.append(f)
        return out

    def _commit(self, md: dict) -> None:
        v = 1 if not os.path.exists(os.path.join(self.meta_dir, "version-hint.text")) else (
            self._current_version() + 1
        )
        md_path = os.path.join(self.meta_dir, f"v{v}.metadata.json")
        with open(md_path, "w") as f:
            json.dump(md, f, indent=1)
        tmp = os.path.join(self.meta_dir, ".version-hint.tmp")
        with open(tmp, "w") as f:
            f.write(str(v))
        os.replace(tmp, os.path.join(self.meta_dir, "version-hint.text"))

    def add_column(self, name: str, spark_type: T.DataType) -> None:
        """Additive schema evolution: commit a new schema with ``name``
        appended (fresh field-id, new schema-id).  Existing data files
        simply lack the column — the scan's explicit read schema makes
        Spark surface it as null there, which is exactly the Iceberg
        contract for added columns (no rewrite).  Rename/drop/type
        promotion stay out of scope.
        """
        md = self.metadata()
        cur = next(s for s in md["schemas"] if s["schema-id"] == md["current-schema-id"])
        if any(f["name"] == name for f in cur["fields"]):
            raise ValueError(f"column {name!r} already exists")
        new_id = md["last-column-id"] + 1
        ice_type = None
        for cls, tname in _SPARK_TO_ICE.items():
            if isinstance(spark_type, cls):
                ice_type = tname
        if ice_type is None:
            raise ValueError(f"unsupported type for added column: {spark_type}")
        new_schema = {
            "type": "struct",
            "schema-id": cur["schema-id"] + 1,
            "fields": cur["fields"] + [
                {"id": new_id, "name": name, "required": False, "type": ice_type}
            ],
        }
        md["schemas"].append(new_schema)
        md["current-schema-id"] = new_schema["schema-id"]
        md["last-column-id"] = new_id
        md["properties"]["schema.name-mapping.default"] = json.dumps(
            [{"field-id": f["id"], "names": [f["name"]]} for f in new_schema["fields"]]
        )
        md["last-updated-ms"] = int(time.time() * 1000)
        self._commit(md)

    def set_property(self, key: str, value: str) -> None:
        """Commit a table-property change (new metadata version)."""
        md = self.metadata()
        md["properties"][key] = value
        md["last-updated-ms"] = int(time.time() * 1000)
        self._commit(md)

    # ---------------------------------------------------------- writes
    @classmethod
    def create(
        cls,
        spark: SparkSession,
        df: DataFrame,
        path: str,
        partition_by: Sequence[str] | None = None,
    ) -> "IcebergTable":
        t = cls(path)
        if os.path.exists(os.path.join(t.meta_dir, "version-hint.text")):
            raise ValueError(
                f"Iceberg table already exists at {t.path!r} — use append()"
            )
        os.makedirs(t.meta_dir, exist_ok=True)
        os.makedirs(t.data_dir, exist_ok=True)
        ice_schema = _ice_schema_from_spark(df.schema)
        by_name = {f["name"]: f for f in ice_schema["fields"]}
        part_fields = []
        for i, item in enumerate(partition_by or []):
            col, transform, fname = _parse_partition_item(item)
            if col not in by_name:
                raise ValueError(
                    f"partition source column {col!r} not in schema "
                    f"{sorted(by_name)}"
                )
            if transform != "identity" and fname in by_name:
                raise ValueError(
                    f"derived partition field name {fname!r} collides "
                    "with a schema column"
                )
            if any(pf["name"] == fname for pf in part_fields):
                # e.g. bucket(4,x) + bucket(8,x) both derive 'x_bucket':
                # the second withColumn would silently overwrite the
                # first and name-keyed manifest/prune lookups would
                # resolve to the wrong transform
                raise ValueError(
                    f"derived partition field name {fname!r} collides "
                    f"with another partition field — two transforms of "
                    f"the same source column in one spec are not "
                    f"supported; drop one of them"
                )
            if transform.startswith("bucket["):
                src_type = by_name[col]["type"]
                if not isinstance(src_type, str) or src_type in (
                    "float", "double", "boolean",
                ):
                    # the Iceberg spec defines bucket over
                    # int/long/decimal/date/time/timestamp/string/uuid/
                    # fixed/binary — never float/double; silently
                    # truncating fractions would produce non-spec
                    # partition values
                    raise ValueError(
                        f"bucket transform is not defined over source "
                        f"type {src_type!r} (column {col!r})"
                    )
            part_fields.append(
                {
                    "name": fname,
                    "transform": transform,
                    "source-id": by_name[col]["id"],
                    "field-id": 1000 + i,
                }
            )
        md = {
            "format-version": 2,
            "table-uuid": str(uuid.uuid5(uuid.NAMESPACE_URL, t.path)),
            "location": t.path,
            "last-sequence-number": 0,
            "last-updated-ms": int(time.time() * 1000),
            "last-column-id": max(
                [f["id"] for f in ice_schema["fields"]]
                + [
                    f["type"]["element-id"]
                    for f in ice_schema["fields"]
                    if isinstance(f["type"], dict)
                ]
                + [0]
            ),
            "schemas": [ice_schema],
            "current-schema-id": 0,
            "partition-specs": [{"spec-id": 0, "fields": part_fields}],
            "default-spec-id": 0,
            "last-partition-id": 999 + len(part_fields),
            "sort-orders": [{"order-id": 0, "fields": []}],
            "default-sort-order-id": 0,
            "properties": {
                "schema.name-mapping.default": json.dumps(
                    [{"field-id": f["id"], "names": [f["name"]]} for f in ice_schema["fields"]]
                ),
                "write.format.default": "parquet",
            },
            "current-snapshot-id": -1,
            "snapshots": [],
            "snapshot-log": [],
            "metadata-log": [],
        }
        t._commit(md)
        t.append(spark, df)
        return t

    def _write_data_files(self, spark: SparkSession, df: DataFrame) -> list[dict]:
        """Write df as parquet under data/ and return stats per new
        file.  Identity partition columns come straight from the data;
        transformed fields (day/bucket/truncate) are computed as
        temporary derived columns — partitionBy strips them from the
        files (they're recomputable), while their SOURCE columns stay
        in the data files."""
        pfs = self.partition_fields()
        names = []
        for pf in pfs:
            if pf["transform"] == "identity":
                names.append(pf["name"])
                continue
            dt = df.schema[pf["source-name"]].dataType
            df = df.withColumn(
                pf["name"],
                _transform_spark_col(
                    pf["transform"], F.col(pf["source-name"]), dt
                ),
            )
            names.append(pf["name"])
        before = set(self._list_parquet())
        w = df.write.mode("append")
        if names:
            w = w.partitionBy(*names)
        w.parquet(self.data_dir)
        new = sorted(set(self._list_parquet()) - before)
        return _collect_stats(spark, new)

    def _list_parquet(self) -> list[str]:
        out = []
        for root, _dirs, files in os.walk(self.data_dir):
            out.extend(
                os.path.join(root, f)
                for f in files
                if f.endswith(".parquet") and not f.startswith((".", "_"))
            )
        return out

    def _partition_values(self, path: str) -> dict[str, str | None]:
        from urllib.parse import unquote

        vals: dict[str, str | None] = {}
        rel = os.path.relpath(path, self.data_dir)
        for seg in rel.split(os.sep)[:-1]:
            if "=" in seg:
                k, v = seg.split("=", 1)
                # Spark URL-encodes special chars in partition path segments
                vals[k] = None if v == "__HIVE_DEFAULT_PARTITION__" else unquote(v)
        return {
            pf["name"]: vals.get(pf["name"])
            for pf in self.partition_fields()
        }

    def _write_manifest(
        self,
        stats: list[dict],
        *,
        snapshot_id: int,
        sequence_number: int,
        content: int,
        ice_fields: list[dict],
        equality_ids: list[int] | None = None,
    ) -> tuple[str, dict]:
        md = self.metadata()
        spec = next(s for s in md["partition-specs"] if s["spec-id"] == md["default-spec-id"])
        schema = _manifest_schema(spec["fields"])
        by_name = {f["name"]: f for f in ice_fields}
        entries = []
        total_rows = 0
        for st in stats:
            lowers, uppers = [], []
            for col, v in st["mins"].items():
                f = by_name.get(col)
                if f and isinstance(f["type"], str):
                    b = _encode_bound(f["type"], v)
                    if b is not None:
                        lowers.append({"key": f["id"], "value": b})
            for col, v in st["maxs"].items():
                f = by_name.get(col)
                if f and isinstance(f["type"], str):
                    b = _encode_bound(f["type"], v)
                    if b is not None:
                        uppers.append({"key": f["id"], "value": b})
            entries.append(
                {
                    "status": 1,  # ADDED
                    "snapshot_id": snapshot_id,
                    "sequence_number": sequence_number,
                    "file_sequence_number": sequence_number,
                    "data_file": {
                        "content": content,
                        "file_path": st["path"],
                        "file_format": "PARQUET",
                        "partition": self._partition_values(st["path"]) if content == 0 else {
                            pf["name"]: None
                            for pf in self.partition_fields()
                        },
                        "record_count": st["rows"],
                        "file_size_in_bytes": st["size"],
                        "lower_bounds": lowers or None,
                        "upper_bounds": uppers or None,
                        "equality_ids": equality_ids,
                    },
                }
            )
            total_rows += st["rows"]
        name = f"manifest-{uuid.uuid4().hex}.avro"
        mpath = os.path.join(self.meta_dir, name)
        write_container(
            mpath,
            schema,
            entries,
            metadata={
                "schema": json.dumps(
                    next(s for s in md["schemas"] if s["schema-id"] == md["current-schema-id"])
                ),
                "schema-id": str(md["current-schema-id"]),
                "partition-spec": json.dumps(spec["fields"]),
                "partition-spec-id": str(spec["spec-id"]),
                "format-version": "2",
                "content": "data" if content == 0 else "deletes",
            },
        )
        summary = {
            "manifest_path": mpath,
            "manifest_length": os.path.getsize(mpath),
            "partition_spec_id": spec["spec-id"],
            "content": 0 if content == 0 else 1,
            "sequence_number": sequence_number,
            "min_sequence_number": sequence_number,
            "added_snapshot_id": snapshot_id,
            "added_files_count": len(entries),
            "existing_files_count": 0,
            "deleted_files_count": 0,
            "added_rows_count": total_rows,
            "existing_rows_count": 0,
            "deleted_rows_count": 0,
        }
        return mpath, summary

    def _new_snapshot(
        self,
        new_manifest_summaries: list[dict],
        operation: str,
        *,
        summary_extra: dict[str, str] | None = None,
        replace: bool = False,
    ) -> None:
        md = self.metadata()
        seq = md["last-sequence-number"] + 1
        snap_id = seq  # unique within the table; monotone
        prior: list[dict] = []
        if not replace and md["current-snapshot-id"] != -1:
            cur = next(s for s in md["snapshots"] if s["snapshot-id"] == md["current-snapshot-id"])
            _meta, prior = read_container(cur["manifest-list"])
        mlist = prior + new_manifest_summaries
        list_path = os.path.join(self.meta_dir, f"snap-{snap_id}-manifest-list.avro")
        write_container(list_path, _manifest_list_schema(), mlist)
        now = int(time.time() * 1000)
        snap = {
            "snapshot-id": snap_id,
            "sequence-number": seq,
            "timestamp-ms": now,
            "manifest-list": list_path,
            "summary": {"operation": operation, **(summary_extra or {})},
            "schema-id": md["current-schema-id"],
        }
        md["snapshots"].append(snap)
        md["snapshot-log"].append({"timestamp-ms": now, "snapshot-id": snap_id})
        md["current-snapshot-id"] = snap_id
        md["last-sequence-number"] = seq
        md["last-updated-ms"] = now
        self._commit(md)

    def append(
        self,
        spark: SparkSession,
        df: DataFrame,
        *,
        summary_extra: dict[str, str] | None = None,
    ) -> None:
        md = self.metadata()
        ice = next(s for s in md["schemas"] if s["schema-id"] == md["current-schema-id"])
        want = [f["name"] for f in ice["fields"]]
        if [c for c in df.columns] != want:
            df = df.select(*want)  # enforce declared column order; missing -> error
        stats = self._write_data_files(spark, df)
        seq = md["last-sequence-number"] + 1
        _p, summary = self._write_manifest(
            stats, snapshot_id=seq, sequence_number=seq, content=0, ice_fields=ice["fields"]
        )
        self._new_snapshot([summary], "append", summary_extra=summary_extra)

    def delete_where(self, spark: SparkSession, condition) -> int:
        """Commit v2 position-delete files for rows matching ``condition``.

        Returns the number of deleted positions.  Delete rows are
        range-partitioned and sorted by (file_path, pos) as the spec
        requires, so a single hot data file cannot produce an unsorted
        or single-reducer delete file at scale.
        """
        df = self.scan(spark, _with_position=True).filter(condition)
        victims = df.select(
            F.col("__fp").alias("file_path"), F.col("__pos").alias("pos")
        )
        out_dir = os.path.join(self.data_dir, f"deletes-{uuid.uuid4().hex}")
        (
            victims.repartitionByRange(max(1, min(8, spark.sparkContext.defaultParallelism)),
                                       "file_path", "pos")
            .sortWithinPartitions("file_path", "pos")
            .write.mode("overwrite")
            .parquet(out_dir)
        )
        files = [
            os.path.join(out_dir, f)
            for f in os.listdir(out_dir)
            if f.endswith(".parquet") and not f.startswith((".", "_"))
        ]
        stats = _collect_stats(spark, files)
        n = sum(s["rows"] for s in stats)
        md = self.metadata()
        seq = md["last-sequence-number"] + 1
        delete_fields = [
            {"id": 2147483546, "name": "file_path", "required": True, "type": "string"},
            {"id": 2147483545, "name": "pos", "required": True, "type": "long"},
        ]
        _p, summary = self._write_manifest(
            stats, snapshot_id=seq, sequence_number=seq, content=1, ice_fields=delete_fields
        )
        self._new_snapshot([summary], "delete")
        return n

    def equality_delete(self, spark: SparkSession, keys_df: DataFrame) -> None:
        """Commit a v2 *equality delete*: every current-or-earlier row
        whose values on ``keys_df.columns`` match a key row is deleted.

        Unlike position deletes this is value-addressed, so the spec's
        sequence-number fence matters: rows appended AFTER this commit
        with the same key are NOT deleted (pinned by test).  This is
        the CDC upsert primitive — streaming pipelines delete the old
        key then append the new row in the next commit.
        """
        md = self.metadata()
        ice = next(s for s in md["schemas"] if s["schema-id"] == md["current-schema-id"])
        by_name = {f["name"]: f for f in ice["fields"]}
        cols = list(keys_df.columns)
        unknown = [c for c in cols if c not in by_name]
        if unknown:
            raise ValueError(f"equality-delete columns not in schema: {unknown}")
        eq_ids = [by_name[c]["id"] for c in cols]
        out_dir = os.path.join(self.data_dir, f"eqdeletes-{uuid.uuid4().hex}")
        keys_df.dropDuplicates().coalesce(1).write.mode("overwrite").parquet(out_dir)
        files = [
            os.path.join(out_dir, f)
            for f in os.listdir(out_dir)
            if f.endswith(".parquet") and not f.startswith((".", "_"))
        ]
        stats = _collect_stats(spark, files)
        seq = md["last-sequence-number"] + 1
        _p, summary = self._write_manifest(
            stats,
            snapshot_id=seq,
            sequence_number=seq,
            content=2,
            ice_fields=[by_name[c] for c in cols],
            equality_ids=eq_ids,
        )
        self._new_snapshot([summary], "delete")

    # ---------------------------------------------------------- maintenance
    def rewrite_data_files(self, spark: SparkSession, target_files: int | None = None) -> None:
        """Compaction: materialize the current live rows (all deletes
        applied) into fresh data files and commit a *replace* snapshot
        that references only them.  This is the streaming-ingest
        companion — many tiny per-batch appends plus delete files fold
        into a clean file set; older snapshots stay readable for time
        travel until :meth:`expire_snapshots`.
        """
        md = self.metadata()
        if md["current-snapshot-id"] == -1:
            return
        ice = next(s for s in md["schemas"] if s["schema-id"] == md["current-schema-id"])
        live = self.scan(spark)
        if target_files is not None:
            live = live.repartition(target_files)
        # materialize BEFORE committing: the rewrite must read the old
        # files, and Spark plans lazily
        stats = self._write_data_files(spark, live.localCheckpoint())
        seq = md["last-sequence-number"] + 1
        _p, summary = self._write_manifest(
            stats, snapshot_id=seq, sequence_number=seq, content=0, ice_fields=ice["fields"]
        )
        self._new_snapshot([summary], "replace", replace=True)

    def expire_snapshots(self, keep_last: int = 1) -> int:
        """Drop all but the newest ``keep_last`` snapshots and delete
        every file (manifest list, manifest, data, delete) no surviving
        snapshot references.  Returns the number of data/delete files
        removed.  Time travel to an expired snapshot then raises the
        structured unknown-snapshot error.
        """
        md = self.metadata()
        snaps = sorted(md["snapshots"], key=lambda s: s["sequence-number"])
        if len(snaps) <= keep_last:
            return 0
        keep = snaps[-keep_last:]
        referenced: set[str] = set()
        keep_lists = set()
        keep_manifests = set()
        for s in keep:
            keep_lists.add(s["manifest-list"])
            _m, manifests = read_container(s["manifest-list"])
            for mf in manifests:
                keep_manifests.add(mf["manifest_path"])
                _mm, entries = read_container(mf["manifest_path"])
                for e in entries:
                    referenced.add(e["data_file"]["file_path"])
        removed = 0
        for p in self._list_parquet():
            if p not in referenced:
                os.remove(p)
                removed += 1
        for f in os.listdir(self.meta_dir):
            fp = os.path.join(self.meta_dir, f)
            if f.endswith(".avro") and fp not in keep_lists and fp not in keep_manifests:
                os.remove(fp)
        md["snapshots"] = keep
        kept_ids = {s["snapshot-id"] for s in keep}
        md["snapshot-log"] = [e for e in md["snapshot-log"] if e["snapshot-id"] in kept_ids]
        self._commit(md)
        return removed

    # ---------------------------------------------------------- reads
    def _plan(
        self,
        snapshot_id: int | None = None,
        predicate: tuple[str, str, Any] | None = None,
    ) -> dict:
        """Scan planning from the manifest tree.

        Returns ``{"data": [(path, seq)], "pos_deletes": [path],
        "eq_deletes": [(path, seq, [field_id])], "pruned": n}``.  Data
        files carry their data sequence number so equality deletes can
        be fenced (an equality delete applies only to rows whose data
        sequence number is STRICTLY below the delete's — rows appended
        later with the same key must survive).  Position deletes need no
        fence: they name exact file paths, and paths are unique per
        commit.
        """
        md = self.metadata()
        snap_id = md["current-snapshot-id"] if snapshot_id is None else snapshot_id
        if snap_id == -1:
            return {"data": [], "pos_deletes": [], "eq_deletes": [], "pruned": 0}
        snap = next((s for s in md["snapshots"] if s["snapshot-id"] == snap_id), None)
        if snap is None:
            raise ValueError(f"unknown snapshot-id {snapshot_id} (have "
                             f"{[s['snapshot-id'] for s in md['snapshots']]})")
        ice = next(s for s in md["schemas"] if s["schema-id"] == md["current-schema-id"])
        by_name = {f["name"]: f for f in ice["fields"]}
        _m, manifests = read_container(snap["manifest-list"])
        plan: dict = {"data": [], "pos_deletes": [], "eq_deletes": [], "pruned": 0}
        pfs_by_source: dict = {}
        for pf in self.partition_fields():
            pfs_by_source.setdefault(pf["source-name"], []).append(pf)
        for mf in manifests:
            _meta, entries = read_container(mf["manifest_path"])
            for e in entries:
                if e["status"] == 2:  # DELETED entry
                    continue
                dfile = e["data_file"]
                seq = e["sequence_number"] or mf["sequence_number"]
                if dfile["content"] == 1:
                    plan["pos_deletes"].append(dfile["file_path"])
                    continue
                if dfile["content"] == 2:
                    plan["eq_deletes"].append(
                        (dfile["file_path"], seq, dfile.get("equality_ids") or [])
                    )
                    continue
                if predicate is not None and self._prunable(
                    dfile, predicate, by_name, pfs_by_source
                ):
                    plan["pruned"] += 1
                    continue
                plan["data"].append((dfile["file_path"], seq))
        return plan

    def plan_files(
        self,
        snapshot_id: int | None = None,
        predicate: tuple[str, str, Any] | None = None,
    ) -> tuple[list[str], list[str], int]:
        """Scan planning: returns (data_files, pos_delete_files, pruned).

        ``predicate`` is a simple ``(column, op, literal)`` with op in
        {==, <, <=, >, >=}; files whose manifest bounds/partition value
        provably exclude it are pruned without opening them.
        """
        p = self._plan(snapshot_id, predicate)
        return [f for f, _s in p["data"]], p["pos_deletes"], p["pruned"]

    @staticmethod
    def _prunable(dfile, predicate, by_name, pfs_by_source) -> bool:
        """True iff the manifest entry PROVABLY excludes the predicate
        — via a partition value (identity exactly; transformed fields
        by comparing in the transformed space, sound because
        year/month/day/hour/truncate are order-preserving and bucket
        supports equality) or via column lower/upper bounds."""
        col, op, lit = predicate
        f = by_name.get(col)
        if f is None or not isinstance(f["type"], str):
            return False
        for pf in pfs_by_source.get(col, ()):
            pv = dfile["partition"].get(pf["name"])
            if pv is None:
                continue
            t = pf["transform"]
            if t == "identity":
                if op == "==" and str(pv) != str(lit):
                    return True
                continue
            tl = _transform_py(t, lit, f["type"])
            if tl is None:
                continue
            if t.startswith("bucket["):
                # buckets are unordered: only equality prunes
                try:
                    if op == "==" and int(pv) != int(tl):
                        return True
                except (TypeError, ValueError):
                    pass  # foreign/garbled value: never mis-prune
                continue
            # order-preserving transform: file holds only rows with
            # t(x) == pv, so x OP lit is satisfiable iff pv is on the
            # right side of t(lit)
            if t.startswith("truncate[") and f["type"] == "string":
                pvv = str(pv)
            else:
                try:
                    pvv = int(pv)
                except (TypeError, ValueError):
                    continue  # foreign/garbled value: never mis-prune
            if op == "==" and pvv != tl:
                return True
            if op in ("<", "<=") and pvv > tl:
                return True
            if op in (">", ">=") and pvv < tl:
                return True
        lo = hi = None
        for kv in dfile.get("lower_bounds") or []:
            if kv["key"] == f["id"]:
                lo = _decode_bound(f["type"], kv["value"])
        for kv in dfile.get("upper_bounds") or []:
            if kv["key"] == f["id"]:
                hi = _decode_bound(f["type"], kv["value"])
        if lo is None or hi is None:
            return False
        # prune iff NO row in [lo, hi] can satisfy the predicate
        if op == "==":
            return lit < lo or lit > hi
        if op == "<":
            return lo >= lit
        if op == "<=":
            return lo > lit
        if op == ">":
            return hi <= lit
        if op == ">=":
            return hi < lit
        return False

    def incremental_files(
        self, from_seq: int, to_seq: int | None = None
    ) -> list[tuple[str, int, dict]]:
        """Incremental *append* scan planning: data files committed with
        ``from_seq < seq <= to_seq`` (Iceberg's incremental-read
        contract), as ``(path, seq, partition_values)``.

        Files written by *replace* (compaction) snapshots are skipped —
        they re-house rows already emitted by the appends they fold, so
        emitting them would duplicate the stream.  Delete snapshots
        advance the sequence but add no data files (append-only stream
        semantics: no retractions).  Caveat: expiry must keep at least
        the snapshots spanning any unconsumed range (size
        ``expire_keep_last`` to the consumer lag), else a fold of
        not-yet-emitted appends is indistinguishable from fresh data.
        """
        md = self.metadata()
        if md["current-snapshot-id"] == -1:
            return []
        if to_seq is None:
            to_seq = md["last-sequence-number"]
        ops = {s["sequence-number"]: s["summary"].get("operation") for s in md["snapshots"]}
        snaps = [s for s in md["snapshots"] if s["sequence-number"] <= to_seq]
        if not snaps:
            return []
        snap = max(snaps, key=lambda s: s["sequence-number"])
        _m, manifests = read_container(snap["manifest-list"])
        out: list[tuple[str, int, dict]] = []
        for mf in manifests:
            if mf["content"] != 0 or mf["sequence_number"] <= from_seq:
                continue  # delete manifest, or wholly before the window
            _mm, entries = read_container(mf["manifest_path"])
            for e in entries:
                if e["status"] == 2:
                    continue
                d = e["data_file"]
                if d["content"] != 0:
                    continue
                seq = e["sequence_number"] or mf["sequence_number"]
                if from_seq < seq <= to_seq and ops.get(seq) != "replace":
                    out.append((d["file_path"], seq, self._partition_values(d["file_path"])))
        return out

    def incremental_scan(
        self, spark: SparkSession, from_seq: int, to_seq: int | None = None
    ) -> DataFrame:
        """Rows appended in ``(from_seq, to_seq]`` as a DataFrame."""
        files = [p for p, _s, _pv in self.incremental_files(from_seq, to_seq)]
        schema = self.schema()
        if not files:
            return spark.createDataFrame([], schema)
        part_cols = self.partition_columns()
        file_schema = T.StructType([f for f in schema.fields if f.name not in part_cols])
        reader = spark.read.schema(file_schema)
        if part_cols:
            reader = reader.option("basePath", self.data_dir)
        df = reader.parquet(*files)
        for f in schema.fields:
            if f.name in part_cols:
                df = df.withColumn(f.name, F.col(f.name).cast(f.dataType))
        return df.select(*[f.name for f in schema.fields])

    def scan(
        self,
        spark: SparkSession,
        *,
        snapshot_id: int | None = None,
        columns: Sequence[str] | None = None,
        predicate: tuple[str, str, Any] | None = None,
        _with_position: bool = False,
    ) -> DataFrame:
        """Read the table as a Spark DataFrame (merge-on-read deletes)."""
        plan = self._plan(snapshot_id, predicate)
        data_files = [f for f, _s in plan["data"]]
        pos_deletes, eq_deletes = plan["pos_deletes"], plan["eq_deletes"]
        schema = self.schema()
        part_cols = self.partition_columns()
        if not data_files:
            return spark.createDataFrame([], schema)
        file_schema = T.StructType([f for f in schema.fields if f.name not in part_cols])
        reader = spark.read.schema(file_schema)
        if part_cols:
            reader = reader.option("basePath", self.data_dir)
        df = reader.parquet(*data_files)
        # partition column types come back as strings from the path; restore
        for f in schema.fields:
            if f.name in part_cols:
                df = df.withColumn(f.name, F.col(f.name).cast(f.dataType))
        need_pos = _with_position or bool(pos_deletes) or bool(eq_deletes)
        if need_pos:
            df = df.select(
                "*",
                F.regexp_replace(F.col("_metadata.file_path"), "^file:(//)?", "").alias("__fp"),
                F.col("_metadata.row_index").alias("__pos"),
            )
        if pos_deletes:
            dels = spark.read.parquet(*pos_deletes).select(
                F.regexp_replace("file_path", "^file:(//)?", "").alias("file_path"), "pos"
            )
            df = df.join(
                F.broadcast(dels),
                (df["__fp"] == dels["file_path"]) & (df["__pos"] == dels["pos"]),
                "left_anti",
            )
        if eq_deletes:
            # fence by data sequence number: the per-file seq rides in
            # the (manifest-sized, broadcastable) plan — the same way
            # real engines carry it in per-split task metadata
            ice = self.metadata()
            ice_fields = next(
                s for s in ice["schemas"] if s["schema-id"] == ice["current-schema-id"]
            )["fields"]
            by_id = {f["id"]: f["name"] for f in ice_fields}
            seq_map = spark.createDataFrame(
                plan["data"], T.StructType([
                    T.StructField("__sm_path", T.StringType(), False),
                    T.StructField("__dseq", T.LongType(), False),
                ])
            )
            df = df.join(
                F.broadcast(seq_map), df["__fp"] == F.col("__sm_path"), "left"
            ).drop("__sm_path")
            # few delete files expected between compactions; a production
            # variant would union same-key-set files before the anti-join
            for path, dseq, ids in eq_deletes:
                cols = [by_id[i] for i in ids]
                ed = spark.read.parquet(path).select(*cols).dropDuplicates()
                cond = F.lit(dseq) > df["__dseq"]
                for c in cols:
                    cond = cond & df[c].eqNullSafe(ed[c])
                df = df.join(F.broadcast(ed), cond, "left_anti")
            df = df.drop("__dseq")
        if not _with_position and need_pos:
            df = df.drop("__fp", "__pos")
        if predicate is not None:
            col, op, lit = predicate
            c = F.col(col)
            df = df.filter(
                {"==": c == lit, "<": c < lit, "<=": c <= lit, ">": c > lit, ">=": c >= lit}[op]
            )
        order = [f.name for f in schema.fields]
        df = df.select(*(order + (["__fp", "__pos"] if _with_position else [])))
        if columns is not None:
            df = df.select(*columns)
        return df


def write_iceberg(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] | None = None,
) -> IcebergTable:
    return IcebergTable.create(spark, df, path, partition_by)


def read_iceberg(spark: SparkSession, path: str, **kw) -> DataFrame:
    return IcebergTable(path).scan(spark, **kw)
