"""Iceberg partition transforms (sources/iceberg.py): day/hour/month/
year, bucket[N] (spec-pinned murmur3), truncate[W] — write-path derived
partitioning, manifest partition values, and transform-aware scan-plan
file pruning, checked against brute-force pandas filters."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
import pytest

from nil_spark.functions.hashing import (
    iceberg_bucket_long,
    iceberg_bucket_str,
    mmh3_32,
    mmh3_32_i64,
)
from nil_spark.sources.iceberg import (
    IcebergTable,
    _parse_partition_item,
    _transform_py,
)


# ------------------------------------------------- murmur3 spec pins


def test_murmur3_spec_vectors():
    # Iceberg spec Appendix B: hashLong(34) and hashString("iceberg")
    assert mmh3_32((34).to_bytes(8, "little")) == 2017239379
    assert mmh3_32(b"iceberg") == 1210000089


def test_murmur3_vectorized_matches_scalar():
    v = np.array([0, 1, -1, 34, 2**40, -(2**40), 2**62], np.int64)
    got = mmh3_32_i64(v)
    for i, x in enumerate(v):
        assert int(got[i]) == mmh3_32(
            int(x).to_bytes(8, "little", signed=True)
        )


def test_bucket_helpers():
    assert iceberg_bucket_long(34, 16) == (2017239379 & 0x7FFFFFFF) % 16
    assert iceberg_bucket_str("iceberg", 16) == (1210000089 & 0x7FFFFFFF) % 16
    arr = iceberg_bucket_long(np.array([34, 35], np.int64), 16)
    assert int(arr[0]) == iceberg_bucket_long(34, 16)


# --------------------------------------------------- spec parsing


def test_parse_partition_items():
    assert _parse_partition_item("role") == ("role", "identity", "role")
    assert _parse_partition_item("day(ts)") == ("ts", "day", "ts_day")
    assert _parse_partition_item("hour(ts)") == ("ts", "hour", "ts_hour")
    assert _parse_partition_item("bucket(16, conv_id)") == (
        "conv_id",
        "bucket[16]",
        "conv_id_bucket",
    )
    assert _parse_partition_item("truncate(4, turn_idx)") == (
        "turn_idx",
        "truncate[4]",
        "turn_idx_trunc",
    )
    with pytest.raises(ValueError, match="positive width"):
        _parse_partition_item("bucket(col)")
    with pytest.raises(ValueError, match="takes no width"):
        _parse_partition_item("day(3, ts)")


def test_transform_py():
    t0 = dt.datetime(2026, 1, 1)
    assert _transform_py("day", t0, "timestamp") == 20454
    assert _transform_py("hour", t0, "timestamp") == 20454 * 24
    assert _transform_py("year", t0, "timestamp") == 56
    assert _transform_py("month", dt.datetime(2026, 2, 1), "timestamp") == (
        56 * 12 + 1
    )
    assert _transform_py("truncate[10]", 37, "long") == 30
    assert _transform_py("truncate[10]", -3, "long") == -10
    assert _transform_py("truncate[3]", "assistant", "string") == "ass"
    assert _transform_py("bucket[16]", 34, "long") == iceberg_bucket_long(
        34, 16
    )
    assert _transform_py("bucket[16]", "iceberg", "string") == (
        iceberg_bucket_str("iceberg", 16)
    )


def test_transform_py_timestamp_micros_exact():
    """Epoch-micros must be computed with integer arithmetic: float
    seconds via .timestamp() lose 1µs for ~1% of microsecond-precision
    values, so bucket[N] would hash a different value than the write
    path (exact datetime64[us]→int64) and mis-prune the file holding
    the match (round-4 ADVICE, reproduced literal)."""
    v = dt.datetime(2004, 7, 20, 19, 48, 54, 935922)
    exact = 1090352934935922  # pandas: Timestamp(v).value // 1000
    assert pd.Timestamp(v).value // 1000 == exact
    for n in (4, 16, 128):
        assert _transform_py(f"bucket[{n}]", v, "timestamp") == int(
            iceberg_bucket_long(exact, n)
        )
    # day/hour path uses the same exact conversion
    assert _transform_py("day", v, "timestamp") == exact // (86400 * 10**6)
    assert _transform_py("hour", v, "timestamp") == exact // (3600 * 10**6)


# ------------------------------------------------- table round-trips


def _mk_pdf(n: int = 60) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "conv_id": [f"c{i % 7}" for i in range(n)],
            "turn_idx": list(range(n)),
            "role": ["user", "assistant", "tool"][0:1] * 0
            + [["user", "assistant", "tool"][i % 3] for i in range(n)],
            "text": [f"msg {i}" for i in range(n)],
            "ts": [
                pd.Timestamp("2026-01-01")
                + pd.Timedelta(days=i // 12, hours=i % 5)
                for i in range(n)
            ],
        }
    )


@pytest.fixture(scope="module")
def transformed_table(spark, tmp_path_factory):
    pdf = _mk_pdf()
    path = str(tmp_path_factory.mktemp("ice_tr") / "tbl")
    t = IcebergTable.create(
        spark,
        spark.createDataFrame(pdf),
        path,
        partition_by=[
            "role",  # identity
            "day(ts)",
            "bucket(4, conv_id)",
            "truncate(10, turn_idx)",
        ],
    )
    return t, pdf


def test_roundtrip_mixed_transforms(spark, transformed_table):
    t, pdf = transformed_table
    assert [(f["name"], f["transform"]) for f in t.partition_fields()] == [
        ("role", "identity"),
        ("ts_day", "day"),
        ("conv_id_bucket", "bucket[4]"),
        ("turn_idx_trunc", "truncate[10]"),
    ]
    # identity col reattached from path; derived cols absent; all rows back
    back = (
        t.scan(spark)
        .toPandas()
        .sort_values("turn_idx")
        .reset_index(drop=True)
    )
    assert list(back.columns) == list(pdf.columns)
    exp = pdf.sort_values("turn_idx").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        back[["conv_id", "turn_idx", "role", "text"]],
        exp[["conv_id", "turn_idx", "role", "text"]],
    )
    assert (back.ts.to_numpy() == exp.ts.to_numpy()).all()


@pytest.mark.parametrize(
    "pred,expect",
    [
        (("ts", ">=", dt.datetime(2026, 1, 3)), lambda p: p.ts >= "2026-01-03"),
        (("ts", "<", dt.datetime(2026, 1, 2)), lambda p: p.ts < "2026-01-02"),
        (("ts", "==", dt.datetime(2026, 1, 1)), lambda p: p.ts == "2026-01-01"),
        (("conv_id", "==", "c3"), lambda p: p.conv_id == "c3"),
        (("turn_idx", ">=", 30), lambda p: p.turn_idx >= 30),
        (("turn_idx", "<=", 9), lambda p: p.turn_idx <= 9),
        (("role", "==", "tool"), lambda p: p.role == "tool"),
    ],
)
def test_pruned_scan_correct(spark, transformed_table, pred, expect):
    t, pdf = transformed_table
    files_all, _, _ = t.plan_files()
    files, _, pruned = t.plan_files(predicate=pred)
    assert pruned > 0, f"no files pruned for {pred}"
    assert len(files) + pruned == len(files_all)
    got = t.scan(spark, predicate=pred).toPandas()
    assert len(got) == int(expect(pdf).sum()), pred


def test_bucket_range_predicate_does_not_misprune(spark, transformed_table):
    """Buckets are unordered — a range predicate on the bucket source
    column must not prune on the partition value (bounds may still
    prune, but results stay exact)."""
    t, pdf = transformed_table
    got = t.scan(spark, predicate=("conv_id", ">=", "c5")).toPandas()
    assert len(got) == int((pdf.conv_id >= "c5").sum())


def test_append_and_delete_on_transformed_table(spark, tmp_path):
    pdf = _mk_pdf(30)
    path = str(tmp_path / "tbl")
    t = IcebergTable.create(
        spark,
        spark.createDataFrame(pdf),
        path,
        partition_by=["day(ts)", "bucket(4, conv_id)"],
    )
    more = _mk_pdf(30)
    more["turn_idx"] += 100
    t.append(spark, spark.createDataFrame(more))
    assert t.scan(spark).count() == 60
    from pyspark.sql import functions as F

    n = t.delete_where(spark, F.col("turn_idx") < 5)
    assert n == 5
    assert t.scan(spark).count() == 55
    # compaction rewrite keeps rows and recomputes derived partitioning
    t.rewrite_data_files(spark, target_files=2)
    back = t.scan(spark).toPandas()
    assert len(back) == 55 and back.turn_idx.min() == 5


def test_create_errors(spark, tmp_path):
    pdf = _mk_pdf(5)
    df = spark.createDataFrame(pdf)
    with pytest.raises(ValueError, match="not in schema"):
        IcebergTable.create(
            spark, df, str(tmp_path / "a"), partition_by=["day(nope)"]
        )
    df2 = df.withColumn("ts_day", df.turn_idx)
    with pytest.raises(ValueError, match="collides"):
        IcebergTable.create(
            spark, df2, str(tmp_path / "b"), partition_by=["day(ts)"]
        )
    # two transforms of the same source derive the same field name —
    # the second withColumn would silently overwrite the first
    with pytest.raises(ValueError, match="another partition field"):
        IcebergTable.create(
            spark, df, str(tmp_path / "c"),
            partition_by=["bucket(4, conv_id)", "bucket(8, conv_id)"],
        )
    # the spec defines no bucket over float/double — reject instead of
    # silently truncating fractions to int64
    df3 = df.withColumn("score", df.turn_idx.cast("double"))
    with pytest.raises(ValueError, match="not defined over"):
        IcebergTable.create(
            spark, df3, str(tmp_path / "d"), partition_by=["bucket(4, score)"]
        )


def test_streaming_sink_with_transform_partitioning(spark, tmp_path):
    """The foreachBatch Iceberg sink accepts transform specs: each
    micro-batch lands day-partitioned with bucket sub-dirs, the table
    reads back whole, and incremental append planning carries the
    derived partition values."""
    from nil_spark.streaming.iceberg_sink import iceberg_batch_sink

    p = str(tmp_path / "stream_tbl")
    sink = iceberg_batch_sink(
        p, partition_by=["day(ts)", "bucket(2, conv_id)"]
    )
    pdf = _mk_pdf(40)
    df = spark.createDataFrame(pdf)
    sink(df.filter("turn_idx < 20"), 0)
    sink(df.filter("turn_idx >= 20"), 1)
    t = IcebergTable(p)
    assert [f["transform"] for f in t.partition_fields()] == [
        "day",
        "bucket[2]",
    ]
    assert t.scan(spark).count() == 40
    files = t.incremental_files(0)
    assert files and all(
        set(pv) == {"ts_day", "conv_id_bucket"} for _p, _s, pv in files
    )
    # pruning works on the streamed table too
    _, _, pruned = t.plan_files(
        predicate=("ts", "<", dt.datetime(2026, 1, 2))
    )
    assert pruned > 0
