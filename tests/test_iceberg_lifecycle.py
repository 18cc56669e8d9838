"""Iceberg v2 lifecycle beyond the basic scan: equality deletes with
sequence-number fencing, data-file compaction (replace snapshots),
snapshot expiry, and the Structured-Streaming sink with exactly-once
batch commits."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row, functions as F

from nil_spark.sources.avro_codec import read_container
from nil_spark.sources.iceberg import IcebergTable, write_iceberg
from nil_spark.sources.transcripts import TRANSCRIPT_SCHEMA
from nil_spark.streaming.iceberg_sink import (
    BATCH_KEY,
    committed_batch_ids,
    iceberg_batch_sink,
)


@pytest.fixture()
def transcripts_df(spark, transcripts_1k):
    return spark.createDataFrame(transcripts_1k, schema=TRANSCRIPT_SCHEMA)


def test_equality_delete_and_sequence_fence(spark, transcripts_df, tmp_path):
    p = str(tmp_path / "tbl")
    t = write_iceberg(spark, transcripts_df, p)
    victims = transcripts_df.filter("role = 'assistant'").select("conv_id", "turn_idx")
    n_vic = victims.count()
    t.equality_delete(spark, victims)
    # value-addressed delete removed exactly those rows
    assert t.scan(spark).count() == 1000 - n_vic
    assert t.scan(spark).filter("role = 'assistant'").count() == 0
    # the manifest records content=2 + the equality field ids
    plan = t._plan()
    assert plan["eq_deletes"] and not plan["pos_deletes"]
    _path, _seq, eq_ids = plan["eq_deletes"][0]
    assert eq_ids == [1, 2]  # conv_id, turn_idx are schema fields 1 and 2
    # SEQUENCE FENCE: re-append one previously-deleted key — the new row
    # has a higher data sequence number than the delete and must survive
    back = transcripts_df.filter("role = 'assistant'").limit(3)
    t.append(spark, back)
    got = t.scan(spark).filter("role = 'assistant'").count()
    assert got == 3


def test_unknown_equality_column_rejected(spark, transcripts_df, tmp_path):
    t = write_iceberg(spark, transcripts_df, str(tmp_path / "tbl"))
    bad = spark.createDataFrame([Row(nope=1)])
    with pytest.raises(ValueError, match="not in schema"):
        t.equality_delete(spark, bad)


def test_rewrite_data_files_compaction(spark, transcripts_df, tmp_path):
    p = str(tmp_path / "tbl")
    t = write_iceberg(spark, transcripts_df.filter("turn_idx < 2").repartition(4), p)
    t.append(spark, transcripts_df.filter("turn_idx >= 2").repartition(4))
    t.delete_where(spark, F.col("role") == "tool")
    want = sorted(
        (r.conv_id, r.turn_idx, r.text)
        for r in transcripts_df.filter("role <> 'tool'").collect()
    )
    files_before, dels_before, _ = t.plan_files()
    assert len(files_before) > 1 and dels_before
    t.rewrite_data_files(spark, target_files=1)
    files_after, dels_after, _ = t.plan_files()
    # compaction folded files and absorbed the deletes
    assert len(files_after) == 1 and dels_after == []
    got = sorted(
        (r.conv_id, r.turn_idx, r.text) for r in t.scan(spark).collect()
    )
    assert got == want
    # replace snapshot recorded as such; history intact for time travel
    assert t.snapshots()[-1]["summary"]["operation"] == "replace"
    pre_compact_id = t.snapshots()[-2]["snapshot-id"]
    assert t.scan(spark, snapshot_id=pre_compact_id).count() == len(want)


def test_expire_snapshots_removes_unreferenced_files(spark, transcripts_df, tmp_path):
    p = str(tmp_path / "tbl")
    t = write_iceberg(spark, transcripts_df.repartition(3), p)
    t.delete_where(spark, F.col("role") == 'tool')
    t.rewrite_data_files(spark, target_files=1)
    n_live = t.scan(spark).count()
    old_id = t.snapshots()[0]["snapshot-id"]
    removed = t.expire_snapshots(keep_last=1)
    assert removed > 0  # pre-compaction data + delete files are gone
    assert len(t.snapshots()) == 1
    assert t.scan(spark).count() == n_live  # current read unaffected
    with pytest.raises(ValueError, match="unknown snapshot-id"):
        t.scan(spark, snapshot_id=old_id)
    # surviving manifests all resolve (no dangling references)
    _m, manifests = read_container(t.snapshots()[-1]["manifest-list"])
    for mf in manifests:
        assert os.path.exists(mf["manifest_path"])


def test_add_column_schema_evolution(spark, transcripts_df, tmp_path):
    """Additive evolution: the new column reads as null from
    pre-evolution files (no rewrite) and as real values from files
    appended after; scans/deletes keep working across the boundary."""
    from pyspark.sql import types as T

    p = str(tmp_path / "tbl")
    t = write_iceberg(spark, transcripts_df.filter("turn_idx < 1"), p)
    n_old = t.scan(spark).count()
    t.add_column("quality", T.DoubleType())
    assert t.schema().fieldNames()[-1] == "quality"
    # old files surface nulls
    got = t.scan(spark)
    assert got.filter("quality IS NULL").count() == n_old
    # new appends carry values
    newer = transcripts_df.filter("turn_idx = 1").withColumn("quality", F.lit(0.5))
    t.append(spark, newer)
    assert t.scan(spark).filter("quality = 0.5").count() == newer.count()
    assert t.scan(spark).count() == n_old + newer.count()
    # the evolved column participates in scans + equality deletes
    t.equality_delete(spark, t.scan(spark).filter("quality = 0.5")
                      .select("conv_id", "turn_idx").limit(3))
    assert t.scan(spark).count() == n_old + newer.count() - 3
    # field-ids stay unique and monotone across the evolution
    md = t.metadata()
    ids = [f["id"] for s in md["schemas"] for f in s["fields"]]
    assert md["last-column-id"] == max(ids)
    with pytest.raises(ValueError, match="already exists"):
        t.add_column("quality", T.DoubleType())


def test_streaming_sink_exactly_once(spark, transcripts_df, tmp_path):
    """The foreachBatch sink commits each batch id once: a replayed
    batch (same id) is skipped, a new id appends a snapshot."""
    p = str(tmp_path / "stream_tbl")
    sink = iceberg_batch_sink(p)
    b0 = transcripts_df.filter("turn_idx = 0")
    b1 = transcripts_df.filter("turn_idx = 1")
    sink(b0, 0)
    t = IcebergTable(p)
    n0 = t.scan(spark).count()
    assert n0 == b0.count()
    sink(b0, 0)  # replay after simulated crash — must be a no-op
    assert t.scan(spark).count() == n0
    assert committed_batch_ids(t) == {0}
    sink(b1, 1)
    assert t.scan(spark).count() == n0 + b1.count()
    assert committed_batch_ids(t) == {0, 1}
    # batch ids live in snapshot summaries (exactly-once bookkeeping
    # rides the table's own commit protocol, no side state)
    assert [
        s["summary"].get(BATCH_KEY) for s in t.snapshots() if BATCH_KEY in s["summary"]
    ] == ["0", "1"]


def test_streaming_sink_real_stream_with_compaction(spark, transcripts_df, tmp_path):
    """Drive an actual Structured-Streaming query (file source) into the
    sink with compact_every set; the table ends compacted + readable."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    import pyarrow as pa
    import pyarrow.parquet as pq

    pdf = transcripts_df.toPandas()
    # explicit schema: an all-null `tool` slice must stay string-typed
    pa_schema = pa.schema(
        [
            ("conv_id", pa.string()),
            ("turn_idx", pa.int32()),
            ("role", pa.string()),
            ("text", pa.string()),
            ("tool", pa.string()),
            ("ts", pa.timestamp("us")),
        ]
    )
    # three files with pinned mtimes -> deterministic batch order
    for i in range(3):
        part = pdf[pdf["turn_idx"] % 3 == i]
        fp = os.path.join(src, f"b{i}.parquet")
        pq.write_table(
            pa.Table.from_pandas(part, schema=pa_schema, preserve_index=False), fp
        )
        os.utime(fp, (1_700_000_000 + i, 1_700_000_000 + i))
    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    from nil_spark.streaming.iceberg_sink import write_stream_to_iceberg

    p = str(tmp_path / "tbl")
    q = write_stream_to_iceberg(
        stream, p, str(tmp_path / "ckpt"), compact_every=2, expire_keep_last=2
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    t = IcebergTable(p)
    assert t.scan(spark).count() == len(pdf)
    assert len(t.snapshots()) <= 2  # maintenance ran in-stream
