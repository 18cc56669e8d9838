"""Structured-Streaming sink into an engine-native Iceberg v2 table.

``foreachBatch`` → :meth:`IcebergTable.append`, with exactly-once
semantics built the same way as the streaming index absorb
(``streaming/incremental.py``) and result sink (``streaming/serving.py``):
the micro-batch id is recorded in the snapshot summary
(``streaming.batch-id``), and a replayed batch (restart after a crash
between the Iceberg commit and the Spark checkpoint commit) is detected
there and skipped, so each batch lands in exactly one snapshot.

This closes the loop on the north-rule input shape: transcripts arrive
as a stream, land in an Iceberg table (one append snapshot per batch,
identity-partitionable), tiny per-batch files are folded by
``rewrite_data_files`` + ``expire_snapshots`` maintenance, and the
batch engine (index build, dedup, quality, clone pipeline) reads the
same table via ``read_iceberg`` / ``cli --format iceberg``.

Scale: per-batch work is one parquet write + KB-sized manifest commits;
state is the table metadata itself (no driver maps).  The single-writer
assumption of the Hadoop-catalog layout matches Structured Streaming's
one-driver execution model.
"""

from __future__ import annotations

import os
from typing import Sequence

from pyspark.sql import DataFrame

from nil_spark.sources.iceberg import IcebergTable

BATCH_KEY = "streaming.batch-id"
WATERMARK_KEY = "streaming.last-batch-id"


def committed_batch_ids(table: IcebergTable) -> set[int]:
    """Batch ids already committed to ``table`` (from snapshot summaries)."""
    try:
        snaps = table.snapshots()
    except FileNotFoundError:
        return set()
    return {
        int(s["summary"][BATCH_KEY])
        for s in snaps
        if BATCH_KEY in s.get("summary", {})
    }


def iceberg_batch_sink(
    table_path: str,
    partition_by: Sequence[str] | None = None,
    *,
    compact_every: int | None = None,
    expire_keep_last: int = 10,
):
    """Returns a ``foreachBatch`` function appending each micro-batch to
    the Iceberg table at ``table_path`` (created on first non-empty
    batch).  With ``compact_every=k``, every k-th batch also rewrites
    the accumulated small files and expires old snapshots — ingest and
    maintenance in one stream, the standard Iceberg streaming pattern.
    """

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        exists = os.path.exists(
            os.path.join(table_path, "metadata", "version-hint.text")
        )
        if batch_df.isEmpty():
            return
        if not exists:
            # create() commits the first append; stamp its batch id by
            # creating empty-then-append so the summary carries the key
            t = IcebergTable.create(
                spark, batch_df.limit(0), table_path, partition_by=partition_by
            )
            t.append(spark, batch_df, summary_extra={BATCH_KEY: str(batch_id)})
            return
        t = IcebergTable(table_path)
        # two-layer replay guard: snapshot summaries catch a crash
        # between append and the property commit; the monotone property
        # watermark survives snapshot EXPIRY (summaries do not)
        last = int(t.metadata()["properties"].get(WATERMARK_KEY, "-1"))
        if batch_id <= last or batch_id in committed_batch_ids(t):
            return  # replayed batch — already in exactly one snapshot
        t.append(spark, batch_df, summary_extra={BATCH_KEY: str(batch_id)})
        t.set_property(WATERMARK_KEY, str(batch_id))
        if compact_every and batch_id > 0 and batch_id % compact_every == 0:
            t.rewrite_data_files(spark)
            t.expire_snapshots(keep_last=expire_keep_last)

    return _sink


def write_stream_to_iceberg(
    stream_df: DataFrame,
    table_path: str,
    checkpoint_dir: str,
    partition_by: Sequence[str] | None = None,
    **sink_kwargs,
):
    """``stream_df.writeStream.foreachBatch(iceberg sink)`` with a
    checkpoint; returns the started StreamingQuery."""
    return (
        stream_df.writeStream.foreachBatch(
            iceberg_batch_sink(table_path, partition_by, **sink_kwargs)
        )
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
