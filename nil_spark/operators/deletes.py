"""Document deletes (live-docs tombstones).

The reference engine is immutable-batch (build once, query once); a
serving index needs deletes.  This is Lucene's liveDocs model rendered
Spark-side: deletes are TOMBSTONES — an append-only sidecar of doc ids
under ``<index-dir>/tombstones/`` — applied at query time; segment data
is never rewritten, and corpus statistics (df, avgdl, N) deliberately
stay as built (scores of surviving docs are unchanged — Lucene
semantics; a rebuild is the "merge" that actually reclaims them).

Two application strategies, both exact:

 * in-kernel exclusion (WAND kernel, DSL executor): the sorted
   tombstone array rides the torrent broadcast and candidates are
   dropped at admission time, before any threshold rises — the same
   soundness argument as filtered search's ``allowed``, so it scales
   to large tombstone sets;
 * over-retrieve + trim (every other topology / positional top-k
   modes): retrieve top-(k + T) where T = |tombstones|, anti-filter,
   renumber.  Exact because removing T docs from a ranking can promote
   at most T ranks — the right shape when deletes are selective (the
   normal serving regime); a mass delete should rebuild instead, which
   the CLI points out when T is a large fraction of the corpus.
"""

from __future__ import annotations

import glob
import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

TOMBSTONE_DIR = "tombstones"


def append_tombstones(
    spark: SparkSession, index_dir: str, ids: DataFrame
) -> int:
    """Append a delete batch (a DataFrame with a ``doc_id`` column) to
    the index's tombstone sidecar; returns the total number of DISTINCT
    tombstoned docs after the append.  Append-only — concurrent readers
    see either the old or the new file set, never a partial file
    (parquet writes are atomic per file)."""
    import uuid

    cast = ids.select(F.col("doc_id").cast("long"))
    n_null = cast.filter(F.col("doc_id").isNull()).count()
    if n_null:
        # a null here is either a null input id or a value long() can't
        # represent — accepting it would poison the sidecar (every
        # later load would crash converting to int64); refuse loudly
        raise ValueError(
            f"{n_null} doc_id value(s) are null or not castable to "
            "long — tombstones must be concrete doc ids"
        )
    d = os.path.join(index_dir, TOMBSTONE_DIR)
    # unique batch name: concurrent deletes (or a retry after a partial
    # failure) must never clobber each other's batch — a counter-based
    # name would collide when two writers glob the same count
    batch = uuid.uuid4().hex[:12]
    cast.distinct().write.mode("overwrite").parquet(
        os.path.join(d, f"batch-{batch}")
    )
    return int(
        spark.read.parquet(os.path.join(d, "batch-*"))
        .select("doc_id").distinct().count()
    )


def load_tombstones(
    spark: SparkSession, index_dir: str
) -> np.ndarray | None:
    """The index's tombstone set as a SORTED unique int64 array, or
    None when the index has no deletes.  Driver-sized by design:
    tombstones are the *selective-delete* mechanism; the array also
    rides worker broadcasts, so both uses need it small relative to
    the corpus."""
    d = os.path.join(index_dir, TOMBSTONE_DIR)
    if not glob.glob(os.path.join(d, "batch-*")):
        return None
    arr = (
        spark.read.parquet(os.path.join(d, "batch-*"))
        .select("doc_id").distinct().toPandas()["doc_id"]
        .to_numpy(np.int64)
    )
    arr.sort()
    return arr


def exclude_and_trim(
    result: DataFrame,
    tombstones: np.ndarray,
    k_col_or_k,
    order_cols: list | None = None,
) -> DataFrame:
    """The generic exact wrapper: ``result`` was retrieved at
    k + len(tombstones); drop tombstoned docs, renumber rank in the
    original order, keep the first k per query.

    ``k_col_or_k`` is an int (uniform k) or the name of a per-query k
    column already present in ``result``.  ``order_cols`` defaults to
    the existing ``rank`` column (every serving path emits one)."""
    spark = result.sparkSession
    tomb_df = spark.createDataFrame(
        [(int(t),) for t in tombstones], "doc_id long"
    )
    order = (
        [F.col(c) for c in order_cols]
        if order_cols
        else [F.col("rank")]
    )
    w = Window.partitionBy("query_id").orderBy(*order)
    out = (
        result.join(F.broadcast(tomb_df), "doc_id", "left_anti")
        .withColumn("__new_rank", F.row_number().over(w))
    )
    if isinstance(k_col_or_k, str):
        out = out.filter(F.col("__new_rank") <= F.col(k_col_or_k))
    else:
        out = out.filter(F.col("__new_rank") <= int(k_col_or_k))
    cols = [
        (F.col("__new_rank").alias("rank") if c == "rank" else F.col(c))
        for c in result.columns
    ]
    return out.select(*cols)
