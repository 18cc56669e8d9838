"""Dense, deterministic docID assignment under stable ordering.

The reference assigns doc ids by in-memory insertion order of a
*parallel* preprocessing stream (/root/reference/src/main/kotlin/jp/ac/
osaka_u/sdl/nil/usecase/preprocess/Preprocess.kt:27-49 + NILMain.kt:86)
— nondeterministic across runs.  We pin ordering instead: docID =
row_number under ``(conv_id, turn_idx)``.

Two implementations:

* ``assign_doc_ids`` — the scale path.  ``repartitionByRange`` on the
  ordering key + ``sortWithinPartitions``, a tiny per-partition count
  job, then offsets added via ``mapInPandas`` (TaskContext partition
  id).  No global single-partition window; each partition numbers its
  rows independently against a cumsum offset.  This survives 10^12
  rows: the only driver-side state is one int per partition.

* a global ``row_number()`` window would funnel every row through one
  partition — correct at test scale, catastrophic at 100 TB; we don't
  ship it.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assign_doc_ids(
    df: DataFrame,
    order_cols: list[str] | None = None,
    num_partitions: int | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Add a dense int64 ``doc_id`` = rank of the row under
    ``order_cols`` (default: stable transcript ordering
    ``(conv_id, turn_idx)``).  Deterministic for unique keys."""
    order_cols = order_cols or ["conv_id", "turn_idx"]
    spark = df.sparkSession
    n = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    parted = df.repartitionByRange(n, *order_cols).sortWithinPartitions(*order_cols)
    # Range bounds are sampled; pin them across the two jobs below by
    # materializing the partitioning once.
    parted = parted.persist()
    counts = (
        parted.select(F.spark_partition_id().alias("pid"))
        .groupBy("pid")
        .count()
        .collect()
    )  # <= num_partitions rows on the driver — the only collected state
    by_pid = {r["pid"]: r["count"] for r in counts}
    offsets = {}
    acc = 0
    for pid in range(max(by_pid) + 1 if by_pid else 0):
        offsets[pid] = acc
        acc += by_pid.get(pid, 0)
    b_offsets = spark.sparkContext.broadcast(offsets)

    out_schema = df.schema.add(id_col, "long", False)

    def number(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        seen = b_offsets.value.get(pid, 0)
        for pdf in it:
            pdf = pdf.copy()
            pdf[id_col] = range(seen, seen + len(pdf))
            seen += len(pdf)
            yield pdf

    out = parted.mapInPandas(number, schema=out_schema)
    return out
