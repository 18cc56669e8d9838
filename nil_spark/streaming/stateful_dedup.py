"""Custom stateful streaming operator: exact near-real-time dedup with
``applyInPandasWithState``.

A training-data ingest stream wants every arriving document tagged
duplicate/canonical immediately, not in a nightly batch job.  State is
partitioned by a hash prefix (256 groups): each group's GroupState
holds the content hashes it has ever seen with the first doc id that
carried them, so the operator scales by adding shuffle partitions — no
global structure, no driver state (the Spark analog of a sharded
dedup-service keyspace).

Output per input row: (doc_id, h, is_dup, canon_id) where canon_id is
the doc that first introduced the hash (within a batch, rows are
processed in ascending doc_id so the assignment is deterministic).
Matches the batch ``exact_dedup`` canonical assignment whenever the
stream arrives in ascending doc_id order.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

DOC_SCHEMA = "doc_id long, text string"

_OUT_TYPE = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("h", StringType()),
        StructField("is_dup", BooleanType()),
        StructField("canon_id", LongType()),
    ]
)
_STATE_TYPE = StructType([StructField("seen_json", StringType())])


def _dedup_fn(key, pdf_iter, state: GroupState):
    seen: dict = json.loads(state.get[0]) if state.exists else {}
    outs = []
    for pdf in pdf_iter:
        pdf = pdf.sort_values("doc_id", kind="mergesort")
        is_dup, canon = [], []
        for did, h in zip(pdf["doc_id"], pdf["h"]):
            first = seen.get(h)
            if first is None:
                seen[h] = int(did)
                is_dup.append(False)
                canon.append(int(did))
            else:
                is_dup.append(True)
                canon.append(int(first))
        outs.append(
            pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "h": pdf["h"],
                    "is_dup": is_dup,
                    "canon_id": pd.Series(canon, dtype="int64", index=pdf.index),
                }
            )
        )
    state.update((json.dumps(seen),))
    yield from outs


def streaming_exact_dedup(
    spark: SparkSession,
    input_glob: str,
    checkpoint_dir: str,
    out_dir: str,
    schema: str = DOC_SCHEMA,
) -> None:
    """Drain available input once (Trigger.AvailableNow), appending the
    tagged rows to ``out_dir``; state survives across drains through
    the checkpoint, so a doc arriving in a later batch still dedups
    against everything before it."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_glob)
        .withColumn("h", F.md5("text"))
        .withColumn("grp", F.substring("h", 1, 2))
    )
    tagged = stream.groupBy("grp").applyInPandasWithState(
        _dedup_fn, _OUT_TYPE, _STATE_TYPE, "append", GroupStateTimeout.NoTimeout
    )
    q = (
        tagged.writeStream.format("parquet")
        .option("path", out_dir)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
