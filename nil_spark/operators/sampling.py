"""Deterministic sampling operators for training-data pipelines.

``stratified_sample`` takes an exact per-stratum quota (e.g. "50 docs
per language") with a pinned hash as the selection order, so the same
rows are chosen across runs, clusters, and the SQL oracle.

Scale shape: the naive formulation is one rank window partitioned by
the stratum column — at 100 TB that is a shuffle where every row of a
hot stratum (a Zipf-dominant language) lands on ONE reducer.  Instead,
a per-partition pre-filter keeps at most ``quota`` rows per stratum per
input partition (an Arrow ``mapInPandas`` pass, no shuffle): the global
top-``quota`` by (hash, id) within a stratum is necessarily a subset of
the union of per-partition top-``quota``s, so the pre-filter is a
correct superset.  The exact rank window then runs over at most
``n_partitions x quota`` rows per stratum — the same map-side-combine
idea Spark applies to aggregates, applied to a rank window.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from nil_spark.functions.hashing import md5_prefix64_col


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    quota: int,
    id_col: str = "doc_id",
    salt: str = "t:",
    rank_name: str = "strata_rank",
) -> DataFrame:
    """Keep the ``quota`` rows with the smallest pinned hash per
    stratum; emit (id, stratum, rank).  Deterministic: selection order
    is (md5-prefix64(salt || id), id)."""
    hcol = md5_prefix64_col(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    pre = df.select(
        F.col(id_col).alias("_id"),
        F.col(strata_col).alias("_stratum"),
        hcol.alias("_h"),
    )

    def head_per_stratum(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf):
                yield (
                    pdf.sort_values(["_stratum", "_h", "_id"])
                    .groupby("_stratum", sort=False)
                    .head(quota)
                )

    survivors = pre.mapInPandas(head_per_stratum, schema=pre.schema)
    w = Window.partitionBy("_stratum").orderBy(
        F.col("_h").asc(), F.col("_id").asc()
    )
    return (
        survivors.withColumn(rank_name, F.row_number().over(w))
        .filter(F.col(rank_name) <= quota)
        .select(
            F.col("_id").alias(id_col),
            F.col("_stratum").alias(strata_col),
            F.col(rank_name).cast("long").alias(rank_name),
        )
    )
