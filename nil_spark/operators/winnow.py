"""Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
SIGMOD 2003 — the MOSS algorithm).

Selects, from each doc's rolling k-gram hash stream, the minimum hash
of every w-wide window; the distinct selected hashes are the doc's
fingerprint set.  Guarantees: any shared substring of length
>= k + w - 1 yields at least one shared fingerprint, so fingerprint
intersection is a sound clone/near-dup screen at a fraction of full
shingle volume (~2/(w+1) of positions selected in expectation).

Same domain as the reference's n-gram location phase
(NGramLocation.kt / TokenSequence.kt): where NIL indexes EVERY n-gram,
winnowing indexes a provably-sufficient subsample — the standard
trade at 100 TB corpus scale.

Scale shape: per-doc window-min is a partition-local window function
(one shuffle on doc_id, which a bucketed-by-doc layout eliminates);
the distinct is map-side combinable.  Hashes are the pinned
md5-prefix family so the DuckDB oracle mirrors exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from nil_spark.functions.hashing import md5_prefix64_col


def winnow_fingerprints(
    df: DataFrame,
    k: int = 3,
    w: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, fp) — distinct winnowing-selected k-gram hashes.

    Only full w-windows are taken (docs need >= k + w - 1 tokens);
    shorter docs emit no fingerprints, mirrored by the oracle.
    """
    toks_df = df.select(
        F.col(id_col).alias("doc_id"),
        F.filter(F.split(F.lower(text_col), "[^a-z0-9]+"), lambda x: x != "").alias("toks"),
    ).filter(F.size("toks") >= k + w - 1)
    grams = toks_df.select(
        "doc_id",
        # gram count is known before the explode — carrying it avoids a
        # second unbounded window pass over the (much larger) gram rows
        (F.size("toks") - (k - 1)).alias("ng"),
        F.posexplode(
            F.expr(
                f"transform(sequence(0, size(toks) - {k}),"
                f" i -> concat_ws(' ', slice(toks, i + 1, {k})))"
            )
        ).alias("pos", "gram"),
    ).select("doc_id", "ng", "pos", md5_prefix64_col(F.col("gram")).alias("h"))
    win = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.currentRow, w - 1)
    )
    return (
        grams.withColumn("wmin", F.min("h").over(win))
        .filter(F.col("pos") <= F.col("ng") - w)  # full windows only
        .select("doc_id", F.col("wmin").alias("fp"))
        .distinct()
    )
