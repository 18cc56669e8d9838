"""Bucketed co-located join: pre-bucketing the posting relation by its
join key removes the exchange entirely — the 100 TB answer to the
candidate self-join's shuffle (bucket once at write time, join
shuffle-free forever after)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _shingle_rel(spark, transcripts_1k):
    docs = spark.createDataFrame(
        transcripts_1k[["text"]].reset_index().rename(columns={"index": "doc_id"})
    )
    t = docs.select(
        "doc_id",
        F.filter(F.split(F.lower("text"), "[^a-z0-9]+"), lambda x: x != "").alias(
            "toks"
        ),
    )
    sh = F.when(
        F.size("toks") >= 3,
        F.expr(
            "transform(sequence(0, size(toks) - 3),"
            " i -> concat_ws(' ', slice(toks, i + 1, 3)))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    return t.select("doc_id", F.explode(F.array_distinct(sh)).alias("shingle"))


def _plan(df) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def test_bucketed_self_join_has_no_exchange(spark, transcripts_1k):
    g = _shingle_rel(spark, transcripts_1k.head(300))
    spark.sql("DROP TABLE IF EXISTS g_bucketed")
    (
        g.write.bucketBy(8, "shingle")
        .sortBy("shingle", "doc_id")
        .mode("overwrite")
        .saveAsTable("g_bucketed")
    )
    t = spark.table("g_bucketed")
    a, b = t.alias("a"), t.alias("b")
    joined = a.join(
        b,
        (F.col("a.shingle") == F.col("b.shingle"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(F.col("a.doc_id").alias("id1"), F.col("b.doc_id").alias("id2"))

    # the fixture is tiny, so Catalyst would broadcast (which is also
    # shuffle-free but doesn't exist at 100 TB on both sides); disable
    # it to show the big-x-big co-located shape
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(joined)
        assert "SortMergeJoin" in plan, plan[:3000]
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan[:3000]}"

        # co-located result identical to the plain shuffled join
        ap, bp = g.alias("a"), g.alias("b")
        expected = (
            ap.join(
                bp,
                (F.col("a.shingle") == F.col("b.shingle"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(F.col("a.doc_id").alias("id1"), F.col("b.doc_id").alias("id2"))
            .distinct()
            .count()
        )
        assert joined.distinct().count() == expected > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
