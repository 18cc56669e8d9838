"""stratified_sample: the per-partition pre-filter + exact window must
equal the naive global rank window (superset property), including when
a stratum's winners are scattered across many input partitions."""

import pandas as pd
from pyspark.sql import Window
from pyspark.sql import functions as F

from nil_spark.functions.hashing import md5_prefix64_col
from nil_spark.operators.sampling import stratified_sample


def _naive(df, strata_col, quota, id_col):
    h = md5_prefix64_col(F.concat(F.lit("t:"), F.col(id_col).cast("string")))
    w = Window.partitionBy(strata_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("strata_rank", F.row_number().over(w))
        .filter(F.col("strata_rank") <= quota)
        .select(id_col, strata_col, F.col("strata_rank").cast("long"))
    )


def test_matches_naive_window_across_partitions(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": range(600),
            "lang": ["en"] * 400 + ["de"] * 150 + ["fr"] * 45 + ["ja"] * 5,
        }
    )
    df = spark.createDataFrame(pdf).repartition(8)
    got = (
        stratified_sample(df, "lang", quota=50, id_col="doc_id")
        .toPandas().sort_values(["lang", "strata_rank"]).reset_index(drop=True)
    )
    exp = (
        _naive(df, "lang", 50, "doc_id")
        .toPandas().sort_values(["lang", "strata_rank"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # quotas: full strata capped at 50, small strata kept whole
    sizes = got.groupby("lang").size()
    assert sizes["en"] == 50 and sizes["de"] == 50
    assert sizes["fr"] == 45 and sizes["ja"] == 5
