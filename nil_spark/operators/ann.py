"""Approximate-nearest-neighbor search over embedding columns.

Brute-force cosine top-k as the exact baseline (JVM-side
``zip_with``/``aggregate`` fold — no Python, no UDF), and a
random-hyperplane LSH-bucketed variant as the scale path: at 100 TB the
crossJoin is infeasible, so queries only score candidates in matching
sign-buckets.  Hyperplane components are derived from the pinned
md5-prefix hash so the LSH variant is *deterministic* and has an exact
DuckDB oracle despite being approximate w.r.t. brute force.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from nil_spark.functions.hashing import md5_prefix64_col

ANN_PLANES = 8  # LSH hyperplanes → 2^8 buckets


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k: (query_id, rank, vec_id, cosine).

    queries: (query_id, qvec).  Queries are broadcast; candidates are
    scored in one codegen'd projection, ranked per query.
    """
    cand = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec")
    )
    q = queries.select("query_id", F.col("qvec"))
    scored = cand.crossJoin(F.broadcast(q)).select(
        "query_id",
        "vec_id",
        F.round(
            _dot(F.col("vec"), F.col("qvec"))
            / (_norm(F.col("vec")) * _norm(F.col("qvec"))),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
    )


def hyperplane_component(plane: F.Column, dim: F.Column) -> F.Column:
    """Pinned pseudo-random hyperplane component in [-1, 1):
    (md5_prefix64('p:<plane>:<dim>') % 2001 - 1000) / 1000."""
    key = F.concat_ws(":", F.lit("p"), plane.cast("string"), dim.cast("string"))
    return (md5_prefix64_col(key) % 2001 - 1000) / 1000.0


def lsh_bucket(df: DataFrame, vec_col: str, n_planes: int = ANN_PLANES) -> DataFrame:
    """Append an int bucket = sign bits of <vec, plane_p> for each pinned
    hyperplane."""
    spark = df.sparkSession
    dims = df.select(F.size(vec_col).alias("d")).limit(1).collect()[0]["d"]
    planes = spark.range(n_planes).select(
        F.col("id").cast("int").alias("plane"),
        F.array(
            *[hyperplane_component(F.col("id"), F.lit(j)) for j in range(dims)]
        ).alias("pvec"),
    )
    sig = (
        df.crossJoin(F.broadcast(planes))
        .select(
            *df.columns,
            F.when(
                _dot(F.col(vec_col), F.col("pvec")) > 0,
                F.expr("shiftleft(CAST(1 AS BIGINT), plane)"),
            )
            .otherwise(F.lit(0).cast("long"))
            .alias("bit"),
        )
        .groupBy(*df.columns)
        .agg(F.sum("bit").cast("int").alias("bucket"))
    )
    return sig


def ann_lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = ANN_PLANES,
) -> DataFrame:
    """LSH-bucketed ANN: exact cosine rerank within the query's bucket.

    Deterministic-approximate: recall < 1 vs brute force, but the
    bucketing is pinned, so results are reproducible and oracle-checkable.
    At scale the bucket join replaces the full crossJoin — each query
    touches ~N/2^planes candidates.
    """
    cand = lsh_bucket(
        embeddings.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec")),
        "vec",
        n_planes,
    )
    q = lsh_bucket(queries.select("query_id", "qvec"), "qvec", n_planes)
    scored = cand.join(F.broadcast(q), "bucket").select(
        "query_id",
        "vec_id",
        F.round(
            _dot(F.col("vec"), F.col("qvec"))
            / (_norm(F.col("vec")) * _norm(F.col("qvec"))),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
    )
