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

from nil_spark.functions.caching import tether
from nil_spark.functions.hashing import md5_prefix64_py

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


def hyperplane_component_py(plane: int, dim: int) -> float:
    """Pinned pseudo-random hyperplane component in [-1, 1):
    (md5_prefix64('p:<plane>:<dim>') % 2001 - 1000) / 1000.  Computed
    driver-side; the SQL oracle computes the identical expression
    (integer %/−, then IEEE754 divide by 1000.0 in both runtimes)."""
    return (md5_prefix64_py(f"p:{plane}:{dim}") % 2001 - 1000) / 1000.0


def lsh_bucket(
    df: DataFrame, vec_col: str, n_planes: int = ANN_PLANES, dims: int | None = None
) -> DataFrame:
    """Append an int bucket = sign bits of <vec, plane_p> for each pinned
    hyperplane — ONE codegen'd projection per row.  Plane vectors are
    pinned literals computed driver-side, so there is no crossJoin, no
    groupBy-on-the-vector-column, and no shuffle (the round-1 shape
    hashed full 64-dim arrays through an exchange just to reassemble
    rows it already had).  Pass ``dims`` when known (the array length is
    not in the schema); the fallback probes one row — one extra tiny job."""
    if dims is None:
        dims = df.select(F.size(vec_col).alias("d")).first()["d"]
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        pvec = F.array(
            *[F.lit(hyperplane_component_py(p, j)) for j in range(dims)]
        )
        bucket = bucket + F.when(
            _dot(F.col(vec_col), pvec) > 0, F.lit(1 << p).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return df.withColumn("bucket", bucket.cast("int"))


def ivf_assign(
    embeddings: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its max-cosine centroid (ties → lowest
    centroid id).  centroids: (cell_id, cvec), always broadcastable
    (IVF lists are small by construction)."""
    scored = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec")
    ).crossJoin(F.broadcast(centroids)).select(
        "vec_id",
        "vec",
        "cell_id",
        F.round(
            _dot(F.col("vec"), F.col("cvec")) / (_norm(F.col("vec")) * _norm(F.col("cvec"))),
            6,
        ).alias("ccos"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("ccos").desc(), F.col("cell_id"))
    return (
        scored.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") == 1)
        .select("vec_id", "vec", "cell_id")
    )


def kmeans_centroids(
    embeddings: DataFrame,
    n_cells: int = 16,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int | None = None,
) -> DataFrame:
    """Spark-native spherical k-means for IVF coarse quantization:
    deterministic init (the ``n_cells`` vectors with the smallest pinned
    md5-prefix hash of their id — a seedless uniform sample), then
    ``n_iter`` fixed Lloyd iterations.

    Scale shape: each iteration is ONE broadcast-assign pass plus ONE
    groupBy(cell_id) carrying ``dims`` per-dimension avg aggregates
    (map-side combine; no posexplode fan-out — the same single-exchange
    discipline as the minhash/simhash aggregates).  Centroids
    (n_cells × dims doubles) are collected to the driver per iteration
    — a few KB, never data-sized.  Empty cells keep their previous
    centroid.  Returns (cell_id, cvec).
    """
    from nil_spark.functions.hashing import md5_prefix64_col

    spark = embeddings.sparkSession
    if dims is None:
        dims = embeddings.select(F.size(vec_col).alias("d")).first()["d"]
    base = embeddings.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec"))
    seeds = (
        base.withColumn("hk", md5_prefix64_col(F.col("vec_id").cast("string")))
        .orderBy("hk", "vec_id")
        .limit(n_cells)
        .select("vec")
        .collect()
    )
    cents = [[float(x) for x in r["vec"]] for r in seeds]

    for _ in range(n_iter):
        cdf = spark.createDataFrame(
            [(i, c) for i, c in enumerate(cents)], "cell_id int, cvec array<double>"
        )
        assigned = ivf_assign(base, cdf, id_col="vec_id", vec_col="vec")
        means = (
            assigned.groupBy("cell_id")
            .agg(*[F.avg(F.element_at("vec", j + 1)).alias(f"m{j}") for j in range(dims)])
            .collect()
        )
        nxt = list(cents)  # empty cells keep their previous centroid
        for r in means:
            nxt[int(r["cell_id"])] = [float(r[f"m{j}"]) for j in range(dims)]
        cents = nxt

    return spark.createDataFrame(
        [(i, c) for i, c in enumerate(cents)], "cell_id int, cvec array<double>"
    )


def ann_ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    trained: bool = False,
    n_iter: int = 5,
) -> DataFrame:
    """IVF ANN: coarse-quantize vectors into ``n_cells`` inverted lists,
    probe the query's ``n_probe`` nearest cells, exact cosine rerank
    within them.

    ``trained=False`` pins centroids deterministically (the first
    ``n_cells`` vectors by id) — a k-means stand-in that keeps the
    operator oracle-checkable against DuckDB.  ``trained=True`` runs
    the deterministic Spark-native k-means (:func:`kmeans_centroids`)
    for real recall — the production path (distributed FP-sum ordering
    makes its centroids reproducible only to ~1e-15, so it is
    pytest-verified by recall, not by value hash).  The scale shape is
    the same either way: the candidate join touches ~n_probe/n_cells of
    the corpus instead of all of it, and the centroid table is always
    broadcast.
    """
    if trained:
        cents = kmeans_centroids(
            embeddings, n_cells=n_cells, n_iter=n_iter, id_col=id_col, vec_col=vec_col
        )
    else:
        cents = (
            embeddings.orderBy(id_col)
            .limit(n_cells)
            .select(F.col(id_col).cast("int").alias("cell_id"), F.col(vec_col).alias("cvec"))
        )
    assigned = ivf_assign(embeddings, cents, id_col, vec_col)

    # query-side: keep the n_probe best cells per query
    qs = queries.select("query_id", "qvec").crossJoin(F.broadcast(cents)).select(
        "query_id",
        "qvec",
        "cell_id",
        F.round(
            _dot(F.col("qvec"), F.col("cvec")) / (_norm(F.col("qvec")) * _norm(F.col("cvec"))),
            6,
        ).alias("ccos"),
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("ccos").desc(), F.col("cell_id"))
    probes = (
        qs.withColumn("r", F.row_number().over(wq))
        .filter(F.col("r") <= n_probe)
        .select("query_id", "qvec", "cell_id")
    )

    scored = assigned.join(F.broadcast(probes), "cell_id").select(
        "query_id",
        "vec_id",
        F.round(
            _dot(F.col("vec"), F.col("qvec")) / (_norm(F.col("vec")) * _norm(F.col("qvec"))),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
    )


def embedding_neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.35,
    n_planes: int = 4,  # coarser than top-k ANN: recall over candidate cost
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: candidates share an LSH
    sign-bucket (triangular id1 < id2), verified by exact cosine ≥
    threshold — the filter-then-verify discipline on the embedding
    modality.  At scale the bucket self-join replaces the all-pairs
    crossJoin (N²) with Σ per-bucket².

    The vector norm is computed ONCE per vector on the persisted
    bucketed frame, so each candidate pair pays a single dot-product
    fold instead of dot + two norm folds (the ~|bucket|² pair side is
    the hot path; norms there tripled its per-row cost).  The norm
    doubles are the same fold as before, so the rounded cosine — and
    the oracle hash — are unchanged."""
    b = (
        lsh_bucket(
            embeddings.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec")),
            "vec",
            n_planes,
            dims=dims,
        )
        .withColumn("norm", _norm(F.col("vec")))
        .persist()  # both sides of the self-join
    )
    a1, a2 = b.alias("a"), b.alias("b")
    out = (
        a1.join(
            a2,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("id1"),
            F.col("b.vec_id").alias("id2"),
            F.round(
                _dot(F.col("a.vec"), F.col("b.vec"))
                / (F.col("a.norm") * F.col("b.norm")),
                6,
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
    return tether(out, b)


def ann_lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = ANN_PLANES,
    dims: int | None = None,
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
        dims=dims,
    )
    q = lsh_bucket(queries.select("query_id", "qvec"), "qvec", n_planes, dims=dims)
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
