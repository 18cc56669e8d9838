"""Sketch, percentile, pipeline, and per-bucket-hit gate queries.

Same contract as ``agg_queries``: pure JVM-side DataFrame plans with
exact DuckDB oracles under the shared parity rules (doubles rounded to
6 decimals BEFORE ranking; ties by id; no NULLs in oracle output).
``build_registry()`` is merged into ``entry_queries.REGISTRY``.

These add the *approximate/analytic* aggregation surface a full-text
engine serves next to retrieval (Elasticsearch ``cardinality``,
``percentiles``, pipeline aggregations, ``top_hits``, and the ``sort``
clause the doc-values side-car serves in-kernel):

 * cardinality_hll — ES ``cardinality`` agg: a HyperLogLog sketch,
   pinned deterministic cross-system.  Register index/rank come from
   the shared 60-bit md5-prefix hash (``hashing.md5_prefix64_*``);
   rank = leading-zero count of the 52 residual bits + 1, computed
   *integer-exactly* as ``53 - length(bin(w))`` (no float log2, so
   Spark and DuckDB can never disagree at a power-of-two boundary).
   Both HLL branches are exercised: per-type distinct users sits in
   the linear-counting range, distinct user-days in the raw-estimate
   range.  At 100 TB this is THE distinct-count shape: the register
   groupBy is a map-side-combining shuffle of at most m rows per
   group, and sketches merge associatively across segments — exactly
   why ES keeps HLL per shard and merges on the coordinating node.
 * percentiles_agg — ES ``percentiles``: exact linear-interpolation
   quantiles (verified bit-identical between Spark ``percentile`` and
   DuckDB ``quantile_cont``).  Exact is the oracle tier; the scale
   path is the same plan with ``percentile_approx`` (t-digest), one
   mergeable sketch per group, noted in the docstring not gated.
 * pipeline_aggs — ES pipeline aggregations over the date_histogram
   bucket series: ``cumulative_sum``, ``derivative`` (pinned 0 for
   the first bucket, where ES emits no value, to keep the oracle
   null-free), and a trailing 7-day ``moving_fn`` average.  The
   parent histogram is one groupBy; the pipeline windows run on the
   already-reduced bucket set (days — small by construction), so the
   unpartitioned window is driver-trivial at any corpus size.
 * top_hits_agg — ES ``top_hits`` inside a terms agg: per source
   bucket, doc_count plus the top TOPHITS_K docs by n_chars.  One
   rank window partitioned by the bucket key — the classic
   top-N-per-group shape (no per-bucket sort of the full corpus).
 * sort_by_field_topk — Lucene index-sort / ES ``sort`` clause:
   matching docs ranked purely by a numeric field, score never
   computed.  This is the plan-level oracle twin of the engine's
   doc-values side-car serving (``operators/docvalues.py``: the
   replica kernel reads field values positionally from the node-shared
   mmap store); the gate row pins the semantics the kernel must match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nil_spark.functions.hashing import md5_prefix64_col, md5_prefix64_sql

# --------------------------------------------------------- fixed inputs

HLL_M = 256              # registers; p = 8 index bits of the 60-bit hash
HLL_RESID_BITS = 52      # 60 - 8 residual bits feeding the rank

PCT_LEVELS = [0.25, 0.5, 0.75, 0.95, 0.99]

MAVG_WINDOW = 7          # trailing buckets for the moving average

TOPHITS_K = 3

SORT_QUERIES = [
    (0, "query"),
    (1, "scan"),
    (2, "merge"),
    (3, "window"),
]
SORT_K = 10


def _eq():
    from nil_spark.plans import entry_queries as EQ

    return EQ


# --------------------------------------------- q: HLL cardinality sketch


def _hll_estimate(reg: DataFrame, key: str, out: str) -> DataFrame:
    """Fold per-register max ranks into the HLL estimate.  ``reg`` has
    (key, idx, rank) rows — at most HLL_M per key after the max —
    absent registers contribute 2^0 to the harmonic sum and count
    toward V for the linear-counting correction."""
    m = float(HLL_M)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    agg = reg.groupBy(key, "idx").agg(F.max("rank").alias("mr")).groupBy(key).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("mr"))).alias("s"),
        F.count("*").cast("double").alias("present"),
    )
    e_raw = F.lit(alpha * m * m) / (F.col("s") + (F.lit(m) - F.col("present")))
    v = F.lit(m) - F.col("present")
    est = F.when(
        (e_raw <= F.lit(2.5 * m)) & (v > 0), F.lit(m) * F.log(F.lit(m) / v)
    ).otherwise(e_raw)
    return agg.select(key, F.round(est, 6).alias(out))


def q_cardinality_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``cardinality`` aggregation: per event_type, HLL-256 distinct
    estimates for users and for (user, day) pairs, next to the exact
    counts.  Hash = pinned 60-bit md5 prefix; idx = low 8 bits; rank =
    53 - length(bin(h >> 8)) (integer-exact leading-zero count).  The
    ~150-user groups land in the linear-counting branch, the ~1.7k
    user-day groups in the raw-estimate branch — both corrections are
    exercised and oracle-pinned."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")

    def regs(keyed: DataFrame) -> DataFrame:
        h = md5_prefix64_col(F.col("k"))
        w = F.shiftright(h, 8)
        return keyed.select(
            "event_type",
            h.bitwiseAND(F.lit(HLL_M - 1)).alias("idx"),
            F.when(w == 0, F.lit(HLL_RESID_BITS + 1))
            .otherwise(F.lit(HLL_RESID_BITS + 1) - F.length(F.bin(w)))
            .alias("rank"),
        )

    users = regs(e.select("event_type", F.col("user_id").cast("string").alias("k")))
    udays = regs(
        e.select(
            "event_type",
            F.concat_ws(
                "|",
                F.col("user_id").cast("string"),
                F.to_date(F.date_trunc("day", "ts")).cast("string"),
            ).alias("k"),
        )
    )
    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("exact_users"),
        F.countDistinct(
            "user_id", F.to_date(F.date_trunc("day", "ts"))
        ).cast("long").alias("exact_user_days"),
    )
    return (
        exact.join(_hll_estimate(users, "event_type", "hll_users"), "event_type")
        .join(_hll_estimate(udays, "event_type", "hll_user_days"), "event_type")
        .select(
            "event_type", "exact_users", "hll_users",
            "exact_user_days", "hll_user_days",
        )
    )


def _cardinality_hll_sql() -> str:
    m = HLL_M
    h = md5_prefix64_sql("k")
    rank = (
        f"CASE WHEN ({h} >> 8) = 0 THEN {HLL_RESID_BITS + 1} "
        f"ELSE {HLL_RESID_BITS + 1} - length(bin({h} >> 8)) END"
    )

    def est(src: str) -> str:
        return f"""(
  SELECT event_type, round(CASE
      WHEN (0.7213 / (1.0 + 1.079 / {m}.0)) * {m}.0 * {m}.0
             / (s + ({m}.0 - present)) <= 2.5 * {m}.0
           AND ({m}.0 - present) > 0
      THEN {m}.0 * ln({m}.0 / ({m}.0 - present))
      ELSE (0.7213 / (1.0 + 1.079 / {m}.0)) * {m}.0 * {m}.0
             / (s + ({m}.0 - present)) END, 6) AS est
  FROM (SELECT event_type, sum(pow(2.0, -mr)) AS s,
               count(*)::DOUBLE AS present
        FROM (SELECT event_type, {h} & {m - 1} AS idx, max({rank}) AS mr
              FROM {src} GROUP BY 1, 2) r GROUP BY 1) f)"""

    users_src = "(SELECT event_type, user_id::VARCHAR AS k FROM events) u"
    udays_src = (
        "(SELECT event_type, user_id::VARCHAR || '|' ||"
        " (date_trunc('day', ts)::DATE)::VARCHAR AS k FROM events) u"
    )
    return f"""
WITH exact AS (
  SELECT event_type, count(DISTINCT user_id)::BIGINT AS exact_users,
         count(DISTINCT (user_id, date_trunc('day', ts)::DATE))::BIGINT
           AS exact_user_days
  FROM events GROUP BY 1),
hu AS {est(users_src)},
hd AS {est(udays_src)}
SELECT exact.event_type, exact_users, hu.est AS hll_users,
       exact_user_days, hd.est AS hll_user_days
FROM exact JOIN hu ON exact.event_type = hu.event_type
           JOIN hd ON exact.event_type = hd.event_type
"""


# ----------------------------------------------------- q: percentiles


def q_percentiles_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``percentiles`` aggregation per event_type over ``value``:
    exact linear-interpolation quantiles (Spark ``percentile`` ==
    DuckDB ``quantile_cont``, verified bit-identical).  Exact is the
    oracle tier; at 100 TB the same plan swaps in a mergeable t-digest
    — either Spark's built-in ``percentile_approx`` or the engine's
    own deterministic implementation (operators/tdigest.py:
    per-partition mapInPandas digests, associative driver merge,
    rank-error-bounded tests in tests/test_tdigest.py) — never a full
    sort."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    cols = [
        F.round(F.expr(f"percentile(value, {p})"), 6).alias(
            f"p{str(p).replace('0.', '')}"
        )
        for p in PCT_LEVELS
    ]
    return e.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"), *cols
    )


def _percentiles_sql() -> str:
    cols = ", ".join(
        f"round(quantile_cont(value, {p}), 6) AS p{str(p).replace('0.', '')}"
        for p in PCT_LEVELS
    )
    return f"""
SELECT event_type, count(*)::BIGINT AS n, {cols}
FROM events GROUP BY 1
"""


# ---------------------------------------------------- q: pipeline aggs


def q_pipeline_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES pipeline aggregations over the daily date_histogram:
    ``cumulative_sum`` of doc_count, ``derivative`` (first bucket
    pinned 0 where ES emits no value — keeps the oracle null-free),
    and a trailing MAVG_WINDOW-day ``moving_fn`` unweighted average.
    The parent histogram is one groupBy(day) shuffle; the pipeline
    windows run on the already-reduced bucket series (calendar days —
    small by construction at any corpus size), so the unpartitioned
    window never sees corpus-scale data."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    per_day = e.groupBy(
        F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).agg(F.count("*").cast("long").alias("doc_count"))
    wc = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    wm = Window.orderBy("day").rowsBetween(-(MAVG_WINDOW - 1), 0)
    wl = Window.orderBy("day")
    return per_day.select(
        "day",
        "doc_count",
        F.sum("doc_count").over(wc).cast("long").alias("cum_docs"),
        (
            F.col("doc_count")
            - F.coalesce(F.lag("doc_count").over(wl), F.col("doc_count"))
        ).cast("long").alias("deriv"),
        F.round(F.avg("doc_count").over(wm), 6).alias("mavg"),
    )


def _pipeline_aggs_sql() -> str:
    return f"""
WITH per_day AS (
  SELECT date_trunc('day', ts)::DATE AS day, count(*)::BIGINT AS doc_count
  FROM events GROUP BY 1)
SELECT day, doc_count,
       (sum(doc_count) OVER (ORDER BY day
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS cum_docs,
       (doc_count - coalesce(lag(doc_count) OVER (ORDER BY day),
                             doc_count))::BIGINT AS deriv,
       round(avg(doc_count) OVER (ORDER BY day
          ROWS BETWEEN {MAVG_WINDOW - 1} PRECEDING AND CURRENT ROW), 6) AS mavg
FROM per_day
"""


# ------------------------------------------------------- q: top_hits


def q_top_hits_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``top_hits`` inside a terms aggregation: per source bucket,
    the bucket doc_count plus the top TOPHITS_K docs by n_chars desc
    (doc_id asc ties).  One rank window partitioned by the bucket key
    against one broadcast bucket-count join — the standard
    top-N-per-group plan, no global sort."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    counts = d.groupBy("source").agg(F.count("*").cast("long").alias("doc_count"))
    w = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    return (
        d.select("source", "doc_id", "n_chars")
        .withColumn("hit_rank", F.row_number().over(w))
        .filter(F.col("hit_rank") <= TOPHITS_K)
        .join(F.broadcast(counts), "source")
        .select("source", "doc_count", "hit_rank", "doc_id", "n_chars")
    )


def _top_hits_sql() -> str:
    return f"""
WITH counts AS (SELECT source, count(*)::BIGINT AS doc_count
                FROM documents GROUP BY 1)
SELECT d.source, counts.doc_count, hit_rank, doc_id, n_chars
FROM (SELECT source, doc_id, n_chars,
             (row_number() OVER (PARTITION BY source
                ORDER BY n_chars DESC, doc_id))::INT AS hit_rank
      FROM documents) d JOIN counts ON d.source = counts.source
WHERE hit_rank <= {TOPHITS_K}
"""


# -------------------------------------------------- q: sort by field


def q_sort_by_field_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lucene index-sort / ES ``sort`` clause: docs matching a single
    term ranked purely by n_chars desc (doc_id asc ties), score never
    computed.  Plan-level oracle twin of the engine's doc-values
    serving (``operators/docvalues.py`` — the replica kernel reads the
    field positionally from the node-shared mmap side-car; CLI
    ``--mode sort``): this row pins the semantics that kernel must
    match.  Scale shape: broadcast term filter below the rank window;
    with an index the posting list prunes first and only matches are
    ranked."""
    EQ = _eq()
    docs = EQ._docs_toks(spark, sf_dir)
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "n_chars"
    )
    q = spark.createDataFrame(SORT_QUERIES, "query_id long, term string")
    w = Window.partitionBy("query_id").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    return (
        docs.select("doc_id", F.explode("toks").alias("term"))
        .dropDuplicates(["doc_id", "term"])
        .join(F.broadcast(q), "term")
        .join(d, "doc_id")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= SORT_K)
        .select("query_id", "rank", "doc_id", "n_chars")
    )


def _sort_by_field_sql() -> str:
    EQ = _eq()
    vals = ", ".join(f"({i}, '{t}')" for i, t in SORT_QUERIES)
    return f"""
WITH {EQ._DOCS_CTE},
q(query_id, term) AS (VALUES {vals}),
m AS (SELECT DISTINCT q.query_id, docs.doc_id
      FROM docs JOIN q ON list_contains(docs.toks, q.term))
SELECT query_id, rank, doc_id, n_chars FROM (
  SELECT m.query_id, m.doc_id, d.n_chars,
         (row_number() OVER (PARTITION BY m.query_id
            ORDER BY d.n_chars DESC, m.doc_id))::INT AS rank
  FROM m JOIN documents d ON m.doc_id = d.doc_id)
WHERE rank <= {SORT_K}
"""


# ------------------------------------------------------ q: filters agg

FILTER_AGGS = [
    ("hot_join", "join AND hash"),
    ("scan_not_slow", "scan AND NOT slow"),
    ("phrase_fast_query", '"fast query"'),
    ("stream_or_window", "stream OR window"),
    ("near_slow_batch", '"slow batch"~2'),
]


def q_filters_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``filters`` aggregation: named boolean-DSL filters as
    buckets, each with doc_count and avg token length — the query DSL
    (``functions/querylang.py``: AND/OR/NOT/"phrase"/sloppy ~n)
    reused inside the aggregation layer exactly the way ES reuses
    Query DSL filters as bucket definitions.  ALL filters evaluate in
    ONE corpus scan (an array of per-filter match structs exploded);
    the groupBy key space is the filter-name set, so the only shuffle
    is bucket-count-sized at any corpus size."""
    from nil_spark.functions.querylang import compile_spark, parse_query

    EQ = _eq()
    docs = EQ._docs_toks(spark, sf_dir)
    base = docs.withColumn(
        "padded",
        F.concat(F.lit(" "), F.array_join("toks", " "), F.lit(" ")),
    ).withColumn("dl", F.size("toks").cast("double"))
    match_arr = F.array(
        *[
            F.struct(
                F.lit(name).alias("filter_name"),
                compile_spark(
                    parse_query(dsl), F.col("toks"), F.col("padded")
                ).alias("m"),
            )
            for name, dsl in FILTER_AGGS
        ]
    )
    return (
        base.select("dl", F.explode(match_arr).alias("fm"))
        .filter(F.col("fm.m"))
        .groupBy(F.col("fm.filter_name").alias("filter_name"))
        .agg(
            F.count("*").cast("long").alias("doc_count"),
            F.round(F.avg("dl"), 6).alias("avg_dl"),
        )
    )


def _filters_agg_sql() -> str:
    from nil_spark.functions.querylang import compile_duckdb, parse_query

    EQ = _eq()
    arms = "\nUNION ALL\n".join(
        f"SELECT '{name}' AS filter_name, count(*)::BIGINT AS doc_count,"
        f" round(avg(dl), 6) AS avg_dl FROM base"
        f" WHERE {compile_duckdb(parse_query(dsl), 'toks', 'padded')}"
        for name, dsl in FILTER_AGGS
    )
    return f"""
WITH {EQ._DOCS_CTE},
base AS (SELECT toks,
                ' ' || coalesce(array_to_string(toks, ' '), '') || ' ' AS padded,
                len(toks)::DOUBLE AS dl FROM docs)
SELECT * FROM ({arms}) WHERE doc_count > 0
"""


# ---------------------------------------------- q: adjacency matrix


def q_adjacency_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``adjacency_matrix`` aggregation: for the named DSL filters
    (the same FILTER_AGGS set), a bucket per filter AND per pairwise
    intersection ("a&b", ES's key convention, lexicographic), each with
    its doc_count; empty buckets omitted (ES emits only non-empty
    cells).  ONE corpus scan evaluates all filters; the per-doc match
    vector expands to at most F + F(F-1)/2 tiny structs, so the shuffle
    is bucket-keyed regardless of corpus size — exactly why ES caps the
    filter count (default 100) rather than the doc count."""
    from nil_spark.functions.querylang import compile_spark, parse_query

    EQ = _eq()
    docs = EQ._docs_toks(spark, sf_dir)
    base = docs.withColumn(
        "padded",
        F.concat(F.lit(" "), F.array_join("toks", " "), F.lit(" ")),
    )
    names = [name for name, _ in FILTER_AGGS]
    matches = [
        compile_spark(parse_query(dsl), F.col("toks"), F.col("padded"))
        for _, dsl in FILTER_AGGS
    ]
    cells = [
        F.struct(F.lit(names[i]).alias("key"), matches[i].alias("m"))
        for i in range(len(names))
    ] + [
        F.struct(
            F.lit(f"{names[i]}&{names[j]}").alias("key"),
            (matches[i] & matches[j]).alias("m"),
        )
        for i in range(len(names))
        for j in range(i + 1, len(names))
    ]
    return (
        base.select(F.explode(F.array(*cells)).alias("c"))
        .filter(F.col("c.m"))
        .groupBy(F.col("c.key").alias("key"))
        .agg(F.count("*").cast("long").alias("doc_count"))
    )


def _adjacency_matrix_sql() -> str:
    from nil_spark.functions.querylang import compile_duckdb, parse_query

    EQ = _eq()
    names = [name for name, _ in FILTER_AGGS]
    conds = [
        compile_duckdb(parse_query(dsl), "toks", "padded")
        for _, dsl in FILTER_AGGS
    ]
    arms = [
        f"SELECT '{names[i]}' AS key, count(*)::BIGINT AS doc_count"
        f" FROM base WHERE {conds[i]}"
        for i in range(len(names))
    ] + [
        f"SELECT '{names[i]}&{names[j]}', count(*)::BIGINT"
        f" FROM base WHERE ({conds[i]}) AND ({conds[j]})"
        for i in range(len(names))
        for j in range(i + 1, len(names))
    ]
    u = "\nUNION ALL\n".join(arms)
    return f"""
WITH {EQ._DOCS_CTE},
base AS (SELECT toks,
                ' ' || coalesce(array_to_string(toks, ' '), '') || ' ' AS padded
         FROM docs)
SELECT * FROM ({u}) WHERE doc_count > 0
"""


# --------------------------------------------------- q: filtered ANN

ANN_FILTER_K = 10


def q_ann_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-filtered vector search (ES knn ``filter`` / the
    standard vector-store pre-filter): each query (vec_id < 5) ranks
    cosine neighbours ONLY among vectors sharing its ``label`` — the
    predicate prunes BEFORE any distance is computed, as an equi-join
    on the filter key, never a post-filter of an unfiltered top-k
    (which under-fills k).  Scale shape: the filter join replaces the
    brute-force crossJoin entirely; with the IVF/LSH paths the same
    predicate composes as a bucket-key conjunct."""
    from nil_spark.operators.ann import _dot, _norm

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qvec"),
        F.col("label").alias("qlabel"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id")
    )
    return (
        e.join(
            F.broadcast(q),
            e["label"] == q["qlabel"],
        )
        .select(
            "query_id",
            "vec_id",
            F.round(
                _dot(F.col("embedding"), F.col("qvec"))
                / (_norm(F.col("embedding")) * _norm(F.col("qvec"))),
                6,
            ).alias("cosine"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= ANN_FILTER_K)
        .select("query_id", "rank", "vec_id", "cosine")
    )


def _ann_filtered_sql() -> str:
    return f"""
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qvec, label
           FROM embeddings WHERE vec_id < 5),
scored AS (
  SELECT q.query_id, e.vec_id,
         round(list_dot_product(e.embedding::DOUBLE[], q.qvec)
               / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                  * sqrt(list_dot_product(q.qvec, q.qvec))), 6) AS cosine
  FROM embeddings e JOIN q ON e.label = q.label)
SELECT query_id, (row_number() OVER (PARTITION BY query_id
         ORDER BY cosine DESC, vec_id))::INT AS rank, vec_id, cosine
FROM scored QUALIFY rank <= {ANN_FILTER_K}
"""


# ---------------------------------------------------- q: stemmed search

STEM_QUERIES = [
    (0, "tables scans"),     # plural surface form...
    (1, "table scan"),       # ...and the singular: identical ranking
    (2, "joins merges"),
    (3, "windows streams"),
    (4, "sorts filters"),
]
STEM_K = 10


def _stem_col(t):
    """Minimal-English plural folding as a pure column expression —
    the SAME rule ``functions/tokenize.stem_minimal_english`` pins for
    the engine (strip one trailing 's' when len > 3 and the token
    doesn't end in 'ss'/'us'/'is')."""
    cond = (
        (F.length(t) > 3)
        & t.endswith("s")
        & ~t.substr(F.length(t) - 1, F.lit(2)).isin("ss", "us", "is")
    )
    return F.when(cond, t.substr(F.lit(1), F.length(t) - 1)).otherwise(t)


_STEM_SQL = (
    "CASE WHEN length({t}) > 3 AND right({t}, 1) = 's' "
    "AND right({t}, 2) NOT IN ('ss', 'us', 'is') "
    "THEN left({t}, length({t}) - 1) ELSE {t} END"
)


def q_stemmed_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The analysis chain at query level (Lucene analyzer semantics):
    corpus AND query tokens fold through the pinned minimal-English
    plural stemmer before BM25, so plural and singular surface forms
    retrieve identically (queries 0 and 1 return the same ranking by
    construction).  Engine twin: ``EngineConfig(analyzer=
    'minimal_english')`` folds in the single tokenizer choke point
    (``functions/tokenize.tokenize_series``) so every build and serving
    path inherits it, with the config fingerprint drifting to refuse
    unfolded queries (tests/test_analyzer.py).  Scale shape: folding is
    a map-only expression on both sides; the BM25 plan is the standard
    filter-early one."""
    EQ = _eq()
    docs = EQ._docs_toks(spark, sf_dir).select(
        "doc_id", F.transform("toks", _stem_col).alias("toks")
    )
    q = spark.createDataFrame(STEM_QUERIES, "query_id long, qtext string")
    qt = (
        q.select(
            "query_id",
            F.explode(
                F.transform(
                    F.filter(
                        F.split(F.lower("qtext"), EQ.TOKEN_SPLIT),
                        lambda x: x != "",
                    ),
                    _stem_col,
                )
            ).alias("term"),
        )
        .dropDuplicates(["query_id", "term"])
    )
    qterms = qt.select("term").distinct()

    dl = docs.select("doc_id", F.size("toks").cast("double").alias("dl"))
    stats = dl.agg(
        F.count("*").cast("double").alias("n"), F.avg("dl").alias("avgdl")
    )
    tf = (
        docs.select("doc_id", F.explode("toks").alias("term"))
        .join(F.broadcast(qterms), "term")
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("double").alias("tf"))
    )
    dfr = tf.groupBy("term").agg(F.count("*").cast("double").alias("df"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("bm25").desc(), F.col("doc_id")
    )
    return (
        tf.join(F.broadcast(qt), "term")
        .join(F.broadcast(dfr), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id",
            "doc_id",
            (
                F.log(
                    F.lit(1.0)
                    + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                )
                * (F.col("tf") * 2.2)
                / (
                    F.col("tf")
                    + 1.2 * (1.0 - 0.75 + 0.75 * F.col("dl") / F.col("avgdl"))
                )
            ).alias("partial"),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum("partial"), 6).alias("bm25"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= STEM_K)
        .select("query_id", "rank", "doc_id", "bm25")
    )


def _stemmed_search_sql() -> str:
    EQ = _eq()
    qvals = ", ".join(f"({i}, '{t}')" for i, t in STEM_QUERIES)
    stem = _STEM_SQL.format(t="x")
    return f"""
WITH raw AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text),
             '[^a-z0-9]+'), x -> x <> '') AS rt FROM documents),
docs AS (SELECT doc_id, list_transform(rt, x -> {stem}) AS toks FROM raw),
q(query_id, qtext) AS (VALUES {qvals}),
qt AS (SELECT DISTINCT query_id, {_STEM_SQL.format(t="tok")} AS term
       FROM (SELECT query_id, tok
             FROM q, unnest(list_filter(regexp_split_to_array(lower(qtext),
                  '[^a-z0-9]+'), x -> x <> '')) AS u(tok))),
dl AS (SELECT doc_id, len(toks)::DOUBLE AS dl FROM docs),
stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
tf AS (SELECT doc_id, tok AS term, count(*)::DOUBLE AS tf
       FROM docs, unnest(toks) AS u(tok)
       WHERE tok IN (SELECT term FROM qt) GROUP BY 1, 2),
dfr AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1)
SELECT query_id, rank, doc_id, bm25 FROM (
  SELECT g.*, (row_number() OVER (PARTITION BY query_id
               ORDER BY bm25 DESC, doc_id))::INT AS rank
  FROM (
    SELECT qt.query_id, tf.doc_id,
           round(sum( ln(1 + (s.n - dfr.df + 0.5) / (dfr.df + 0.5))
                      * (tf.tf * 2.2)
                      / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) ), 6) AS bm25
    FROM qt JOIN tf USING (term) JOIN dfr USING (term)
         JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats s
    GROUP BY 1, 2) g)
WHERE rank <= {STEM_K}
"""


# ------------------------------------------------- q: cross_fields

XFIELDS_K = 10


def q_crossfields_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """multi_match ``cross_fields`` — the third ES field-combination
    mode next to best_fields (``dismax_topk``) and BM25F
    (``bm25f_topk``): TERM-centric blending.  Each query term is scored
    once per doc with tf = the summed per-field tf and a BLENDED df =
    max of the per-field dfs (the published BlendedTermQuery shape that
    fixes the idf skew best_fields suffers when a term is rare in one
    field but common in another); dl/avgdl are whole-doc.  Same field
    split as ``dismax_topk`` (title = first TITLE_LEN tokens), same
    filter-early plan: the broadcast query-term join sits below the tf
    aggregate."""
    from nil_spark.plans.search_features import TITLE_LEN

    EQ = _eq()
    docs = EQ._docs_toks(spark, sf_dir)
    fields = docs.select(
        "doc_id",
        F.explode(
            F.array(
                F.struct(
                    F.lit("title").alias("field"),
                    F.slice("toks", 1, TITLE_LEN).alias("ftoks"),
                ),
                F.struct(
                    F.lit("body").alias("field"),
                    F.expr(
                        f"slice(toks, {TITLE_LEN + 1},"
                        f" greatest(size(toks) - {TITLE_LEN}, 0))"
                    ).alias("ftoks"),
                ),
            )
        ).alias("fs"),
    ).select("doc_id", "fs.field", "fs.ftoks")

    q = spark.createDataFrame(EQ.BM25_QUERIES, "query_id long, qtext string")
    qt = (
        q.select(
            "query_id",
            F.explode(
                F.filter(F.split(F.lower("qtext"), EQ.TOKEN_SPLIT), lambda x: x != "")
            ).alias("term"),
        )
        .dropDuplicates(["query_id", "term"])
    )
    qterms = qt.select("term").distinct()

    ftf = (
        fields.select("doc_id", "field", F.explode("ftoks").alias("term"))
        .join(F.broadcast(qterms), "term")
        .groupBy("doc_id", "field", "term")
        .agg(F.count("*").cast("double").alias("tf"))
    )
    # blended df: max of per-field dfs (term-centric idf correction)
    dfb = (
        ftf.groupBy("field", "term")
        .agg(F.count("*").cast("double").alias("fdf"))
        .groupBy("term")
        .agg(F.max("fdf").alias("df"))
    )
    tf = ftf.groupBy("doc_id", "term").agg(F.sum("tf").alias("tf"))

    dl = docs.select("doc_id", F.size("toks").cast("double").alias("dl"))
    stats = dl.agg(
        F.count("*").cast("double").alias("n"), F.avg("dl").alias("avgdl")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("xf").desc(), F.col("doc_id")
    )
    return (
        tf.join(F.broadcast(qt), "term")
        .join(F.broadcast(dfb), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id",
            "doc_id",
            (
                F.log(
                    F.lit(1.0)
                    + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                )
                * (F.col("tf") * 2.2)
                / (
                    F.col("tf")
                    + 1.2 * (1.0 - 0.75 + 0.75 * F.col("dl") / F.col("avgdl"))
                )
            ).alias("partial"),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum("partial"), 6).alias("xf"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= XFIELDS_K)
        .select("query_id", "rank", "doc_id", "xf")
    )


def _crossfields_sql() -> str:
    from nil_spark.plans.search_features import TITLE_LEN

    EQ = _eq()
    qvals = ", ".join(f"({i}, '{t}')" for i, t in EQ.BM25_QUERIES)
    return f"""
WITH {EQ._DOCS_CTE},
fields AS (
  SELECT doc_id, 'title' AS field, toks[1:{TITLE_LEN}] AS ftoks FROM docs
  UNION ALL
  SELECT doc_id, 'body', toks[{TITLE_LEN + 1}:] FROM docs),
q(query_id, qtext) AS (VALUES {qvals}),
qt AS (SELECT DISTINCT query_id, tok AS term
       FROM q, unnest(list_filter(regexp_split_to_array(lower(qtext),
            '[^a-z0-9]+'), x -> x <> '')) AS u(tok)),
ftf AS (SELECT doc_id, field, tok AS term, count(*)::DOUBLE AS tf
        FROM fields, unnest(ftoks) AS u(tok)
        WHERE tok IN (SELECT term FROM qt) GROUP BY 1, 2, 3),
dfb AS (SELECT term, max(fdf) AS df FROM (
          SELECT field, term, count(*)::DOUBLE AS fdf
          FROM ftf GROUP BY 1, 2) GROUP BY 1),
tf AS (SELECT doc_id, term, sum(tf) AS tf FROM ftf GROUP BY 1, 2),
dl AS (SELECT doc_id, len(toks)::DOUBLE AS dl FROM docs),
stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl)
SELECT query_id, rank, doc_id, xf FROM (
  SELECT g.*, (row_number() OVER (PARTITION BY query_id
               ORDER BY xf DESC, doc_id))::INT AS rank
  FROM (
    SELECT qt.query_id, tf.doc_id,
           round(sum( ln(1 + (s.n - dfb.df + 0.5) / (dfb.df + 0.5))
                      * (tf.tf * 2.2)
                      / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) ), 6) AS xf
    FROM qt JOIN tf USING (term) JOIN dfb USING (term)
         JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats s
    GROUP BY 1, 2) g)
WHERE rank <= {XFIELDS_K}
"""


# --------------------------------------------------------- registry


def build_registry() -> dict:
    return {
        "cardinality_hll": (q_cardinality_hll, _cardinality_hll_sql()),
        "percentiles_agg": (q_percentiles_agg, _percentiles_sql()),
        "pipeline_aggs": (q_pipeline_aggs, _pipeline_aggs_sql()),
        "top_hits_agg": (q_top_hits_agg, _top_hits_sql()),
        "sort_by_field_topk": (q_sort_by_field_topk, _sort_by_field_sql()),
        "filters_agg": (q_filters_agg, _filters_agg_sql()),
        "ann_filtered_topk": (q_ann_filtered_topk, _ann_filtered_sql()),
        "stemmed_search": (q_stemmed_search, _stemmed_search_sql()),
        "adjacency_matrix": (q_adjacency_matrix, _adjacency_matrix_sql()),
        "crossfields_topk": (q_crossfields_topk, _crossfields_sql()),
    }
