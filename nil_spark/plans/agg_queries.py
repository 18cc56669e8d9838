"""Similarity-module, aggregation, and suggestion gate queries.

Same contract as ``entry_queries`` / ``relevance_queries``: every query
is pure JVM-side DataFrame expressions with an exact DuckDB oracle,
pinned to the shared parity rules (tokenize on ``[^a-z0-9]+``; doubles
rounded to 6 decimals BEFORE ranking; ties by id).
``build_registry()`` is merged into ``entry_queries.REGISTRY``.

These round out the retrieval surface with the remaining standard
Lucene/Elasticsearch operations a full-text-index user expects —
public-knowledge semantics, re-expressed as Spark plans (the reference
NIL exposes only the clone pipeline over its index; a search engine on
the same structures also serves alternative similarities, histogram /
composite aggregations, regexp term expansion, and phrase suggestion):

 * lm_dirichlet_topk — LM Dirichlet similarity (Lucene
   ``LMDirichletSimilarity``, the standard pluggable alternative to
   BM25): per matched term ``ln(1 + tf/(mu*p_t)) + ln(mu/(dl+mu))``
   with ``p_t = cf_t / total_tokens``, mu = 2000;
 * dismax_topk — multi_match best_fields (Elasticsearch default): a
   dis_max over per-field BM25 scores with a tie_breaker, the
   contrast to BM25F's fold-tf-first weighting already gated as
   ``bm25f_topk``;
 * date_histogram — ES date_histogram with ``min_doc_count: 0`` +
   ``extended_bounds`` semantics: EVERY calendar-day bucket across the
   data's span is emitted, zero-filled when empty (the property that
   distinguishes it from a plain GROUP BY, which ``events_trend``
   already covers);
 * composite_agg — ES composite aggregation with after-key
   pagination: buckets keyed (source, lang) in key order, page 2 of
   size COMPOSITE_PAGE returned;
 * regexp_search — Lucene RegexpQuery with the scoring boolean
   rewrite: anchored regex expansion over the term DICTIONARY (never
   the corpus), BM25 sum over matched terms;
 * phrase_suggest — ES phrase suggester ("did you mean"): per-slot
   candidate generation (edit distance <= MAX_EDITS against the vocabulary,
   top CAND_PER_SLOT by collection frequency) then whole-phrase
   ranking under a Laplace-smoothed bigram language model.

Scale notes: every query keeps the corpus on one side of broadcast
joins only.  lm_dirichlet / dismax / regexp are filter-early — the
(tiny) query-term / matched-dictionary set is broadcast BELOW the tf
aggregate, so only matching occurrences ever shuffle.  date_histogram
and composite_agg are single-shuffle groupBys (the bucket-key space is
small by construction; composite's page filter prunes on the sort key
exactly the way ES resumes from ``after``).  phrase_suggest touches
the corpus twice (unigram + bigram counts, each one groupBy); the
candidate cross-product is capped at CAND_PER_SLOT^2 per phrase and
stays on the driver-broadcast side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# --------------------------------------------------------- fixed inputs

LMD_MU = 2000.0
LMD_K = 10

DISMAX_TIE = 0.3
DISMAX_K = 10

COMPOSITE_PAGE = 6      # page size; the gate query returns page 2

REGEXP_QUERIES = [
    (0, "qu[ae]ry"),        # character class: query
    (1, "s[ck]an"),         # scan
    (2, "[bf]a(st|tch)"),   # alternation inside the term: fast, batch
    (3, "jo.n|merge"),      # top-level alternation + any-char: join, merge
    (4, "zz+"),             # matches nothing: empty result
]
REGEXP_K = 10

SUGGEST_PHRASES = [
    (0, "hassh joni"),      # both slots misspelled
    (1, "tabel sacn"),      # transposition-ish errors
    (2, "fast quer"),       # second slot truncated
    (3, "slow batc"),       # real bigram after correction
]
MAX_EDITS = 2            # ES phrase-suggester max_edits
CAND_PER_SLOT = 5
SUGGEST_TOPN = 3


def _eq():
    from nil_spark.plans import entry_queries as EQ

    return EQ


# ------------------------------------------- q: LM Dirichlet similarity


def q_lm_dirichlet_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LM Dirichlet ranking over the BM25 query set: score(q, d) =
    sum over matched terms of ln(1 + tf/(mu*p_t)) + ln(mu/(dl+mu)),
    p_t = cf_t/T (collection frequency over total tokens), mu = 2000 —
    Lucene ``LMDirichletSimilarity`` semantics with the doc-length
    normalizer applied once per matched term.  Filter-early: the
    broadcast query-term join sits below the tf aggregate, and cf_t is
    recovered exactly from the filtered rows (they ARE all occurrences
    of t), so the only corpus-wide aggregate is the scalar total."""
    EQ = _eq()
    docs = EQ._docs_toks(spark, sf_dir)
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

    dl = docs.select("doc_id", F.size("toks").cast("double").alias("dl"))
    total = dl.agg(F.sum("dl").alias("t"))
    tf = (
        docs.select("doc_id", F.explode("toks").alias("term"))
        .join(F.broadcast(qterms), "term")
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("double").alias("tf"))
    )
    cf = tf.groupBy("term").agg(F.sum("tf").alias("cf"))

    w = Window.partitionBy("query_id").orderBy(F.col("lmd").desc(), F.col("doc_id"))
    mu = F.lit(LMD_MU)
    return (
        tf.join(F.broadcast(qt), "term")
        .join(F.broadcast(cf), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(total))
        .select(
            "query_id",
            "doc_id",
            (
                F.log(F.lit(1.0) + F.col("tf") / (mu * F.col("cf") / F.col("t")))
                + F.log(mu / (F.col("dl") + mu))
            ).alias("partial"),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum("partial"), 6).alias("lmd"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= LMD_K)
        .select("query_id", "rank", "doc_id", "lmd")
    )


def _lm_dirichlet_sql() -> str:
    EQ = _eq()
    qvals = ", ".join(f"({i}, '{t}')" for i, t in EQ.BM25_QUERIES)
    return f"""
WITH {EQ._DOCS_CTE},
q(query_id, qtext) AS (VALUES {qvals}),
qt AS (SELECT DISTINCT query_id, tok AS term
       FROM q, unnest(list_filter(regexp_split_to_array(lower(qtext),
            '[^a-z0-9]+'), x -> x <> '')) AS u(tok)),
dl AS (SELECT doc_id, len(toks)::DOUBLE AS dl FROM docs),
tot AS (SELECT sum(dl) AS t FROM dl),
tf AS (SELECT doc_id, tok AS term, count(*)::DOUBLE AS tf
       FROM docs, unnest(toks) AS u(tok)
       WHERE tok IN (SELECT term FROM qt) GROUP BY 1, 2),
cf AS (SELECT term, sum(tf) AS cf FROM tf GROUP BY 1)
SELECT query_id, rank, doc_id, lmd FROM (
  SELECT g.*, (row_number() OVER (PARTITION BY query_id ORDER BY lmd DESC, doc_id))::INT AS rank
  FROM (
    SELECT qt.query_id, tf.doc_id,
           round(sum( ln(1 + tf.tf / ({LMD_MU} * cf.cf / tot.t))
                      + ln({LMD_MU} / (dl.dl + {LMD_MU})) ), 6) AS lmd
    FROM qt JOIN tf USING (term) JOIN cf USING (term)
         JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN tot
    GROUP BY 1, 2) g)
WHERE rank <= {LMD_K}
"""


# --------------------------------------------- q: dis_max (best_fields)


def q_dismax_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """multi_match best_fields: per-field BM25 over the title field
    (first TITLE_LEN tokens) and the body (rest), combined per doc as
    dis_max = max(field scores) + tie_breaker * (sum - max).  Field
    statistics are per-field the way Lucene keeps them: df counts docs
    whose FIELD contains the term; avgdl and docCount n are over docs
    where the field is non-empty.  Contrast with ``bm25f_topk`` (fold
    tfs into one saturation) — ES's default multi_match is this one."""
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

    dl = fields.filter(F.size("ftoks") > 0).select(
        "doc_id", "field", F.size("ftoks").cast("double").alias("dl")
    )
    stats = dl.groupBy("field").agg(
        F.count("*").cast("double").alias("n"), F.avg("dl").alias("avgdl")
    )

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

    tf = (
        fields.select("doc_id", "field", F.explode("ftoks").alias("term"))
        .join(F.broadcast(qterms), "term")
        .groupBy("doc_id", "field", "term")
        .agg(F.count("*").cast("double").alias("tf"))
    )
    dfr = tf.groupBy("field", "term").agg(F.count("*").cast("double").alias("df"))

    per_field = (
        tf.join(F.broadcast(qt), "term")
        .join(F.broadcast(dfr), ["field", "term"])
        .join(dl, ["doc_id", "field"])
        .join(F.broadcast(stats), "field")
        .select(
            "query_id",
            "doc_id",
            "field",
            (
                F.log(F.lit(1.0) + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5))
                * (F.col("tf") * 2.2)
                / (F.col("tf") + 1.2 * (1.0 - 0.75 + 0.75 * F.col("dl") / F.col("avgdl")))
            ).alias("partial"),
        )
        .groupBy("query_id", "doc_id", "field")
        .agg(F.sum("partial").alias("fscore"))
    )

    w = Window.partitionBy("query_id").orderBy(F.col("dismax").desc(), F.col("doc_id"))
    return (
        per_field.groupBy("query_id", "doc_id")
        .agg(
            F.round(
                F.max("fscore")
                + F.lit(DISMAX_TIE) * (F.sum("fscore") - F.max("fscore")),
                6,
            ).alias("dismax")
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= DISMAX_K)
        .select("query_id", "rank", "doc_id", "dismax")
    )


def _dismax_sql() -> str:
    from nil_spark.plans.search_features import TITLE_LEN

    EQ = _eq()
    qvals = ", ".join(f"({i}, '{t}')" for i, t in EQ.BM25_QUERIES)
    return f"""
WITH {EQ._DOCS_CTE},
fields AS (
  SELECT doc_id, 'title' AS field, toks[1:{TITLE_LEN}] AS ftoks FROM docs
  UNION ALL
  SELECT doc_id, 'body', toks[{TITLE_LEN + 1}:] FROM docs),
dl AS (SELECT doc_id, field, len(ftoks)::DOUBLE AS dl
       FROM fields WHERE len(ftoks) > 0),
stats AS (SELECT field, count(*)::DOUBLE AS n, avg(dl) AS avgdl
          FROM dl GROUP BY 1),
q(query_id, qtext) AS (VALUES {qvals}),
qt AS (SELECT DISTINCT query_id, tok AS term
       FROM q, unnest(list_filter(regexp_split_to_array(lower(qtext),
            '[^a-z0-9]+'), x -> x <> '')) AS u(tok)),
tf AS (SELECT doc_id, field, tok AS term, count(*)::DOUBLE AS tf
       FROM fields, unnest(ftoks) AS u(tok)
       WHERE tok IN (SELECT term FROM qt) GROUP BY 1, 2, 3),
dfr AS (SELECT field, term, count(*)::DOUBLE AS df FROM tf GROUP BY 1, 2),
pf AS (
  SELECT qt.query_id, tf.doc_id, tf.field, sum(
           ln(1 + (s.n - dfr.df + 0.5) / (dfr.df + 0.5))
           * (tf.tf * 2.2)
           / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) ) AS fscore
  FROM qt JOIN tf USING (term)
       JOIN dfr ON dfr.field = tf.field AND dfr.term = tf.term
       JOIN dl ON dl.doc_id = tf.doc_id AND dl.field = tf.field
       JOIN stats s ON s.field = tf.field
  GROUP BY 1, 2, 3)
SELECT query_id, rank, doc_id, dismax FROM (
  SELECT g.*, (row_number() OVER (PARTITION BY query_id ORDER BY dismax DESC, doc_id))::INT AS rank
  FROM (
    SELECT query_id, doc_id,
           round(max(fscore) + {DISMAX_TIE} * (sum(fscore) - max(fscore)), 6) AS dismax
    FROM pf GROUP BY 1, 2) g)
WHERE rank <= {DISMAX_K}
"""


# -------------------------------------------------- q: date_histogram


def q_date_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES date_histogram (calendar_interval: day) with min_doc_count 0
    and extended_bounds = the data's own [min, max] day span: every
    day bucket in the span is emitted, zero-filled when no event fell
    on it — the semantics that distinguish the histogram aggregation
    from a plain GROUP BY day.  Metrics per bucket: doc_count,
    distinct users, sum(value).  Scale shape: one groupBy(day) over
    the events (single shuffle on a small key space), the day spine
    generated from two corpus scalars and broadcast to the join."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    per_day = (
        e.groupBy(F.to_date(F.date_trunc("day", "ts")).alias("day"))
        .agg(
            F.count("*").cast("long").alias("dc"),
            F.countDistinct("user_id").cast("long").alias("uu"),
            F.round(F.sum("value"), 6).alias("tv"),
        )
    )
    bounds = e.agg(
        F.to_date(F.min(F.date_trunc("day", "ts"))).alias("dmin"),
        F.to_date(F.max(F.date_trunc("day", "ts"))).alias("dmax"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence("dmin", "dmax", F.expr("interval 1 day"))
        ).alias("day")
    )
    return (
        spine.join(per_day, "day", "left")
        .select(
            "day",
            F.coalesce("dc", F.lit(0)).cast("long").alias("doc_count"),
            F.coalesce("uu", F.lit(0)).cast("long").alias("uniq_users"),
            F.coalesce("tv", F.lit(0.0)).alias("total_value"),
        )
    )


def _date_histogram_sql() -> str:
    return """
WITH per_day AS (
  SELECT date_trunc('day', ts)::DATE AS day, count(*)::BIGINT AS dc,
         count(DISTINCT user_id)::BIGINT AS uu, round(sum(value), 6) AS tv
  FROM events GROUP BY 1),
b AS (SELECT min(date_trunc('day', ts))::DATE AS dmin,
             max(date_trunc('day', ts))::DATE AS dmax FROM events),
spine AS (SELECT unnest(generate_series(dmin, dmax, INTERVAL 1 day))::DATE AS day
          FROM b)
SELECT spine.day,
       coalesce(dc, 0)::BIGINT AS doc_count,
       coalesce(uu, 0)::BIGINT AS uniq_users,
       coalesce(tv, 0.0) AS total_value
FROM spine LEFT JOIN per_day ON spine.day = per_day.day
"""


# ------------------------------------------------- q: composite agg


def q_composite_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES composite aggregation with after-key pagination: buckets
    keyed (source, lang) in ascending key order, per-bucket doc_count
    and sum(n_chars); the gate returns PAGE 2 (buckets COMPOSITE_PAGE+1
    .. 2*COMPOSITE_PAGE) — exactly what a client gets by passing page
    1's last bucket as ``after``.  At scale the ``after`` filter is a
    sort-key range predicate (prunes before the aggregate under
    partition-by-key layouts); the rank window here is the exact
    equivalent on the already-aggregated (tiny) bucket set."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    buckets = d.groupBy("source", "lang").agg(
        F.count("*").cast("long").alias("doc_count"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )
    w = Window.orderBy("source", "lang")
    return (
        buckets.withColumn("bucket_rank", F.row_number().over(w))
        .filter(
            (F.col("bucket_rank") > COMPOSITE_PAGE)
            & (F.col("bucket_rank") <= 2 * COMPOSITE_PAGE)
        )
        .select("bucket_rank", "source", "lang", "doc_count", "total_chars")
    )


def _composite_agg_sql() -> str:
    return f"""
SELECT bucket_rank, source, lang, doc_count, total_chars FROM (
  SELECT (row_number() OVER (ORDER BY source, lang))::INT AS bucket_rank,
         source, lang, count(*)::BIGINT AS doc_count,
         sum(n_chars)::BIGINT AS total_chars
  FROM documents GROUP BY source, lang)
WHERE bucket_rank > {COMPOSITE_PAGE} AND bucket_rank <= {2 * COMPOSITE_PAGE}
"""


# ---------------------------------------------- q: extended stats


def q_extended_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``extended_stats`` per event_type over ``value``: count /
    min / max / sum / avg / population variance / population std — one
    groupBy on the tiny key space, every moment map-side combinable
    (sum, sum of squares), the textbook scalable aggregate."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    return e.groupBy("event_type").agg(
        F.count("*").cast("long").alias("doc_count"),
        F.round(F.min("value"), 6).alias("v_min"),
        F.round(F.max("value"), 6).alias("v_max"),
        F.round(F.sum("value"), 6).alias("v_sum"),
        F.round(F.avg("value"), 6).alias("v_avg"),
        F.round(F.var_pop("value"), 6).alias("v_var"),
        F.round(F.stddev_pop("value"), 6).alias("v_std"),
    )


def _extended_stats_sql() -> str:
    return """
SELECT event_type, count(*)::BIGINT AS doc_count,
       round(min(value), 6) AS v_min, round(max(value), 6) AS v_max,
       round(sum(value), 6) AS v_sum, round(avg(value), 6) AS v_avg,
       round(var_pop(value), 6) AS v_var,
       round(stddev_pop(value), 6) AS v_std
FROM events GROUP BY event_type
"""


# ------------------------------------------------ q: numeric histogram


HISTO_INTERVAL = 50


def q_histogram_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``histogram`` aggregation (fixed numeric interval, not
    calendar): documents bucketed by floor(n_chars / interval) *
    interval with min_doc_count 0 — every bucket across the data's
    span emitted, zero-filled when empty, same spine discipline as
    ``date_histogram``."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    w = F.lit(HISTO_INTERVAL)
    per = d.groupBy(
        (F.floor(F.col("n_chars") / w) * w).cast("long").alias("bucket")
    ).agg(
        F.count("*").cast("long").alias("dc"),
        F.sum("n_chars").cast("long").alias("tc"),
    )
    bounds = d.agg(
        (F.floor(F.min("n_chars") / w) * w).cast("long").alias("bmin"),
        (F.floor(F.max("n_chars") / w) * w).cast("long").alias("bmax"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence("bmin", "bmax", F.lit(HISTO_INTERVAL).cast("long"))
        ).alias("bucket")
    )
    return spine.join(per, "bucket", "left").select(
        "bucket",
        F.coalesce("dc", F.lit(0)).cast("long").alias("doc_count"),
        F.coalesce("tc", F.lit(0)).cast("long").alias("total_chars"),
    )


def _histogram_agg_sql() -> str:
    W = HISTO_INTERVAL
    return f"""
WITH per AS (
  SELECT (floor(n_chars / {W}) * {W})::BIGINT AS bucket,
         count(*)::BIGINT AS dc, sum(n_chars)::BIGINT AS tc
  FROM documents GROUP BY 1),
b AS (SELECT (floor(min(n_chars) / {W}) * {W})::BIGINT AS bmin,
             (floor(max(n_chars) / {W}) * {W})::BIGINT AS bmax
      FROM documents),
spine AS (SELECT unnest(generate_series(bmin, bmax, {W}))::BIGINT AS bucket
          FROM b)
SELECT spine.bucket, coalesce(dc, 0)::BIGINT AS doc_count,
       coalesce(tc, 0)::BIGINT AS total_chars
FROM spine LEFT JOIN per ON spine.bucket = per.bucket
"""


# ------------------------------------------------- q: multi_terms


MULTI_TERMS_K = 10


def q_multi_terms_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``multi_terms``: buckets keyed by the (source, lang)
    COMBINATION, top-K by doc_count (ties by keys ascending) — the
    composite key space stays bucket-sized, so the rank window runs
    over an already-tiny aggregate."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    buckets = d.groupBy("source", "lang").agg(
        F.count("*").cast("long").alias("doc_count")
    )
    w = Window.orderBy(
        F.col("doc_count").desc(), F.col("source"), F.col("lang")
    )
    return (
        buckets.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= MULTI_TERMS_K)
        .select("rank", "source", "lang", "doc_count")
    )


def _multi_terms_sql() -> str:
    return f"""
SELECT rank, source, lang, doc_count FROM (
  SELECT (row_number() OVER (ORDER BY doc_count DESC, source, lang))::INT
             AS rank,
         source, lang, doc_count
  FROM (SELECT source, lang, count(*)::BIGINT AS doc_count
        FROM documents GROUP BY 1, 2))
WHERE rank <= {MULTI_TERMS_K}
"""


# -------------------------------------------------- q: rare_terms


RARE_MAX_DF = 2


def q_rare_terms_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``rare_terms``: vocabulary terms appearing in at most
    RARE_MAX_DF documents (the long tail a terms agg's top-N can never
    surface).  One distinct + one groupBy over (doc, term); at scale
    this is the term-dictionary df column with a filter — the index
    answers it without touching postings."""
    EQ = _eq()
    docs = EQ._docs_toks(spark, sf_dir)
    return (
        docs.select("doc_id", F.explode("toks").alias("term"))
        .distinct()
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("doc_count"))
        .filter(F.col("doc_count") <= RARE_MAX_DF)
    )


def _rare_terms_sql() -> str:
    EQ = _eq()
    return f"""
WITH {EQ._DOCS_CTE},
dt AS (SELECT DISTINCT doc_id, tok AS term
       FROM docs, unnest(toks) AS u(tok))
SELECT term, count(*)::BIGINT AS doc_count
FROM dt GROUP BY 1 HAVING count(*) <= {RARE_MAX_DF}
"""


# -------------------------------------------------- q: regexp search


def q_regexp_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lucene RegexpQuery with the scoring boolean rewrite: each
    anchored regex expands over the term DICTIONARY — never the corpus
    — to its matching term set; docs score as the BM25 sum over
    matched terms, each with its own df/idf (same rewrite as
    ``wildcard_search``, general regex syntax: classes, alternation,
    any-char).  Scale shape: the dictionary scan is vocabulary-sized
    with the tiny pattern set broadcast; retrieval is the standard
    filter-early BM25 plan."""
    EQ = _eq()
    docs = EQ._docs_toks(spark, sf_dir)
    vocab = docs.select(F.explode("toks").alias("term")).distinct()

    pats = spark.createDataFrame(
        [(i, f"^({p})$") for i, p in REGEXP_QUERIES],
        "query_id long, pat string",
    )
    qt = (
        vocab.crossJoin(F.broadcast(pats))
        .filter(F.expr("term RLIKE pat"))
        .select("query_id", "term")
    )

    dl = docs.select("doc_id", F.size("toks").cast("double").alias("dl"))
    stats = dl.agg(
        F.count("*").cast("double").alias("n"), F.avg("dl").alias("avgdl")
    )
    qterms = qt.select("term").distinct()
    tf = (
        docs.select("doc_id", F.explode("toks").alias("term"))
        .join(F.broadcast(qterms), "term")
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("double").alias("tf"))
    )
    dfr = tf.groupBy("term").agg(F.count("*").cast("double").alias("df"))
    w = Window.partitionBy("query_id").orderBy(F.col("bm25").desc(), F.col("doc_id"))
    return (
        tf.join(F.broadcast(qt), "term")
        .join(F.broadcast(dfr), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id",
            "doc_id",
            (
                F.log(F.lit(1.0) + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5))
                * (F.col("tf") * 2.2)
                / (F.col("tf") + 1.2 * (1.0 - 0.75 + 0.75 * F.col("dl") / F.col("avgdl")))
            ).alias("partial"),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum("partial"), 6).alias("bm25"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= REGEXP_K)
        .select("query_id", "rank", "doc_id", "bm25")
    )


def _regexp_sql() -> str:
    EQ = _eq()
    vals = ", ".join(f"({i}, '^({p})$')" for i, p in REGEXP_QUERIES)
    return f"""
WITH {EQ._DOCS_CTE},
vocab AS (SELECT DISTINCT tok AS term FROM docs, unnest(toks) AS u(tok)),
pats(query_id, pat) AS (VALUES {vals}),
qt AS (SELECT query_id, term FROM vocab CROSS JOIN pats
       WHERE regexp_matches(term, pat)),
dl AS (SELECT doc_id, len(toks)::DOUBLE AS dl FROM docs),
stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
tf AS (SELECT doc_id, tok AS term, count(*)::DOUBLE AS tf
       FROM docs, unnest(toks) AS u(tok)
       WHERE tok IN (SELECT term FROM qt) GROUP BY 1, 2),
dfr AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1)
SELECT query_id, rank, doc_id, bm25 FROM (
  SELECT g.*, (row_number() OVER (PARTITION BY query_id ORDER BY bm25 DESC, doc_id))::INT AS rank
  FROM (
    SELECT qt.query_id, tf.doc_id,
           round(sum( ln(1 + (s.n - dfr.df + 0.5) / (dfr.df + 0.5))
                      * (tf.tf * 2.2)
                      / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) ), 6) AS bm25
    FROM qt JOIN tf USING (term) JOIN dfr USING (term)
         JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats s
    GROUP BY 1, 2) g)
WHERE rank <= {REGEXP_K}
"""


# ------------------------------------------------- q: phrase suggest


def q_phrase_suggest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES phrase suggester ("did you mean"): for each two-term input
    phrase, per-slot candidates are vocabulary terms at edit distance
    <= MAX_EDITS (the slot term itself included at distance 0), capped to the
    top CAND_PER_SLOT by collection frequency (ties alphabetical);
    candidate PHRASES (slot-0 x slot-1) are then ranked by a
    Laplace-smoothed bigram language model over the corpus:
    score = ln((cf1+1)/(T+V)) + ln((bc+1)/(cf1+V)) with T total
    tokens, V vocabulary size, bc the corpus adjacent-bigram count —
    so real-word corrections win on CONTEXT, which per-term edit
    distance alone (``search_corrected``) cannot do.  Scale shape:
    unigram + bigram counts are one groupBy each; candidate
    generation is a dictionary-sized scan against the broadcast slot
    terms; everything downstream of the counts is bucket-tiny."""
    EQ = _eq()
    docs = EQ._docs_toks(spark, sf_dir)

    uni = (
        docs.select(F.explode("toks").alias("term"))
        .groupBy("term")
        .agg(F.count("*").cast("double").alias("cf"))
    )
    totals = uni.agg(
        F.sum("cf").alias("t"), F.count("*").cast("double").alias("v")
    )
    bg = (
        docs.filter(F.size("toks") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(0, size(toks)-2),"
                    " i -> struct(toks[i] AS w1, toks[i+1] AS w2))"
                )
            ).alias("bg")
        )
        .groupBy("bg.w1", "bg.w2")
        .agg(F.count("*").cast("double").alias("bc"))
    )

    phrases = spark.createDataFrame(
        SUGGEST_PHRASES, "query_id long, phrase string"
    )
    slots = phrases.select(
        "query_id",
        F.posexplode(
            F.filter(F.split(F.lower("phrase"), EQ.TOKEN_SPLIT), lambda x: x != "")
        ).alias("slot", "qterm"),
    )
    cw = Window.partitionBy("query_id", "slot").orderBy(
        F.col("cf").desc(), F.col("term")
    )
    cands = (
        uni.crossJoin(F.broadcast(slots))
        .filter(F.levenshtein("term", "qterm") <= MAX_EDITS)
        .withColumn("cr", F.row_number().over(cw))
        .filter(F.col("cr") <= CAND_PER_SLOT)
        .select("query_id", "slot", "term", "cf")
    )

    c0 = cands.filter(F.col("slot") == 0).select(
        "query_id", F.col("term").alias("w1"), F.col("cf").alias("cf1")
    )
    c1 = cands.filter(F.col("slot") == 1).select(
        "query_id", F.col("term").alias("w2")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("suggestion")
    )
    return (
        c0.join(c1, "query_id")
        .join(F.broadcast(bg), ["w1", "w2"], "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "query_id",
            F.concat_ws(" ", "w1", "w2").alias("suggestion"),
            F.round(
                F.log((F.col("cf1") + 1.0) / (F.col("t") + F.col("v")))
                + F.log(
                    (F.coalesce("bc", F.lit(0.0)) + 1.0)
                    / (F.col("cf1") + F.col("v"))
                ),
                6,
            ).alias("score"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= SUGGEST_TOPN)
        .select("query_id", "rank", "suggestion", "score")
    )


def _phrase_suggest_sql() -> str:
    EQ = _eq()
    pvals = ", ".join(f"({i}, '{p}')" for i, p in SUGGEST_PHRASES)
    return f"""
WITH {EQ._DOCS_CTE},
uni AS (SELECT tok AS term, count(*)::DOUBLE AS cf
        FROM docs, unnest(toks) AS u(tok) GROUP BY 1),
tot AS (SELECT sum(cf) AS t, count(*)::DOUBLE AS v FROM uni),
tokp AS (SELECT doc_id, unnest(toks) AS tok,
                generate_subscripts(toks, 1) AS ord FROM docs),
bg AS (SELECT a.tok AS w1, b.tok AS w2, count(*)::DOUBLE AS bc
       FROM tokp a JOIN tokp b ON a.doc_id = b.doc_id AND b.ord = a.ord + 1
       GROUP BY 1, 2),
phrases(query_id, phrase) AS (VALUES {pvals}),
ptoks AS (SELECT query_id, list_filter(regexp_split_to_array(lower(phrase),
                 '[^a-z0-9]+'), x -> x <> '') AS toks FROM phrases),
slots AS (SELECT query_id, generate_subscripts(toks, 1) - 1 AS slot,
                 unnest(toks) AS qterm FROM ptoks),
cands AS (
  SELECT query_id, slot, term, cf FROM (
    SELECT s.query_id, s.slot, uni.term, uni.cf,
           row_number() OVER (PARTITION BY s.query_id, s.slot
                              ORDER BY uni.cf DESC, uni.term) AS cr
    FROM uni CROSS JOIN slots s
    WHERE levenshtein(uni.term, s.qterm) <= {MAX_EDITS})
  WHERE cr <= {CAND_PER_SLOT})
SELECT query_id, rank, suggestion, score FROM (
  SELECT g.*, (row_number() OVER (PARTITION BY query_id
               ORDER BY score DESC, suggestion))::INT AS rank
  FROM (
    SELECT c0.query_id, c0.term || ' ' || c1.term AS suggestion,
           round( ln((c0.cf + 1) / (tot.t + tot.v))
                  + ln((coalesce(bg.bc, 0) + 1) / (c0.cf + tot.v)), 6) AS score
    FROM cands c0 JOIN cands c1
         ON c0.query_id = c1.query_id AND c0.slot = 0 AND c1.slot = 1
         LEFT JOIN bg ON bg.w1 = c0.term AND bg.w2 = c1.term
         CROSS JOIN tot) g)
WHERE rank <= {SUGGEST_TOPN}
"""


# --------------------------------------------------------- registry


def build_registry() -> dict:
    return {
        "lm_dirichlet_topk": (q_lm_dirichlet_topk, _lm_dirichlet_sql()),
        "dismax_topk": (q_dismax_topk, _dismax_sql()),
        "date_histogram": (q_date_histogram, _date_histogram_sql()),
        "composite_agg": (q_composite_agg, _composite_agg_sql()),
        "extended_stats": (q_extended_stats, _extended_stats_sql()),
        "histogram_agg": (q_histogram_agg, _histogram_agg_sql()),
        "multi_terms_agg": (q_multi_terms_agg, _multi_terms_sql()),
        "rare_terms_agg": (q_rare_terms_agg, _rare_terms_sql()),
        "regexp_search": (q_regexp_search, _regexp_sql()),
        "phrase_suggest": (q_phrase_suggest, _phrase_suggest_sql()),
    }
