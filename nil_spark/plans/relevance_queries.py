"""Relevance / query-language gate queries: field collapsing,
more-like-this, synonym expansion, ranking-quality metrics, collocation
mining, and the boolean query DSL.

Same contract as ``entry_queries``: every query is pure JVM-side
DataFrame expressions with an exact DuckDB oracle, pinned to the shared
parity rules (tokenize on ``[^a-z0-9]+``; BM25 k1=1.2 b=0.75 with
idf = ln(1+(N-df+0.5)/(df+0.5)); doubles rounded to 6 decimals BEFORE
ranking; ties by id).  ``build_registry()`` is merged into
``entry_queries.REGISTRY`` at import.

These extend the reference's retrieval surface the way a search user
expects of a full-text index (the reference's only "query" is the clone
pipeline; grouping / MLT / synonyms / eval metrics are the standard
operations Lucene exposes on the same index structures — public
knowledge, re-expressed as Spark plans):

 * collapse_topk — one best hit per ``source`` group, top groups per
   query (Lucene grouping / Elasticsearch field collapsing);
 * mlt_topk — more-like-this: top tf-idf terms of seed docs become a
   BM25 query, seed excluded (Lucene MoreLikeThis);
 * synonym_search — query-time synonym expansion with SynonymQuery
   semantics: member tfs SUM, group df = docs containing ANY member;
 * ndcg_eval — nDCG@10 + reciprocal rank of the BM25 ranking against
   graded qrels derived from the data (rel = #query terms in doc);
 * collocations — adjacent-bigram PMI mining over the corpus;
 * dsl_search — the AND/OR/NOT/phrase query language of
   ``functions/querylang.py``, compiled from ONE parse to both the
   Spark plan and the DuckDB oracle.

Scale notes: every query keeps the corpus relation on one side of
broadcast joins only (query terms, seed terms, synonym map, per-term
df are all broadcast); the only corpus-wide shuffles are the tf/df
aggregates that define the statistics themselves.  dsl_search
evaluates ALL queries in a single corpus scan (one projection builds
an array of per-query match structs, then explodes) — q queries cost
one pass, not q passes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nil_spark.functions.querylang import (
    compile_duckdb,
    compile_spark,
    parse_query,
    positive_terms,
)

# --------------------------------------------------------- fixed inputs

COLLAPSE_K = 5          # collapsed groups returned per query

MLT_SEEDS = [3, 47, 112]
MLT_TERMS = 5           # tf-idf terms extracted per seed
MLT_K = 10

SYN_GROUPS = [
    ("speed", ("fast", "quick", "rapid")),
    ("lookup", ("scan", "probe", "seek")),
    ("bulk", ("big", "large")),
]
SYN_QUERIES = [
    (0, "fast table"),
    (1, "scan the big"),
    (2, "dup fast scan"),
    (3, "window big sort"),
]
SYN_K = 10

NDCG_K = 10

COLL_TOPK = 20

DSL_QUERIES = [
    (0, '"hash join" AND merge NOT sort'),
    (1, 'dup OR (vector AND NOT stream)'),
    (2, 'scan filter (big OR small)'),          # implicit AND
    (3, '"table scan" OR "hash join"'),
    (4, 'NOT the AND query'),
    (5, '"slow batch filter"'),
    (6, 'NOT dup'),                             # pure-negation: rank by id, score 0
    (7, 'ATLEAST(2, dup, vector, "hash join")'),  # minimum_should_match
    (8, '"slow batch"~2 OR dup'),                 # ordered sloppy phrase
]
DSL_K = 10

# field-scoped predicates (ES filter context): keyword equality on
# lang, numeric ranges on n_chars — mixed freely with the boolean
# full-text algebra.  Filters gate matching but never contribute
# scoring terms, so BM25 ranks come only from the text terms.
# query-time boosts (Lucene query-string `term^2`): scoring only —
# matching is boost-blind; a word's effective boost is the SUM of its
# positive occurrences' boosts (Lucene: `a^2 OR a` = two scorers whose
# contributions add); phrase boosts scale every member term.
BOOST_DSL_QUERIES = [
    (0, "dup^3 OR vector"),
    (1, '"hash join"^2 AND merge'),
    (2, "scan AND (big^0.5 OR small^2)"),
    (3, "dup^2 OR (dup AND vector)"),  # additive repeat: dup at 3.0
    (4, '"slow batch"~2^2 OR filter^1.5'),
    (5, "NOT sort^5 AND table"),  # boost under NOT scores nothing
]

FIELD_DSL_QUERIES = [
    (0, "join AND lang:en"),
    (1, "scan AND n_chars:[150 TO 400]"),
    (2, "hash AND NOT lang:en"),
    (3, '"fast query" OR n_chars:[* TO 120]'),
    (4, "merge lang:de n_chars:[100 TO *]"),  # implicit AND with filters
    (5, 'NOT lang:en AND "fast query"'),
    (6, "ATLEAST(2, dup, lang:es, n_chars:[200 TO 500])"),
    (7, "n_chars:[* TO *] AND vector"),  # exists-degenerate range
]


def _eq():
    # deferred: entry_queries imports this module at its bottom, so all
    # of its helpers already exist when our functions run
    from nil_spark.plans import entry_queries as EQ

    return EQ


# ------------------------------------------------- q: field collapsing


def q_collapse_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Field collapsing: the single best BM25 hit per (query, source)
    group, then the top-COLLAPSE_K groups per query — exact because the
    group winner is computed over ALL matching docs, not a truncated
    candidate list."""
    EQ = _eq()
    scored = EQ._bm25_scored(spark, sf_dir)
    meta = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source"
    )
    per_group = Window.partitionBy("query_id", "source").orderBy(
        F.col("bm25").desc(), F.col("doc_id")
    )
    per_query = Window.partitionBy("query_id").orderBy(
        F.col("bm25").desc(), F.col("doc_id")
    )
    return (
        scored.join(meta, "doc_id")
        .withColumn("rn", F.row_number().over(per_group))
        .filter(F.col("rn") == 1)
        .withColumn("rank", F.row_number().over(per_query))
        .filter(F.col("rank") <= COLLAPSE_K)
        .select("query_id", "rank", "source", "doc_id", "bm25")
    )


def _scored_with() -> str:
    """The shared scored-relation CTE chain (docs → dl/stats/tf/df →
    per-(query,doc) rounded BM25) — mirrors entry_queries._bm25_sql."""
    EQ = _eq()
    vals = ", ".join(f"({i}, '{t}')" for i, t in EQ.BM25_QUERIES)
    return f"""{EQ._DOCS_CTE},
dl AS (SELECT doc_id, len(toks)::DOUBLE AS dl FROM docs),
stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
tf AS (SELECT doc_id, tok AS term, count(*)::DOUBLE AS tf
       FROM docs, unnest(toks) AS u(tok) GROUP BY 1, 2),
dfr AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
q(query_id, qtext) AS (VALUES {vals}),
qt AS (SELECT DISTINCT query_id, tok AS term
       FROM q, unnest(list_filter(regexp_split_to_array(lower(qtext), '[^a-z0-9]+'), x -> x <> '')) AS u(tok)),
scored AS (
  SELECT qt.query_id, tf.doc_id,
         round(sum( ln(1 + (s.n - dfr.df + 0.5) / (dfr.df + 0.5))
                    * (tf.tf * 2.2)
                    / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) ), 6) AS bm25
  FROM qt JOIN tf USING (term) JOIN dfr USING (term)
       JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats s
  GROUP BY 1, 2)"""


def _collapse_sql() -> str:
    return f"""
WITH {_scored_with()}
SELECT query_id, rank, source, doc_id, bm25 FROM (
  SELECT query_id, doc_id, bm25, source,
         (row_number() OVER (PARTITION BY query_id
                             ORDER BY bm25 DESC, doc_id))::INT AS rank
  FROM (
    SELECT s.query_id, s.doc_id, s.bm25, d.source,
           row_number() OVER (PARTITION BY s.query_id, d.source
                              ORDER BY s.bm25 DESC, s.doc_id) AS rn
    FROM scored s JOIN documents d USING (doc_id)) x
  WHERE rn = 1) y
WHERE rank <= {COLLAPSE_K}
"""


# ------------------------------------------------- q: more-like-this


def q_mlt_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """More-like-this: for each seed doc, its top-MLT_TERMS terms by
    tf·ln(N/df) become the query; BM25-rank the corpus on those terms,
    seed excluded (Lucene MoreLikeThis on the same index statistics)."""
    EQ = _eq()
    docs = EQ._docs_toks(spark, sf_dir)
    dl = docs.select("doc_id", F.size("toks").cast("double").alias("dl"))
    stats = dl.agg(
        F.count("*").cast("double").alias("n"), F.avg("dl").alias("avgdl")
    )
    tf = (
        docs.select("doc_id", F.explode("toks").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("double").alias("tf"))
    )
    dfr = tf.groupBy("term").agg(F.count("*").cast("double").alias("df"))

    seed_w = Window.partitionBy("seed_id").orderBy(
        F.col("weight").desc(), F.col("term")
    )
    st = (
        tf.filter(F.col("doc_id").isin(MLT_SEEDS))
        .join(F.broadcast(dfr), "term")
        .crossJoin(F.broadcast(stats.select("n")))
        .select(
            F.col("doc_id").alias("seed_id"),
            "term",
            F.round(F.col("tf") * F.log(F.col("n") / F.col("df")), 6).alias(
                "weight"
            ),
        )
        .withColumn("trank", F.row_number().over(seed_w))
        .filter(F.col("trank") <= MLT_TERMS)
        .select("seed_id", "term")
    )

    rank_w = Window.partitionBy("seed_id").orderBy(
        F.col("bm25").desc(), F.col("doc_id")
    )
    return (
        tf.join(F.broadcast(st), "term")
        .filter(F.col("doc_id") != F.col("seed_id"))
        .join(F.broadcast(dfr), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "seed_id",
            "doc_id",
            (
                F.log(F.lit(1.0) + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5))
                * (F.col("tf") * 2.2)
                / (F.col("tf") + 1.2 * (1.0 - 0.75 + 0.75 * F.col("dl") / F.col("avgdl")))
            ).alias("partial"),
        )
        .groupBy("seed_id", "doc_id")
        .agg(F.round(F.sum("partial"), 6).alias("bm25"))
        .withColumn("rank", F.row_number().over(rank_w))
        .filter(F.col("rank") <= MLT_K)
        .select("seed_id", "rank", "doc_id", "bm25")
    )


def _mlt_sql() -> str:
    EQ = _eq()
    seeds = ", ".join(str(s) for s in MLT_SEEDS)
    return f"""
WITH {EQ._DOCS_CTE},
dl AS (SELECT doc_id, len(toks)::DOUBLE AS dl FROM docs),
stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
tf AS (SELECT doc_id, tok AS term, count(*)::DOUBLE AS tf
       FROM docs, unnest(toks) AS u(tok) GROUP BY 1, 2),
dfr AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
st AS (
  SELECT seed_id, term FROM (
    SELECT tf.doc_id AS seed_id, tf.term,
           row_number() OVER (PARTITION BY tf.doc_id
                              ORDER BY round(tf.tf * ln(s.n / dfr.df), 6) DESC, tf.term) AS trank
    FROM tf JOIN dfr USING (term) CROSS JOIN stats s
    WHERE tf.doc_id IN ({seeds}))
  WHERE trank <= {MLT_TERMS})
SELECT seed_id, rank, doc_id, bm25 FROM (
  SELECT g.*, (row_number() OVER (PARTITION BY seed_id ORDER BY bm25 DESC, doc_id))::INT AS rank
  FROM (
    SELECT st.seed_id, tf.doc_id,
           round(sum( ln(1 + (s.n - dfr.df + 0.5) / (dfr.df + 0.5))
                      * (tf.tf * 2.2)
                      / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) ), 6) AS bm25
    FROM st JOIN tf USING (term) JOIN dfr USING (term)
         JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats s
    WHERE tf.doc_id <> st.seed_id
    GROUP BY 1, 2) g)
WHERE rank <= {MLT_K}
"""


# --------------------------------------------- q: synonym expansion


def q_synonym_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-time synonym expansion with Lucene SynonymQuery semantics:
    a synonym group scores as ONE pseudo-term whose tf is the SUM of
    member tfs in the doc and whose df counts docs containing ANY
    member — so expansion never inflates idf or double-counts."""
    EQ = _eq()
    docs = EQ._docs_toks(spark, sf_dir)
    dl = docs.select("doc_id", F.size("toks").cast("double").alias("dl"))
    stats = dl.agg(
        F.count("*").cast("double").alias("n"), F.avg("dl").alias("avgdl")
    )

    pairs = [(m, canon) for canon, members in SYN_GROUPS for m in members]
    mapping = F.create_map(
        *[F.lit(x) for pair in pairs for x in pair]
    )

    q = spark.createDataFrame(SYN_QUERIES, "query_id long, qtext string")
    qt = (
        q.select(
            "query_id",
            F.explode(
                F.filter(F.split(F.lower("qtext"), EQ.TOKEN_SPLIT), lambda x: x != "")
            ).alias("term"),
        )
        .select(
            "query_id",
            F.coalesce(mapping[F.col("term")], F.col("term")).alias("canon"),
        )
        .dropDuplicates(["query_id", "canon"])
    )
    qcanon = qt.select("canon").distinct()

    tf = (
        docs.select("doc_id", F.explode("toks").alias("term"))
        .select(
            "doc_id",
            F.coalesce(mapping[F.col("term")], F.col("term")).alias("canon"),
        )
        .join(F.broadcast(qcanon), "canon")
        .groupBy("doc_id", "canon")
        .agg(F.count("*").cast("double").alias("tf"))
    )
    dfr = tf.groupBy("canon").agg(F.count("*").cast("double").alias("df"))

    w = Window.partitionBy("query_id").orderBy(F.col("bm25").desc(), F.col("doc_id"))
    return (
        tf.join(F.broadcast(qt), "canon")
        .join(F.broadcast(dfr), "canon")
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
        .filter(F.col("rank") <= SYN_K)
        .select("query_id", "rank", "doc_id", "bm25")
    )


def _synonym_sql() -> str:
    EQ = _eq()
    qvals = ", ".join(f"({i}, '{t}')" for i, t in SYN_QUERIES)
    mvals = ", ".join(
        f"('{m}', '{canon}')" for canon, members in SYN_GROUPS for m in members
    )
    return f"""
WITH {EQ._DOCS_CTE},
dl AS (SELECT doc_id, len(toks)::DOUBLE AS dl FROM docs),
stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
syn(member, canon) AS (VALUES {mvals}),
tf AS (SELECT doc_id, coalesce(syn.canon, u.tok) AS canon, count(*)::DOUBLE AS tf
       FROM docs, unnest(toks) AS u(tok)
       LEFT JOIN syn ON syn.member = u.tok
       GROUP BY 1, 2),
dfr AS (SELECT canon, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
q(query_id, qtext) AS (VALUES {qvals}),
qt AS (SELECT DISTINCT query_id, coalesce(syn.canon, u.tok) AS canon
       FROM q, unnest(list_filter(regexp_split_to_array(lower(qtext), '[^a-z0-9]+'), x -> x <> '')) AS u(tok)
       LEFT JOIN syn ON syn.member = u.tok)
SELECT query_id, rank, doc_id, bm25 FROM (
  SELECT g.*, (row_number() OVER (PARTITION BY query_id ORDER BY bm25 DESC, doc_id))::INT AS rank
  FROM (
    SELECT qt.query_id, tf.doc_id,
           round(sum( ln(1 + (s.n - dfr.df + 0.5) / (dfr.df + 0.5))
                      * (tf.tf * 2.2)
                      / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) ), 6) AS bm25
    FROM qt JOIN tf USING (canon) JOIN dfr USING (canon)
         JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats s
    GROUP BY 1, 2) g)
WHERE rank <= {SYN_K}
"""


# ------------------------------------------------ q: ranking metrics


def q_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-quality evaluation of the BM25 ranking against graded
    qrels derived deterministically from the data: rel(q,d) = number of
    distinct query terms present in d.  Emits nDCG@10 and reciprocal
    rank of the first maximally-relevant doc — the standard IR eval
    operator a relevance pipeline runs at corpus scale (one extra join
    over the scored relation; qrels broadcast)."""
    EQ = _eq()
    scored = EQ._bm25_scored(spark, sf_dir)
    docs = EQ._docs_toks(spark, sf_dir)
    dtok = docs.select(
        "doc_id", F.explode("toks").alias("term")
    ).dropDuplicates(["doc_id", "term"])

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
    rel = (
        dtok.join(F.broadcast(qt), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.count("*").cast("double").alias("rel"))
    )

    rank_w = Window.partitionBy("query_id").orderBy(
        F.col("bm25").desc(), F.col("doc_id")
    )
    ranked = scored.withColumn("rank", F.row_number().over(rank_w)).join(
        rel, ["query_id", "doc_id"]
    )

    gain = F.pow(F.lit(2.0), F.col("rel")) - F.lit(1.0)
    dcg = (
        ranked.filter(F.col("rank") <= NDCG_K)
        .groupBy("query_id")
        .agg(F.sum(gain / F.log2(F.col("rank") + 1.0)).alias("dcg"))
    )

    ideal_w = Window.partitionBy("query_id").orderBy(
        F.col("rel").desc(), F.col("doc_id")
    )
    idcg = (
        rel.withColumn("irank", F.row_number().over(ideal_w))
        .filter(F.col("irank") <= NDCG_K)
        .groupBy("query_id")
        .agg(F.sum(gain / F.log2(F.col("irank") + 1.0)).alias("idcg"))
    )

    relmax = rel.groupBy("query_id").agg(F.max("rel").alias("relmax"))
    rr = (
        ranked.join(F.broadcast(relmax), "query_id")
        .filter(F.col("rel") == F.col("relmax"))
        .groupBy("query_id")
        .agg(F.round(F.lit(1.0) / F.min("rank"), 6).alias("rr"))
    )

    return (
        dcg.join(idcg, "query_id")
        .join(rr, "query_id")
        .select(
            "query_id",
            F.round(F.col("dcg") / F.col("idcg"), 6).alias("ndcg10"),
            "rr",
        )
    )


def _ndcg_sql() -> str:
    return f"""
WITH {_scored_with()},
dtok AS (SELECT DISTINCT doc_id, tok AS term FROM docs, unnest(toks) AS u(tok)),
rel AS (SELECT qt.query_id, dtok.doc_id, count(*)::DOUBLE AS rel
        FROM dtok JOIN qt USING (term) GROUP BY 1, 2),
ranked AS (SELECT s.query_id, s.doc_id, r.rel,
                  row_number() OVER (PARTITION BY s.query_id ORDER BY s.bm25 DESC, s.doc_id) AS rank
           FROM scored s JOIN rel r ON r.query_id = s.query_id AND r.doc_id = s.doc_id),
dcg AS (SELECT query_id, sum((power(2.0, rel) - 1) / log2(rank + 1.0)) AS dcg
        FROM ranked WHERE rank <= {NDCG_K} GROUP BY 1),
ideal AS (SELECT query_id, rel,
                 row_number() OVER (PARTITION BY query_id ORDER BY rel DESC, doc_id) AS irank
          FROM rel),
idcg AS (SELECT query_id, sum((power(2.0, rel) - 1) / log2(irank + 1.0)) AS idcg
         FROM ideal WHERE irank <= {NDCG_K} GROUP BY 1),
relmax AS (SELECT query_id, max(rel) AS relmax FROM rel GROUP BY 1),
rr AS (SELECT r.query_id, round(1.0 / min(r.rank), 6) AS rr
       FROM ranked r JOIN relmax m ON m.query_id = r.query_id AND r.rel = m.relmax
       GROUP BY 1)
SELECT d.query_id, round(d.dcg / i.idcg, 6) AS ndcg10, rr.rr
FROM dcg d JOIN idcg i USING (query_id) JOIN rr USING (query_id)
"""


# ----------------------------------------------- q: collocation PMI


def q_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacent-bigram PMI collocation mining: PMI(a,b) =
    ln(P(ab) / (P(a)P(b))) over corpus bigram/unigram frequencies, with
    a corpus-relative min-count floor so rare noise never ranks.  One
    corpus scan builds bigrams via an in-array transform (no positional
    self-join); unigram/bigram counts are two aggregates; the count
    floor scales with corpus size so the query is SF-stable."""
    EQ = _eq()
    docs = EQ._docs_toks(spark, sf_dir)
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
        .select("bg.w1", "bg.w2")
    )
    cab = bg.groupBy("w1", "w2").agg(F.count("*").alias("n_ab"))
    uni = (
        docs.select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("double").alias("c"))
    )
    totals = cab.agg(F.sum("n_ab").cast("double").alias("b")).crossJoin(
        uni.agg(F.sum("c").alias("t"))
    )

    return (
        cab.join(F.broadcast(uni.withColumnRenamed("w", "w1").withColumnRenamed("c", "ca")), "w1")
        .join(F.broadcast(uni.withColumnRenamed("w", "w2").withColumnRenamed("c", "cb")), "w2")
        .crossJoin(F.broadcast(totals))
        .filter(
            F.col("n_ab")
            >= F.greatest(F.lit(5.0), F.lit(0.0005) * F.col("b"))
        )
        .select(
            "w1",
            "w2",
            "n_ab",
            F.round(
                F.log(
                    (F.col("n_ab") / F.col("b"))
                    / ((F.col("ca") / F.col("t")) * (F.col("cb") / F.col("t")))
                ),
                6,
            ).alias("pmi"),
        )
        .orderBy(F.col("pmi").desc(), "w1", "w2")
        .limit(COLL_TOPK)
    )


def _collocations_sql() -> str:
    EQ = _eq()
    return f"""
WITH {EQ._DOCS_CTE},
tokp AS (SELECT doc_id, unnest(toks) AS tok,
                unnest(range(1, len(toks) + 1)) AS ord
         FROM docs),
bg AS (SELECT a.tok AS w1, b.tok AS w2
       FROM tokp a JOIN tokp b ON a.doc_id = b.doc_id AND b.ord = a.ord + 1),
cab AS (SELECT w1, w2, count(*) AS n_ab FROM bg GROUP BY 1, 2),
uni AS (SELECT tok AS w, count(*)::DOUBLE AS c FROM tokp GROUP BY 1),
tot AS (SELECT (SELECT sum(n_ab)::DOUBLE FROM cab) AS b,
               (SELECT sum(c) FROM uni) AS t)
SELECT cab.w1, cab.w2, cab.n_ab,
       round(ln( (cab.n_ab / tot.b)
                 / ((ua.c / tot.t) * (ub.c / tot.t)) ), 6) AS pmi
FROM cab JOIN uni ua ON ua.w = cab.w1 JOIN uni ub ON ub.w = cab.w2
     CROSS JOIN tot
WHERE cab.n_ab >= greatest(5.0, 0.0005 * tot.b)
ORDER BY pmi DESC, w1, w2
LIMIT {COLL_TOPK}
"""


# --------------------------------------------------- q: query DSL


def _parsed_dsl() -> list:
    return [(qid, parse_query(text)) for qid, text in DSL_QUERIES]


def q_dsl_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The boolean query DSL end-to-end: parse once, compile the AST to
    Spark boolean Columns, match ALL queries in ONE corpus scan (an
    array of per-query match structs exploded), then BM25-rank matches
    on each query's positive terms (pure-negation queries rank by id at
    score 0)."""
    return _dsl_rank_frame(spark, sf_dir, _parsed_dsl())


def _dsl_rank_frame(
    spark: SparkSession,
    sf_dir: str,
    parsed: list,
    field_names: tuple = (),
) -> DataFrame:
    """Shared DataFrame backend under ``dsl_search`` and
    ``dsl_field_search``: one corpus scan matches every query, one
    BM25 pass ranks the matches.  ``field_names`` are documents
    columns carried through the scan for FieldTerm/FieldRange
    predicates (compiled null-safe by compile_spark)."""
    EQ = _eq()
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs = d.select(
        "doc_id",
        *field_names,
        F.filter(
            F.split(F.lower("text"), EQ.TOKEN_SPLIT), lambda x: x != ""
        ).alias("toks"),
    )
    base = docs.withColumn(
        "padded",
        F.concat(F.lit(" "), F.array_join("toks", " "), F.lit(" ")),
    )
    field_cols = {f: F.col(f) for f in field_names} or None
    match_arr = F.array(
        *[
            F.struct(
                F.lit(qid).cast("long").alias("query_id"),
                compile_spark(
                    ast, F.col("toks"), F.col("padded"), field_cols
                ).alias("m"),
            )
            for qid, ast in parsed
        ]
    )
    matched = (
        base.select("doc_id", F.explode(match_arr).alias("qm"))
        .filter(F.col("qm.m"))
        .select(F.col("qm.query_id").alias("query_id"), "doc_id")
    )

    from nil_spark.functions.querylang import positive_term_boosts

    qt_rows = [
        (qid, t, w)
        for qid, ast in parsed
        for t, w in sorted(positive_term_boosts(ast).items())
    ]
    qt = spark.createDataFrame(
        qt_rows, "query_id long, term string, w double"
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
    scored = (
        tf.join(F.broadcast(qt), "term")
        .join(F.broadcast(dfr), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id",
            "doc_id",
            (
                F.col("w")
                * F.log(F.lit(1.0) + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5))
                * (F.col("tf") * 2.2)
                / (F.col("tf") + 1.2 * (1.0 - 0.75 + 0.75 * F.col("dl") / F.col("avgdl")))
            ).alias("partial"),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum("partial"), 6).alias("bm25"))
    )

    w = Window.partitionBy("query_id").orderBy(F.col("bm25").desc(), F.col("doc_id"))
    return (
        matched.join(scored, ["query_id", "doc_id"], "left")
        .withColumn("bm25", F.round(F.coalesce("bm25", F.lit(0.0)), 6))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= DSL_K)
        .select("query_id", "rank", "doc_id", "bm25")
    )


def _dsl_sql() -> str:
    return _dsl_sql_core(_parsed_dsl())


def _dsl_sql_core(parsed: list, field_names: tuple = ()) -> str:
    EQ = _eq()
    field_exprs = {f: f for f in field_names} or None
    field_sel = "".join(f", d.{f}" for f in field_names)
    field_join = (
        " JOIN documents d USING (doc_id)" if field_names else ""
    )
    matched_selects = "\n UNION ALL\n".join(
        f" SELECT {qid}::BIGINT AS query_id, doc_id FROM dtokp WHERE "
        + compile_duckdb(ast, "toks", "padded", field_exprs)
        for qid, ast in parsed
    )
    from nil_spark.functions.querylang import positive_term_boosts

    qt_vals = ", ".join(
        f"({qid}, '{t}', {w!r})"
        for qid, ast in parsed
        for t, w in sorted(positive_term_boosts(ast).items())
    )
    all_terms = sorted({t for _, ast in parsed for t in positive_terms(ast)})
    in_list = ", ".join(f"'{t}'" for t in all_terms)
    return f"""
WITH {EQ._DOCS_CTE},
dtokp AS (SELECT doc_id, toks,
                 ' ' || coalesce(array_to_string(toks, ' '), '') || ' ' AS padded{field_sel}
          FROM docs{field_join}),
matched AS (
{matched_selects}),
dl AS (SELECT doc_id, len(toks)::DOUBLE AS dl FROM docs),
stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
qt(query_id, term, w) AS (VALUES {qt_vals}),
tf AS (SELECT doc_id, tok AS term, count(*)::DOUBLE AS tf
       FROM docs, unnest(toks) AS u(tok)
       WHERE tok IN ({in_list}) GROUP BY 1, 2),
dfr AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
scored AS (
  SELECT qt.query_id, tf.doc_id,
         round(sum( qt.w * ln(1 + (s.n - dfr.df + 0.5) / (dfr.df + 0.5))
                    * (tf.tf * 2.2)
                    / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) ), 6) AS bm25
  FROM qt JOIN tf USING (term) JOIN dfr USING (term)
       JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats s
  GROUP BY 1, 2)
SELECT query_id, rank, doc_id, bm25 FROM (
  SELECT m.query_id, m.doc_id,
         round(coalesce(s.bm25, 0.0), 6) AS bm25,
         (row_number() OVER (PARTITION BY m.query_id
                             ORDER BY coalesce(s.bm25, 0.0) DESC, m.doc_id))::INT AS rank
  FROM matched m LEFT JOIN scored s
    ON s.query_id = m.query_id AND s.doc_id = m.doc_id)
WHERE rank <= {DSL_K}
"""


# ------------------------------------------- q: block-join ranking


BLOCKJOIN_K = 5


def q_blockjoin_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parent/child ranking (Lucene ToParentBlockJoinQuery with
    ScoreMode.Total): children (docs) score with BM25 and each PARENT
    (``source`` group — the conv_id analog of multi-turn transcripts)
    ranks by the SUM of its matching children's scores, with the match
    count carried for context.  Complements ``collapse_topk``, which is
    the max-mode of the same structure.  Scale shape: one extra
    broadcast metadata join and a parent-keyed aggregate over rows that
    are already per-(query, doc)."""
    EQ = _eq()
    scored = EQ._bm25_scored(spark, sf_dir)
    meta = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("source")
    )
    return (
        scored.join(meta, "doc_id")
        .groupBy("query_id", "source")
        .agg(
            F.round(F.sum("bm25"), 6).alias("score"),
            F.count("*").alias("n_hits"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= BLOCKJOIN_K)
        .select("query_id", "rank", "source", "n_hits", "score")
    )


def _blockjoin_sql() -> str:
    return f"""
WITH {_scored_with()}
SELECT query_id, rank, source, n_hits, score FROM (
  SELECT g.*, (row_number() OVER (PARTITION BY query_id
                                  ORDER BY score DESC, source))::INT AS rank
  FROM (
    SELECT s.query_id, d.source,
           round(sum(s.bm25), 6) AS score,
           count(*) AS n_hits
    FROM scored s JOIN documents d USING (doc_id)
    GROUP BY 1, 2) g)
WHERE rank <= {BLOCKJOIN_K}
"""


# ---------------------------------------------- q: wildcard search


WILDCARD_QUERIES = [
    (0, "s*"),      # prefix: scan, slow, small, sort, spark, stream
    (1, "*ue*"),    # contains: query, value
    (2, "dup*"),    # prefix hitting the rare discriminative term
    (3, "zz*"),     # matches nothing: empty result for this query
]
WILDCARD_K = 10


def _wildcard_regex(pat: str) -> str:
    """Translate the `*`-wildcard into an anchored regex (the only
    metacharacter the surface accepts; everything else is literal —
    patterns are [a-z0-9*] by construction of the query set)."""
    return "^" + pat.replace("*", ".*") + "$"


def q_wildcard_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wildcard term queries (Lucene MultiTermQuery with the scoring
    boolean rewrite): each pattern expands over the term DICTIONARY —
    never the corpus — to its matching term set, and docs score as the
    BM25 sum over matched terms, each with its own df/idf.  Scale
    shape: expansion is a regex scan of the dictionary-sized vocab with
    the tiny pattern set broadcast; retrieval is the standard
    filter-early BM25 plan."""
    EQ = _eq()
    docs = EQ._docs_toks(spark, sf_dir)
    vocab = docs.select(F.explode("toks").alias("term")).distinct()

    pats = spark.createDataFrame(
        [(i, _wildcard_regex(p)) for i, p in WILDCARD_QUERIES],
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
        .filter(F.col("rank") <= WILDCARD_K)
        .select("query_id", "rank", "doc_id", "bm25")
    )


def _wildcard_sql() -> str:
    EQ = _eq()
    vals = ", ".join(
        f"({i}, '{_wildcard_regex(p)}')" for i, p in WILDCARD_QUERIES
    )
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
WHERE rank <= {WILDCARD_K}
"""


# -------------------------------------------- q: corrected search


CORRECTED_QUERIES = [
    (0, "hassh join"),        # hassh → hash
    (1, "tabel scan dup"),    # tabel → table
    (2, "fast qeury"),        # qeury → query
    (3, "merge sort"),        # nothing to correct
    (4, "zzzzzzzzzz scan"),   # no close correction: term dropped
]
CORRECT_MAX_DIST = 2
CORRECTED_K = 10


def q_search_corrected(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spell-corrected retrieval ("did you mean", applied): query terms
    absent from the corpus vocabulary are replaced by the vocabulary
    term at minimum edit distance (ties alphabetical; dropped when the
    closest term is further than CORRECT_MAX_DIST edits), then BM25 as
    usual.  Scale shape: corrections join the tiny MISSING-term set
    (broadcast) against the dictionary-sized vocabulary — never the
    corpus; the retrieval plan is the standard filter-early BM25."""
    EQ = _eq()
    docs = EQ._docs_toks(spark, sf_dir)
    vocab = docs.select(F.explode("toks").alias("vterm")).distinct()

    q = spark.createDataFrame(CORRECTED_QUERIES, "query_id long, qtext string")
    qt = (
        q.select(
            "query_id",
            F.explode(
                F.filter(F.split(F.lower("qtext"), EQ.TOKEN_SPLIT), lambda x: x != "")
            ).alias("qterm"),
        )
        .dropDuplicates(["query_id", "qterm"])
    )
    present = qt.join(
        vocab, qt["qterm"] == vocab["vterm"], "left_semi"
    ).select("query_id", F.col("qterm").alias("term"))
    missing = qt.join(
        vocab, qt["qterm"] == vocab["vterm"], "left_anti"
    )

    corr_w = Window.partitionBy("query_id", "qterm").orderBy(
        F.col("dist"), F.col("vterm")
    )
    corrections = (
        vocab.crossJoin(F.broadcast(missing))
        .withColumn("dist", F.levenshtein("qterm", "vterm"))
        .withColumn("rn", F.row_number().over(corr_w))
        .filter((F.col("rn") == 1) & (F.col("dist") <= CORRECT_MAX_DIST))
        .select("query_id", F.col("vterm").alias("term"))
    )
    qct = present.unionByName(corrections).dropDuplicates(
        ["query_id", "term"]
    )

    # standard filter-early BM25 over the corrected term set
    dl = docs.select("doc_id", F.size("toks").cast("double").alias("dl"))
    stats = dl.agg(
        F.count("*").cast("double").alias("n"), F.avg("dl").alias("avgdl")
    )
    qterms = qct.select("term").distinct()
    tf = (
        docs.select("doc_id", F.explode("toks").alias("term"))
        .join(F.broadcast(qterms), "term")
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("double").alias("tf"))
    )
    dfr = tf.groupBy("term").agg(F.count("*").cast("double").alias("df"))
    w = Window.partitionBy("query_id").orderBy(F.col("bm25").desc(), F.col("doc_id"))
    return (
        tf.join(F.broadcast(qct), "term")
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
        .filter(F.col("rank") <= CORRECTED_K)
        .select("query_id", "rank", "doc_id", "bm25")
    )


def _search_corrected_sql() -> str:
    EQ = _eq()
    vals = ", ".join(f"({i}, '{t}')" for i, t in CORRECTED_QUERIES)
    return f"""
WITH {EQ._DOCS_CTE},
vocab AS (SELECT DISTINCT tok AS vterm FROM docs, unnest(toks) AS u(tok)),
q(query_id, qtext) AS (VALUES {vals}),
qt AS (SELECT DISTINCT query_id, tok AS qterm
       FROM q, unnest(list_filter(regexp_split_to_array(lower(qtext), '[^a-z0-9]+'), x -> x <> '')) AS u(tok)),
present AS (SELECT query_id, qterm AS term FROM qt
            WHERE EXISTS (SELECT 1 FROM vocab v WHERE v.vterm = qt.qterm)),
missing AS (SELECT query_id, qterm FROM qt
            WHERE NOT EXISTS (SELECT 1 FROM vocab v WHERE v.vterm = qt.qterm)),
corr AS (SELECT query_id, vterm AS term FROM (
           SELECT m.query_id, m.qterm, v.vterm,
                  levenshtein(m.qterm, v.vterm) AS dist,
                  row_number() OVER (PARTITION BY m.query_id, m.qterm
                                     ORDER BY levenshtein(m.qterm, v.vterm), v.vterm) AS rn
           FROM missing m CROSS JOIN vocab v) x
         WHERE rn = 1 AND dist <= {CORRECT_MAX_DIST}),
qct AS (SELECT DISTINCT query_id, term FROM
        (SELECT * FROM present UNION ALL SELECT * FROM corr) u),
dl AS (SELECT doc_id, len(toks)::DOUBLE AS dl FROM docs),
stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
tf AS (SELECT doc_id, tok AS term, count(*)::DOUBLE AS tf
       FROM docs, unnest(toks) AS u(tok)
       WHERE tok IN (SELECT term FROM qct) GROUP BY 1, 2),
dfr AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1)
SELECT query_id, rank, doc_id, bm25 FROM (
  SELECT g.*, (row_number() OVER (PARTITION BY query_id ORDER BY bm25 DESC, doc_id))::INT AS rank
  FROM (
    SELECT qct.query_id, tf.doc_id,
           round(sum( ln(1 + (s.n - dfr.df + 0.5) / (dfr.df + 0.5))
                      * (tf.tf * 2.2)
                      / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) ), 6) AS bm25
    FROM qct JOIN tf USING (term) JOIN dfr USING (term)
         JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats s
    GROUP BY 1, 2) g)
WHERE rank <= {CORRECTED_K}
"""


def q_dsl_search_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME DSL queries executed index-natively
    (operators/dsl_exec.py): phrases resolved from the positional
    store, terms from replica postings, boolean algebra + BM25 scoring
    in one zero-shuffle kernel — gated by the identical oracle as
    ``dsl_search``, so the DataFrame and engine backends are pinned
    hash-identical."""
    import pandas as pd

    from nil_spark.operators.dsl_exec import dsl_search_replica

    EQ = _eq()
    shard_paths, td_pdf, n_docs, avgdl, cfg = EQ._gate_engine_index(
        spark, sf_dir
    )
    pos_store, _pcfg = EQ._gate_pos_store(spark, sf_dir)
    qpdf = pd.DataFrame(
        {
            "query_id": [i for i, _ in DSL_QUERIES],
            "dsl": [t for _, t in DSL_QUERIES],
        }
    )
    return dsl_search_replica(
        spark,
        qpdf,
        shard_paths,
        td_pdf,
        n_docs,
        avgdl,
        cfg,
        k=DSL_K,
        pos_store=pos_store,
    )


# ----------------------------------------- q: field-predicate DSL


def _parsed_field_dsl() -> list:
    return [(qid, parse_query(text)) for qid, text in FIELD_DSL_QUERIES]


def q_dsl_field_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DSL with ES filter-context field predicates — keyword
    equality (lang:en) and inclusive numeric ranges
    (n_chars:[150 TO 400]) mixed into the boolean algebra.  Filters
    gate matching, never score: BM25 ranks come only from the text
    terms (a pure-filter query ranks by doc id at 0), and a null field
    value never matches, so NOT field:v has complement semantics."""
    return _dsl_rank_frame(
        spark, sf_dir, _parsed_field_dsl(), field_names=("lang", "n_chars")
    )


def q_dsl_field_search_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME field-predicate queries executed index-natively:
    terms from the replica postings, field predicates resolved
    vectorized from the node-shared doc-values side-cars
    (operators/docvalues.py — ordinal compare for keywords, dense
    range mask for numerics), boolean algebra + BM25 in the one
    zero-shuffle kernel.  Gated by the identical oracle as
    ``dsl_field_search``, pinning the two backends hash-identical."""
    import pandas as pd

    from nil_spark.operators.dsl_exec import dsl_search_replica

    EQ = _eq()
    shard_paths, td_pdf, n_docs, avgdl, cfg = EQ._gate_engine_index(
        spark, sf_dir
    )
    pos_store, _pcfg = EQ._gate_pos_store(spark, sf_dir)
    numeric_dv, keyword_dv = EQ._gate_docvalues(spark, sf_dir)
    qpdf = pd.DataFrame(
        {
            "query_id": [i for i, _ in FIELD_DSL_QUERIES],
            "dsl": [t for _, t in FIELD_DSL_QUERIES],
        }
    )
    return dsl_search_replica(
        spark,
        qpdf,
        shard_paths,
        td_pdf,
        n_docs,
        avgdl,
        cfg,
        k=DSL_K,
        pos_store=pos_store,
        numeric_dv=numeric_dv,
        keyword_dv=keyword_dv,
    )


def _dsl_field_sql() -> str:
    return _dsl_sql_core(
        _parsed_field_dsl(), field_names=("lang", "n_chars")
    )


# ------------------------------------------------ q: boosted DSL


def _parsed_boost_dsl() -> list:
    return [(qid, parse_query(text)) for qid, text in BOOST_DSL_QUERIES]


def q_dsl_boost_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-time boosts (`term^2`, `"phrase"~n^1.5`) through the
    DataFrame backend: matching is boost-blind, ranking scales each
    term's BM25 contribution by the summed boost of its positive
    occurrences (Lucene additive-scorer semantics); boosts under NOT
    contribute nothing."""
    return _dsl_rank_frame(spark, sf_dir, _parsed_boost_dsl())


def q_dsl_boost_search_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME boosted queries index-natively: the driver folds each
    term's boost into its idf before shipping the scoring list to the
    zero-shuffle kernel — gated by the identical oracle as
    ``dsl_boost_search``."""
    import pandas as pd

    from nil_spark.operators.dsl_exec import dsl_search_replica

    EQ = _eq()
    shard_paths, td_pdf, n_docs, avgdl, cfg = EQ._gate_engine_index(
        spark, sf_dir
    )
    pos_store, _pcfg = EQ._gate_pos_store(spark, sf_dir)
    qpdf = pd.DataFrame(
        {
            "query_id": [i for i, _ in BOOST_DSL_QUERIES],
            "dsl": [t for _, t in BOOST_DSL_QUERIES],
        }
    )
    return dsl_search_replica(
        spark,
        qpdf,
        shard_paths,
        td_pdf,
        n_docs,
        avgdl,
        cfg,
        k=DSL_K,
        pos_store=pos_store,
    )


def _dsl_boost_sql() -> str:
    return _dsl_sql_core(_parsed_boost_dsl())


# ------------------------------------------------ q: span_first


SPAN_FIRST_QUERIES = [
    # (query_id, term, end) — match iff the term occurs among the
    # first `end` tokens (Lucene SpanFirstQuery)
    (0, "hash", 8),
    (1, "dup", 5),
    (2, "window", 10),
    (3, "merge", 6),
]


def q_span_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lucene ``SpanFirstQuery``: docs where the term's FIRST
    occurrence falls within the leading ``end`` tokens (title-ish
    matching without a title field), ranked by that position (doc_id
    ties).  ``array_position`` is a JVM expression; at scale the
    positional store answers the same predicate from position lists
    without touching text (same store span_near/min_window read)."""
    EQ = _eq()
    docs = EQ._docs_toks(spark, sf_dir)
    q = spark.createDataFrame(
        SPAN_FIRST_QUERIES, "query_id long, term string, end int"
    )
    pos = docs.crossJoin(F.broadcast(q)).select(
        "query_id",
        "doc_id",
        "end",
        F.array_position("toks", F.col("term")).alias("first_pos"),
    )
    w = Window.partitionBy("query_id").orderBy("first_pos", "doc_id")
    return (
        pos.filter(
            (F.col("first_pos") > 0)
            & (F.col("first_pos") <= F.col("end"))
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= DSL_K)
        .select("query_id", "rank", "doc_id", "first_pos")
    )


def _span_first_sql() -> str:
    EQ = _eq()
    vals = ", ".join(
        f"({i}, '{t}', {e})" for i, t, e in SPAN_FIRST_QUERIES
    )
    return f"""
WITH {EQ._DOCS_CTE},
q(query_id, term, e) AS (VALUES {vals}),
m AS (SELECT q.query_id, docs.doc_id,
             coalesce(list_position(docs.toks, q.term), 0) AS first_pos,
             q.e
      FROM docs CROSS JOIN q)
SELECT query_id, rank, doc_id, first_pos::BIGINT AS first_pos FROM (
  SELECT query_id, doc_id, first_pos,
         (row_number() OVER (PARTITION BY query_id
                             ORDER BY first_pos, doc_id))::INT AS rank
  FROM m WHERE first_pos > 0 AND first_pos <= e)
WHERE rank <= {DSL_K}
"""


# ------------------------------------------------ q: boosting query


BOOSTING_QUERIES = [
    # (query_id, positive DSL, negative DSL)
    (0, "hash OR join", "slow"),
    (1, "scan", '"table scan"'),
    (2, "dup OR vector", "stream OR batch"),
    (3, '"hash join"', "sort"),
]
NEG_BOOST = 0.3


def q_boosting_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``boosting`` query: docs must match the POSITIVE query; docs
    also matching the NEGATIVE query are not excluded (that's NOT) but
    DEMOTED — their BM25 scaled by negative_boost before ranking.
    Both clauses are full DSL expressions; one corpus scan evaluates
    every (positive, negative) pair as a match-struct array, and the
    demotion is a factor applied to the unrounded positive score
    (round-before-rank happens after, the shared pin)."""
    EQ = _eq()
    parsed = [
        (qid, parse_query(p), parse_query(n))
        for qid, p, n in BOOSTING_QUERIES
    ]
    docs = EQ._docs_toks(spark, sf_dir)
    base = docs.withColumn(
        "padded",
        F.concat(F.lit(" "), F.array_join("toks", " "), F.lit(" ")),
    )
    match_arr = F.array(
        *[
            F.struct(
                F.lit(qid).cast("long").alias("query_id"),
                compile_spark(p, F.col("toks"), F.col("padded")).alias("m"),
                compile_spark(n, F.col("toks"), F.col("padded")).alias(
                    "neg"
                ),
            )
            for qid, p, n in parsed
        ]
    )
    matched = (
        base.select("doc_id", F.explode(match_arr).alias("qm"))
        .filter(F.col("qm.m"))
        .select(
            F.col("qm.query_id").alias("query_id"),
            "doc_id",
            F.col("qm.neg").alias("neg"),
        )
    )

    qt_rows = [
        (qid, t) for qid, p, _n in parsed for t in positive_terms(p)
    ]
    qt = spark.createDataFrame(qt_rows, "query_id long, term string")
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
    scored = (
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
        .agg(F.sum("partial").alias("raw"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("bm25").desc(), F.col("doc_id")
    )
    return (
        matched.join(scored, ["query_id", "doc_id"], "left")
        .withColumn(
            "bm25",
            F.round(
                F.coalesce("raw", F.lit(0.0))
                * F.when(F.col("neg"), F.lit(NEG_BOOST)).otherwise(1.0),
                6,
            ),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= DSL_K)
        .select("query_id", "rank", "doc_id", "bm25", "neg")
    )


def _boosting_sql() -> str:
    EQ = _eq()
    parsed = [
        (qid, parse_query(p), parse_query(n))
        for qid, p, n in BOOSTING_QUERIES
    ]
    matched_selects = "\n UNION ALL\n".join(
        f" SELECT {qid}::BIGINT AS query_id, doc_id, "
        + f"({compile_duckdb(n, 'toks', 'padded')}) AS neg "
        + "FROM dtokp WHERE "
        + compile_duckdb(p, "toks", "padded")
        for qid, p, n in parsed
    )
    qt_vals = ", ".join(
        f"({qid}, '{t}')"
        for qid, p, _n in parsed
        for t in positive_terms(p)
    )
    all_terms = sorted(
        {t for _, p, _n in parsed for t in positive_terms(p)}
    )
    in_list = ", ".join(f"'{t}'" for t in all_terms)
    return f"""
WITH {EQ._DOCS_CTE},
dtokp AS (SELECT doc_id, toks,
                 ' ' || coalesce(array_to_string(toks, ' '), '') || ' ' AS padded
          FROM docs),
matched AS (
{matched_selects}),
dl AS (SELECT doc_id, len(toks)::DOUBLE AS dl FROM docs),
stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
qt(query_id, term) AS (VALUES {qt_vals}),
tf AS (SELECT doc_id, tok AS term, count(*)::DOUBLE AS tf
       FROM docs, unnest(toks) AS u(tok)
       WHERE tok IN ({in_list}) GROUP BY 1, 2),
dfr AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
scored AS (
  SELECT qt.query_id, tf.doc_id,
         sum( ln(1 + (s.n - dfr.df + 0.5) / (dfr.df + 0.5))
              * (tf.tf * 2.2)
              / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) ) AS raw
  FROM qt JOIN tf USING (term) JOIN dfr USING (term)
       JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats s
  GROUP BY 1, 2)
SELECT query_id, rank, doc_id, bm25, neg FROM (
  SELECT m.query_id, m.doc_id, m.neg,
         round(coalesce(s.raw, 0.0)
               * (CASE WHEN m.neg THEN {NEG_BOOST} ELSE 1.0 END), 6) AS bm25,
         (row_number() OVER (PARTITION BY m.query_id
            ORDER BY round(coalesce(s.raw, 0.0)
                     * (CASE WHEN m.neg THEN {NEG_BOOST} ELSE 1.0 END), 6)
                     DESC,
                     m.doc_id))::INT AS rank
  FROM matched m LEFT JOIN scored s
    ON s.query_id = m.query_id AND s.doc_id = m.doc_id)
WHERE rank <= {DSL_K}
"""


# --------------------------------------------------------- registry


def build_registry() -> dict:
    return {
        "collapse_topk": (q_collapse_topk, _collapse_sql()),
        "mlt_topk": (q_mlt_topk, _mlt_sql()),
        "synonym_search": (q_synonym_search, _synonym_sql()),
        "ndcg_eval": (q_ndcg_eval, _ndcg_sql()),
        "collocations": (q_collocations, _collocations_sql()),
        "dsl_search": (q_dsl_search, _dsl_sql()),
        "dsl_search_engine": (q_dsl_search_engine, _dsl_sql()),
        "dsl_field_search": (q_dsl_field_search, _dsl_field_sql()),
        "dsl_field_search_engine": (
            q_dsl_field_search_engine,
            _dsl_field_sql(),
        ),
        "dsl_boost_search": (q_dsl_boost_search, _dsl_boost_sql()),
        "dsl_boost_search_engine": (
            q_dsl_boost_search_engine,
            _dsl_boost_sql(),
        ),
        "boosting_search": (q_boosting_search, _boosting_sql()),
        "span_first": (q_span_first, _span_first_sql()),
        "search_corrected": (q_search_corrected, _search_corrected_sql()),
        "wildcard_search": (q_wildcard_search, _wildcard_sql()),
        "blockjoin_topk": (q_blockjoin_topk, _blockjoin_sql()),
    }
