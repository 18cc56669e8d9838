"""Search-surface gate queries, part 3: score explanation, cursor
pagination (search_after), numeric range facets, fuzzy (edit-distance)
retrieval, and BM25F field-boosted ranking.

Same contract as ``entry_queries`` / ``relevance_queries``: pure
JVM-side DataFrame plans with exact DuckDB oracles under the shared
parity rules (tokenize on ``[^a-z0-9]+``; BM25 k1=1.2 b=0.75 with
idf = ln(1+(N-df+0.5)/(df+0.5)); doubles rounded to 6 decimals BEFORE
ranking; ties by id).  ``build_registry()`` is merged into
``entry_queries.REGISTRY`` at import, after ``relevance_queries``.

These are the remaining operations a search user expects of a
full-text index (all public Lucene/Elasticsearch semantics,
re-expressed as Spark plans — the reference's own query surface is the
clone pipeline, SURVEY §2 Q1-Q9):

 * score_explain — Lucene ``Explanation``: the per-term tf/df/idf/
   contribution breakdown behind the BM25 total for each top hit;
 * search_after_topk — cursor pagination: page 2 selected by the
   strictly-after (score, doc_id) predicate, not by offset — the only
   pagination that stays O(k) per page at 10^12 docs;
 * facet_ranges — numeric range aggregation over ALL hits of each
   query (Elasticsearch range facet on ``n_chars``);
 * fuzzy_search — FuzzyQuery: query terms expand to vocabulary terms
   within Levenshtein distance 1, each variant scored as its own term
   with a length-normalized boost, SHOULD-summed per doc;
 * bm25f_topk — BM25F (Robertson/Zaragoza): per-field weighted tf
   (title = first TITLE_LEN tokens at weight 2, body at weight 1)
   folded into ONE saturation with a weighted length norm.

Scale notes: every query keeps the corpus on one side of broadcast
joins only (query terms, cursors, top-doc sets, fuzzy expansions are
broadcast); tf aggregates are filter-early (query/variant terms joined
BELOW the groupBy, so only matching occurrences shuffle).  The fuzzy
expansion scans the term dictionary once with a cheap length prefilter
ahead of the Levenshtein evaluation — in the engine layout the same
expansion is a bounded walk of the sorted termdict, not a corpus scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# --------------------------------------------------------- fixed inputs

EXPLAIN_DOCS = 3        # hits explained per query

PAGE_SIZE = 5           # search_after: page size; page 2 is returned

FACET_BUCKET = 100      # n_chars bucket width

# misspellings within edit distance 1 of corpus vocabulary terms
# ("tabl" ~ table, "scann" ~ scan, "dupp" ~ dup, "windo" ~ window,
#  "merg" ~ merge, "vectr" ~ vector); exact terms expand to themselves
# at distance 0 with boost 1, Lucene FuzzyQuery semantics
FUZZ_QUERIES = [
    (0, "dupp tabl"),
    (1, "scann join"),
    (2, "windo sort"),
    (3, "vectr merg"),
]
FUZZ_MAX_EDITS = 1
FUZZ_K = 10

TITLE_LEN = 5           # bm25f: first TITLE_LEN tokens are the "title"
W_TITLE = 2.0
W_BODY = 1.0
BM25F_K = 10


def _eq():
    # deferred: entry_queries imports this module at its bottom, so all
    # of its helpers already exist when our functions run
    from nil_spark.plans import entry_queries as EQ

    return EQ


# ------------------------------------------------ shared: per-term parts


def _explain_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pre-aggregation per-(query, doc, term) BM25 parts relation:
    tf, df, raw idf and raw contribution — ``_bm25_scored`` is its
    ``sum(contrib_raw)``.  Filter-early: the tiny distinct query-term
    set broadcast-joins BELOW the tf aggregate."""
    EQ = _eq()
    docs = EQ._docs_toks(spark, sf_dir)
    dl = docs.select("doc_id", F.size("toks").cast("double").alias("dl"))
    stats = dl.agg(
        F.count("*").cast("double").alias("n"), F.avg("dl").alias("avgdl")
    )
    q = spark.createDataFrame(EQ.BM25_QUERIES, "query_id long, qtext string")
    qt = q.select(
        "query_id",
        F.explode(
            F.filter(F.split(F.lower("qtext"), EQ.TOKEN_SPLIT), lambda x: x != "")
        ).alias("term"),
    ).dropDuplicates(["query_id", "term"])
    qterms = qt.select("term").distinct()
    tf = (
        docs.select("doc_id", F.explode("toks").alias("term"))
        .join(F.broadcast(qterms), "term")
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("double").alias("tf"))
    )
    dfr = tf.groupBy("term").agg(F.count("*").cast("double").alias("df"))
    return (
        tf.join(F.broadcast(qt), "term")
        .join(F.broadcast(dfr), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf_raw",
            F.log(
                F.lit(1.0) + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
        )
        .withColumn(
            "contrib_raw",
            F.col("idf_raw")
            * (F.col("tf") * 2.2)
            / (F.col("tf") + 1.2 * (1.0 - 0.75 + 0.75 * F.col("dl") / F.col("avgdl"))),
        )
    )


_PARTS_CTES = """
dl AS (SELECT doc_id, len(toks)::DOUBLE AS dl FROM docs),
stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
tf AS (SELECT doc_id, tok AS term, count(*)::DOUBLE AS tf
       FROM docs, unnest(toks) AS u(tok) GROUP BY 1, 2),
dfr AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
qt AS (SELECT DISTINCT query_id, tok AS term
       FROM q, unnest(list_filter(regexp_split_to_array(lower(qtext), '[^a-z0-9]+'), x -> x <> '')) AS u(tok)),
parts AS (
  SELECT qt.query_id, tf.doc_id, tf.term, tf.tf, dfr.df, dl.dl, s.avgdl,
         ln(1 + (s.n - dfr.df + 0.5) / (dfr.df + 0.5)) AS idf_raw,
         ln(1 + (s.n - dfr.df + 0.5) / (dfr.df + 0.5))
           * (tf.tf * 2.2)
           / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) AS contrib_raw
  FROM qt JOIN tf USING (term) JOIN dfr USING (term)
       JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats s)"""


def _q_values() -> str:
    EQ = _eq()
    return ", ".join(f"({i}, '{t}')" for i, t in EQ.BM25_QUERIES)


# ------------------------------------------------- q: score explanation


def q_score_explain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lucene-style score explanation: for each query's top-EXPLAIN_DOCS
    BM25 hits, one row per contributing term with tf, df, rounded idf
    and rounded contribution, plus the doc's rounded total.  The
    breakdown relation is the scored relation BEFORE its sum — the
    top-doc set (queries × EXPLAIN_DOCS rows) broadcasts back into it,
    so explaining costs no second corpus pass."""
    parts = _explain_parts(spark, sf_dir)
    scored = parts.groupBy("query_id", "doc_id").agg(
        F.round(F.sum("contrib_raw"), 6).alias("bm25")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("bm25").desc(), F.col("doc_id")
    )
    top = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= EXPLAIN_DOCS)
    )
    return (
        parts.join(F.broadcast(top), ["query_id", "doc_id"])
        .select(
            "query_id",
            "rank",
            "doc_id",
            "term",
            "tf",
            "df",
            F.round(F.col("idf_raw"), 6).alias("idf"),
            F.round(F.col("contrib_raw"), 6).alias("contrib"),
            "bm25",
        )
    )


def _score_explain_sql() -> str:
    EQ = _eq()
    return f"""
WITH {EQ._DOCS_CTE},
q(query_id, qtext) AS (VALUES {_q_values()}),
{_PARTS_CTES},
scored AS (SELECT query_id, doc_id, round(sum(contrib_raw), 6) AS bm25
           FROM parts GROUP BY 1, 2),
top AS (
  SELECT query_id, doc_id, bm25,
         (row_number() OVER (PARTITION BY query_id
                             ORDER BY bm25 DESC, doc_id))::INT AS rank
  FROM scored
  QUALIFY rank <= {EXPLAIN_DOCS})
SELECT p.query_id, t.rank, p.doc_id, p.term, p.tf, p.df,
       round(p.idf_raw, 6) AS idf, round(p.contrib_raw, 6) AS contrib, t.bm25
FROM parts p JOIN top t ON p.query_id = t.query_id AND p.doc_id = t.doc_id
"""


# --------------------------------------------- q: search_after paging


def q_search_after_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cursor pagination: page 2 of the BM25 ranking, selected by the
    strictly-after predicate on the (bm25 DESC, doc_id ASC) sort key —
    the cursor is page 1's last row.  Unlike offset paging this never
    re-ranks the skipped prefix: at engine scale the predicate pushes
    into the top-k heap (admit only docs after the cursor), so page N
    costs the same as page 1.  Queries with fewer than PAGE_SIZE hits
    have no cursor and return no page-2 rows."""
    EQ = _eq()
    scored = EQ._bm25_scored(spark, sf_dir)
    w = Window.partitionBy("query_id").orderBy(
        F.col("bm25").desc(), F.col("doc_id")
    )
    cursor = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == PAGE_SIZE)
        .select(
            "query_id",
            F.col("bm25").alias("cur_score"),
            F.col("doc_id").alias("cur_doc"),
        )
    )
    return (
        scored.join(F.broadcast(cursor), "query_id")
        .filter(
            (F.col("bm25") < F.col("cur_score"))
            | ((F.col("bm25") == F.col("cur_score")) & (F.col("doc_id") > F.col("cur_doc")))
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= PAGE_SIZE)
        .select("query_id", "rank", "doc_id", "bm25")
    )


def _search_after_sql() -> str:
    EQ = _eq()
    return f"""
WITH {EQ._DOCS_CTE},
q(query_id, qtext) AS (VALUES {_q_values()}),
{_PARTS_CTES},
scored AS (SELECT query_id, doc_id, round(sum(contrib_raw), 6) AS bm25
           FROM parts GROUP BY 1, 2),
cursor AS (
  SELECT query_id, bm25 AS cur_score, doc_id AS cur_doc FROM (
    SELECT query_id, doc_id, bm25,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY bm25 DESC, doc_id) AS rn
    FROM scored)
  WHERE rn = {PAGE_SIZE})
SELECT query_id, (row_number() OVER (PARTITION BY query_id
                                     ORDER BY bm25 DESC, doc_id))::INT AS rank,
       doc_id, bm25
FROM (
  SELECT s.query_id, s.doc_id, s.bm25
  FROM scored s JOIN cursor c USING (query_id)
  WHERE s.bm25 < c.cur_score
     OR (s.bm25 = c.cur_score AND s.doc_id > c.cur_doc))
QUALIFY rank <= {PAGE_SIZE}
"""


# ------------------------------------------------- q: range facets


def q_facet_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric range aggregation over ALL hits of each query
    (Elasticsearch range facet): bucket ``n_chars`` by FACET_BUCKET,
    count hits and keep the bucket's best score.  The aggregate is
    partial (map-side combine) on (query_id, bucket) — the hit
    relation joins document metadata on the co-partitioned doc_id key
    and never fans out."""
    EQ = _eq()
    scored = EQ._bm25_scored(spark, sf_dir)
    meta = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(
            "doc_id",
            F.floor(F.col("n_chars") / FACET_BUCKET).cast("long").alias("bucket"),
        )
    )
    return (
        scored.join(meta, "doc_id")
        .groupBy("query_id", "bucket")
        .agg(
            F.count("*").alias("hits"),
            F.max("bm25").alias("top_bm25"),
        )
    )


def _facet_ranges_sql() -> str:
    EQ = _eq()
    return f"""
WITH {EQ._DOCS_CTE},
q(query_id, qtext) AS (VALUES {_q_values()}),
{_PARTS_CTES},
scored AS (SELECT query_id, doc_id, round(sum(contrib_raw), 6) AS bm25
           FROM parts GROUP BY 1, 2)
SELECT s.query_id, CAST(floor(d.n_chars / {FACET_BUCKET}.0) AS BIGINT) AS bucket,
       count(*) AS hits, max(s.bm25) AS top_bm25
FROM scored s JOIN documents d USING (doc_id)
GROUP BY 1, 2
"""


# --------------------------------------------- q: fuzzy (edit-distance)


def q_fuzzy_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FuzzyQuery retrieval: each query term expands to every
    vocabulary term within Levenshtein distance FUZZ_MAX_EDITS; each
    variant scores as its own term (its own df/idf) scaled by the
    length-normalized boost ``1 - dist / max(len(qterm), len(term))``
    (Lucene FuzzyTermsEnum boost), SHOULD-summed per doc, top-FUZZ_K.

    Scale shape: the expansion is (query terms × vocabulary) behind a
    broadcast nested-loop with a |len(term) - len(qterm)| <= maxEdits
    prefilter ahead of the Levenshtein evaluation — in the engine
    layout this is a bounded walk of the sorted termdict (the same
    structure ``wildcard_search`` walks), never a corpus scan; the tf
    aggregate is filter-early on the matched variant set."""
    EQ = _eq()
    docs = EQ._docs_toks(spark, sf_dir)
    dl = docs.select("doc_id", F.size("toks").cast("double").alias("dl"))
    stats = dl.agg(
        F.count("*").cast("double").alias("n"), F.avg("dl").alias("avgdl")
    )
    vocab = (
        docs.select(F.explode("toks").alias("term")).distinct()
    )
    q = spark.createDataFrame(FUZZ_QUERIES, "query_id long, qtext string")
    qt = q.select(
        "query_id",
        F.explode(
            F.filter(F.split(F.lower("qtext"), EQ.TOKEN_SPLIT), lambda x: x != "")
        ).alias("qterm"),
    ).dropDuplicates(["query_id", "qterm"])
    expanded = (
        vocab.join(
            F.broadcast(qt),
            F.abs(F.length("term") - F.length("qterm")) <= FUZZ_MAX_EDITS,
        )
        .withColumn("dist", F.levenshtein("qterm", "term"))
        .filter(F.col("dist") <= FUZZ_MAX_EDITS)
        .withColumn(
            "boost",
            F.lit(1.0)
            - F.col("dist")
            / F.greatest(F.length("qterm"), F.length("term")).cast("double"),
        )
        .select("query_id", "qterm", "term", "boost")
    )
    variants = expanded.select("term").distinct()
    tf = (
        docs.select("doc_id", F.explode("toks").alias("term"))
        .join(F.broadcast(variants), "term")
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("double").alias("tf"))
    )
    dfr = tf.groupBy("term").agg(F.count("*").cast("double").alias("df"))
    scored = (
        tf.join(F.broadcast(expanded), "term")
        .join(F.broadcast(dfr), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id",
            "doc_id",
            (
                F.col("boost")
                * F.log(
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
        .agg(F.round(F.sum("partial"), 6).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= FUZZ_K)
        .select("query_id", "rank", "doc_id", "score")
    )


def _fuzzy_sql() -> str:
    EQ = _eq()
    vals = ", ".join(f"({i}, '{t}')" for i, t in FUZZ_QUERIES)
    return f"""
WITH {EQ._DOCS_CTE},
dl AS (SELECT doc_id, len(toks)::DOUBLE AS dl FROM docs),
stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
vocab AS (SELECT DISTINCT tok AS term FROM docs, unnest(toks) AS u(tok)),
q(query_id, qtext) AS (VALUES {vals}),
qt AS (SELECT DISTINCT query_id, tok AS qterm
       FROM q, unnest(list_filter(regexp_split_to_array(lower(qtext), '[^a-z0-9]+'), x -> x <> '')) AS u(tok)),
expanded AS (
  SELECT query_id, qterm, term,
         1.0 - levenshtein(qterm, term)::DOUBLE
               / greatest(len(qterm), len(term)) AS boost
  FROM vocab JOIN qt ON abs(len(term) - len(qterm)) <= {FUZZ_MAX_EDITS}
  WHERE levenshtein(qterm, term) <= {FUZZ_MAX_EDITS}),
tf AS (SELECT doc_id, tok AS term, count(*)::DOUBLE AS tf
       FROM docs, unnest(toks) AS u(tok)
       WHERE tok IN (SELECT term FROM expanded)
       GROUP BY 1, 2),
dfr AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
scored AS (
  SELECT e.query_id, tf.doc_id,
         round(sum( e.boost
                    * ln(1 + (s.n - dfr.df + 0.5) / (dfr.df + 0.5))
                    * (tf.tf * 2.2)
                    / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) ), 6) AS score
  FROM expanded e JOIN tf USING (term) JOIN dfr USING (term)
       JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats s
  GROUP BY 1, 2)
SELECT query_id, (row_number() OVER (PARTITION BY query_id
                                     ORDER BY score DESC, doc_id))::INT AS rank,
       doc_id, score
FROM scored
QUALIFY rank <= {FUZZ_K}
"""


# --------------------------------------------------- q: BM25F fields


def q_bm25f_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25F (Robertson & Zaragoza): the first TITLE_LEN tokens of each
    doc are its "title" field at weight W_TITLE, the rest the "body" at
    W_BODY; per-term field tfs fold into ONE weighted tf with a
    weighted length norm BEFORE the single BM25 saturation (the defining
    property of BM25F vs naive per-field score summing).  df/idf are
    whole-document.  Filter-early as everywhere: query terms broadcast
    below the weighted-tf aggregate."""
    EQ = _eq()
    docs = EQ._docs_toks(spark, sf_dir)
    # weighted doc length: W_TITLE*|title| + W_BODY*|body|
    wdl = docs.select(
        "doc_id",
        (
            F.lit(W_TITLE) * F.least(F.size("toks"), F.lit(TITLE_LEN))
            + F.lit(W_BODY)
            * F.greatest(F.size("toks") - TITLE_LEN, F.lit(0))
        ).cast("double").alias("wdl"),
    )
    stats = wdl.agg(
        F.count("*").cast("double").alias("n"), F.avg("wdl").alias("avgwdl")
    )
    q = spark.createDataFrame(EQ.BM25_QUERIES, "query_id long, qtext string")
    qt = q.select(
        "query_id",
        F.explode(
            F.filter(F.split(F.lower("qtext"), EQ.TOKEN_SPLIT), lambda x: x != "")
        ).alias("term"),
    ).dropDuplicates(["query_id", "term"])
    qterms = qt.select("term").distinct()

    title_occ = docs.select(
        "doc_id",
        F.explode(F.slice("toks", 1, TITLE_LEN)).alias("term"),
        F.lit(W_TITLE).alias("w"),
    )
    body_occ = docs.select(
        "doc_id",
        F.explode(
            F.slice(
                "toks",
                TITLE_LEN + 1,
                F.greatest(F.size("toks") - TITLE_LEN, F.lit(0)),
            )
        ).alias("term"),
        F.lit(W_BODY).alias("w"),
    )
    wtf = (
        title_occ.unionByName(body_occ)
        .join(F.broadcast(qterms), "term")
        .groupBy("doc_id", "term")
        .agg(F.sum("w").alias("wtf"))
    )
    # whole-document df: every doc with wtf > 0 contains the term
    dfr = wtf.groupBy("term").agg(F.count("*").cast("double").alias("df"))
    scored = (
        wtf.join(F.broadcast(qt), "term")
        .join(F.broadcast(dfr), "term")
        .join(wdl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id",
            "doc_id",
            (
                F.log(
                    F.lit(1.0)
                    + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                )
                * (F.col("wtf") * 2.2)
                / (
                    F.col("wtf")
                    + 1.2 * (1.0 - 0.75 + 0.75 * F.col("wdl") / F.col("avgwdl"))
                )
            ).alias("partial"),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum("partial"), 6).alias("bm25f"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("bm25f").desc(), F.col("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= BM25F_K)
        .select("query_id", "rank", "doc_id", "bm25f")
    )


def _bm25f_sql() -> str:
    EQ = _eq()
    return f"""
WITH {EQ._DOCS_CTE},
wdl AS (SELECT doc_id,
               ({W_TITLE} * least(len(toks), {TITLE_LEN})
                + {W_BODY} * greatest(len(toks) - {TITLE_LEN}, 0))::DOUBLE AS wdl
        FROM docs),
stats AS (SELECT count(*)::DOUBLE AS n, avg(wdl) AS avgwdl FROM wdl),
occ AS (
  SELECT doc_id, tok AS term, {W_TITLE} AS w
  FROM docs, unnest(toks[1:{TITLE_LEN}]) AS u(tok)
  UNION ALL
  SELECT doc_id, tok AS term, {W_BODY} AS w
  FROM docs, unnest(toks[{TITLE_LEN + 1}:]) AS u(tok)),
wtf AS (SELECT doc_id, term, sum(w) AS wtf FROM occ GROUP BY 1, 2),
dfr AS (SELECT term, count(*)::DOUBLE AS df FROM wtf GROUP BY 1),
q(query_id, qtext) AS (VALUES {_q_values()}),
qt AS (SELECT DISTINCT query_id, tok AS term
       FROM q, unnest(list_filter(regexp_split_to_array(lower(qtext), '[^a-z0-9]+'), x -> x <> '')) AS u(tok)),
scored AS (
  SELECT qt.query_id, wtf.doc_id,
         round(sum( ln(1 + (s.n - dfr.df + 0.5) / (dfr.df + 0.5))
                    * (wtf.wtf * 2.2)
                    / (wtf.wtf + 1.2 * (1 - 0.75 + 0.75 * wdl.wdl / s.avgwdl)) ), 6) AS bm25f
  FROM qt JOIN wtf USING (term) JOIN dfr USING (term)
       JOIN wdl ON wtf.doc_id = wdl.doc_id CROSS JOIN stats s
  GROUP BY 1, 2)
SELECT query_id, (row_number() OVER (PARTITION BY query_id
                                     ORDER BY bm25f DESC, doc_id))::INT AS rank,
       doc_id, bm25f
FROM scored
QUALIFY rank <= {BM25F_K}
"""


# --------------------------------------------------- q: rescoring


RESCORE_WINDOW = 20   # first-pass pool depth per query
RESCORE_K = 10
PHRASE_BOOST = 2.0    # added per contained adjacent query bigram


def _query_bigrams() -> list[tuple[int, str]]:
    EQ = _eq()
    out = []
    for qid, qtext in EQ.BM25_QUERIES:
        ws = qtext.split()
        out.extend(
            sorted({(qid, f"{a} {b}") for a, b in zip(ws, ws[1:])})
        )
    return out


def q_rescore_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-pass rescoring (Lucene/Elasticsearch rescorer): the cheap
    first pass (BM25) selects a RESCORE_WINDOW pool per query; an
    expensive second signal — how many of the query's adjacent bigrams
    the doc contains as phrases — runs on the POOL ONLY and re-ranks it
    as ``rescored = bm25 + PHRASE_BOOST·bigrams_contained``.

    Scale shape: the second pass touches queries × RESCORE_WINDOW ×
    bigrams rows (pool and bigram set broadcast into the docs join),
    never the corpus — the defining property of a rescorer vs a scoring
    function.  This is the same filter-then-verify shape as the
    reference's clone pipeline (cheap overlap filter, expensive LCS
    verify on the residue, NILMain.kt flow) applied to ranked
    retrieval."""
    EQ = _eq()
    scored = EQ._bm25_scored(spark, sf_dir)
    w = Window.partitionBy("query_id").orderBy(
        F.col("bm25").desc(), F.col("doc_id")
    )
    pool = (
        scored.withColumn("r1", F.row_number().over(w))
        .filter(F.col("r1") <= RESCORE_WINDOW)
        .select("query_id", "doc_id", "bm25")
    )
    bg = spark.createDataFrame(_query_bigrams(), "query_id long, bigram string")
    docs = EQ._docs_toks(spark, sf_dir)
    hits = (
        docs.join(F.broadcast(pool), "doc_id")
        .withColumn(
            "padded",
            F.concat(F.lit(" "), F.array_join("toks", " "), F.lit(" ")),
        )
        .join(F.broadcast(bg), "query_id")
        .withColumn(
            "hit",
            F.col("padded")
            .contains(F.concat(F.lit(" "), F.col("bigram"), F.lit(" ")))
            .cast("double"),
        )
        .groupBy("query_id", "doc_id", "bm25")
        .agg(F.sum("hit").alias("nbg"))
        .withColumn(
            "rescored",
            F.round(F.col("bm25") + F.lit(PHRASE_BOOST) * F.col("nbg"), 6),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("rescored").desc(), F.col("doc_id")
    )
    return (
        hits.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= RESCORE_K)
        .select("query_id", "rank", "doc_id", "bm25", "rescored")
    )


def _rescore_sql() -> str:
    EQ = _eq()
    bg_vals = ", ".join(f"({qid}, '{b}')" for qid, b in _query_bigrams())
    return f"""
WITH {EQ._DOCS_CTE},
q(query_id, qtext) AS (VALUES {_q_values()}),
bg(query_id, bigram) AS (VALUES {bg_vals}),
{_PARTS_CTES},
scored AS (SELECT query_id, doc_id, round(sum(contrib_raw), 6) AS bm25
           FROM parts GROUP BY 1, 2),
pool AS (
  SELECT query_id, doc_id, bm25 FROM (
    SELECT query_id, doc_id, bm25,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY bm25 DESC, doc_id) AS r1
    FROM scored)
  WHERE r1 <= {RESCORE_WINDOW}),
rescored AS (
  SELECT p.query_id, p.doc_id, p.bm25,
         round(p.bm25 + {PHRASE_BOOST} * sum(CASE WHEN contains(
                 ' ' || coalesce(array_to_string(d.toks, ' '), '') || ' ',
                 ' ' || bg.bigram || ' ') THEN 1.0 ELSE 0.0 END), 6) AS rescored
  FROM pool p JOIN docs d USING (doc_id) JOIN bg USING (query_id)
  GROUP BY 1, 2, 3)
SELECT query_id, (row_number() OVER (PARTITION BY query_id
                                     ORDER BY rescored DESC, doc_id))::INT AS rank,
       doc_id, bm25, rescored
FROM rescored
QUALIFY rank <= {RESCORE_K}
"""


# --------------------------------------------- q: function_score decay


FS_ORIGIN = 250.0   # n_chars value where the decay multiplier is 1.0
FS_SIGMA = 150.0    # gaussian width
FS_K = 10


def q_function_score_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """function_score with a Gaussian field decay (Elasticsearch
    ``function_score`` / ``gauss`` decay): the relevance score is the
    BM25 total multiplied by ``exp(-(n_chars - origin)^2 / (2 sigma^2))``
    — documents near the preferred length keep their score, outliers
    decay smoothly toward 0.  The canonical use is recency boosting on
    a timestamp; the documents table carries no timestamp, so the decay
    field is ``n_chars`` (same math, ES ``field_value_factor`` family).

    Scale shape: the decay is a column expression over the scored
    relation joined to document metadata on the co-partitioned doc_id
    key — one narrow join, no second corpus scan, no fan-out; ranking
    is the usual per-query window over matching docs only."""
    EQ = _eq()
    scored = EQ._bm25_scored(spark, sf_dir)
    meta = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.col("n_chars").cast("double").alias("n_chars")
    )
    rescored = (
        scored.join(meta, "doc_id")
        .withColumn(
            "decay",
            F.round(
                F.exp(
                    -F.pow(F.col("n_chars") - F.lit(FS_ORIGIN), F.lit(2.0))
                    / F.lit(2.0 * FS_SIGMA * FS_SIGMA)
                ),
                6,
            ),
        )
        .withColumn("score", F.round(F.col("bm25") * F.col("decay"), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id")
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= FS_K)
        .select("query_id", "rank", "doc_id", "bm25", "decay", "score")
    )


def _function_score_sql() -> str:
    EQ = _eq()
    return f"""
WITH {EQ._DOCS_CTE},
q(query_id, qtext) AS (VALUES {_q_values()}),
{_PARTS_CTES},
scored AS (SELECT query_id, doc_id, round(sum(contrib_raw), 6) AS bm25
           FROM parts GROUP BY 1, 2),
rescored AS (
  SELECT s.query_id, s.doc_id, s.bm25,
         round(exp(-pow(d.n_chars::DOUBLE - {FS_ORIGIN}, 2)
                   / {2.0 * FS_SIGMA * FS_SIGMA}), 6) AS decay
  FROM scored s JOIN documents d USING (doc_id))
SELECT query_id, (row_number() OVER (PARTITION BY query_id
                                     ORDER BY round(bm25 * decay, 6) DESC, doc_id))::INT AS rank,
       doc_id, bm25, decay, round(bm25 * decay, 6) AS score
FROM rescored
QUALIFY rank <= {FS_K}
"""


# --------------------------------------------- q: significant terms


SIG_POOL = 50   # foreground sample: top-SIG_POOL BM25 docs per query
SIG_K = 10      # significant terms returned per query
SIG_MIN_FG = 3  # a term must appear in >= SIG_MIN_FG foreground docs


def q_significant_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """significant_terms under a sampler aggregation (Elasticsearch):
    for each query, which vocabulary terms are OVER-represented in the
    result set relative to the corpus background?  Foreground = the
    top-SIG_POOL BM25 hits; per term, ``lift = (fg_docs / pool_size) /
    (bg_docs / N)`` — the ES "popularity in fg vs bg" ratio; terms
    below SIG_MIN_FG foreground docs are noise-floored out, top-SIG_K
    per query by lift (ties by term).

    Scale shape: the bounded foreground pool (queries × SIG_POOL rows)
    BROADCASTS into the corpus token relation, so foreground counting
    touches pool docs only; the background df is one partial aggregate
    the index already maintains (the termdict df column) — here
    recomputed as a distinct-doc count per term, the same single
    shuffle as term_stats."""
    EQ = _eq()
    scored = EQ._bm25_scored(spark, sf_dir)
    w = Window.partitionBy("query_id").orderBy(
        F.col("bm25").desc(), F.col("doc_id")
    )
    pool = (
        scored.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= SIG_POOL)
        .select("query_id", "doc_id")
    )
    docs = EQ._docs_toks(spark, sf_dir)
    dterms = docs.select(
        "doc_id", F.explode(F.array_distinct("toks")).alias("term")
    )
    n_docs = docs.count()
    pool_sizes = pool.groupBy("query_id").agg(
        F.count("*").cast("double").alias("pool_n")
    )
    fg = (
        dterms.join(F.broadcast(pool), "doc_id")
        .groupBy("query_id", "term")
        .agg(F.count("*").cast("double").alias("fg_count"))
        .filter(F.col("fg_count") >= SIG_MIN_FG)
    )
    bg = dterms.groupBy("term").agg(F.count("*").cast("double").alias("df"))
    lifted = (
        fg.join(bg, "term")
        .join(F.broadcast(pool_sizes), "query_id")
        .withColumn(
            "lift",
            F.round(
                (F.col("fg_count") / F.col("pool_n"))
                / (F.col("df") / F.lit(float(n_docs))),
                6,
            ),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("lift").desc(), F.col("term")
    )
    return (
        lifted.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= SIG_K)
        .select(
            "query_id",
            "rank",
            "term",
            F.col("fg_count").cast("long").alias("fg_count"),
            F.col("df").cast("long").alias("df"),
            "lift",
        )
    )


def _significant_terms_sql() -> str:
    EQ = _eq()
    return f"""
WITH {EQ._DOCS_CTE},
q(query_id, qtext) AS (VALUES {_q_values()}),
{_PARTS_CTES},
scored AS (SELECT query_id, doc_id, round(sum(contrib_raw), 6) AS bm25
           FROM parts GROUP BY 1, 2),
pool AS (
  SELECT query_id, doc_id FROM (
    SELECT query_id, doc_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY bm25 DESC, doc_id) AS r
    FROM scored)
  WHERE r <= {SIG_POOL}),
pool_sizes AS (SELECT query_id, count(*)::DOUBLE AS pool_n
               FROM pool GROUP BY 1),
dterms AS (SELECT doc_id, tok AS term
           FROM docs, unnest(list_distinct(toks)) AS u(tok)),
n_docs AS (SELECT count(*)::DOUBLE AS n FROM docs),
fg AS (SELECT p.query_id, t.term, count(*)::DOUBLE AS fg_count
       FROM dterms t JOIN pool p USING (doc_id)
       GROUP BY 1, 2
       HAVING count(*) >= {SIG_MIN_FG}),
bg AS (SELECT term, count(*)::DOUBLE AS df FROM dterms GROUP BY 1),
lifted AS (
  SELECT f.query_id, f.term, f.fg_count, b.df,
         round((f.fg_count / ps.pool_n) / (b.df / nd.n), 6) AS lift
  FROM fg f JOIN bg b USING (term)
       JOIN pool_sizes ps USING (query_id) CROSS JOIN n_docs nd)
SELECT query_id, (row_number() OVER (PARTITION BY query_id
                                     ORDER BY lift DESC, term))::INT AS rank,
       term, fg_count::BIGINT AS fg_count, df::BIGINT AS df, lift
FROM lifted
QUALIFY rank <= {SIG_K}
"""


# ------------------------------------------------- q: percolation


PERC_MOD = 41  # incoming batch = docs with doc_id % PERC_MOD == 0


def q_percolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percolation (Lucene/Elasticsearch percolator): REVERSE search —
    the stored-query set (the DSL registry's queries) is matched
    against an incoming batch of documents, emitting (doc_id, query_id)
    for every stored query each new doc satisfies.  This is the
    routing/alerting primitive of a streaming index: which saved
    searches fire for this document?

    Scale shape: stored queries compile ONCE to an array of boolean
    structs evaluated in a single scan of the (small) incoming batch —
    cost is O(batch × queries) column expressions with zero shuffles
    and zero corpus passes; the corpus itself is never touched."""
    from nil_spark.plans.relevance_queries import _parsed_dsl

    EQ = _eq()
    docs = EQ._docs_toks(spark, sf_dir).filter(
        F.col("doc_id") % PERC_MOD == 0
    )
    base = docs.withColumn(
        "padded",
        F.concat(F.lit(" "), F.array_join("toks", " "), F.lit(" ")),
    )
    from nil_spark.functions.querylang import compile_spark as _cs

    match_arr = F.array(
        *[
            F.struct(
                F.lit(qid).cast("long").alias("query_id"),
                _cs(ast, F.col("toks"), F.col("padded")).alias("m"),
            )
            for qid, ast in _parsed_dsl()
        ]
    )
    return (
        base.select("doc_id", F.explode(match_arr).alias("qm"))
        .filter(F.col("qm.m"))
        .select("doc_id", F.col("qm.query_id").alias("query_id"))
    )


def _percolate_sql() -> str:
    from nil_spark.functions.querylang import compile_duckdb as _cd
    from nil_spark.plans.relevance_queries import _parsed_dsl

    EQ = _eq()
    selects = "\n UNION ALL\n".join(
        f" SELECT doc_id, {qid}::BIGINT AS query_id FROM dtokp WHERE "
        + _cd(ast, "toks", "padded")
        for qid, ast in _parsed_dsl()
    )
    return f"""
WITH {EQ._DOCS_CTE},
dtokp AS (SELECT doc_id, toks,
                 ' ' || coalesce(array_to_string(toks, ' '), '') || ' ' AS padded
          FROM docs WHERE doc_id % {PERC_MOD} = 0)
{selects}
"""


# ------------------------------------------ q: prefix autocomplete


SUGGEST_PREFIXES = [(0, "s"), (1, "c"), (2, "b"), (3, "f"), (4, "d")]
SUGGEST_K = 5


def q_suggest_complete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix autocomplete (Lucene suggest): vocabulary terms matching
    each prefix, ranked by document frequency (desc, term asc) —
    the search-box completion list.  The vocabulary relation (term, df)
    is the term dictionary the index already maintains; prefixes
    broadcast into it.  At engine scale this is a bounded range walk
    of the SORTED termdict (all completions of a prefix are contiguous),
    same structure wildcard_search walks."""
    EQ = _eq()
    docs = EQ._docs_toks(spark, sf_dir)
    dfr = (
        docs.select("doc_id", F.explode("toks").alias("term"))
        .dropDuplicates(["doc_id", "term"])
        .groupBy("term")
        .agg(F.count("*").alias("df"))
    )
    p = spark.createDataFrame(SUGGEST_PREFIXES, "prefix_id long, prefix string")
    w = Window.partitionBy("prefix_id").orderBy(
        F.col("df").desc(), F.col("term")
    )
    return (
        dfr.join(F.broadcast(p), F.col("term").startswith(F.col("prefix")))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= SUGGEST_K)
        .select("prefix_id", "rank", "term", "df")
    )


def _suggest_sql() -> str:
    EQ = _eq()
    vals = ", ".join(f"({i}, '{p}')" for i, p in SUGGEST_PREFIXES)
    return f"""
WITH {EQ._DOCS_CTE},
dfr AS (SELECT term, count(*) AS df FROM (
          SELECT DISTINCT doc_id, tok AS term
          FROM docs, unnest(toks) AS u(tok)) GROUP BY 1),
p(prefix_id, prefix) AS (VALUES {vals})
SELECT prefix_id, rank, term, df FROM (
  SELECT p.prefix_id, dfr.term, dfr.df,
         (row_number() OVER (PARTITION BY p.prefix_id
                             ORDER BY dfr.df DESC, dfr.term))::INT AS rank
  FROM dfr JOIN p ON starts_with(dfr.term, p.prefix))
WHERE rank <= {SUGGEST_K}
"""


# ------------------------------------------------- q: term vectors


TV_DOCS = [3, 47, 112]


def q_term_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term vectors (Lucene TermVectors API): for a requested doc set,
    each term with its in-doc frequency and 1-based position list —
    the per-document view of the index (what MLT, highlighting and
    rescoring read).  The doc filter pushes to the parquet scan; the
    per-doc aggregate touches only the requested rows."""
    EQ = _eq()
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("doc_id").isin(TV_DOCS)
    )
    toks = d.select(
        "doc_id",
        F.filter(
            F.split(F.lower("text"), EQ.TOKEN_SPLIT), lambda x: x != ""
        ).alias("toks"),
    )
    return (
        toks.select("doc_id", F.posexplode("toks").alias("pos", "term"))
        .withColumn("pos", F.col("pos") + 1)  # 1-based, DuckDB parity
        .groupBy("doc_id", "term")
        .agg(
            F.count("*").alias("tf"),
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list("pos")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("positions"),
        )
    )


def _term_vectors_sql() -> str:
    EQ = _eq()
    ids = ", ".join(str(d) for d in TV_DOCS)
    return f"""
WITH {EQ._DOCS_CTE},
occ AS (SELECT doc_id, unnest(toks) AS term,
               generate_subscripts(toks, 1) AS pos
        FROM docs WHERE doc_id IN ({ids}))
SELECT doc_id, term, count(*) AS tf,
       string_agg(pos::VARCHAR, ',' ORDER BY pos) AS positions
FROM occ GROUP BY 1, 2
"""


# --------------------------------------------------------- registry


def build_registry() -> dict:
    return {
        "score_explain": (q_score_explain, _score_explain_sql()),
        "search_after_topk": (q_search_after_topk, _search_after_sql()),
        "facet_ranges": (q_facet_ranges, _facet_ranges_sql()),
        "fuzzy_search": (q_fuzzy_search, _fuzzy_sql()),
        "bm25f_topk": (q_bm25f_topk, _bm25f_sql()),
        "rescore_topk": (q_rescore_topk, _rescore_sql()),
        "function_score_topk": (q_function_score_topk, _function_score_sql()),
        "significant_terms": (q_significant_terms, _significant_terms_sql()),
        "percolate": (q_percolate, _percolate_sql()),
        "suggest_complete": (q_suggest_complete, _suggest_sql()),
        "term_vectors": (q_term_vectors, _term_vectors_sql()),
    }
