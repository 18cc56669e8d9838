"""Inverted-index build: exploded postings, doc/corpus stats, term
dictionary, df-based stopword pruning.

Reference analog: the partial inverted-index hash aggregation
(/root/reference/src/main/kotlin/jp/ac/osaka_u/sdl/nil/entity/
InvertedIndex.kt:10-23, driven per partition at NILMain.kt:71-87).  The
reference appends ``(docId, nGramCount)`` to ``map[ngram]`` — a GROUP BY
term.  In Spark that is a shuffle on ``term`` with map-side partial
aggregation; we keep postings *exploded* ``(term, doc_id, tf, dl)`` as
the logical index (Catalyst can shuffle/prune/push down on it) and make
the compressed binary segment layout (segments.py) a physical detail.

Scale notes (100 TB):
 * ``dl`` is stored inside each posting row, exactly like the reference
   stores the doc's n-gram count inside ``NGramInfo`` (entity/
   NGram.kt:18-23, InvertedIndex.kt:20) — scoring never needs a second
   per-doc lookup/join at query time.
 * tf is computed by ``groupBy(doc_id, term)`` — key includes doc_id, so
   hot terms do NOT skew this shuffle.
 * df / term dictionary is ``groupBy(term).count()`` — algebraic, so
   map-side combine flattens the skew before the exchange.
 * stopword pruning (df > cutoff·N) is the reference's distinct-n-gram
   posting-shrink generalized (TokenSequence.kt:11), and the north
   rule's df-based pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nil_spark.config import EngineConfig
from nil_spark.functions.tokenize import with_term_counts, with_terms


def doc_stats(docs_with_terms: DataFrame) -> DataFrame:
    """(doc_id, dl) — BM25 document lengths."""
    return docs_with_terms.select("doc_id", "dl")


def corpus_stats(docstats: DataFrame) -> tuple[int, float]:
    """N, avgdl — two scalars; the only driver-side aggregation."""
    row = docstats.agg(
        F.count("*").alias("n"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    return int(row["n"]), float(row["avgdl"])


def exploded_postings(docs_with_terms: DataFrame, cfg: EngineConfig) -> DataFrame:
    """(term, doc_id, tf, dl) — the logical inverted index.

    Accepts either tokenizer output: ``tcs`` (per-doc (term, tf) pairs
    pre-counted inside the Arrow UDF — preferred: a pure narrow explode,
    NO shuffle) or flat ``terms`` (falls back to a (term, doc_id)
    groupBy whose group count ≈ input count, so map-side combine buys
    nothing — measured 2-3x slower at 27M postings).  ``dl`` rides
    along per row, mirroring the reference's posting-resident ``size``
    (InvertedIndex.kt:20).
    """
    if "tcs" in docs_with_terms.columns:
        ex = docs_with_terms.select("doc_id", "dl", F.explode("tcs").alias("tc"))
        return ex.select(
            F.col("tc.term").alias("term"), "doc_id", "dl",
            F.col("tc.tf").alias("tf"),
        )
    ex = docs_with_terms.select(
        "doc_id", "dl", F.explode("terms").alias("term")
    )
    return ex.groupBy("term", "doc_id", "dl").agg(F.count("*").cast("int").alias("tf"))


def term_dictionary(postings: DataFrame) -> DataFrame:
    """(term, df, cf) — document frequency + collection frequency."""
    return postings.groupBy("term").agg(
        F.count("*").cast("long").alias("df"),
        F.sum("tf").cast("long").alias("cf"),
    )


def prune_stopwords(
    postings: DataFrame, termdict: DataFrame, n_docs: int, cfg: EngineConfig
) -> DataFrame:
    """Drop postings of terms with df > cutoff·N (hot-term pruning).

    The surviving-term set is usually small relative to postings, but
    the *pruned* set is tiny — broadcast the stopword list and
    anti-join, so the big postings relation never reshuffles.
    """
    cutoff = cfg.df_stopword_cutoff
    if cutoff is None or cutoff >= 1.0:
        return postings
    stop = termdict.filter(F.col("df") > int(cutoff * n_docs)).select("term")
    return postings.join(F.broadcast(stop), "term", "left_anti")


def build_index(
    docs: DataFrame, cfg: EngineConfig, text_col: str = "text"
) -> dict:
    """End-to-end logical index build over a doc table that already has
    ``doc_id``.  Returns dict of DataFrames + corpus scalars."""
    # persist the tokenized view: docstats, postings and termdict all
    # derive from it and would otherwise re-run the tokenizer UDF per
    # consumer (at cluster scale this would be a checkpoint instead)
    dt = with_term_counts(docs, cfg, text_col=text_col).persist()
    docstats = doc_stats(dt)
    postings = exploded_postings(dt, cfg)
    # termdict is re-read by every query batch (idf lookup) — keep it hot
    termdict = term_dictionary(postings).persist()
    n_docs, avgdl = corpus_stats(docstats)
    pruned = prune_stopwords(postings, termdict, n_docs, cfg)
    return {
        "postings": pruned,
        "termdict": termdict,
        "docstats": docstats,
        "n_docs": n_docs,
        "avgdl": avgdl,
    }
