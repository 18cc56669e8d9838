"""Exact phrase search over the inverted index: conjunctive candidate
generation from the node-shared replica store, then a contiguity
verification pass over candidate texts — the reference's
filter-then-verify staging (OptimizedCloneDetection.kt:17-56) applied
to phrase queries, with the index supplying the *location* filter
(NGramBasedLocation.kt:10-15 candidate counting specialized to "doc
must contain every phrase term").

Semantics (pinned, SQL-expressible): a document matches phrase
``[w1..wm]`` iff its token sequence contains the phrase tokens
contiguously; ``hits`` counts LEFTMOST NON-OVERLAPPING occurrences —
after a match the scan resumes past the matched window.  This is
exactly the number of non-overlapping ``' w1 .. wm '`` substrings of
the space-joined, space-padded token string, i.e. the string
``replace``-count both Spark and DuckDB compute with pure built-ins,
so the driver gate can oracle the engine path bit-for-bit.

Scale shape (100 TB): candidate generation touches only the phrase
terms' posting lists — the rarest term's doc list is the probe set and
every other term prunes it with one vectorized ``searchsorted``
membership pass (O(min_df · m · log)); the corpus is never scanned.
With ``gram_size > 1`` the index terms are n-gram shingles of the
phrase, which are *more* selective than single tokens.  Verification
re-reads text for candidate docs only (broadcast semi-join on the
candidate-id set) and runs an Arrow-batched NumPy window-compare —
never row-at-a-time Python.  The query batch is what Spark partitions
(``parallelize`` into splits, like every replica topology): zero
shuffles end-to-end except the final verify join.
"""

from __future__ import annotations

import json
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nil_spark.config import EngineConfig
from nil_spark.functions.tokenize import terms_for_tokens, tokenize_series
from nil_spark.operators.segments import _load_replica


def count_phrase_hits(doc_toks: list, ph_toks: list) -> int:
    """Leftmost non-overlapping count of ``ph_toks`` inside
    ``doc_toks`` (list equality per position).  Pure-Python oracle for
    the vectorized kernel; also the definition tests pin against."""
    m, n = len(ph_toks), len(doc_toks)
    if m == 0 or n < m:
        return 0
    i, c = 0, 0
    while i <= n - m:
        if doc_toks[i : i + m] == ph_toks:
            c += 1
            i += m
        else:
            i += 1
    return c


def _count_hits_np(doc: np.ndarray, ph: np.ndarray) -> int:
    """Vectorized window compare: candidate start positions are pruned
    token-by-token (each pass is one fancy-index equality over the
    survivors), then a greedy left-to-right pass enforces the
    non-overlap rule on the (few) full matches."""
    m, n = len(ph), len(doc)
    if m == 0 or n < m:
        return 0
    idx = np.flatnonzero(doc[: n - m + 1] == ph[0])
    for j in range(1, m):
        if not len(idx):
            return 0
        idx = idx[doc[idx + j] == ph[j]]
    c, last = 0, -m
    for p in idx:
        if p >= last + m:
            c += 1
            last = int(p)
    return c


def _membership(dlist: np.ndarray, cand: np.ndarray) -> np.ndarray:
    """Boolean mask over ``cand``: which values occur in the SORTED
    posting doc list ``dlist`` (one vectorized searchsorted — the
    shared intersection kernel of phrase and boolean retrieval)."""
    pos = np.searchsorted(dlist, cand)
    np.minimum(pos, len(dlist) - 1, out=pos)
    return dlist[pos] == cand


def phrase_candidates_replica(
    spark: SparkSession,
    queries_pdf: pd.DataFrame,
    shard_paths: list,
    termdict_pdf: pd.DataFrame,
    n_docs: int,
    avgdl: float,
    cfg: EngineConfig,
    n_splits: int | None = None,
) -> DataFrame:
    """Conjunctive candidates ``(query_id, doc_id)``: docs whose
    posting entries cover EVERY index term of the phrase (single-token
    hashes at ``gram_size=1``, shingle hashes above — the shingles of a
    phrase are contiguity-implied necessary conditions either way).

    ``queries_pdf``: ``(query_id, text)``.  Replica arrays are the
    node-shared mmap store (`segments._load_replica`), so a fresh
    worker attaches in ~ms.

    Absence semantics: a phrase term missing from the term dictionary
    means no document contains it — the query returns no candidates.
    That inference is only sound when df-based stopword pruning never
    dropped the term, so a finite ``cfg.df_stopword_cutoff`` (< 1.0 of
    the corpus) raises: a pruned hot term would silently turn "filter"
    into "false negatives".  Phrase indexes should be built with the
    cutoff disabled (or the caller verifies against a full scan).
    """
    if (
        cfg.df_stopword_cutoff is not None
        and float(cfg.df_stopword_cutoff) < 1.0
    ):
        raise ValueError(
            "phrase candidate generation needs an unpruned term "
            "dictionary: df_stopword_cutoff "
            f"{cfg.df_stopword_cutoff} < 1.0 may have dropped phrase "
            "terms from the index (absence would read as 'no match')"
        )
    df_map = dict(
        zip(
            termdict_pdf["term"].astype(np.int64),
            termdict_pdf["df"].astype(np.int64),
        )
    )
    paths = tuple(sorted(shard_paths))
    n_splits = n_splits or max(
        int(spark.conf.get("spark.sql.shuffle.partitions", "32")), 1
    )
    k1, b = cfg.bm25_k1, cfg.bm25_b

    qtoks = tokenize_series(queries_pdf["text"], cfg)
    rows = []
    for qid, ts in zip(queries_pdf["query_id"], qtoks):
        terms = np.unique(terms_for_tokens(ts, cfg))
        if len(terms) == 0:
            if len(ts):
                # a phrase shorter than gram_size has no index terms;
                # silently returning "no match" would be a false
                # negative (the phrase may well occur) — refuse
                raise ValueError(
                    f"query {qid}: phrase of {len(ts)} tokens is "
                    f"shorter than gram_size={cfg.gram_size}; the "
                    "index cannot filter it (use a unigram index or "
                    "a full-scan verify)"
                )
            continue  # empty text: no tokens, no matches
        if any(int(t) not in df_map for t in terms):
            continue  # some term absent from the corpus: no match
        # rarest first: the head list is the probe set every other
        # term prunes, so ordering by ascending df minimizes probes
        order = np.argsort([df_map[int(t)] for t in terms], kind="stable")
        rows.append((int(qid), json.dumps([int(t) for t in terms[order]])))
    qdf = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, n_splits) if rows
        else spark.sparkContext.parallelize([], 1),
        "query_id long, terms_json string",
    )

    def per_split(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        view = None
        for pdf in it:
            if len(pdf) == 0:
                continue
            if view is None:
                view = _load_replica(paths, avgdl, k1, b)
            out_q, out_d = [], []
            for qid, tj in zip(pdf["query_id"], pdf["terms_json"]):
                terms = json.loads(tj)
                entry = view.get(int(terms[0]))
                if entry is None:
                    continue
                cand = np.asarray(entry[0])
                for t in terms[1:]:
                    if not len(cand):
                        break
                    entry = view.get(int(t))
                    if entry is None:
                        cand = cand[:0]
                        break
                    cand = cand[_membership(np.asarray(entry[0]), cand)]
                if len(cand):
                    out_q.extend([int(qid)] * len(cand))
                    out_d.extend(cand.tolist())
            yield pd.DataFrame({"query_id": out_q, "doc_id": out_d})

    return qdf.mapInPandas(per_split, schema="query_id long, doc_id long")


def boolean_search_replica(
    spark: SparkSession,
    queries_pdf: pd.DataFrame,
    shard_paths: list,
    termdict_pdf: pd.DataFrame,
    n_docs: int,
    avgdl: float,
    cfg: EngineConfig,
    n_splits: int | None = None,
) -> DataFrame:
    """Boolean retrieval over the index: ``queries_pdf`` is
    ``(query_id, must, must_not)`` — whitespace-tokenized term lists —
    and the answer is every doc containing ALL ``must`` terms and NONE
    of the ``must_not`` terms, as ``(query_id, doc_id)``.

    Same machinery as phrase candidates: rarest-first conjunctive
    intersection over the node-shared replica's posting lists (the
    rarest term's doc list is the probe set, each further term prunes
    it with one vectorized ``searchsorted``), then each exclusion term
    anti-filters the survivors the same way.  Per-query cost is
    O(min_df_must · (m + x) · log) — the corpus is never scanned, and
    a ``must`` term absent from the dictionary means no match while an
    absent ``must_not`` term is a no-op.  The same unpruned-dictionary
    soundness rule applies (a stopword-pruned term would silently turn
    NOT into a no-op and AND into a false negative), so a finite df
    cutoff raises, exactly like phrase candidates.
    """
    if cfg.gram_size != 1:
        # with n-gram shingle terms, 'must' would mean contiguous-run
        # containment (not AND-of-terms) and a must_not shorter than
        # gram_size would produce zero index terms — NOT silently
        # becomes a no-op.  Phrase queries WANT shingle contiguity;
        # boolean semantics need unigram terms.
        raise ValueError(
            f"boolean retrieval needs a unigram index (gram_size=1, "
            f"got {cfg.gram_size}): shingle terms change AND into "
            "contiguity and can erase NOT clauses"
        )
    if (
        cfg.df_stopword_cutoff is not None
        and float(cfg.df_stopword_cutoff) < 1.0
    ):
        raise ValueError(
            "boolean retrieval needs an unpruned term dictionary: "
            f"df_stopword_cutoff {cfg.df_stopword_cutoff} < 1.0 may have "
            "dropped query terms from the index"
        )
    df_map = dict(
        zip(
            termdict_pdf["term"].astype(np.int64),
            termdict_pdf["df"].astype(np.int64),
        )
    )
    paths = tuple(sorted(shard_paths))
    n_splits = n_splits or max(
        int(spark.conf.get("spark.sql.shuffle.partitions", "32")), 1
    )
    k1, b = cfg.bm25_k1, cfg.bm25_b

    def _hashes(texts: pd.Series) -> list:
        toks = tokenize_series(texts, cfg)
        return [np.unique(terms_for_tokens(ts, cfg)) for ts in toks]

    must_h = _hashes(queries_pdf["must"])
    not_h = _hashes(queries_pdf["must_not"].fillna(""))
    rows = []
    for qid, mh, nh in zip(queries_pdf["query_id"], must_h, not_h):
        if len(mh) == 0:
            raise ValueError(
                f"query {qid}: boolean retrieval needs at least one "
                "must term (a pure-NOT query is a corpus scan)"
            )
        if any(int(t) not in df_map for t in mh):
            continue  # a must term absent from the corpus: no match
        order = np.argsort([df_map[int(t)] for t in mh], kind="stable")
        rows.append((
            int(qid),
            json.dumps([int(t) for t in mh[order]]),
            json.dumps([int(t) for t in nh if int(t) in df_map]),
        ))
    qdf = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, n_splits) if rows
        else spark.sparkContext.parallelize([], 1),
        "query_id long, must_json string, not_json string",
    )

    def per_split(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        view = None
        for pdf in it:
            if len(pdf) == 0:
                continue
            if view is None:
                view = _load_replica(paths, avgdl, k1, b)
            out_q, out_d = [], []
            for qid, mj, nj in zip(
                pdf["query_id"], pdf["must_json"], pdf["not_json"]
            ):
                must = json.loads(mj)
                entry = view.get(int(must[0]))
                if entry is None:
                    continue
                cand = np.asarray(entry[0])
                for t in must[1:]:
                    if not len(cand):
                        break
                    entry = view.get(int(t))
                    if entry is None:
                        cand = cand[:0]
                        break
                    cand = cand[_membership(np.asarray(entry[0]), cand)]
                for t in json.loads(nj):
                    if not len(cand):
                        break
                    entry = view.get(int(t))
                    if entry is None:
                        continue
                    cand = cand[~_membership(np.asarray(entry[0]), cand)]
                if len(cand):
                    out_q.extend([int(qid)] * len(cand))
                    out_d.extend(cand.tolist())
            yield pd.DataFrame({"query_id": out_q, "doc_id": out_d})

    return qdf.mapInPandas(per_split, schema="query_id long, doc_id long")


def phrase_verify(
    candidates: DataFrame,
    queries: DataFrame,
    docs: DataFrame,
    cfg: EngineConfig,
) -> DataFrame:
    """Contiguity verification: ``(query_id, doc_id)`` candidates →
    ``(query_id, doc_id, hits)`` with ``hits ≥ 1`` (leftmost
    non-overlapping count).  ``queries``: ``(query_id, text)``;
    ``docs``: ``(doc_id, text)`` — only candidate docs are read
    (broadcast semi-join), so verify cost scales with the candidate
    set, not the corpus."""
    cids = candidates.select("doc_id").distinct()
    ctext = docs.join(F.broadcast(cids), "doc_id").select("doc_id", "text")
    qtext = queries.select("query_id", F.col("text").alias("qtext"))
    pairs = (
        ctext.join(F.broadcast(candidates), "doc_id")
        .join(F.broadcast(qtext), "query_id")
        .select("query_id", "doc_id", "qtext", "text")
    )

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            tq = tokenize_series(pdf["qtext"], cfg)
            td = tokenize_series(pdf["text"], cfg)
            hits = np.empty(len(pdf), dtype=np.int32)
            for i, (ph, dt) in enumerate(zip(tq, td)):
                hits[i] = _count_hits_np(
                    np.asarray(dt, dtype=object), np.asarray(ph, dtype=object)
                )
            out = pdf[["query_id", "doc_id"]].copy()
            out["hits"] = hits
            yield out

    return pairs.mapInPandas(
        kernel, schema="query_id long, doc_id long, hits int"
    ).filter(F.col("hits") >= 1)


def phrase_search_replica(
    spark: SparkSession,
    queries_pdf: pd.DataFrame,
    shard_paths: list,
    termdict_pdf: pd.DataFrame,
    n_docs: int,
    avgdl: float,
    cfg: EngineConfig,
    docs: DataFrame,
    n_splits: int | None = None,
) -> DataFrame:
    """End-to-end phrase search: replica conjunctive candidates →
    contiguity verify → ``(query_id, doc_id, hits)``."""
    cand = phrase_candidates_replica(
        spark, queries_pdf, shard_paths, termdict_pdf, n_docs, avgdl,
        cfg, n_splits,
    )
    queries = spark.createDataFrame(
        queries_pdf[["query_id", "text"]], "query_id long, text string"
    )
    return phrase_verify(cand, queries, docs, cfg)
