"""Engine-native aggregations served from the doc-values side-car.

Elasticsearch runs bucket aggregations over per-segment doc-values
columns — never over stored source — and merges per-shard partial
buckets on the coordinating node.  This module is that shape on the
nil_spark stores: a ``date_histogram`` (fixed-interval histogram over
a numeric doc-values field) computed in-kernel from the node-shared
mmap doc-values array (``operators/docvalues.py``), with an optional
boolean-DSL filter evaluated index-natively against the replica
posting arrays (``operators/dsl_exec.py``) — the corpus text is never
read.

Execution shape (one zero-shuffle mapInPandas stage + one bucket-sized
reduce):

 * the doc-id universe is split into contiguous ranges, one task per
   range — the per-segment model: each task buckets ONLY its id range;
 * every task mmaps the SAME published doc-values array (one physical
   copy per node, ~ms attach) and, when a filter is given, the same
   replica posting store;
 * per-task output is (bucket, count[, metric partials]) rows — at
   most one row per bucket per task, so the single groupBy shuffle
   moves bucket-count-sized data regardless of corpus size;
 * zero-fill (``min_doc_count: 0``): the bucket spine is generated
   from the aggregated min/max buckets, a bucket-domain-sized join.

The DSL filter is evaluated once per task (same per-shard repetition
Lucene pays: each segment walks the filter's postings); its cost is
bounded by the posting mass under the filter's terms, and the matched
set is clipped to the task's id range before any doc-value is read.

Tombstoned docs (``operators/deletes``) are excluded exactly, same
live-docs semantics as every serving path.

Metric sub-aggregation: an optional second doc-values field yields
per-bucket ``value_sum`` / ``value_avg`` (ES ``sum``/``avg`` nested
under the histogram), accumulated with the same bincount kernel.
"""

from __future__ import annotations

import json
import math
from typing import Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nil_spark.config import EngineConfig
from nil_spark.functions.querylang import parse_query
from nil_spark.operators.dsl_exec import (
    _EMPTY,
    _ast_json,
    _collect_phrases,
    _eval_node,
    make_field_resolver,
    validate_field_stores,
)
from nil_spark.operators.docvalues import load_docvalues
from nil_spark.operators.phrase import _membership
from nil_spark.operators.segments import _load_replica


def _prepare_filter_bc(
    spark, dsl, shard_paths, cfg, pos_store, avgdl, universe_mode,
    numeric_dv=None, keyword_dv=None,
):
    """Validate + compile the optional DSL filter into a broadcast
    payload (serialized analyzed AST, resolved phrase doc-sets, replica
    paths, scoring scalars) shared by every engine aggregation."""
    if universe_mode not in ("dense", "indexed"):
        raise ValueError(f"unknown universe_mode {universe_mode!r}")
    if dsl is None:
        return None
    if shard_paths is None or cfg is None:
        raise ValueError("a DSL filter needs shard_paths and the build cfg")
    if cfg.gram_size != 1:
        raise ValueError(
            "DSL filters need a unigram index (gram_size=1, got "
            f"{cfg.gram_size})"
        )
    if (
        cfg.df_stopword_cutoff is not None
        and float(cfg.df_stopword_cutoff) < 1.0
    ):
        raise ValueError(
            "DSL filters need an unpruned term dictionary: "
            f"df_stopword_cutoff {cfg.df_stopword_cutoff} < 1.0 may "
            "have dropped filter terms from the index"
        )
    if universe_mode == "dense" and (
        (cfg.min_tokens or 0) > 0 or (cfg.min_chars or 0) > 0
    ):
        raise ValueError(
            "dense DSL NOT-complements assume dense doc ids; "
            "min-size predicates filtered the index — build without "
            "them or use universe_mode='indexed'"
        )
    from nil_spark.functions.querylang import analyze_ast

    ast = analyze_ast(parse_query(dsl), cfg)
    # field predicates (role:user, ts:[a TO b]) need doc-values stores
    numeric_dv, keyword_dv = validate_field_stores(
        [ast], numeric_dv, keyword_dv
    )
    phrases: set = set()
    _collect_phrases(ast, phrases)
    phrase_ids = {ws: i for i, ws in enumerate(sorted(phrases))}
    if phrase_ids and pos_store is None:
        raise ValueError(
            "the DSL filter contains phrases but no positional "
            "store was provided"
        )
    from nil_spark.operators.dsl_exec import resolve_phrase_sets

    phrase_sets = resolve_phrase_sets(spark, phrase_ids, pos_store, cfg)
    payload = (
        json.dumps(_ast_json(ast, phrase_ids)),
        phrase_sets,
        tuple(sorted(shard_paths)),
        float(avgdl),
        float(cfg.bm25_k1),
        float(cfg.bm25_b),
        numeric_dv,
        keyword_dv,
    )
    return spark.sparkContext.broadcast(payload)


def _eval_filter(payload, n_docs: int, universe_mode: str) -> np.ndarray:
    """Worker-side: evaluate the compiled filter against the replica
    store → SORTED matched doc ids (runs once per task; posting-mass
    bounded, the per-shard repetition Lucene pays)."""
    aj, psets, paths, a, k1, b, numeric_dv, keyword_dv = payload
    view = _load_replica(paths, a, k1, b)
    if universe_mode == "dense" and view.max_doc >= n_docs:
        raise ValueError(
            f"doc id {view.max_doc} >= n_docs {n_docs}: ids are not "
            "dense — use universe_mode='indexed'"
        )
    ucache: list = []

    def universe() -> np.ndarray:
        if not ucache:
            ucache.append(
                np.arange(n_docs, dtype=np.int64)
                if universe_mode == "dense"
                else np.unique(np.asarray(view.docs, np.int64))
            )
        return ucache[0]

    fsolve = make_field_resolver(
        numeric_dv, keyword_dv, universe_mode, universe
    )
    return np.asarray(
        _eval_node(json.loads(aj), view, psets, universe, fsolve),
        np.int64,
    )


def _range_ids(
    lo: int, hi: int, matched_global, excl
) -> np.ndarray:
    """Selected doc ids for one [lo, hi) range: the filter's matched
    set clipped to the range (or the dense range itself), minus
    tombstones."""
    if matched_global is not None:
        ids = matched_global[
            np.searchsorted(matched_global, lo):
            np.searchsorted(matched_global, hi)
        ]
    else:
        ids = np.arange(lo, hi, dtype=np.int64)
    if excl is not None and len(ids):
        ids = ids[~_membership(excl, ids)]
    return ids


def _range_frame(spark, n_docs: int, n_splits):
    n_splits = n_splits or max(
        int(spark.conf.get("spark.sql.shuffle.partitions", "32")), 1
    )
    n_splits = min(n_splits, n_docs)
    step = math.ceil(n_docs / n_splits)
    ranges = [(lo, min(lo + step, n_docs)) for lo in range(0, n_docs, step)]
    return spark.createDataFrame(
        spark.sparkContext.parallelize(ranges, len(ranges)),
        "lo long, hi long",
    )


def date_histogram_replica(
    spark: SparkSession,
    dv_dir: str,
    n_docs: int,
    interval_s: float = 86400.0,
    dsl: Optional[str] = None,
    shard_paths: Optional[list] = None,
    avgdl: float = 1.0,
    cfg: Optional[EngineConfig] = None,
    pos_store: Optional[DataFrame] = None,
    excluded: Optional[np.ndarray] = None,
    metric_dv_dir: Optional[str] = None,
    n_splits: Optional[int] = None,
    universe_mode: str = "indexed",
    dsl_numeric_dv: Optional[dict] = None,
    dsl_keyword_dv: Optional[dict] = None,
) -> DataFrame:
    """Fixed-interval histogram over a doc-values field, in-kernel.

    Returns (bucket long, bucket_start double, doc_count long
    [, value_sum double, value_avg double]) with every bucket in the
    data's [min, max] span emitted, zero-filled when empty.  ``bucket``
    is ``floor(value / interval_s)``; ``bucket_start`` is the bucket's
    epoch-second origin.  Docs whose field is NaN (missing) are not
    bucketed, matching ES (missing values are skipped unless a
    ``missing`` default is configured).

    ``dsl``: optional boolean-DSL filter (AND/OR/NOT/"phrase"/ATLEAST)
    evaluated index-natively; needs ``shard_paths`` (+ ``pos_store``
    if the filter contains phrases) and the build ``cfg``.
    ``universe_mode`` fixes what NOT complements against, same contract
    as ``dsl_exec.dsl_search_replica``: "indexed" (default — the docs
    the index holds, always sound) or "dense" (raw-corpus ids
    [0, n_docs); exact DataFrame-backend parity, refused when min-size
    predicates punched holes in the indexed id space).
    """
    if interval_s <= 0:
        raise ValueError(f"interval_s must be positive, got {interval_s}")
    if n_docs <= 0:
        raise ValueError(f"n_docs must be positive, got {n_docs}")

    filt_bc = _prepare_filter_bc(
        spark, dsl, shard_paths, cfg, pos_store, avgdl, universe_mode,
        numeric_dv=dsl_numeric_dv, keyword_dv=dsl_keyword_dv,
    )
    excl_bc = (
        spark.sparkContext.broadcast(
            np.unique(np.asarray(excluded, np.int64))
        )
        if excluded is not None and len(excluded)
        else None
    )
    rdf = _range_frame(spark, n_docs, n_splits)
    interval = float(interval_s)
    dv = dv_dir
    mdv = metric_dv_dir
    with_metric = mdv is not None

    def per_range(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        vals = None
        mvals = None
        matched_global = None
        for pdf in it:
            if len(pdf) == 0:
                continue
            if vals is None:
                vals = load_docvalues(dv)
                if with_metric:
                    mvals = load_docvalues(mdv)
                if filt_bc is not None and matched_global is None:
                    matched_global = _eval_filter(
                        filt_bc.value, n_docs, universe_mode
                    )
            out = []
            excl = excl_bc.value if excl_bc is not None else None
            for lo, hi in zip(pdf["lo"], pdf["hi"]):
                ids = _range_ids(int(lo), int(hi), matched_global, excl)
                if not len(ids):
                    continue
                v = np.where(
                    ids < len(vals),
                    vals[np.minimum(ids, len(vals) - 1)],
                    np.nan,
                )
                ok = ~np.isnan(v)
                if with_metric:
                    m = np.where(
                        ids < len(mvals),
                        mvals[np.minimum(ids, len(mvals) - 1)],
                        np.nan,
                    )
                    ok &= ~np.isnan(m)
                if not ok.any():
                    continue
                b_ = np.floor(v[ok] / interval).astype(np.int64)
                ub, inv = np.unique(b_, return_inverse=True)
                cnt = np.bincount(inv, minlength=len(ub))
                row = {
                    "bucket": ub,
                    "cnt": cnt.astype(np.int64),
                }
                if with_metric:
                    row["msum"] = np.bincount(
                        inv, weights=m[ok], minlength=len(ub)
                    )
                out.append(pd.DataFrame(row))
            if out:
                yield pd.concat(out, ignore_index=True)

    schema = "bucket long, cnt long" + (
        ", msum double" if with_metric else ""
    )
    partials = rdf.mapInPandas(per_range, schema=schema)
    aggs = [F.sum("cnt").cast("long").alias("doc_count")]
    if with_metric:
        aggs.append(F.sum("msum").alias("vs"))
    buckets = partials.groupBy("bucket").agg(*aggs)

    # min_doc_count: 0 zero-fill across the observed span — the spine
    # is generated from two bucket-domain scalars, never corpus-sized
    spine = buckets.agg(
        F.min("bucket").alias("b0"), F.max("bucket").alias("b1")
    ).select(F.explode(F.sequence("b0", "b1")).alias("bucket"))
    cols = [
        "bucket",
        F.round(F.col("bucket") * interval, 6).alias("bucket_start"),
        F.coalesce("doc_count", F.lit(0)).cast("long").alias("doc_count"),
    ]
    if with_metric:
        cols += [
            F.round(F.coalesce("vs", F.lit(0.0)), 6).alias("value_sum"),
            F.round(
                F.when(
                    F.coalesce("doc_count", F.lit(0)) > 0,
                    F.col("vs") / F.col("doc_count"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("value_avg"),
        ]
    return spine.join(buckets, "bucket", "left").select(*cols)


def terms_agg_replica(
    spark: SparkSession,
    kw_dir: str,
    n_docs: int,
    size: int = 10,
    dsl: Optional[str] = None,
    shard_paths: Optional[list] = None,
    avgdl: float = 1.0,
    cfg: Optional[EngineConfig] = None,
    pos_store: Optional[DataFrame] = None,
    excluded: Optional[np.ndarray] = None,
    metric_dv_dir: Optional[str] = None,
    n_splits: Optional[int] = None,
    universe_mode: str = "indexed",
    dsl_numeric_dv: Optional[dict] = None,
    dsl_keyword_dv: Optional[dict] = None,
) -> DataFrame:
    """ES ``terms`` aggregation over a KEYWORD doc-values field
    (Lucene SortedDocValues): top-``size`` buckets by doc_count
    (ties by term asc), exact — per-id-range tasks bincount the
    node-shared ORDINAL array (one int32 read per doc, no strings
    touched until the final tiny dictionary join), partials are
    (ordinal, count) rows bounded by the field's cardinality, one
    bucket reduce, then the sorted term dictionary maps ordinals back
    to terms.  This is why keyword fields aggregate fast in Lucene:
    the per-segment work is integer bincounts over ordinals, and the
    global merge is cardinality-sized.  Output also carries
    ``total_doc_count`` (docs with a value, post-filter/tombstone) so
    ES's ``sum_other_doc_count`` is derivable.  Missing values
    (ordinal -1) are skipped, ES missing-bucket semantics.
    ``metric_dv_dir``: optional numeric doc-values field nested under
    the buckets (ES terms + sum/avg sub-aggregation) — accumulated in
    the same weighted bincount, docs missing the metric skipped from
    the bucket entirely (consistent doc_count/value_avg base).  Same
    optional DSL filter / tombstone / universe contract as
    ``date_histogram_replica``."""
    if size <= 0:
        raise ValueError(f"size must be positive, got {size}")
    if n_docs <= 0:
        raise ValueError(f"n_docs must be positive, got {n_docs}")

    from nil_spark.operators.docvalues import load_keyword_docvalues

    filt_bc = _prepare_filter_bc(
        spark, dsl, shard_paths, cfg, pos_store, avgdl, universe_mode,
        numeric_dv=dsl_numeric_dv, keyword_dv=dsl_keyword_dv,
    )
    excl_bc = (
        spark.sparkContext.broadcast(
            np.unique(np.asarray(excluded, np.int64))
        )
        if excluded is not None and len(excluded)
        else None
    )
    rdf = _range_frame(spark, n_docs, n_splits)
    kd = kw_dir
    mdv = metric_dv_dir
    with_metric = mdv is not None

    def per_range(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ords = None
        mvals = None
        matched_global = None
        for pdf in it:
            if len(pdf) == 0:
                continue
            if ords is None:
                ords, _terms = load_keyword_docvalues(kd)
                if with_metric:
                    mvals = load_docvalues(mdv)
                if filt_bc is not None and matched_global is None:
                    matched_global = _eval_filter(
                        filt_bc.value, n_docs, universe_mode
                    )
            out = []
            excl = excl_bc.value if excl_bc is not None else None
            for lo, hi in zip(pdf["lo"], pdf["hi"]):
                ids = _range_ids(int(lo), int(hi), matched_global, excl)
                if not len(ids):
                    continue
                o = np.where(
                    ids < len(ords),
                    ords[np.minimum(ids, len(ords) - 1)],
                    -1,
                ).astype(np.int64)
                if with_metric:
                    m = np.where(
                        ids < len(mvals),
                        mvals[np.minimum(ids, len(mvals) - 1)],
                        np.nan,
                    )
                    keep = (o >= 0) & ~np.isnan(m)
                    o, m = o[keep], m[keep]
                else:
                    o = o[o >= 0]
                if not len(o):
                    continue
                cnt = np.bincount(o)
                nz = np.nonzero(cnt)[0]
                row = {"ord": nz, "cnt": cnt[nz].astype(np.int64)}
                if with_metric:
                    row["msum"] = np.bincount(o, weights=m)[nz]
                out.append(pd.DataFrame(row))
            if out:
                yield pd.concat(out, ignore_index=True)

    schema = "ord long, cnt long" + (", msum double" if with_metric else "")
    partials = rdf.mapInPandas(per_range, schema=schema)
    aggs = [F.sum("cnt").cast("long").alias("doc_count")]
    if with_metric:
        aggs.append(F.sum("msum").alias("vs"))
    buckets = partials.groupBy("ord").agg(*aggs)
    # the dictionary is vocabulary-sized by definition of keyword
    # doc-values — broadcast to the cardinality-sized bucket set
    _, terms = load_keyword_docvalues(kw_dir)
    tdf = spark.createDataFrame(
        list(enumerate(terms)), "ord long, term string"
    )
    w = Window.orderBy(F.col("doc_count").desc(), F.col("term"))
    total = buckets.agg(
        F.sum("doc_count").cast("long").alias("total_doc_count")
    )
    cols = ["rank", "term", "doc_count", "total_doc_count"]
    if with_metric:
        cols += [
            F.round("vs", 6).alias("value_sum"),
            F.round(F.col("vs") / F.col("doc_count"), 6).alias("value_avg"),
        ]
    return (
        buckets.join(F.broadcast(tdf), "ord")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= size)
        .crossJoin(F.broadcast(total))
        .select(*cols)
    )


def percentiles_replica(
    spark: SparkSession,
    dv_dir: str,
    n_docs: int,
    qs: list,
    compression: float = 200.0,
    dsl: Optional[str] = None,
    shard_paths: Optional[list] = None,
    avgdl: float = 1.0,
    cfg: Optional[EngineConfig] = None,
    pos_store: Optional[DataFrame] = None,
    excluded: Optional[np.ndarray] = None,
    n_splits: Optional[int] = None,
    universe_mode: str = "indexed",
    dsl_numeric_dv: Optional[dict] = None,
    dsl_keyword_dv: Optional[dict] = None,
) -> DataFrame:
    """ES ``percentiles`` aggregation over a numeric doc-values field,
    served by the engine's deterministic t-digest
    (operators/tdigest.py): per-id-range tasks sketch their slice of
    the node-shared doc-values array into ONE O(compression)-byte
    digest row, the driver merges the P digests associatively and
    answers every requested quantile — no sort, no row-proportional
    shuffle, rank error O(q(1-q)/compression).

    Same optional index-native DSL filter (incl. field predicates) and
    tombstone exclusion as the other engine aggregations.  Returns a
    tiny DataFrame ``(q double, value double, doc_count long)``.
    """
    from nil_spark.operators.tdigest import TDigest

    for q in qs:
        if not 0.0 <= float(q) <= 1.0:
            raise ValueError(f"percentile out of [0,1]: {q}")
    if n_docs <= 0:
        raise ValueError(f"n_docs must be positive, got {n_docs}")
    filt_bc = _prepare_filter_bc(
        spark, dsl, shard_paths, cfg, pos_store, avgdl, universe_mode,
        numeric_dv=dsl_numeric_dv, keyword_dv=dsl_keyword_dv,
    )
    excl_bc = (
        spark.sparkContext.broadcast(
            np.unique(np.asarray(excluded, np.int64))
        )
        if excluded is not None and len(excluded)
        else None
    )
    rdf = _range_frame(spark, n_docs, n_splits)
    dv = dv_dir
    comp = float(compression)

    def per_range(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        vals = None
        matched_global = None
        for pdf in it:
            if len(pdf) == 0:
                continue
            if vals is None:
                vals = load_docvalues(dv)
                if filt_bc is not None and matched_global is None:
                    matched_global = _eval_filter(
                        filt_bc.value, n_docs, universe_mode
                    )
            chunks = []
            excl = excl_bc.value if excl_bc is not None else None
            for lo, hi in zip(pdf["lo"], pdf["hi"]):
                ids = _range_ids(int(lo), int(hi), matched_global, excl)
                if not len(ids):
                    continue
                v = np.where(
                    ids < len(vals),
                    vals[np.minimum(ids, len(vals) - 1)],
                    np.nan,
                )
                chunks.append(v[~np.isnan(v)])
            if chunks:
                arr = np.concatenate(chunks)
                if len(arr):
                    d = TDigest.from_values(arr, comp)
                    yield pd.DataFrame({"digest": [d.to_bytes()]})

    rows = rdf.mapInPandas(per_range, schema="digest binary").collect()
    digests = [TDigest.from_bytes(bytes(r["digest"])) for r in rows]
    merged = (
        TDigest.merge_all(digests) if digests else TDigest.empty(comp)
    )
    n = int(merged.total)
    return spark.createDataFrame(
        [(float(q), float(merged.quantile(float(q))), n) for q in qs],
        "q double, value double, doc_count long",
    )
