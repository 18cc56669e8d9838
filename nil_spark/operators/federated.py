"""Federated multi-index search (Lucene MultiReader / Elasticsearch
index alias): one query batch answered over N independently-built
indexes as if they were a single index.

Semantics are Elasticsearch ``dfs_query_then_fetch`` made exact:

 * **Merged global statistics.**  BM25 idf and length normalization use
   corpus scalars merged across members — ``N = Σ nᵢ``,
   ``avgdl = Σ nᵢ·avgdlᵢ / N``, ``df(term) = Σ dfᵢ(term)`` — injected
   into each member's unchanged top-k kernel.  A document's score
   depends only on the merged stats plus its own (tf, dl), so scoring
   each member separately with merged stats and merging afterwards is
   EXACT, not approximate (the per-shard-idf skew that plain
   ``query_then_fetch`` tolerates never appears).
 * **docBase offsets** (Lucene MultiReader): member i's doc ids are
   shifted by ``base_i = Σ_{j<i} n_j`` in listed order, so federated
   results over a corpus split in global doc order are BIT-IDENTICAL —
   ids, scores, ranks, tie-breaks — to the single whole-corpus index
   (pinned by tests/test_federated.py).
 * **Scatter/gather is top-k-safe**: each member retrieves the full k
   per query; the global top-k is a subset of the union of member
   top-ks, so the merge window loses nothing.

Scale shape (100 TB): this is how an index that outgrows one build is
actually operated — time-partitioned or tenant-partitioned member
indexes, each built and compacted independently, queried through one
alias.  The query-side cost is member-parallel (each member's kernel
run is the same job it would run alone); the merge touches only
queries × k × members rows.  Statistics merging is one union+groupBy
over term dictionaries (vocabulary-sized, not corpus-sized).

Reference analog: the reference builds ONE in-memory index per run
(NILMain.kt:43-47); partitioned corpora are out of its reach — this is
a genuinely new capability the Spark grafting adds.

Build-config caveat: members must share a config fingerprint (enforced
here, same rule as single-index serving).  For exact cross-member
ranking the members should be built with ``df_stopword_cutoff >= 1.0``:
build-time pruning uses each member's LOCAL df, so a term can be
pruned from one member's merged store while surviving another's —
sound per-member, but the federation would then under-count that
term's postings.  The fused build's ``partial_segments`` layout (the
replica topology's preferred shard set) retains all postings either
way.
"""

from __future__ import annotations

import glob
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nil_spark.config import EngineConfig
from nil_spark.operators.segments import (
    CheckpointedIndexBuilder,
    _cfg_fingerprint,
    topk_maxscore,
    topk_replica_resident,
)


class FederatedIndexError(ValueError):
    """Structured failure opening a member index (missing layout,
    config drift across members, incomplete build)."""


@dataclass
class _Member:
    path: str
    name: str
    n_docs: int
    avgdl: float
    doc_base: int = 0
    tombstones: object = None  # np.ndarray | None


@dataclass
class FederatedIndex:
    members: list[_Member]
    n_docs: int
    avgdl: float
    termdict: DataFrame  # (term, df) merged, stopword cutoff applied
    cfg: EngineConfig = field(repr=False, default=None)


def _open_member(spark: SparkSession, index_dir: str, cfg: EngineConfig) -> _Member:
    if not os.path.exists(os.path.join(index_dir, "manifest.json")):
        raise FederatedIndexError(
            f"{index_dir}: not a batch index (no manifest.json) — federated "
            f"search serves batch-built members; compact a streaming index "
            f"into a batch layout first"
        )
    builder = CheckpointedIndexBuilder(index_dir, cfg)
    built_fp = builder.manifest.get("config_fingerprint")
    if built_fp and built_fp != _cfg_fingerprint(cfg):
        raise FederatedIndexError(
            f"{index_dir}: config mismatch (index {built_fp}, "
            f"query {_cfg_fingerprint(cfg)}) — every member must be built "
            f"with the config the federation queries with"
        )
    if os.path.isdir(os.path.join(index_dir, "docstats")):
        from nil_spark.operators.index import corpus_stats

        n_docs, avgdl = corpus_stats(
            spark.read.parquet(os.path.join(index_dir, "docstats"))
        )
    else:
        c = builder.manifest.get("corpus")
        if not c:
            raise FederatedIndexError(
                f"{index_dir}: manifest missing corpus stats — the build "
                f"did not complete; rebuild this member"
            )
        n_docs, avgdl = int(c["n_docs"]), float(c["avgdl"])
    from nil_spark.operators.deletes import load_tombstones

    return _Member(
        path=index_dir,
        name=os.path.basename(os.path.normpath(index_dir)),
        n_docs=n_docs,
        avgdl=avgdl,
        tombstones=load_tombstones(spark, index_dir),
    )


def open_federated(
    spark: SparkSession, index_dirs: list[str], cfg: EngineConfig
) -> FederatedIndex:
    """Open member indexes, assign docBase offsets in LISTED order, and
    merge global statistics.  Raises FederatedIndexError on any member
    problem (all members are validated before any scoring runs)."""
    if len(index_dirs) < 2:
        raise FederatedIndexError(
            "federated search needs >= 2 member index dirs"
        )
    if len(set(index_dirs)) != len(index_dirs):
        raise FederatedIndexError("duplicate member index dirs")
    members = [_open_member(spark, d, cfg) for d in index_dirs]
    base = 0
    for m in members:
        m.doc_base = base
        base += m.n_docs
    n = sum(m.n_docs for m in members)
    avgdl = sum(m.n_docs * m.avgdl for m in members) / float(n)
    merged = None
    for m in members:
        td = spark.read.parquet(os.path.join(m.path, "termdict")).select(
            "term", "df"
        )
        merged = td if merged is None else merged.unionByName(td)
    termdict = merged.groupBy("term").agg(F.sum("df").alias("df"))
    # stopword cutoff on MERGED stats: the same decision the whole-corpus
    # index would make (merged df vs merged N), not per-member df
    if cfg.df_stopword_cutoff is not None and cfg.df_stopword_cutoff < 1.0:
        termdict = termdict.filter(
            F.col("df") <= int(cfg.df_stopword_cutoff * n)
        )
    return FederatedIndex(
        members=members, n_docs=n, avgdl=avgdl, termdict=termdict, cfg=cfg
    )


def _member_paths(index_dir: str) -> list[str]:
    return sorted(
        glob.glob(os.path.join(index_dir, "partial_segments", "part-*.parquet"))
    ) or sorted(glob.glob(os.path.join(index_dir, "segments", "part-*.parquet")))


def federated_topk(
    spark: SparkSession,
    queries: DataFrame,
    fed: FederatedIndex,
    cfg: EngineConfig,
    topology: str = "join",
) -> DataFrame:
    """(query_id, rank, doc_id, bm25, index) — global top-k over all
    members.  ``doc_id`` carries the docBase offset (globally unique);
    ``index`` is the member dir's basename (the ES ``_index`` field).

    ``queries`` needs (query_id, text, k).  ``topology``: "join" runs
    each member through :func:`topk_maxscore` (segments stay a
    DataFrame); "replica" runs each through the node-shared mmap
    replica kernel — member stores are keyed by shard-path set, so N
    members publish N stores and successive batches attach warm.

    Live-docs deletes stay member-local: member i over-retrieves
    ``k + |tombstones_i|``, its tombstoned rows are dropped after
    offsetting, and the global merge window trims back to k — exact,
    because a member contributes at most k live rows to the final list.
    """
    per_member: list[DataFrame] = []
    td_pdf = None
    for m in fed.members:
        q_m = queries
        t_i = 0 if m.tombstones is None else int(len(m.tombstones))
        if t_i:
            q_m = q_m.withColumn(
                "k", (F.col("k") + F.lit(t_i)).cast("int")
            )
        if topology == "replica":
            if td_pdf is None:
                from nil_spark.operators.segments import (
                    TermdictTooLargeError,
                    collect_termdict,
                )

                try:
                    td_pdf = collect_termdict(fed.termdict)
                except TermdictTooLargeError as e:
                    raise FederatedIndexError(
                        f"merged termdict over the driver-resident "
                        f"bound for topology='replica' — use "
                        f"topology='join' ({e})"
                    ) from e
            out = topk_replica_resident(
                spark,
                q_m.toPandas(),
                _member_paths(m.path),
                td_pdf,
                fed.n_docs,
                fed.avgdl,
                cfg,
                tokenize_on="worker",
            )
        else:
            segs = spark.read.parquet(os.path.join(m.path, "segments"))
            out = topk_maxscore(
                q_m, segs, fed.termdict, fed.n_docs, fed.avgdl, cfg
            )
        out = out.select(
            "query_id",
            (F.col("doc_id") + F.lit(int(m.doc_base))).alias("doc_id"),
            "bm25",
        )
        if t_i:
            import pandas as pd

            tomb_df = spark.createDataFrame(
                pd.DataFrame(
                    {"doc_id": [int(t) + int(m.doc_base) for t in m.tombstones]}
                )
            )
            out = out.join(F.broadcast(tomb_df), "doc_id", "left_anti")
        per_member.append(out.withColumn("index", F.lit(m.name)))
    union = per_member[0]
    for o in per_member[1:]:
        union = union.unionByName(o)
    # global merge: queries × k × members rows — tiny; ties by the
    # OFFSET doc id, which makes the order the single whole-index order
    w = Window.partitionBy("query_id").orderBy(
        F.col("bm25").desc(), F.col("doc_id")
    )
    ks = queries.select("query_id", F.col("k").alias("__k"))
    return (
        union.withColumn("rank", F.row_number().over(w))
        .join(F.broadcast(ks), "query_id")
        .filter(F.col("rank") <= F.col("__k"))
        .select("query_id", "rank", "doc_id", "bm25", "index")
    )
