"""WAND scale-curve bench: dense term-at-a-time vs Block-Max
WAND/MaxScore serving as the corpus (and therefore posting mass)
grows, same 200-query batch throughout.

The claim under test is the 100 TB story of `operators/wand.py`: the
dense replica path touches EVERY posting of every query term, so its
per-batch cost grows linearly with corpus size; the WAND/MaxScore path
walks only the essential (rare-term) lists and probes hot terms by
binary search, so its cost grows with the essential posting mass +
log-time probes — far sub-linear on a Zipfian vocabulary.  At 10^12
turns a hot term's posting list is ~10^9 entries; whichever curve is
flatter here is the one that survives there.

Writes bench_artifacts/wand.{md,json}; bench_scaling.py's BENCH.md
regeneration appends every bench_artifacts/*.md, so the artifact
survives regenerations.

Usage: python bench_wand.py   (env: NIL_WAND_SIZES="50000,200000,800000",
SPARK_GRAFT_CPUS, NIL_WAND_QUERIES)
"""

from __future__ import annotations

import glob
import json
import math
import os
import shutil
import tempfile
import time


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sizes = [
        int(s)
        for s in os.environ.get("NIL_WAND_SIZES", "50000,200000,800000").split(",")
    ]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_queries = int(os.environ.get("NIL_WAND_QUERIES", "200"))

    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from nil_spark.config import EngineConfig
    from nil_spark.functions.tokenize import terms_for_tokens, tokenize_series
    from nil_spark.operators.docids import assign_doc_ids
    from nil_spark.operators.segments import (
        DOCSTAT_SENTINEL,
        build_partial_segments,
        publish_replica,
        topk_replica_resident,
        _load_replica,
    )
    from nil_spark.operators.wand import _load_block_index, topk_replica_bmw, wand_query
    from nil_spark.session import get_spark
    from nil_spark.sources.transcripts import gen_queries, gen_transcripts

    spark = get_spark(
        app="nil_wand_bench", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    cfg = EngineConfig(gram_size=1, num_segments=cpus)
    replica_dir = tempfile.mkdtemp(prefix="nil_wand_replica_")
    os.environ["NIL_REPLICA_DIR"] = replica_dir

    rows = []
    for n_turns in sizes:
        pdf = gen_transcripts(n_turns, seed=42)
        docs = spark.createDataFrame(pdf).repartition(cpus)
        shard_dir = tempfile.mkdtemp(prefix="nil_wand_shards_")
        t0 = time.perf_counter()
        build_partial_segments(
            assign_doc_ids(docs, ["conv_id", "turn_idx"]), cfg
        ).write.mode("overwrite").parquet(shard_dir)
        raw = spark.read.parquet(shard_dir)
        st = (
            raw.filter(F.col("term") == DOCSTAT_SENTINEL)
            .agg(
                F.sum("n_postings").alias("n"),
                F.sum(F.element_at("bm_max", 1)).alias("s"),
            )
            .collect()[0]
        )
        n_docs, avgdl = int(st["n"]), float(st["s"]) / int(st["n"])
        termdict = (
            raw.filter(F.col("term") != DOCSTAT_SENTINEL)
            .groupBy("term")
            .agg(F.sum("n_postings").cast("long").alias("df"))
            .filter(F.col("df") <= int(cfg.df_stopword_cutoff * n_docs))
            .toPandas()
        )
        build_s = time.perf_counter() - t0
        paths = sorted(glob.glob(shard_dir + "/part-*.parquet"))
        publish_replica(paths, avgdl, cfg, spark=spark)

        qpdf = gen_queries(pdf, n_queries=n_queries, k=10, seed=43)
        n_warm = 2 * cpus
        # warm both paths over every query split (cold workers measured
        # as 2x noise otherwise, BENCH.md round 1)
        force(topk_replica_resident(spark, qpdf.iloc[:n_warm], paths, termdict, n_docs, avgdl, cfg))
        force(topk_replica_bmw(spark, qpdf.iloc[:n_warm], paths, termdict, n_docs, avgdl, cfg))

        dense = []
        wand = []
        for _ in range(2):
            t0 = time.perf_counter()
            force(topk_replica_resident(spark, qpdf, paths, termdict, n_docs, avgdl, cfg))
            dense.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            force(topk_replica_bmw(spark, qpdf, paths, termdict, n_docs, avgdl, cfg))
            wand.append(time.perf_counter() - t0)

        # kernel-level pruning stats (single-threaded, 30 queries)
        key = tuple(paths)
        view = _load_replica(key, avgdl, cfg.bm25_k1, cfg.bm25_b)
        bidx = _load_block_index(key, avgdl, cfg.bm25_k1, cfg.bm25_b, cfg.block_size)
        dfm = dict(zip(termdict["term"].astype(np.int64), termdict["df"].astype(np.int64)))
        tlists = []
        for ts in tokenize_series(qpdf["text"].iloc[:30], cfg):
            th = np.unique(terms_for_tokens(ts, cfg))
            tlists.append(
                [
                    (int(t), math.log(1.0 + (n_docs - dfm[int(t)] + 0.5) / (dfm[int(t)] + 0.5)))
                    for t in th
                    if int(t) in dfm
                ]
            )

        # single-threaded kernel timings on the SAME 30 queries — the
        # Spark batch numbers above sit on a ~1 s job-launch floor at
        # these corpus sizes, which hides the per-query cost curve the
        # 10^12-turn story actually rides on
        stats: dict = {}
        wk = []
        for _ in range(3):
            t0 = time.perf_counter()
            for tl in tlists:
                wand_query(view, bidx, tl, 10, stats)
            wk.append(time.perf_counter() - t0)
        wand_us = min(wk) / len(tlists) * 1e6

        scores = np.zeros(max(n_docs, view.max_doc + 1), dtype=np.float64)
        dk = []
        for _ in range(3):
            t0 = time.perf_counter()
            for tl in tlists:
                hits = [(view.get(t), idf) for t, idf in tl if t in view]
                if not hits:
                    continue
                for e, idf in hits:
                    scores[e[0]] += idf * e[1]
                docs_cat = (
                    np.concatenate([e[0] for e, _ in hits])
                    if len(hits) > 1
                    else hits[0][0][0]
                )
                sc_dup = scores[docs_cat]
                m = 10 * len(hits)
                if m < len(sc_dup):
                    v = -np.partition(-sc_dup, m - 1)[m - 1]
                    cd = docs_cat[sc_dup >= v - 1e-8]
                else:
                    cd = docs_cat
                cu = np.unique(cd)
                np.lexsort((cu, -np.round(scores[cu], 8)))
                scores[docs_cat] = 0.0
            dk.append(time.perf_counter() - t0)
        dense_us = min(dk) / len(tlists) * 1e6

        rows.append(
            {
                "turns": n_turns,
                "postings": int(len(view.docs)),
                "build_s": round(build_s, 3),
                "dense_s": round(min(dense), 3),
                "wand_s": round(min(wand), 3),
                "dense_kernel_us": round(dense_us, 1),
                "wand_kernel_us": round(wand_us, 1),
                "eval_rate": round(stats["evaluated"] / stats["candidates"], 4),
            }
        )
        print(json.dumps(rows[-1]))
        shutil.rmtree(shard_dir, ignore_errors=True)

    spark.stop()
    shutil.rmtree(replica_dir, ignore_errors=True)

    base = rows[0]
    lines = [
        "## WAND vs dense serving as posting mass grows",
        "",
        "Same 200-query batch (k=10), same node-shared mmap replica, only",
        "the corpus grows.  `dense` = `topk_replica_resident` (term-at-a-",
        "time, touches every posting of every query term); `wand` =",
        "`topk_replica_bmw` (Block-Max WAND/MaxScore: essential lists",
        "walked in slabs, hot terms probed by binary search).  `eval rate`",
        "= fraction of candidate postings the WAND kernel actually",
        "gathered (single-threaded sample, 30 queries).",
        "",
        "| turns | postings | dense batch | wand batch | dense kernel/q | wand kernel/q | dense kernel growth | wand kernel growth | wand eval rate |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        gx = r["turns"] / base["turns"]
        lines.append(
            f"| {r['turns']:,} | {r['postings']:,} | {r['dense_s']} s "
            f"| {r['wand_s']} s "
            f"| {r['dense_kernel_us'] / 1e3:.2f} ms "
            f"| {r['wand_kernel_us'] / 1e3:.2f} ms "
            f"| {round(r['dense_kernel_us'] / base['dense_kernel_us'], 2)}× over {gx:g}× data "
            f"| {round(r['wand_kernel_us'] / base['wand_kernel_us'], 2)}× over {gx:g}× data "
            f"| {r['eval_rate']:.1%} |"
        )
    lines += [
        "",
        "Batch columns sit on the ~1 s Spark job-launch floor at these",
        "corpus sizes — the kernel/query columns (single-threaded, no",
        "Spark) carry the curve.  The flatter curve is the one that",
        "survives 10^12 turns: dense",
        "cost tracks posting mass; the WAND path's growth is bounded by",
        "the essential (rare-term) mass plus log-time probes into the hot",
        "lists it never walks.  Rank identity of both paths is pinned by",
        "`tests/test_wand.py` (300-trial fuzz vs naive scoring + oracle",
        "rank identity) and the `bm25_wand_topk` driver gate row.",
        "Generated by `python bench_wand.py` — raw numbers in",
        "`bench_artifacts/wand.json`.",
        "",
    ]
    os.makedirs("bench_artifacts", exist_ok=True)
    with open("bench_artifacts/wand.json", "w") as f:
        json.dump(rows, f, indent=2)
    with open("bench_artifacts/wand.md", "w") as f:
        f.write("\n".join(lines))
    print("wrote bench_artifacts/wand.md")


if __name__ == "__main__":
    main()
