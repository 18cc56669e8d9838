"""Round benchmark: headline gate queries at $SPARK_GRAFT_SF_DIR plus
the core engine (index-build turns/sec, BM25 query qps) on synthetic
transcripts.  Prints ONE JSON line.

Usage: python bench.py   (env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS,
NIL_BENCH_TURNS, NIL_BENCH_QUERIES)
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def force(df) -> int:
    """Materialize a DataFrame fully (noop sink — no driver collect)."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def _calib_build_file(path: str) -> int:
    """The REAL file-direct build kernel on one corpus file under plain
    multiprocessing — identical computation to a build task, no Spark.
    Module-level so mp.Pool can pickle it (bench_scaling._kernel_work
    with bench.py's config)."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from nil_spark.config import EngineConfig
    from nil_spark.operators.segments import _fused_partition_frame

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    cfg = EngineConfig(gram_size=1, num_segments=int(cpus))
    t = (
        pq.read_table(path, columns=["conv_id", "turn_idx", "text"])
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"], kind="mergesort")
    )
    part = pd.DataFrame(
        {"doc_id": np.arange(len(t), dtype=np.int64),
         "text": t["text"].to_numpy()}
    )
    out = _fused_partition_frame(part, cfg, 1 << 20)
    if out is None:
        return 0
    # identical work to an engine build task: the direct-write build
    # persists the shard parquet in the worker, so the calibration
    # ceiling must pay the same write (snappy, pinned schema)
    import pyarrow as pa

    from nil_spark.operators.segments import _segment_arrow_schema

    dest = f"{path}.calib.{os.getpid()}.parquet"
    pq.write_table(
        pa.Table.from_pandas(out, schema=_segment_arrow_schema(),
                             preserve_index=False),
        dest, compression="snappy",
    )
    os.remove(dest)
    g = out.groupby("term", sort=False)["n_postings"].sum()
    stats = pd.DataFrame(
        {"term": g.index.to_numpy(np.int64),
         "df": g.to_numpy(np.int64),
         "sdl": np.zeros(len(g), dtype=np.float64)}
    )
    pq.write_table(
        pa.Table.from_pandas(stats, preserve_index=False),
        dest, compression="snappy",
    )
    os.remove(dest)
    return len(out)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_turns = int(os.environ.get("NIL_BENCH_TURNS", "50000"))
    n_queries = int(os.environ.get("NIL_BENCH_QUERIES", "200"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from nil_spark.session import get_spark

    spark = get_spark(app="nil_spark_bench", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))

    import __spark_entry__ as entry_mod

    # Warm-up: FS cache + JVM JIT/codegen + Python workers.  The first
    # execution of each join/window/UDF shape pays 5-15 s of one-time
    # JIT at this tiny scale, which would swamp the signal the bench is
    # after (plan quality, shuffle counts).  One untimed pass of the
    # most complex shapes amortizes it, exactly as a long-running
    # cluster would.
    # (generic FS-cache warm only — per-query JIT is handled by the
    # cold+best-of-2-warm protocol below, so no query-specific pre-warm
    # that would mislabel those queries' cold numbers)
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()

    # Protocol: each gate query runs twice — the first execution is
    # recorded as its COLD time (includes one-time JIT/codegen for that
    # query's unique join/window/UDF shapes), the second as the headline
    # steady-state time.  A long-running cluster pays the JIT once per
    # shape and then serves thousands of queries at the warm number, so
    # the warm time is what reflects plan quality; the cold table is
    # reported alongside so the one-time cost stays visible.
    # This sandbox host has external tenants whose load swings timings
    # 3x minute-to-minute (measured in BENCH.md); best-of-2 on the warm
    # runs is the same defense bench_scaling.py uses (best interleaved
    # sample per level).
    queries: dict[str, float] = {}
    queries_cold: dict[str, float] = {}
    only = {
        s for s in os.environ.get("NIL_BENCH_ONLY", "").split(",") if s
    }
    for name, fn in sorted(entry_mod.queries().items()):
        if only and name not in only:
            continue
        # round-4 lesson: with 100+ queries in one session, cached
        # relations + JVM pressure from earlier queries made four cold
        # numbers blow up 5x with unchanged code — clear the cache so
        # each query's cold run starts from the same session state and
        # cold numbers stay comparable round-over-round
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        force(fn(spark, sf_dir))
        queries_cold[name] = round(time.perf_counter() - t0, 3)
        warm = []
        for _ in range(2):
            t0 = time.perf_counter()
            force(fn(spark, sf_dir))
            warm.append(time.perf_counter() - t0)
        queries[name] = round(min(warm), 3)

    if only:
        # restricted reproduction run (NIL_BENCH_ONLY=a,b,...): gate
        # queries only, no engine cases — for chasing per-query
        # regressions without a 3-minute full pass
        print(json.dumps({
            "metric": "total_bench_seconds",
            "value": round(sum(queries.values()), 3),
            "unit": "sec",
            "queries": queries,
            "queries_cold": queries_cold,
            "sf": sf,
            "cpus": int(cpus),
            "only": sorted(only),
        }))
        spark.stop()
        return

    # ---- core engine: synthetic transcript corpus; the scale paths
    # (fused shard build + replica-resident serving) ----
    import glob
    import shutil
    import tempfile

    import pandas as pd

    from pyspark.sql import functions as SF

    from nil_spark.config import EngineConfig
    from nil_spark.operators.docids import assign_doc_ids
    from nil_spark.operators.segments import (
        DOCSTAT_SENTINEL,
        build_partial_segments,
        topk_replica_resident,
    )
    from nil_spark.sources.transcripts import gen_queries, gen_transcripts

    cfg = EngineConfig(gram_size=1, num_segments=int(cpus))
    pdf = gen_transcripts(n_turns, seed=42)
    docs = spark.createDataFrame(pdf).repartition(int(cpus))
    shard_dir = tempfile.mkdtemp(prefix="nil_bench_shards_")

    # timed region matches rounds 1-2: doc-id assignment through the
    # shard write, corpus-stat aggregate, and termdict collect (the
    # full build, not just the shard write) so BENCH_rN comparisons
    # stay apples-to-apples; best-of-2 is the only protocol change
    build_times = []
    for _ in range(2):
        t0 = time.perf_counter()
        docs_b = assign_doc_ids(docs, ["conv_id", "turn_idx"])
        build_partial_segments(docs_b, cfg).write.mode("overwrite").parquet(shard_dir)
        raw = spark.read.parquet(shard_dir)
        st = (
            raw.filter(SF.col("term") == DOCSTAT_SENTINEL)
            .agg(SF.sum("n_postings").alias("n"), SF.sum(SF.element_at("bm_max", 1)).alias("s"))
            .collect()[0]
        )
        n_docs, avgdl = int(st["n"]), float(st["s"]) / int(st["n"])
        termdict = (
            raw.filter(SF.col("term") != DOCSTAT_SENTINEL)
            .groupBy("term").agg(SF.sum("n_postings").cast("long").alias("df"))
            .filter(SF.col("df") <= int(cfg.df_stopword_cutoff * n_docs))
        ).toPandas()
        build_times.append(time.perf_counter() - t0)
    build_s = min(build_times)
    queries["engine_index_build"] = round(build_s, 3)

    # file-direct build variant: corpus written (untimed) as range-sorted
    # parquet slices, then built with workers reading the files directly
    # AND writing their own shard parquet (direct-write: only a one-row
    # manifest per file crosses the JVM<->Python channel)
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nil_spark.operators.segments import build_segment_store_files_direct

    corpus_dir = tempfile.mkdtemp(prefix="nil_bench_corpus_")
    step = (len(pdf) + int(cpus) - 1) // int(cpus)
    fd_files = []
    for i in range(int(cpus)):
        chunk = pdf.iloc[i * step : (i + 1) * step]
        if not len(chunk):
            continue
        fp = f"{corpus_dir}/part-{i:05d}.parquet"
        pq.write_table(pa.Table.from_pandas(chunk, preserve_index=False), fp)
        fd_files.append(fp)
    fd_dir = tempfile.mkdtemp(prefix="nil_bench_fd_")
    fd_times = []
    for _ in range(2):
        shutil.rmtree(fd_dir, ignore_errors=True)
        t_fd = time.perf_counter()
        build_segment_store_files_direct(spark, fd_files, cfg, fd_dir)
        fd_times.append(time.perf_counter() - t_fd)
    fd_s = min(fd_times)
    queries["engine_index_build_filedirect"] = round(fd_s, 3)
    shutil.rmtree(fd_dir, ignore_errors=True)

    # ---- in-run host calibration #1 (round-4 verdict): the SAME
    # build kernel under plain multiprocessing on the SAME corpus
    # files, measured in the SAME session window — distinguishes "the
    # shared host was slow during this run" from a real engine
    # regression.  Engine-relative ratios are emitted alongside the
    # raw numbers.
    import multiprocessing as mp

    with mp.Pool(int(cpus)) as pool:  # warm fork/import/page-cache
        pool.map(_calib_build_file, fd_files[:2])
    t0 = time.perf_counter()
    with mp.Pool(int(cpus)) as pool:
        pool.map(_calib_build_file, fd_files)
    calib_build_tps = n_turns / (time.perf_counter() - t0)
    shutil.rmtree(corpus_dir, ignore_errors=True)

    qpdf = gen_queries(pdf, n_queries=n_queries, k=10, seed=43)
    paths = sorted(glob.glob(shard_dir + "/part-*.parquet"))

    # long-query MaxScore case: 20 queries x ~50-60 terms each, via the
    # join-based segment traversal (exercises the per-term chunk-group
    # path that was O(T^2) in query terms in round 1).  Runs BEFORE the
    # replica phase so its timing is not taken against Python workers
    # already holding multi-hundred-MB resident replicas.
    from nil_spark.operators.segments import topk_maxscore

    lq = [
        (
            100000 + i,
            " ".join(qpdf["text"].iloc[(i * 7 + j) % len(qpdf)] for j in range(7)),
            10,
        )
        for i in range(20)
    ]
    lqdf = spark.createDataFrame(lq, "query_id long, text string, k int")
    segs = raw.filter(SF.col("term") != DOCSTAT_SENTINEL)
    td_df = spark.createDataFrame(termdict)
    # untimed: first-use applyInPandas/codegen for the maxscore shape
    force(topk_maxscore(lqdf.limit(3), segs, td_df, n_docs, avgdl, cfg))
    lq_times = []
    for _ in range(2):
        t0 = time.perf_counter()
        force(topk_maxscore(lqdf, segs, td_df, n_docs, avgdl, cfg))
        lq_times.append(time.perf_counter() - t0)
    queries["engine_maxscore_longq"] = round(min(lq_times), 3)

    # LCS verify throughput: the only Python-compute-heavy stage gets a
    # dedicated case.  verify_cap pins the residue entering the Arrow
    # LCS cogroup (knob: NIL_BENCH_LCS_CAP) so the verify cost curve is
    # explicit and comparable round-over-round; filtration 5 /
    # verification 0 routes EVERY candidate through LCS (single-tier,
    # worst case for Python compute).
    from nil_spark.operators.clone import candidate_pairs, clone_detect

    lcs_cap = int(os.environ.get("NIL_BENCH_LCS_CAP", "2000"))
    lcs_cfg = EngineConfig(
        gram_size=3, filtration_threshold=5, verification_threshold=0
    )
    docs_tbl = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_cand = candidate_pairs(docs_tbl, lcs_cfg).count()
    n_verify = min(lcs_cap, n_cand)
    # untimed: first-use JIT for the capped-clone plan shape
    force(clone_detect(docs_tbl, lcs_cfg, mode="always_lcs", verify_cap=64))
    lcs_times = []
    for _ in range(2):
        t0 = time.perf_counter()
        force(clone_detect(docs_tbl, lcs_cfg, mode="always_lcs", verify_cap=lcs_cap))
        lcs_times.append(time.perf_counter() - t0)
    lcs_s = min(lcs_times)
    queries["engine_lcs_verify"] = round(lcs_s, 3)

    # publish-at-build: the node-shared mmap replica store is
    # materialized as part of the build (per-shard decode as a parallel
    # Spark stage + one vectorized merge), so serving NEVER pays the
    # index decode — engine_bm25_cold_load below measures what a cold
    # worker cohort actually pays now: mmap attach + first-batch JIT.
    from nil_spark.operators.segments import publish_replica

    t0 = time.perf_counter()
    replica_store = publish_replica(paths, avgdl, cfg, spark=spark)
    queries["engine_replica_publish"] = round(time.perf_counter() - t0, 3)

    # first-batch (cold) pass: per-worker mmap attach + codegen.
    # Reported separately so round-over-round comparisons see both the
    # one-time cost and the steady-state qps (a long-lived serving job
    # pays it once; engine_bm25_batch is the warm measurement).  The
    # warm-up batch must cover EVERY query split (2 queries per core) —
    # a partial warm-up leaves some timed-run tasks on cold workers,
    # which round 1 measured as 2x run-to-run noise on the warm number.
    n_warm = 2 * int(cpus)
    t0 = time.perf_counter()
    force(topk_replica_resident(spark, qpdf.iloc[:n_warm], paths, termdict, n_docs, avgdl, cfg))
    cold_s = time.perf_counter() - t0
    queries["engine_bm25_cold_load"] = round(cold_s, 3)
    q_times = []
    for _ in range(2):
        t0 = time.perf_counter()
        force(topk_replica_resident(spark, qpdf, paths, termdict, n_docs, avgdl, cfg))
        q_times.append(time.perf_counter() - t0)
    query_s = min(q_times)
    queries["engine_bm25_batch"] = round(query_s, 3)

    # ---- in-run host calibration #2: the SAME warm-query kernel
    # under plain multiprocessing over the SAME shard store + query
    # batch (bench_scaling's kernel, per-process replica loaded in the
    # pool initializer, untimed — mirroring the engine's warm path)
    import math

    import numpy as np

    from bench_scaling import _query_kernel_chunk, _query_kernel_init
    from nil_spark.functions.tokenize import terms_for_tokens, tokenize_series

    df_map = dict(zip(termdict["term"].astype(np.int64),
                      termdict["df"].astype(np.int64)))
    qtoks = tokenize_series(qpdf["text"], cfg)
    calibq = []
    for (qid, kk), ts_ in zip(zip(qpdf["query_id"], qpdf["k"]), qtoks):
        th = np.unique(terms_for_tokens(ts_, cfg))
        tl = [
            (int(t), math.log(1.0 + (n_docs - df_map[int(t)] + 0.5)
                              / (df_map[int(t)] + 0.5)))
            for t in th if int(t) in df_map
        ]
        if tl:
            calibq.append((int(qid), int(kk), tl))
    cpaths = tuple(paths)
    k1_, b_ = cfg.bm25_k1, cfg.bm25_b
    procs = int(cpus)
    n_chunks = procs * 4
    step_q = (len(calibq) + n_chunks - 1) // n_chunks
    chunks = [
        (cpaths, avgdl, k1_, b_, n_docs,
         calibq[i * step_q:(i + 1) * step_q])
        for i in range(n_chunks)
    ]
    with mp.Pool(procs, initializer=_query_kernel_init,
                 initargs=(cpaths, avgdl, k1_, b_)) as pool:
        pool.map(_query_kernel_chunk, chunks[:procs], chunksize=1)  # warm
        t0 = time.perf_counter()
        pool.map(_query_kernel_chunk, chunks, chunksize=1)
        calib_q_dt = time.perf_counter() - t0
    calib_query_qps = len(calibq) / calib_q_dt

    # the Spark per-job scheduling floor, measured on a near-empty job:
    # at a 200-query batch the engine pays this floor per job while the
    # mp calibration pays none, so engine_relative_query is
    # floor-bound by construction — report the floor so the ratio can
    # be read correctly (the ratio's value is round-over-round host
    # tracking, not an absolute efficiency target; the build ratio IS
    # apples-to-apples)
    floor_times = []
    for _ in range(3):
        t0 = time.perf_counter()
        force(spark.range(int(cpus)).repartition(int(cpus)))
        floor_times.append(time.perf_counter() - t0)
    spark_job_floor_s = min(floor_times)

    # Block-Max WAND serving over the same replica + query batch: the
    # document-at-a-time path whose cost is O(evaluated docs), not
    # O(posting mass) — apples-to-apples with engine_bm25_batch (same
    # 200 queries, k=10, same node-shared store; block index published
    # once on first use, untimed warm-up covers it)
    from nil_spark.operators.wand import topk_replica_bmw

    force(topk_replica_bmw(spark, qpdf.iloc[:n_warm], paths, termdict, n_docs, avgdl, cfg))
    w_times = []
    for _ in range(2):
        t0 = time.perf_counter()
        force(topk_replica_bmw(spark, qpdf, paths, termdict, n_docs, avgdl, cfg))
        w_times.append(time.perf_counter() - t0)
    queries["engine_bm25_wand"] = round(min(w_times), 3)

    # the same 20 long queries engine_maxscore_longq runs through the
    # join-based segment path — on the BMW kernel the MaxScore term
    # split keeps the walked set tiny even at ~60 terms/query
    lqpdf = pd.DataFrame(lq, columns=["query_id", "text", "k"])
    wl_times = []
    for _ in range(2):
        t0 = time.perf_counter()
        force(topk_replica_bmw(spark, lqpdf, paths, termdict, n_docs, avgdl, cfg))
        wl_times.append(time.perf_counter() - t0)
    queries["engine_wand_longq"] = round(min(wl_times), 3)

    # Boolean query-DSL serving over the same replica: the 200-query
    # batch rewritten as AND/OR/NOT expressions (three fixed shapes,
    # cycling) — measures the boolean-algebra kernel + positive-term
    # scoring.  Needs an unpruned dictionary (NOT soundness), so the
    # idf map is the unfiltered df aggregate; postings come from the
    # same partial shards, which keep hot terms.
    from nil_spark.operators.dsl_exec import dsl_search_replica

    td_full = (
        raw.filter(SF.col("term") != DOCSTAT_SENTINEL)
        .groupBy("term").agg(SF.sum("n_postings").cast("long").alias("df"))
    ).toPandas()
    cfg_dsl = cfg.with_(df_stopword_cutoff=2.0)
    dsl_rows = []
    for i, text in enumerate(qpdf["text"]):
        ws = [w for w in str(text).split() if w][:3]
        while len(ws) < 3:
            ws.append(ws[-1] if ws else "a")
        a, b, c = ws
        if i % 3 == 0:
            dsl_rows.append((i, f"{a} AND {b}"))
        elif i % 3 == 1:
            dsl_rows.append((i, f"{a} OR {b} NOT {c}"))
        else:
            dsl_rows.append((i, f"({a} OR {b}) AND NOT {c}"))
    dsl_pdf = pd.DataFrame(dsl_rows, columns=["query_id", "dsl"])
    force(dsl_search_replica(
        spark, dsl_pdf.iloc[:n_warm], paths, td_full, n_docs, avgdl,
        cfg_dsl, k=10, universe_mode="indexed",
    ))
    d_times = []
    for _ in range(2):
        t0 = time.perf_counter()
        force(dsl_search_replica(
            spark, dsl_pdf, paths, td_full, n_docs, avgdl, cfg_dsl,
            k=10, universe_mode="indexed",
        ))
        d_times.append(time.perf_counter() - t0)
    queries["engine_dsl_batch"] = round(min(d_times), 3)

    # engine-native doc-values aggregations (operators/aggs_engine.py).
    # engine_agg_histogram: unfiltered daily date_histogram from the
    # node-shared mmap doc-values array — NOTE its absolute number is
    # Spark-job-floor bound at bench scale (4 chained tiny stages),
    # not data bound; it exists for round-over-round tracking.  The
    # meaningful pair is the FILTERED aggregation ("bucket the matches
    # of a query"): the kernel resolves the boolean filter from the
    # replica postings and buckets ordinals/values in one pass, while
    # the DataFrame equivalent must re-tokenize the corpus — the
    # measured gap is 5-8x at 0.4-1.5M docs and grows with corpus size
    # (kernel cost is posting-mass bounded, see BENCH.md).
    from nil_spark.operators.aggs_engine import date_histogram_replica
    from nil_spark.operators.docvalues import write_docvalues
    from nil_spark.functions.querylang import compile_spark, parse_query

    dv_root = tempfile.mkdtemp(prefix="nil_bench_dv_")
    write_docvalues(docs_b, dv_root, ["ts"])  # untimed: build-time cost
    dv_dir = f"{dv_root}/docvalues/ts"
    force(date_histogram_replica(spark, dv_dir, n_docs, 86400.0))  # JIT
    ag_times = []
    for _ in range(2):
        t0 = time.perf_counter()
        force(date_histogram_replica(spark, dv_dir, n_docs, 86400.0))
        ag_times.append(time.perf_counter() - t0)
    queries["engine_agg_histogram"] = round(min(ag_times), 3)

    agg_dsl = "w00013 AND w00042"
    agg_ast = parse_query(agg_dsl)
    cfg_agg = cfg.with_(df_stopword_cutoff=2.0, min_chars=0, min_tokens=0)

    def _agg_filtered_kernel():
        return date_histogram_replica(
            spark, dv_dir, n_docs, 86400.0, dsl=agg_dsl,
            shard_paths=paths, cfg=cfg_agg, universe_mode="dense",
        )

    def _agg_filtered_df():
        base = docs_b.select(
            "ts",
            SF.filter(
                SF.split(SF.lower("text"), "[^a-z0-9]+"), lambda x: x != ""
            ).alias("toks"),
        ).withColumn(
            "padded",
            SF.concat(SF.lit(" "), SF.array_join("toks", " "), SF.lit(" ")),
        )
        m = base.filter(
            compile_spark(agg_ast, SF.col("toks"), SF.col("padded"))
        )
        return m.groupBy(
            SF.floor(
                SF.unix_micros(SF.col("ts").cast("timestamp"))
                / SF.lit(86400.0 * 1e6)
            ).alias("bucket")
        ).count()

    force(_agg_filtered_kernel())  # untimed JIT
    force(_agg_filtered_df())
    agk_times, agd_times = [], []
    for _ in range(2):
        t0 = time.perf_counter()
        force(_agg_filtered_kernel())
        agk_times.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        force(_agg_filtered_df())
        agd_times.append(time.perf_counter() - t0)
    queries["engine_agg_filtered"] = round(min(agk_times), 3)
    queries["engine_agg_filtered_df"] = round(min(agd_times), 3)

    # field-predicate DSL serving: the same 200-query boolean batch
    # with a numeric doc-values range filter appended (ts in the upper
    # half of the corpus span) — measures the in-kernel doc-values
    # range mask + universe intersection on top of engine_dsl_batch.
    ts_mid = docs_b.agg(
        (
            (
                SF.unix_micros(SF.min(SF.col("ts").cast("timestamp")))
                + SF.unix_micros(SF.max(SF.col("ts").cast("timestamp")))
            )
            / SF.lit(2e6)
        ).alias("m")
    ).collect()[0]["m"]
    dslf_pdf = dsl_pdf.copy()
    dslf_pdf["dsl"] = [
        f"({d}) AND ts:[{ts_mid:.3f} TO *]" for d in dslf_pdf["dsl"]
    ]
    ndv = {"ts": dv_dir}
    force(dsl_search_replica(
        spark, dslf_pdf.iloc[:n_warm], paths, td_full, n_docs, avgdl,
        cfg_dsl, k=10, universe_mode="indexed", numeric_dv=ndv,
    ))
    df_times = []
    for _ in range(2):
        t0 = time.perf_counter()
        force(dsl_search_replica(
            spark, dslf_pdf, paths, td_full, n_docs, avgdl, cfg_dsl,
            k=10, universe_mode="indexed", numeric_dv=ndv,
        ))
        df_times.append(time.perf_counter() - t0)
    queries["engine_dsl_fields"] = round(min(df_times), 3)

    # t-digest percentiles over the doc-values array: per-range
    # digests + driver merge (operators/tdigest.py) — the quantile
    # scale path, cost O(n_docs/cores) per run
    from nil_spark.operators.aggs_engine import percentiles_replica

    force(percentiles_replica(spark, dv_dir, n_docs, [0.5]))  # JIT
    pc_times = []
    for _ in range(2):
        t0 = time.perf_counter()
        force(percentiles_replica(
            spark, dv_dir, n_docs, [0.5, 0.95, 0.99]
        ))
        pc_times.append(time.perf_counter() - t0)
    queries["engine_percentiles"] = round(min(pc_times), 3)
    shutil.rmtree(dv_root, ignore_errors=True)

    # end-to-end verified serving: BMW retrieval at k+margin, tier-1
    # overlap fast-accept, LCS on the residue, BM25 re-rank — the full
    # filter-then-verify query pipeline (operators/search_verify.py)
    # over the same corpus + 200-query batch
    from nil_spark.operators.search_verify import verify_topk

    qv = qpdf.copy()
    qv["k"] = qv["k"] + 20
    queries_df = spark.createDataFrame(qpdf)
    docs_txt = docs_b.select("doc_id", "text")

    def _verified():
        cand = topk_replica_bmw(
            spark, qv, paths, termdict, n_docs, avgdl, cfg
        ).select("query_id", "doc_id", "bm25")
        return verify_topk(cand, queries_df, docs_txt, cfg, mode="two_tier")

    force(_verified())  # untimed: first-use JIT for the verify shape
    v_times = []
    for _ in range(2):
        t0 = time.perf_counter()
        force(_verified())
        v_times.append(time.perf_counter() - t0)
    queries["engine_bm25_verified"] = round(min(v_times), 3)
    shutil.rmtree(shard_dir, ignore_errors=True)
    shutil.rmtree(replica_store, ignore_errors=True)

    total = round(sum(queries.values()), 3)
    payload = {
        "metric": "total_bench_seconds",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "queries_cold": queries_cold,
        "cold_total": round(sum(queries_cold.values()), 3),
        "protocol": (
            "gate queries: clearCache + 1 cold run (reported in "
            "queries_cold, incl. one-time JIT) + best-of-2 warm runs "
            "(headline); engine cases best-of-2 after declared warm-up "
            "— the noisy-shared-host defense bench_scaling.py uses; "
            "calibration_* = same kernels under plain multiprocessing "
            "in the SAME run (host ceiling), engine_relative_* = "
            "engine raw / calibration"
        ),
        "sf": sf,
        "index_build_turns_per_sec": round(n_turns / build_s, 1),
        "index_build_fd_turns_per_sec": round(n_turns / fd_s, 1),
        "query_qps": round(n_queries / query_s, 1),
        "query_qps_cold": round(n_warm / cold_s, 1),
        # in-run host calibration (round-4 verdict #1): same-kernel
        # plain-multiprocessing throughput measured in this run —
        # compare rounds on engine_relative_*, not raw, when the
        # shared host drifts
        "calibration_build_turns_per_sec": round(calib_build_tps, 1),
        "calibration_query_qps": round(calib_query_qps, 1),
        "engine_relative_build_fd": round(
            (n_turns / fd_s) / calib_build_tps, 3
        ),
        # floor-bound by construction at a 200-query batch (see
        # protocol) — track it round-over-round, don't read it as
        # absolute efficiency; floor-corrected ratio alongside
        "engine_relative_query": round(
            (n_queries / query_s) / calib_query_qps, 3
        ),
        "engine_relative_query_floor_corrected": round(
            (n_queries / max(query_s - spark_job_floor_s, 1e-9))
            / calib_query_qps, 3
        ),
        "spark_job_floor_sec": round(spark_job_floor_s, 3),
        "lcs_verify_pairs": n_verify,
        "lcs_verify_candidates": n_cand,
        "lcs_verify_pairs_per_sec": round(n_verify / lcs_s, 1),
        "bench_turns": n_turns,
        "bench_queries": n_queries,
        "cpus": int(cpus),
    }
    # full artifact on disk (round-4 verdict #7: the driver keeps only
    # a 2000-char tail of stdout, which truncated the warm per-query
    # dict — persist the whole payload so every round's numbers stay
    # diffable)
    os.makedirs("bench_artifacts", exist_ok=True)
    with open("bench_artifacts/gate_r05.json", "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
