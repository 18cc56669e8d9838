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
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    force(entry_mod.queries()["bm25_topk"](spark, sf_dir))
    force(entry_mod.queries()["ann_lsh_topk"](spark, sf_dir))

    queries: dict[str, float] = {}
    for name, fn in sorted(entry_mod.queries().items()):
        t0 = time.perf_counter()
        force(fn(spark, sf_dir))
        queries[name] = round(time.perf_counter() - t0, 3)

    # ---- core engine: synthetic transcript corpus ----
    from nil_spark.config import EngineConfig
    from nil_spark.operators.docids import assign_doc_ids
    from nil_spark.operators.index import build_index
    from nil_spark.operators.query import bm25_topk
    from nil_spark.sources.transcripts import gen_queries, gen_transcripts

    cfg = EngineConfig(gram_size=1)
    pdf = gen_transcripts(n_turns, seed=42)
    docs = spark.createDataFrame(pdf).repartition(int(cpus))

    t0 = time.perf_counter()
    docs = assign_doc_ids(docs, ["conv_id", "turn_idx"])
    idx = build_index(docs, cfg)
    idx["postings"] = idx["postings"].persist()
    force(idx["postings"])
    build_s = time.perf_counter() - t0
    queries["engine_index_build"] = round(build_s, 3)

    qpdf = gen_queries(pdf, n_queries=n_queries, k=10, seed=43)
    qdf = spark.createDataFrame(qpdf, schema="query_id long, text string, k int")
    t0 = time.perf_counter()
    force(bm25_topk(qdf, idx, cfg))
    query_s = time.perf_counter() - t0
    queries["engine_bm25_batch"] = round(query_s, 3)

    total = round(sum(queries.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_bench_seconds",
                "value": total,
                "unit": "sec",
                "queries": queries,
                "sf": sf,
                "index_build_turns_per_sec": round(n_turns / build_s, 1),
                "query_qps": round(n_queries / query_s, 1),
                "bench_turns": n_turns,
                "bench_queries": n_queries,
                "cpus": int(cpus),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
