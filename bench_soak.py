"""Streaming soak: many micro-batches through the full streaming
surface — stateful exact dedup (TTL eviction) + incremental index
build (build-stream) + periodic generational compaction + query
serving — asserting the two properties a long-running streaming job
lives or dies by:

 * the dedup STATE STORE plateaus (TTL eviction balances new-hash
   arrivals) instead of growing with stream length;
 * query latency against the incremental index stays FLAT because
   compaction keeps the per-term chunk-group count bounded (without it
   every term decodes B chunk groups after B batches).

State size is measured as the newest per-partition state file the
HDFS-backed store wrote (every group's blob is rewritten each batch,
so the newest delta/snapshot carries the full live state).

`run_soak` is reused by tests/test_streaming_soak.py (smaller, with
assertions); this script runs the full-size soak and writes
bench_artifacts/soak.{json,md} for BENCH.md.

Usage: python bench_soak.py   (env: NIL_SOAK_BATCHES, default 24)
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))


def _state_bytes(ckpt: str) -> int:
    """Live dedup state size: newest state file per store partition."""
    total = 0
    for part in glob.glob(os.path.join(ckpt, "state", "0", "*")):
        if not os.path.isdir(part):
            continue
        versions = []
        for f in os.listdir(part):
            stem, _, ext = f.partition(".")
            if ext in ("delta", "snapshot") and stem.isdigit():
                versions.append((int(stem), os.path.join(part, f)))
        if versions:
            total += os.path.getsize(max(versions)[1])
    return total


def run_soak(
    spark,
    root: str,
    n_batches: int = 24,
    rows_per_batch: int = 400,
    ttl_batches: int = 5,
    compact_every: int = 6,
    latency_every: int = 4,
) -> dict:
    """Drive the soak; returns per-batch metric series."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nil_spark.config import EngineConfig
    from nil_spark.operators.segments import topk_maxscore
    from nil_spark.sources.transcripts import gen_transcripts
    from nil_spark.streaming.incremental import IncrementalIndexer
    from nil_spark.streaming.stateful_dedup import streaming_exact_dedup

    cfg = EngineConfig(gram_size=1, num_segments=4, block_size=32)
    dirs = {k: os.path.join(root, k) for k in
            ("arrivals", "dedup_in", "dedup_ckpt", "dedup_out", "idx")}
    for d in dirs.values():
        os.makedirs(d, exist_ok=True)

    ix = IncrementalIndexer(dirs["idx"], cfg)
    # fixed query batch: built once from the first arrival's vocabulary
    qdf = None
    prev_texts: list[str] = []
    doc_counter = 0
    metrics: dict[str, list] = {
        "state_bytes": [], "uncompacted_deltas": [],
        "latency_batches": [], "latency_s": [], "compactions": [],
        "dedup_dup_rows": [],
    }
    rng = np.random.default_rng(4242)

    for i in range(n_batches):
        # ---- arrival: mostly-fresh turns + ~30% texts recurring from
        # the previous 2 batches (state hits inside the TTL horizon;
        # older hashes age out) ----
        pdf = gen_transcripts(rows_per_batch, seed=1000 + i)
        pdf["conv_id"] = pdf["conv_id"] + f"_b{i:03d}"
        texts = pdf["text"].tolist()
        if prev_texts:
            n_rec = int(0.3 * rows_per_batch)
            idxs = rng.integers(0, len(texts), n_rec)
            for j in idxs:
                texts[int(j)] = prev_texts[int(rng.integers(0, len(prev_texts)))]
            pdf["text"] = texts
        prev_texts = texts[-rows_per_batch:]

        arr = os.path.join(dirs["arrivals"], f"arrival{i:03d}")
        os.makedirs(arr, exist_ok=True)
        fp = os.path.join(arr, "part-0.parquet")
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), fp)
        # FileStreamSource orders by mtime; same-tick writes would make
        # batch order nondeterministic
        os.utime(fp, (1_700_000_000 + i, 1_700_000_000 + i))

        ddf = pd.DataFrame({
            "doc_id": np.arange(doc_counter, doc_counter + len(pdf), dtype=np.int64),
            "text": pdf["text"],
        })
        doc_counter += len(pdf)
        dfp = os.path.join(dirs["dedup_in"], f"batch{i:03d}.parquet")
        pq.write_table(pa.Table.from_pandas(ddf, preserve_index=False), dfp)
        os.utime(dfp, (1_700_000_000 + i, 1_700_000_000 + i))

        # ---- stateful dedup drain (TTL on) ----
        streaming_exact_dedup(
            spark, dirs["dedup_in"] + "/*.parquet", dirs["dedup_ckpt"],
            dirs["dedup_out"], ttl_batches=ttl_batches,
        )
        metrics["state_bytes"].append(_state_bytes(dirs["dedup_ckpt"]))

        # ---- incremental index absorb + periodic compaction ----
        ix.run_available(spark, dirs["arrivals"] + "/arrival*")
        if i % compact_every == compact_every - 1:
            info = ix.compact(spark)
            metrics["compactions"].append({"batch": i, **info})
        compacted = set(ix.manifest.get("compacted_batch_ids", []))
        metrics["uncompacted_deltas"].append(
            sum(1 for b in ix.manifest["batches"]
                if int(b["batch_id"]) not in compacted)
        )

        # ---- query latency probe ----
        if i % latency_every == latency_every - 1:
            idx = ix.load_index(spark)
            if qdf is None:
                from nil_spark.sources.transcripts import gen_queries

                qpdf = gen_queries(pdf, n_queries=20, k=5, seed=77)
                qdf = spark.createDataFrame(
                    qpdf, schema="query_id long, text string, k int"
                )
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                topk_maxscore(
                    qdf, idx["segments"], idx["termdict"],
                    idx["n_docs"], idx["avgdl"], cfg,
                ).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            metrics["latency_batches"].append(i)
            metrics["latency_s"].append(round(best, 3))

    # dedup sanity: duplicates were actually found (state hits happened)
    out = spark.read.parquet(dirs["dedup_out"])
    metrics["dedup_dup_rows"] = out.filter("is_dup").count()
    metrics["dedup_total_rows"] = out.count()
    metrics["n_batches"] = n_batches
    metrics["ttl_batches"] = ttl_batches
    metrics["compact_every"] = compact_every
    return metrics


def main() -> None:
    from nil_spark.session import get_spark

    n_batches = int(os.environ.get("NIL_SOAK_BATCHES", "24"))
    root = f"/tmp/nil_soak_{n_batches}_{os.getpid()}"
    spark = get_spark(app="nil_soak", master="local[8]", shuffle_partitions=8)
    t0 = time.perf_counter()
    m = run_soak(spark, root, n_batches=n_batches)
    wall = round(time.perf_counter() - t0, 1)
    spark.stop()
    shutil.rmtree(root, ignore_errors=True)

    sb = m["state_bytes"]
    half, final = sb[len(sb) // 2], sb[-1]
    plateau = round(final / max(half, 1), 2)
    lat = m["latency_s"]
    art = os.path.join(REPO, "bench_artifacts")
    os.makedirs(art, exist_ok=True)
    payload = {
        "metric": "streaming_soak", "wall_s": wall, **m,
        "state_plateau_final_over_half": plateau,
        "latency_first_s": lat[0], "latency_last_s": lat[-1],
    }
    with open(os.path.join(art, "soak.json"), "w") as f:
        json.dump(payload, f, indent=2)
    md = f"""## Streaming soak ({m['n_batches']} micro-batches)

Full streaming surface driven end-to-end for {m['n_batches']}
micro-batches (400 turns each): stateful exact dedup with
ttl_batches={m['ttl_batches']} (30% of each batch's texts recur from
the previous two batches — real state hits inside the TTL horizon,
older hashes age out), incremental index absorb, generational
compaction every {m['compact_every']} batches, and a fixed 20-query
probe every 4 batches.

* **State store plateaus**: live state {sb[len(sb)//2]:,} B at batch
  {len(sb)//2} → {sb[-1]:,} B at batch {len(sb)} (final/half =
  {plateau}; unbounded growth would read ≈ 2.0).
* **Query latency stays flat under compaction**: probe wall
  {lat[0]} s (batch {m['latency_batches'][0] + 1}) → {lat[-1]} s
  (batch {m['latency_batches'][-1] + 1}); uncompacted deltas never
  exceed {max(m['uncompacted_deltas'])} (compaction folds them into
  one term-sorted generation).
* Dedup found {m['dedup_dup_rows']:,} duplicate rows out of
  {m['dedup_total_rows']:,} (state hits across batches are real).

Asserted (smaller run) in `tests/test_streaming_soak.py`; generated by
`python bench_soak.py` — raw series in `bench_artifacts/soak.json`.
"""
    with open(os.path.join(art, "soak.md"), "w") as f:
        f.write(md)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
