"""10x scale-up evidence for the most expensive gate queries.

The plan shapes (triangular joins with df caps, linear window-hash span
marking, residue-bounded LCS, iterative components) are argued
scale-safe at sf0.1; this bench SHOWS the growth curve: the same five
queries run over two synthetic `documents` corpora of identical
statistics — 5,000 docs (sf0.1-equivalent) and 50,000 docs (10x) — and
the wall-time ratio is reported per query.  Linear behavior = ratio
~10; an emergent quadratic term (skew blowup, uncapped fan-out) would
read as ratio -> 100.

Corpus generator: flat Zipf (s=0.8) 5,000-word vocabulary, doc length
~ U[10,100] (matching sf0.1's length distribution), with a fixed 1.5%
rate of planted near-duplicates (an earlier doc with ~10% of tokens
mutated) so the dedup-family queries have real work that grows
LINEARLY with corpus size by construction.

Why not the sf0.1 empirical vocabulary (and why a FLAT Zipf): it has only 31 words, so the
3-gram shingle space (29,791 values) SATURATES — mean shingle df grows
from ~9 at 5k docs to ~87 at 50k, and any exact pair-enumeration
operator does Σ df² candidate work, a quadratic lower bound imposed by
the DATA, not the plan (measured: ngram_jaccard 70×, exponent 1.85, on
that fixture).  Real corpora grow vocabulary with size (Heaps' law),
keeping shingle df scale-free; the Zipf fixture models that.  Result
row counts are reported per size so output-work growth is visible next
to wall growth.

Writes bench_artifacts/scale10.{json,md}; bench_scaling.py appends the
.md into BENCH.md when regenerating it.

Usage: python bench_scale10.py   (env: NIL_SCALE10_CPUS, default 32)
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
SF01 = "/root/testdata/sf0.1"
QUERIES = [
    "tracking_cascade",
    "neardup_components",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "dup_spans",
    "clone_candidates_tier1",
    "clone_pairs",
]
DUP_RATE = 0.015


def gen_documents(n_docs: int, seed: int):
    """Synthetic documents: flat-Zipf 5,000-word vocabulary (shingle
    df stays scale-free, as in real text), sf0.1-like doc lengths."""
    import pandas as pd
    import pyarrow.parquet as pq

    words = np.array([f"w{i:04d}" for i in range(5000)])
    # flat-ish Zipf (s=0.8): heavy enough for a realistic head, flat
    # enough that two RANDOM docs share ~no 3-gram shingles — so pair
    # candidates come from the planted near-dups (linear by
    # construction), not from coincidental head-shingle collisions
    zipf = 1.0 / np.arange(1, len(words) + 1) ** 0.8
    p = zipf / zipf.sum()
    src = pq.read_table(SF01 + "/documents.parquet", columns=["lang"]).to_pandas()
    langs, lcounts = np.unique(src["lang"], return_counts=True)
    lp = lcounts / lcounts.sum()

    rng = np.random.default_rng(seed)
    texts = []
    for i in range(n_docs):
        if texts and rng.random() < DUP_RATE:
            # planted near-duplicate: mutate ~10% of an earlier doc
            base = texts[int(rng.integers(0, len(texts)))].split()
            toks = list(base)
            n_mut = max(1, len(toks) // 10)
            for j in rng.integers(0, len(toks), n_mut):
                toks[int(j)] = str(rng.choice(words, p=p))
            texts.append(" ".join(toks))
        else:
            ln = int(rng.integers(10, 101))
            texts.append(" ".join(rng.choice(words, size=ln, p=p)))
    return pd.DataFrame(
        {
            "doc_id": np.arange(n_docs, dtype=np.int64),
            "text": texts,
            "lang": rng.choice(langs, size=n_docs, p=lp),
            "source": [f"src{i % 20}" for i in range(n_docs)],
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }
    )


def write_corpus(n_docs: int, seed: int) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = f"/tmp/nil_scale10_{n_docs}"
    marker = os.path.join(d, "_DONE")
    if not os.path.exists(marker):
        os.makedirs(d, exist_ok=True)
        pq.write_table(
            pa.Table.from_pandas(gen_documents(n_docs, seed), preserve_index=False),
            os.path.join(d, "documents.parquet"),
        )
        open(marker, "w").close()
    return d


def main() -> None:
    cpus = os.environ.get("NIL_SCALE10_CPUS", "32")
    from nil_spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark(
        app="nil_scale10", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    dirs = {1: write_corpus(5000, seed=7), 10: write_corpus(50000, seed=7)}
    qmap = entry_mod.queries()
    results: dict[str, dict] = {q: {} for q in QUERIES}
    for scale, d in dirs.items():
        for q in QUERIES:
            fn = qmap[q]
            t0 = time.perf_counter()
            force(fn(spark, d))
            cold = time.perf_counter() - t0
            warm = []
            for _ in range(2):
                t0 = time.perf_counter()
                force(fn(spark, d))
                warm.append(time.perf_counter() - t0)
            results[q][f"x{scale}_cold_s"] = round(cold, 3)
            results[q][f"x{scale}_warm_s"] = round(min(warm), 3)
            results[q][f"x{scale}_rows"] = fn(spark, d).count()
            print(
                f"PROGRESS x{scale} {q}: cold={cold:.2f}s "
                f"warm={min(warm):.2f}s rows={results[q][f'x{scale}_rows']}",
                flush=True,
            )
    for q in QUERIES:
        r = results[q]
        ratio = r["x10_warm_s"] / r["x1_warm_s"]
        r["growth_ratio_10x"] = round(ratio, 2)
        # wall = c * n^e  =>  e = log10(t10/t1) when sizes differ 10x
        r["growth_exponent"] = round(float(np.log10(max(ratio, 1e-9))), 2)

    # exact-jaccard work accounting: the triangular join verifies
    # sum-over-shingles C(df, 2) candidate pairs — report that work at
    # both scales so the wall growth can be judged against the work
    # growth (engine linear-in-work vs workload super-linear-in-docs)
    from pyspark.sql import functions as F

    from nil_spark.operators.dedup import shingles

    for scale, d in dirs.items():
        docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
        cand = (
            shingles(docs, 3)
            .groupBy("shingle")
            .count()
            .filter(F.col("count") <= 1000)  # the operator's df_cap
            .agg(F.sum(F.expr("count * (count - 1) / 2")).alias("c"))
            .collect()[0]["c"]
        )
        results["ngram_jaccard_pairs"][f"x{scale}_candidates"] = int(cand or 0)
    jr = results["ngram_jaccard_pairs"]
    jr["candidate_ratio_10x"] = round(jr["x10_candidates"] / max(jr["x1_candidates"], 1), 2)
    jr["cand_per_sec_x1"] = round(jr["x1_candidates"] / jr["x1_warm_s"], 1)
    jr["cand_per_sec_x10"] = round(jr["x10_candidates"] / jr["x10_warm_s"], 1)
    spark.stop()

    art = os.path.join(REPO, "bench_artifacts")
    os.makedirs(art, exist_ok=True)
    payload = {
        "metric": "scale10_growth",
        "corpora": {"x1_docs": 5000, "x10_docs": 50000, "dup_rate": DUP_RATE},
        "cpus": int(cpus),
        "protocol": "1 cold + best-of-2 warm per query per size, same session",
        "queries": results,
    }
    with open(os.path.join(art, "scale10.json"), "w") as f:
        json.dump(payload, f, indent=2)

    rows = "\n".join(
        f"| {q} | {results[q]['x1_warm_s']} s | {results[q]['x10_warm_s']} s "
        f"| {results[q]['growth_ratio_10x']}× | {results[q]['growth_exponent']} "
        f"| {results[q]['x1_rows']:,} → {results[q]['x10_rows']:,} |"
        for q in QUERIES
    )
    md = f"""## 10× scale-up growth curve (most expensive gate queries)

Two synthetic `documents` corpora with identical statistics
(flat Zipf s=0.8, 5,000-word vocabulary, U[10,100] doc lengths, 1.5%
planted near-duplicates — dedup work grows linearly by construction):
5,000 docs (sf0.1-equivalent) vs 50,000 docs, local[{cpus}], 1 cold +
best-of-2 warm per query and size.  A query whose plan holds at scale
grows ~linearly (ratio ≈ 10, exponent ≈ 1.0 in wall = c·nᵉ); an
emergent quadratic term (skew blowup, uncapped pair fan-out) would
push the ratio toward 100.  Result rows are shown so output-work
growth is visible next to wall growth.

| query | 5k docs (warm) | 50k docs (warm) | growth | exponent | result rows |
|---|---|---|---|---|---|
{rows}

**Exact-jaccard work accounting**: the triangular join inherently
verifies Σ C(df,2) candidate pairs (after the df_cap=1000 prune) —
{results['ngram_jaccard_pairs']['x1_candidates']:,} candidates at 5k
docs vs {results['ngram_jaccard_pairs']['x10_candidates']:,} at 50k
({results['ngram_jaccard_pairs']['candidate_ratio_10x']}×).  Verified
candidates/sec: {results['ngram_jaccard_pairs']['cand_per_sec_x1']:,}
→ {results['ngram_jaccard_pairs']['cand_per_sec_x10']:,} — the engine
is ~linear in its actual join work; the super-linear WALL growth is
the workload's Σ df² lower bound, which no exact pair enumeration can
beat.  The scale path for that regime is the approximate operator
(`minhash_lsh_pairs`, in the table above), which stays near-linear.

**Saturated-vocabulary counterpoint**: on a fixture drawn from the
sf0.1 EMPIRICAL vocabulary (31 words — the 3-gram shingle space
saturates, mean shingle df 9 → 87 across the same 10× step),
`ngram_jaccard_pairs` measured **70× / exponent 1.85** for the same
reason, and `neardup_components` 45× (it consumes those pairs).  Real
corpora grow vocabulary with size (Heaps' law), which the Zipf fixture
models.

Generated by `python bench_scale10.py` — raw numbers in
`bench_artifacts/scale10.json`.
"""
    with open(os.path.join(art, "scale10.md"), "w") as f:
        f.write(md)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
