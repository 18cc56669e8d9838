"""Deduplication operators for training-data pipelines.

Exact (hash groupBy), MinHash+LSH (shingle → minhash → band → bucket
join → Jaccard verify), SimHash, and n-gram Jaccard — the
filter-then-verify discipline of the reference (cheap bucket/bound
first, exact similarity only on survivors; OptimizedCloneDetection.kt:
17-56) applied to near-duplicate detection.

All hashes here are the *cross-system* md5-prefix family
(functions/hashing.py) so every operator has an exact DuckDB SQL oracle.
Pure JVM expressions throughout — no Python in the hot path.

Scale notes: minhash signatures are one groupBy(doc_id) carrying k
literal-permutation min aggregates (each shingle crosses the exchange
once — no perm fan-out before the shuffle); the LSH bucket self-join
fans out only within buckets, and a ``bucket_cap`` guards degenerate
buckets (the df-cutoff analog).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nil_spark.functions.caching import tether
from nil_spark.functions.hashing import md5_prefix64_col

MINHASH_P = 2147483647  # 2^31 - 1; a·(h%P)+b stays < 2^62 (int64 safe)
MINHASH_K = 12
LSH_BANDS = 4
LSH_ROWS = 3


def minhash_perms(k: int = MINHASH_K) -> list[tuple[int, int, int]]:
    """Pinned permutation params (perm_id, a, b) — same literals are
    embedded in the SQL oracle."""
    out = []
    for i in range(k):
        a = (2654435761 * (i + 1) + 1) % MINHASH_P
        b = (40503 * (i + 7) * 2654435761 + 17) % MINHASH_P
        out.append((i, a, b))
    return out


def shingles(df: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, shingle) — distinct word n-gram shingles as strings."""
    toks_df = df.select(
        F.col(id_col).alias("doc_id"),
        F.filter(F.split(F.lower(text_col), "[^a-z0-9]+"), lambda x: x != "").alias("toks"),
    )
    sh = F.when(
        F.size("toks") >= n,
        F.expr(
            f"transform(sequence(0, size(toks) - {n}),"
            f" i -> concat_ws(' ', slice(toks, i + 1, {n})))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    return toks_df.select("doc_id", F.explode(F.array_distinct(sh)).alias("shingle"))


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, canon_id, group_size) by md5 content hash — groupBy+join
    shape (no global window) so it scales: one shuffle on the hash."""
    h = df.select(F.col(id_col).alias("doc_id"), F.md5(text_col).alias("h"))
    groups = h.groupBy("h").agg(
        F.min("doc_id").alias("canon_id"), F.count("*").cast("long").alias("group_size")
    )
    return h.join(groups, "h").select("doc_id", "canon_id", "group_size")


def minhash_signatures_wide(sh: DataFrame, k: int = MINHASH_K) -> DataFrame:
    """(doc_id, mh0..mh{k-1}) — ONE groupBy(doc_id) with k literal-perm
    min aggregates.  Each shingle row crosses the exchange exactly once;
    the earlier perm-crossJoin shape multiplied every shingle ×k before
    the shuffle (the round-1 bench's dominant cost)."""
    hp = sh.select(
        "doc_id", (md5_prefix64_col(F.col("shingle")) % MINHASH_P).alias("hp")
    )
    aggs = [
        F.min((F.lit(a) * F.col("hp") + F.lit(b)) % MINHASH_P).alias(f"mh{i}")
        for i, a, b in minhash_perms(k)
    ]
    return hp.groupBy("doc_id").agg(*aggs)


def minhash_signatures(sh: DataFrame, k: int = MINHASH_K) -> DataFrame:
    """(doc_id, perm_id, mh) — narrow view of the wide aggregate (a
    post-shuffle stack projection; no extra exchange)."""
    wide = minhash_signatures_wide(sh, k)
    pairs = ", ".join(f"{i}, mh{i}" for i in range(k))
    return wide.select(
        "doc_id", F.expr(f"stack({k}, {pairs}) AS (perm_id, mh)")
    )


def lsh_band_keys(
    wide: DataFrame, bands: int = LSH_BANDS, rows: int = LSH_ROWS
) -> DataFrame:
    """(doc_id, band, band_key) from wide signatures — pure projection +
    explode, no shuffle (band_key = mh values in perm order, '-'-joined,
    matching the SQL oracle's string_agg ORDER BY perm_id)."""
    need = bands * rows
    have = sum(1 for c in wide.columns if c.startswith("mh"))
    if need > have:
        raise ValueError(
            f"bands*rows = {bands}*{rows} = {need} exceeds the {have} minhash "
            f"columns in the signature frame; build signatures with k >= {need}"
        )
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws(
                "-", *[F.col(f"mh{b * rows + r}").cast("string") for r in range(rows)]
            ).alias("band_key"),
        )
        for b in range(bands)
    ]
    return wide.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("bb")
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.band_key").alias("band_key"))


def lsh_candidate_pairs(
    sigs_wide: DataFrame,
    bands: int = LSH_BANDS,
    rows: int = LSH_ROWS,
    bucket_cap: int = 10_000,
) -> DataFrame:
    """(id1, id2) distinct — pairs sharing at least one LSH band.
    Takes *wide* signatures (``minhash_signatures_wide``)."""
    banded = lsh_band_keys(sigs_wide, bands, rows)
    # guard degenerate buckets (hot-bucket analog of df stopword pruning)
    sizes = banded.groupBy("band", "band_key").agg(F.count("*").alias("bsz"))
    banded = banded.join(
        F.broadcast(sizes.filter(F.col("bsz") > bucket_cap)), ["band", "band_key"], "left_anti"
    ).persist()  # consumed by both sides of the self-join below
    a, b = banded.alias("a"), banded.alias("b")
    out = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("id1"), F.col("b.doc_id").alias("id2"))
        .distinct()
    )
    return tether(out, banded)


def jaccard_verify(pairs: DataFrame, sh: DataFrame) -> DataFrame:
    """(id1, id2, inter, n1, n2, jaccard) — exact verify on candidates."""
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("nsh"))
    g1 = sh.select(F.col("doc_id").alias("id1"), "shingle")
    g2 = sh.select(F.col("doc_id").alias("id2"), "shingle")
    inter = (
        pairs.join(g1, "id1")
        .join(g2, ["id2", "shingle"])
        .groupBy("id1", "id2")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.select(F.col("doc_id").alias("id1"), F.col("nsh").alias("n1")), "id1")
        .join(sizes.select(F.col("doc_id").alias("id2"), F.col("nsh").alias("n2")), "id2")
        .select(
            "id1",
            "id2",
            F.col("inter").cast("long").alias("inter"),
            F.col("n1").cast("long").alias("n1"),
            F.col("n2").cast("long").alias("n2"),
            F.round(F.col("inter") / (F.col("n1") + F.col("n2") - F.col("inter")), 6).alias("jaccard"),
        )
    )


def minhash_dedup(
    df: DataFrame,
    n: int = 3,
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
    rows: int = LSH_ROWS,
    threshold: float = 0.5,
) -> DataFrame:
    """End-to-end near-dup pairs: shingle → minhash → LSH → Jaccard ≥ t.

    ``shingles`` feeds three consumers (signatures + both sides of the
    verify join) and the banded signatures feed a self-join — persist
    both so the DAG doesn't re-derive them per branch (cluster analog:
    checkpoint); both caches are tethered to the result for release."""
    sh = shingles(df, n).persist()
    sigs = minhash_signatures_wide(sh, k)
    cand = lsh_candidate_pairs(sigs, bands, rows)
    out = jaccard_verify(cand, sh).filter(F.col("jaccard") >= threshold)
    # cand is tethered too: holding it alive defers the release of the
    # banded cache inside lsh_candidate_pairs until `out` itself is dropped
    # (unpersist on the non-persisted cand is a no-op).
    return tether(out, sh, cand)


def ngram_jaccard_pairs(
    df: DataFrame, n: int = 3, threshold: float = 0.3, df_cap: int = 1000
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs (no MinHash approximation):
    shingle self-join with the triangular guard, Jaccard ≥ threshold.

    ``df_cap`` drops shingles shared by more than that many docs before
    the self-join — the df-based stopword pruning of the index applied
    to the pair-enumeration fan-out (a shingle in d docs contributes
    d² candidate pairs).  Exactness is preserved for any pair whose
    Jaccard ≥ threshold can't be reached through capped shingles alone;
    with the default corpus the cap never fires below ~20% df."""
    sh = shingles(df, n).persist()  # sizes + both join sides
    hot = (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("sdf"))
        .filter(F.col("sdf") > df_cap)
        .select("shingle")
    )
    g = sh.join(F.broadcast(hot), "shingle", "left_anti")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("nsh"))
    a, b = g.alias("a"), g.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("id1"), F.col("b.doc_id").alias("id2"))
        .agg(F.count("*").alias("inter"))
    )
    out = (
        inter.join(F.broadcast(sizes.select(F.col("doc_id").alias("id1"), F.col("nsh").alias("n1"))), "id1")
        .join(F.broadcast(sizes.select(F.col("doc_id").alias("id2"), F.col("nsh").alias("n2"))), "id2")
        .select(
            "id1",
            "id2",
            F.col("inter").cast("long").alias("inter"),
            F.round(F.col("inter") / (F.col("n1") + F.col("n2") - F.col("inter")), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return tether(out, sh)


def simhash63(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dense_cells: int = 4_000_000,
) -> DataFrame:
    """(doc_id, simhash) — 63-bit SimHash over unigram tf with
    md5-prefix term hashes.  bit b = 1 iff Σ tf·(2·bit_b(h)−1) > 0.
    Docs with zero tokens are excluded (same as the groupBy-over-
    occurrences formulation and the SQL oracle).

    Shape: SimHash is purely per-document, so the right plan is a
    ZERO-shuffle Arrow ``mapInPandas`` projection — each executor
    fingerprints its own partition; nothing crosses an exchange at any
    scale.  The NumPy kernel reduces each sub-chunk to (doc, term, tf)
    pairs, hashes unique terms once, then computes the 63 bit sums
    Σ_terms tf·(2·bit_b(h)−1) either as a dense tf-matrix matmul
    (small vocab) or a per-bit weighted bincount over the pairs (large
    vocab) — exact integer-valued math, identical to the DuckDB
    oracle, and never materialising an occurrences×63 intermediate
    (large fresh allocations pay a first-touch page-fault cliff that
    dwarfs the arithmetic).  (History: v1 exploded every (doc, term)
    row ×63 bit positions before a groupBy — the round-1 MinHash
    fan-out defect class; v2 was one groupBy(doc_id) with 63
    conditional-sum aggregates — shuffle-sane but 63 codegen exprs per
    occurrence row.)"""
    import re

    import numpy as np
    import pandas as pd

    from nil_spark.functions.hashing import md5_prefix64_py

    splitter = re.compile("[^a-z0-9]+")
    bits = np.arange(63, dtype=np.uint64)
    pows = (np.uint64(1) << bits).astype(np.int64)
    occ_budget = 200_000  # occurrences per sub-chunk: bounds the (occ × 63) int32 expansion to ~50 MB

    def kernel(it):
        hcache: dict[str, int] = {}
        for pdf in it:
            n = len(pdf)
            if n == 0:
                continue
            ids = pdf[id_col].to_numpy()
            toks = [
                [w for w in splitter.split(t.lower()) if w]
                for t in pdf[text_col].astype(str)
            ]
            counts = np.fromiter((len(t) for t in toks), dtype=np.int64, count=n)
            out_ids, out_sh = [], []
            start = 0
            while start < n:
                end = start + 1
                tot = counts[start]
                while end < n and tot + counts[end] <= occ_budget:
                    tot += counts[end]
                    end += 1
                sl = slice(start, end)
                flat = [w for t in toks[sl] for w in t]
                start = end
                if not flat:
                    continue
                uniq, inv = np.unique(np.asarray(flat, dtype=object), return_inverse=True)
                for u in uniq:
                    if u not in hcache:
                        hcache[u] = md5_prefix64_py(u)
                h = np.fromiter((hcache[u] for u in uniq), dtype=np.uint64, count=len(uniq))
                pm = ((h[:, None] >> bits[None, :]) & np.uint64(1)).astype(np.int64) * 2 - 1
                seg_counts = counts[sl]
                nd, nu = len(seg_counts), len(uniq)
                doc_local = np.repeat(np.arange(nd, dtype=np.int64), seg_counts)
                if nd * nu <= dense_cells:
                    # dense (docs × vocab) tf + one matmul
                    tf = np.bincount(doc_local * nu + inv, minlength=nd * nu).reshape(nd, nu)
                    sums = tf @ pm
                else:
                    # large vocab: reduce to (doc, term, tf) pairs and
                    # bincount each bit's tf-weighted ±1 contribution —
                    # pairs-length temporaries only
                    pk, cnt = np.unique(doc_local * nu + inv, return_counts=True)
                    pdoc, pterm = pk // nu, pk % nu
                    sums = np.empty((nd, 63), dtype=np.float64)
                    for b in range(63):
                        sums[:, b] = np.bincount(
                            pdoc, weights=cnt * pm[pterm, b], minlength=nd
                        )
                keep = np.flatnonzero(seg_counts > 0)
                out_ids.append(ids[sl][keep])
                out_sh.append((sums[keep] > 0) @ pows)
            yield pd.DataFrame(
                {
                    "doc_id": np.concatenate(out_ids) if out_ids else np.empty(0, np.int64),
                    "simhash": np.concatenate(out_sh) if out_sh else np.empty(0, np.int64),
                }
            )

    return df.select(F.col(id_col).alias(id_col), F.col(text_col)).mapInPandas(
        kernel, schema="doc_id long, simhash long"
    )


def benchmark_contamination(
    df: DataFrame,
    bench_ids: DataFrame,
    n: int = 3,
    min_shared: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination (training-data pipeline op): for every
    non-benchmark document, count how many of its distinct word
    ``n``-gram shingles also occur anywhere in the benchmark set, and
    flag it contaminated at ``min_shared`` hits — the shingle-overlap
    test eval-set decontamination runs before training.

    Scale shape: the benchmark shingle set is tiny relative to the
    corpus (eval sets are MBs against TBs), so it is distinct-ed and
    BROADCAST; the corpus side then probes it with a broadcast hash
    join — no shuffle of corpus shingles, no pairwise doc join.  Corpus
    docs with zero shingles (< n tokens) are excluded on both engine
    and oracle sides.
    """
    sh = shingles(df, n=n, text_col=text_col, id_col=id_col)
    bench_sh = (
        sh.join(F.broadcast(bench_ids.select("doc_id")), "doc_id")
        .select("shingle")
        .distinct()
    )
    corpus_sh = sh.join(F.broadcast(bench_ids.select("doc_id")), "doc_id", "left_anti")
    tot = corpus_sh.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    hits = (
        corpus_sh.join(F.broadcast(bench_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared"))
    )
    return (
        tot.join(hits, "doc_id", "left")
        .na.fill({"n_shared": 0})
        .select(
            "doc_id",
            F.col("n_shingles").cast("long").alias("n_shingles"),
            F.col("n_shared").cast("long").alias("n_shared"),
            (F.col("n_shared") >= min_shared).alias("contaminated"),
        )
    )


def duplicated_spans(
    df: DataFrame,
    w: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact-substring duplication stats per doc (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): every
    w-token window is hashed (pinned md5-prefix); a window whose hash
    occurs >= 2 times corpus-wide (any doc, including repeats within
    one doc) is a duplicated span.

    Returns (doc_id, n_windows, n_dup_windows, dup_frac) for docs with
    at least w tokens.

    Scale shape: windows explode (positions, NOT distinct — span
    multiplicity matters), one groupBy(hash) for global counts, one
    join back, one groupBy(doc).  The hash groupBy is the same exchange
    ngram df-stats already pays; no self-join — this marks spans, it
    does not enumerate pairs, so it is linear in corpus size where
    pair-based dedup is quadratic in cluster size.
    """
    toks_df = df.select(
        F.col(id_col).alias("doc_id"),
        F.filter(F.split(F.lower(text_col), "[^a-z0-9]+"), lambda x: x != "").alias("toks"),
    ).filter(F.size("toks") >= w)
    wins = toks_df.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, size(toks) - {w}),"
                f" i -> concat_ws(' ', slice(toks, i + 1, {w})))"
            )
        ).alias("win"),
    ).select("doc_id", md5_prefix64_col(F.col("win")).alias("h"))
    counts = wins.groupBy("h").agg(F.count("*").alias("cnt"))
    return (
        wins.join(counts, "h")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_windows"),
            F.sum((F.col("cnt") >= 2).cast("long")).cast("long").alias("n_dup_windows"),
        )
        .select(
            "doc_id",
            "n_windows",
            "n_dup_windows",
            F.round(F.col("n_dup_windows") / F.col("n_windows"), 6).alias("dup_frac"),
        )
    )
