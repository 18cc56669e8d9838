"""Engine-native doc-values aggregations (operators/aggs_engine.py).

The histogram kernel reads the node-shared doc-values array and (for
filtered aggs) the replica posting store — the corpus text is never
touched.  Every case is pinned to a DataFrame oracle computed from the
raw corpus with the same semantics: floor(epoch / interval) buckets,
NaN-skipping, min_doc_count:0 zero-fill, DSL filters via the shared
``compile_spark`` backend, tombstones excluded exactly.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from nil_spark.config import EngineConfig
from nil_spark.functions.querylang import compile_spark, parse_query
from nil_spark.operators.aggs_engine import date_histogram_replica
from nil_spark.operators.docids import assign_doc_ids
from nil_spark.operators.docvalues import docvalues_dir, write_docvalues
from nil_spark.operators.segments import build_partial_segments
from nil_spark.sources.transcripts import spark_transcripts

N_TURNS = 3000
SEED = 17
INTERVAL = 86400.0

CFG = EngineConfig(
    gram_size=1, min_chars=0, min_tokens=0, df_stopword_cutoff=2.0
)


@pytest.fixture(scope="module")
def idx(spark):
    """(index_dir, shard_paths, n_docs, corpus_pdf) over a synthetic
    transcript corpus carrying ts + turn_idx doc-values."""
    import glob

    d = os.path.join(tempfile.gettempdir(), "nil_test_aggs_engine")
    docs = assign_doc_ids(spark_transcripts(spark, N_TURNS, seed=SEED))
    docs.persist()
    shard_dir = os.path.join(d, "segments")
    if not os.path.exists(os.path.join(shard_dir, "_SUCCESS")):
        build_partial_segments(
            docs.select("doc_id", "text").repartition(8), CFG
        ).write.mode("overwrite").parquet(shard_dir)
        write_docvalues(docs, d, ["ts", "turn_idx"])
    shard_paths = sorted(glob.glob(os.path.join(shard_dir, "part-*.parquet")))

    old_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        pdf = docs.select(
            "doc_id",
            (F.unix_micros(F.col("ts").cast("timestamp")) / 1e6).alias(
                "epoch"
            ),
            F.col("turn_idx").cast("double").alias("metric"),
            F.lower("text").alias("ltext"),
        ).toPandas()
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)
    n_docs = int(docs.count())
    docs.unpersist()
    return d, shard_paths, n_docs, pdf


def _oracle(pdf: pd.DataFrame, metric: bool = False) -> pd.DataFrame:
    b = np.floor(pdf["epoch"].to_numpy() / INTERVAL).astype(np.int64)
    g = pd.DataFrame({"bucket": b, "m": pdf["metric"].to_numpy()})
    agg = g.groupby("bucket").agg(
        doc_count=("m", "size"), value_sum=("m", "sum")
    )
    spine = pd.RangeIndex(agg.index.min(), agg.index.max() + 1)
    agg = agg.reindex(spine, fill_value=0)
    out = pd.DataFrame(
        {
            "bucket": agg.index.to_numpy(np.int64),
            "bucket_start": np.round(agg.index.to_numpy() * INTERVAL, 6),
            "doc_count": agg["doc_count"].to_numpy(np.int64),
        }
    )
    if metric:
        vs = agg["value_sum"].to_numpy(float)
        dc = agg["doc_count"].to_numpy(float)
        out["value_sum"] = np.round(vs, 6)
        out["value_avg"] = np.round(
            np.divide(vs, dc, out=np.zeros_like(vs), where=dc > 0), 6
        )
    return out.reset_index(drop=True)


def _got(df) -> pd.DataFrame:
    return (
        df.toPandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )


def _check(got: pd.DataFrame, exp: pd.DataFrame):
    assert list(got.columns) == list(exp.columns), (
        got.columns, exp.columns
    )
    assert len(got) == len(exp), (len(got), len(exp))
    for c in got.columns:
        if got[c].dtype.kind == "f":
            assert np.allclose(got[c], exp[c], atol=1e-9), c
        else:
            assert (got[c].to_numpy() == exp[c].to_numpy()).all(), c


def test_unfiltered_histogram_matches_oracle(spark, idx):
    d, shard_paths, n_docs, pdf = idx
    got = _got(
        date_histogram_replica(
            spark, docvalues_dir(d, "ts"), n_docs, INTERVAL
        )
    )
    _check(got, _oracle(pdf))


def test_metric_subagg_matches_oracle(spark, idx):
    d, shard_paths, n_docs, pdf = idx
    got = _got(
        date_histogram_replica(
            spark,
            docvalues_dir(d, "ts"),
            n_docs,
            INTERVAL,
            metric_dv_dir=docvalues_dir(d, "turn_idx"),
        )
    )
    _check(got, _oracle(pdf, metric=True))


@pytest.mark.parametrize(
    "dsl",
    [
        "w00003 AND w00007",
        "w00042 OR (w00013 AND NOT w00002)",
        '"w00000 w00001" OR w00276',
        "NOT w00000",
    ],
)
def test_dsl_filtered_histogram_matches_oracle(spark, idx, dsl):
    d, shard_paths, n_docs, pdf = idx
    ast = parse_query(dsl)

    # positional store only when the filter carries a phrase
    pos_store = None
    if '"' in dsl:
        from nil_spark.operators.positions import build_position_segments

        pos_dir = os.path.join(d, "positions")
        if not os.path.exists(os.path.join(pos_dir, "_SUCCESS")):
            docs = assign_doc_ids(
                spark_transcripts(spark, N_TURNS, seed=SEED)
            )
            build_position_segments(
                docs.select("doc_id", "text").repartition(8), CFG
            ).write.mode("overwrite").parquet(pos_dir)
        pos_store = spark.read.parquet(pos_dir)

    got = _got(
        date_histogram_replica(
            spark,
            docvalues_dir(d, "ts"),
            n_docs,
            INTERVAL,
            dsl=dsl,
            shard_paths=shard_paths,
            cfg=CFG,
            pos_store=pos_store,
            universe_mode="dense",
        )
    )

    # oracle: the shared DataFrame DSL backend picks the doc set
    sdf = spark.createDataFrame(pdf[["doc_id", "ltext"]])
    toks = F.filter(
        F.split("ltext", "[^a-z0-9]+"), lambda x: x != ""
    )
    base = sdf.select(
        "doc_id",
        toks.alias("toks"),
    ).withColumn(
        "padded",
        F.concat(F.lit(" "), F.array_join("toks", " "), F.lit(" ")),
    )
    keep = set(
        r[0]
        for r in base.filter(
            compile_spark(ast, F.col("toks"), F.col("padded"))
        )
        .select("doc_id")
        .collect()
    )
    _check(got, _oracle(pdf[pdf["doc_id"].isin(keep)]))


def test_tombstones_excluded(spark, idx):
    d, shard_paths, n_docs, pdf = idx
    rng = np.random.default_rng(3)
    tombs = np.unique(
        rng.choice(n_docs, size=max(n_docs // 10, 1), replace=False)
    ).astype(np.int64)
    got = _got(
        date_histogram_replica(
            spark,
            docvalues_dir(d, "ts"),
            n_docs,
            INTERVAL,
            excluded=tombs,
        )
    )
    _check(got, _oracle(pdf[~pdf["doc_id"].isin(set(tombs.tolist()))]))


def test_cli_agg_lifecycle(spark, idx, tmp_path):
    """CLI build --docvalues → agg (plain, metric, DSL-filtered) in
    fresh JVMs; bucket counts must equal the in-process kernel's."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def run(extra):
        return subprocess.run(
            [sys.executable, os.path.join(repo, "cli_main.py"),
             "--master", "local[2]", "--shuffle-partitions", "4",
             "--stopword-cutoff", "2.0", *extra],
            capture_output=True, text=True, timeout=600, cwd=repo,
        )

    corpus = str(tmp_path / "corpus.parquet")
    spark_transcripts(spark, 800, seed=23).write.mode("overwrite").parquet(
        corpus
    )
    idx_dir = str(tmp_path / "idx")
    r = run(["build", "--input", corpus, "--index-dir", idx_dir,
             "--docvalues", "ts,turn_idx"])
    assert r.returncode == 0, r.stderr

    out1 = str(tmp_path / "agg1")
    r = run(["agg", "--index-dir", idx_dir, "--field", "ts",
             "--metric-field", "turn_idx", "--out", out1])
    assert r.returncode == 0, r.stderr

    got = (
        spark.read.parquet(out1)
        .toPandas().sort_values("bucket").reset_index(drop=True)
    )
    exp = _got(
        date_histogram_replica(
            spark, docvalues_dir(idx_dir, "ts"),
            int(spark.read.parquet(corpus).count()), INTERVAL,
            metric_dv_dir=docvalues_dir(idx_dir, "turn_idx"),
        )
    )
    _check(got, exp)
    assert int(got["doc_count"].sum()) == 800

    out2 = str(tmp_path / "agg2")
    r = run(["agg", "--index-dir", idx_dir, "--field", "ts",
             "--dsl", "w00003 AND w00007", "--out", out2])
    assert r.returncode == 0, r.stderr
    filt = spark.read.parquet(out2).toPandas()
    assert 0 < int(filt["doc_count"].sum()) < 800

    # structured error: unknown doc-values field
    r = run(["agg", "--index-dir", idx_dir, "--field", "nope",
             "--out", str(tmp_path / "agg3")])
    assert r.returncode == 2
    import json as _json

    err = _json.loads(r.stderr.strip().splitlines()[-1])
    assert err["fields"] == ["nope"]


# ------------------------------------------------ percentiles (t-digest)


def _rank_err(values: np.ndarray, q: float, est: float) -> float:
    s = np.sort(values)
    n = len(s)
    lo = np.searchsorted(s, est, side="left")
    hi = np.searchsorted(s, est, side="right")
    return max(0.0, lo - q * n, q * n - hi) / n


def test_percentiles_matches_exact(spark, idx):
    """percentiles_replica over the turn_idx doc-values: per-range
    t-digests merged on the driver — estimates inside the rank-error
    bound of the exact quantiles, count exact."""
    from nil_spark.operators.aggs_engine import percentiles_replica

    d, _paths, n_docs, pdf = idx
    qs = [0.05, 0.5, 0.95]
    got = percentiles_replica(
        spark, docvalues_dir(d, "turn_idx"), n_docs, qs
    ).toPandas().set_index("q")
    vals = pdf["metric"].to_numpy(float)
    assert (got["doc_count"] == n_docs).all()
    for q in qs:
        assert _rank_err(vals, q, got.loc[q, "value"]) < 0.01


def test_percentiles_dsl_and_field_filters(spark, idx, kw_idx):
    """The same optional index-native DSL filter the other engine aggs
    take — including a FIELD predicate resolved from the keyword
    doc-values — restricts which docs are sketched."""
    from nil_spark.operators.aggs_engine import percentiles_replica

    d, shard_paths, n_docs, pdf = idx
    kw_dir, roles = kw_idx
    qs = [0.5, 0.9]

    got = percentiles_replica(
        spark, docvalues_dir(d, "turn_idx"), n_docs, qs,
        dsl="w00001", shard_paths=shard_paths, cfg=CFG,
    ).toPandas().set_index("q")
    mask = pdf["ltext"].str.contains(r"(?:^|[^a-z0-9])w00001(?:[^a-z0-9]|$)")
    vals = pdf.loc[mask, "metric"].to_numpy(float)
    assert int(got["doc_count"].iloc[0]) == int(mask.sum())
    for q in qs:
        assert _rank_err(vals, q, got.loc[q, "value"]) < 0.02

    got2 = percentiles_replica(
        spark, docvalues_dir(d, "turn_idx"), n_docs, qs,
        dsl="role:user", shard_paths=shard_paths, cfg=CFG,
        dsl_keyword_dv={"role": kw_dir},
    ).toPandas().set_index("q")
    m = roles.merge(pdf[["doc_id", "metric"]], on="doc_id")
    uvals = m.loc[m["role"] == "user", "metric"].to_numpy(float)
    assert int(got2["doc_count"].iloc[0]) == len(uvals)
    for q in qs:
        assert _rank_err(uvals, q, got2.loc[q, "value"]) < 0.02


def test_percentiles_guards(spark, idx):
    from nil_spark.operators.aggs_engine import percentiles_replica

    d, shard_paths, n_docs, _pdf = idx
    with pytest.raises(ValueError, match="out of"):
        percentiles_replica(
            spark, docvalues_dir(d, "turn_idx"), n_docs, [1.5]
        )
    with pytest.raises(ValueError, match="doc-values store"):
        percentiles_replica(
            spark, docvalues_dir(d, "turn_idx"), n_docs, [0.5],
            dsl="lang:en", shard_paths=shard_paths, cfg=CFG,
        )


def test_cli_percentiles(spark, tmp_path):
    import json as _json
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def run(extra):
        return subprocess.run(
            [sys.executable, os.path.join(repo, "cli_main.py"),
             "--master", "local[2]", "--shuffle-partitions", "4",
             "--stopword-cutoff", "2.0", *extra],
            capture_output=True, text=True, timeout=600, cwd=repo,
        )

    corpus = str(tmp_path / "corpus.parquet")
    spark_transcripts(spark, 500, seed=29).write.mode("overwrite").parquet(
        corpus
    )
    idx_dir = str(tmp_path / "idx")
    r = run(["build", "--input", corpus, "--index-dir", idx_dir,
             "--docvalues", "turn_idx"])
    assert r.returncode == 0, r.stderr
    out = str(tmp_path / "pct")
    r = run(["agg", "--index-dir", idx_dir, "--field", "turn_idx",
             "--percentiles", "0.5,0.95", "--out", out])
    assert r.returncode == 0, r.stderr
    got = spark.read.parquet(out).toPandas().sort_values("q")
    assert list(got["q"]) == [0.5, 0.95]
    assert (got["doc_count"] == 500).all()
    summary = _json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["percentiles"] == [0.5, 0.95]

    r = run(["agg", "--index-dir", idx_dir, "--field", "turn_idx",
             "--percentiles", "1.5", "--out", out])
    assert r.returncode == 2
    err = _json.loads(r.stderr.strip().splitlines()[-1])
    assert err["error"] == "bad --percentiles"


@pytest.fixture(scope="module")
def kw_idx(spark, idx):
    """Keyword (ordinal) doc-values over `role` on the same corpus."""
    d, shard_paths, n_docs, pdf = idx
    from nil_spark.operators.docvalues import (
        keyword_docvalues_dir,
        write_keyword_docvalues,
    )

    if keyword_docvalues_dir(d, "role") is None:
        docs = assign_doc_ids(spark_transcripts(spark, N_TURNS, seed=SEED))
        write_keyword_docvalues(docs, d, ["role"])
    roles = (
        assign_doc_ids(spark_transcripts(spark, N_TURNS, seed=SEED))
        .select("doc_id", "role")
        .toPandas()
    )
    return keyword_docvalues_dir(d, "role"), roles


def _terms_oracle(roles: pd.DataFrame, size: int = 10) -> pd.DataFrame:
    g = (
        roles.dropna(subset=["role"])
        .groupby("role")
        .size()
        .reset_index(name="doc_count")
        .sort_values(["doc_count", "role"], ascending=[False, True])
        .reset_index(drop=True)
    )
    out = g.head(size).copy()
    out.insert(0, "rank", range(1, len(out) + 1))
    out = out.rename(columns={"role": "term"})
    out["total_doc_count"] = int(g["doc_count"].sum())
    return out[["rank", "term", "doc_count", "total_doc_count"]]


def test_terms_agg_matches_oracle(spark, idx, kw_idx):
    from nil_spark.operators.aggs_engine import terms_agg_replica

    d, shard_paths, n_docs, pdf = idx
    kw, roles = kw_idx
    got = (
        terms_agg_replica(spark, kw, n_docs, size=10)
        .toPandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    exp = _terms_oracle(roles)
    assert got.values.tolist() == exp.values.tolist(), (got, exp)


def test_terms_agg_size_and_total(spark, idx, kw_idx):
    from nil_spark.operators.aggs_engine import terms_agg_replica

    d, shard_paths, n_docs, pdf = idx
    kw, roles = kw_idx
    got = terms_agg_replica(spark, kw, n_docs, size=2).toPandas()
    exp = _terms_oracle(roles, size=2)
    assert len(got) == min(2, len(exp))
    # sum_other_doc_count derivable: total - shown
    assert (
        int(got["total_doc_count"].iloc[0]) - int(got["doc_count"].sum())
        == int(exp["total_doc_count"].iloc[0]) - int(exp["doc_count"].sum())
    )


def test_terms_agg_dsl_and_tombstones(spark, idx, kw_idx):
    from nil_spark.operators.aggs_engine import terms_agg_replica

    d, shard_paths, n_docs, pdf = idx
    kw, roles = kw_idx
    ast = parse_query("w00003 AND w00007")
    sdf = spark.createDataFrame(pdf[["doc_id", "ltext"]])
    base = sdf.select(
        "doc_id",
        F.filter(F.split("ltext", "[^a-z0-9]+"), lambda x: x != "").alias(
            "toks"
        ),
    ).withColumn(
        "padded",
        F.concat(F.lit(" "), F.array_join("toks", " "), F.lit(" ")),
    )
    keep = set(
        r[0]
        for r in base.filter(
            compile_spark(ast, F.col("toks"), F.col("padded"))
        )
        .select("doc_id")
        .collect()
    )
    rng = np.random.default_rng(7)
    tombs = np.unique(
        rng.choice(n_docs, size=n_docs // 20, replace=False)
    ).astype(np.int64)
    got = (
        terms_agg_replica(
            spark, kw, n_docs, size=10,
            dsl="w00003 AND w00007", shard_paths=shard_paths, cfg=CFG,
            excluded=tombs, universe_mode="dense",
        )
        .toPandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    sel = roles[
        roles["doc_id"].isin(keep - set(tombs.tolist()))
    ]
    exp = _terms_oracle(sel)
    assert got.values.tolist() == exp.values.tolist(), (got, exp)


def test_terms_agg_metric_subagg(spark, idx, kw_idx):
    from nil_spark.operators.aggs_engine import terms_agg_replica

    d, shard_paths, n_docs, pdf = idx
    kw, roles = kw_idx
    got = (
        terms_agg_replica(
            spark, kw, n_docs, size=10,
            metric_dv_dir=docvalues_dir(d, "turn_idx"),
        )
        .toPandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    j = roles.merge(pdf[["doc_id", "metric"]], on="doc_id")
    g = (
        j.dropna(subset=["role", "metric"])
        .groupby("role")
        .agg(doc_count=("metric", "size"), value_sum=("metric", "sum"))
        .reset_index()
        .sort_values(["doc_count", "role"], ascending=[False, True])
        .reset_index(drop=True)
    )
    assert got["term"].tolist() == g["role"].tolist()
    assert got["doc_count"].tolist() == g["doc_count"].tolist()
    assert np.allclose(
        got["value_sum"], np.round(g["value_sum"].astype(float), 6)
    )
    assert np.allclose(
        got["value_avg"],
        np.round(
            (g["value_sum"] / g["doc_count"]).astype(float), 6
        ),
    )


def test_keyword_sort_replica(spark, idx, kw_idx):
    """Lucene keyword sort: the replica kernel orders matches by
    SortedDocValues ORDINAL (dictionary is sorted, so ordinal order is
    term order), missing last, doc_id ties ascending."""
    from pyspark.sql import functions as SF

    from nil_spark.operators.segments import (
        DOCSTAT_SENTINEL,
        topk_replica_resident,
    )

    d, shard_paths, n_docs, pdf = idx
    kw, roles = kw_idx
    raw = spark.read.parquet(os.path.join(d, "segments"))
    termdict = (
        raw.filter(SF.col("term") != DOCSTAT_SENTINEL)
        .groupBy("term")
        .agg(SF.sum("n_postings").cast("long").alias("df"))
        .toPandas()
    )
    st = (
        raw.filter(SF.col("term") == DOCSTAT_SENTINEL)
        .agg(SF.sum("n_postings").alias("n"),
             SF.sum(SF.element_at("bm_max", 1)).alias("s"))
        .collect()[0]
    )
    avgdl = float(st["s"]) / int(st["n"])

    k = 15
    qpdf = pd.DataFrame({"query_id": [0], "text": ["w00013"], "k": [k]})
    for asc in (True, False):
        got = (
            topk_replica_resident(
                spark, qpdf, shard_paths, termdict, n_docs, avgdl, CFG,
                sort_by={"dv_dir": kw, "kind": "keyword",
                         "ascending": asc},
            )
            .toPandas()
            .sort_values("rank")
            .reset_index(drop=True)
        )
        vocab = sorted(roles["role"].dropna().unique().tolist())
        ordmap = {v: i for i, v in enumerate(vocab)}
        matches = pdf[
            pdf["ltext"].str.split("[^a-z0-9]+").map(
                lambda ts: "w00013" in ts
            )
        ].merge(roles, on="doc_id")
        matches = matches.assign(o=matches["role"].map(ordmap))
        exp = matches.sort_values(
            ["o", "doc_id"], ascending=[asc, True]
        ).head(k)
        assert got["doc_id"].tolist() == exp["doc_id"].tolist(), asc
        assert got["bm25"].tolist() == [float(o) for o in exp["o"]], asc


def test_cli_keyword_sort(spark, tmp_path):
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def run(extra):
        return subprocess.run(
            [sys.executable, os.path.join(repo, "cli_main.py"),
             "--master", "local[2]", "--shuffle-partitions", "4", *extra],
            capture_output=True, text=True, timeout=600, cwd=repo,
        )

    corpus = str(tmp_path / "corpus.parquet")
    spark_transcripts(spark, 500, seed=41).write.mode("overwrite").parquet(
        corpus
    )
    idx_dir = str(tmp_path / "idx")
    r = run(["build", "--input", corpus, "--index-dir", idx_dir,
             "--keyword-docvalues", "role"])
    assert r.returncode == 0, r.stderr
    qp = str(tmp_path / "q.parquet")
    spark.createDataFrame(
        [(0, "w00013 w00042", 8)], "query_id long, text string, k int"
    ).write.mode("overwrite").parquet(qp)
    out = str(tmp_path / "res")
    r = run(["query", "--index-dir", idx_dir, "--topology", "replica",
             "--sort-by", "role:asc", "--queries", qp, "--out", out])
    assert r.returncode == 0, r.stderr
    got = spark.read.parquet(out).toPandas().sort_values("rank")
    assert len(got) > 0
    assert "sort_term" in got.columns
    # terms come back in dictionary (== lexicographic) order
    terms = got["sort_term"].dropna().tolist()
    assert terms == sorted(terms)


def test_sort_search_after_pages(spark, tmp_path_factory):
    """Cursor pagination composes with field sort: reconstructing the
    ranking page-by-page (k=7, cursor = last (sort_value, doc_id))
    equals the single big-k run — numeric field, asc AND desc,
    including docs with MISSING values (NaN sorts last; the cursor
    keeps paging by doc_id inside the missing block)."""
    from pyspark.sql import functions as SF

    from nil_spark.operators.docvalues import docvalues_dir, write_docvalues
    from nil_spark.operators.segments import (
        DOCSTAT_SENTINEL,
        topk_replica_resident,
    )

    d = str(tmp_path_factory.mktemp("sortpage_idx"))
    rows = []
    for i in range(40):
        ts = None if i % 4 == 0 else pd.Timestamp(2024, 1, 1 + (i * 7) % 28)
        rows.append((f"c{i:03d}", 0, "user", f"w00013 x{i % 5}", None, ts))
    pdf = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    docs = assign_doc_ids(
        spark.createDataFrame(
            pdf,
            "conv_id string, turn_idx int, role string, text string, "
            "tool string, ts timestamp",
        )
    )
    import glob

    shard_dir = os.path.join(d, "segments")
    build_partial_segments(
        docs.select("doc_id", "text").repartition(2), CFG
    ).write.mode("overwrite").parquet(shard_dir)
    write_docvalues(docs, d, ["ts"])
    paths = sorted(glob.glob(os.path.join(shard_dir, "part-*.parquet")))
    raw = spark.read.parquet(shard_dir)
    termdict = (
        raw.filter(SF.col("term") != DOCSTAT_SENTINEL)
        .groupBy("term")
        .agg(SF.sum("n_postings").cast("long").alias("df"))
        .toPandas()
    )
    dv = docvalues_dir(d, "ts")

    for asc in (True, False):
        sb = {"dv_dir": dv, "ascending": asc}
        big = (
            topk_replica_resident(
                spark,
                pd.DataFrame({"query_id": [0], "text": ["w00013"], "k": [40]}),
                paths, termdict, 40, 3.0, CFG, sort_by=sb,
            )
            .toPandas().sort_values("rank").reset_index(drop=True)
        )
        assert len(big) == 40
        got_pages = []
        a_s, a_d = float("nan"), -1
        for _guard in range(8):  # ceil(40/7)+2: a cycle fails, not hangs
            page = (
                topk_replica_resident(
                    spark,
                    pd.DataFrame(
                        {"query_id": [0], "text": ["w00013"], "k": [7],
                         "after_score": [a_s], "after_doc": [a_d]}
                    ),
                    paths, termdict, 40, 3.0, CFG, sort_by=sb,
                )
                .toPandas().sort_values("rank").reset_index(drop=True)
            )
            if not len(page):
                break
            got_pages.append(page)
            a_s = float(page["bm25"].iloc[-1])
            a_d = int(page["doc_id"].iloc[-1])
        rebuilt = pd.concat(got_pages, ignore_index=True)
        assert rebuilt["doc_id"].tolist() == big["doc_id"].tolist(), asc
        bb, rr = big["bm25"], rebuilt["bm25"]
        assert ((bb.isna() & rr.isna()) | (bb == rr)).all(), asc


def test_cli_terms_agg(spark, tmp_path):
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def run(extra):
        return subprocess.run(
            [sys.executable, os.path.join(repo, "cli_main.py"),
             "--master", "local[2]", "--shuffle-partitions", "4",
             "--stopword-cutoff", "2.0", *extra],
            capture_output=True, text=True, timeout=600, cwd=repo,
        )

    corpus = str(tmp_path / "corpus.parquet")
    spark_transcripts(spark, 600, seed=31).write.mode("overwrite").parquet(
        corpus
    )
    idx_dir = str(tmp_path / "idx")
    r = run(["build", "--input", corpus, "--index-dir", idx_dir,
             "--keyword-docvalues", "role"])
    assert r.returncode == 0, r.stderr
    out = str(tmp_path / "tagg")
    r = run(["agg", "--index-dir", idx_dir, "--terms-field", "role",
             "--size", "3", "--out", out])
    assert r.returncode == 0, r.stderr
    got = spark.read.parquet(out).toPandas()
    assert len(got) <= 3 and int(got["doc_count"].sum()) > 0
    assert int(got["total_doc_count"].iloc[0]) == 600

    # mutual exclusion is a structured error
    r = run(["agg", "--index-dir", idx_dir, "--terms-field", "role",
             "--field", "ts", "--out", str(tmp_path / "x")])
    assert r.returncode == 2
    import json as _json

    err = _json.loads(r.stderr.strip().splitlines()[-1])
    assert "mutually exclusive" in err["error"]


def test_guards(spark, idx):
    d, shard_paths, n_docs, _ = idx
    dv = docvalues_dir(d, "ts")
    with pytest.raises(ValueError, match="interval_s"):
        date_histogram_replica(spark, dv, n_docs, 0.0)
    with pytest.raises(ValueError, match="shard_paths"):
        date_histogram_replica(spark, dv, n_docs, INTERVAL, dsl="w00003")
    with pytest.raises(ValueError, match="unpruned"):
        date_histogram_replica(
            spark, dv, n_docs, INTERVAL, dsl="w00003",
            shard_paths=shard_paths,
            cfg=EngineConfig(gram_size=1, df_stopword_cutoff=0.5),
        )
    with pytest.raises(ValueError, match="phrases"):
        date_histogram_replica(
            spark, dv, n_docs, INTERVAL, dsl='"w00000 w00001"',
            shard_paths=shard_paths, cfg=CFG,
        )
