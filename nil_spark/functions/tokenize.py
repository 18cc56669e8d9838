"""Vectorized tokenization + n-gram shingling (Arrow pandas UDFs).

Reference analog: the lexer/symbol-filter/hash stage
(/root/reference/src/main/kotlin/jp/ac/osaka_u/sdl/nil/usecase/
preprocess/SymbolSeparator.kt:11-41) and n-gram shingling
(entity/TokenSequence.kt:8-11).  The reference tokenizes source code
with JDT/ANTLR; our payload is natural-language transcript text, so the
tokenizer is a pinned regex (lowercase, ``[a-z0-9]+`` runs) applied in
Arrow batches — no per-row Python UDFs, no grammar.

The whole stage is ONE pandas UDF returning a struct ``(dl, terms)`` so
text is tokenized exactly once; everything downstream is JVM-side
DataFrame ops.
"""

from __future__ import annotations

import re
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nil_spark.config import EngineConfig
from nil_spark.functions.hashing import MASK63, MASK64, FNV_PRIME, FNV_OFFSET, ngram_hashes_np

# per-worker token-hash memo: vocabulary is Zipfian, so the hit rate is
# very high; values are pinned FNV-1a so the cache is pure memoization.
_TOKEN_CACHE: dict[str, int] = {}


def _hash_token(tok: str) -> int:
    h = _TOKEN_CACHE.get(tok)
    if h is None:
        h = FNV_OFFSET
        for b in tok.encode("utf-8"):
            h = ((h ^ b) * FNV_PRIME) & MASK64
        h &= MASK63
        _TOKEN_CACHE[tok] = h
    return h


def stem_minimal_english(tok: str) -> str:
    """Pinned plural folding (the published minimal English stemmer —
    Harman; Lucene's EnglishMinimalStemmer shape): strip ONE trailing
    's' when len > 3 and the token doesn't end in 'ss'/'us'/'is'."""
    if len(tok) > 3 and tok[-1] == "s" and tok[-2] not in "sui":
        return tok[:-1]
    return tok


def apply_analyzer(tokens: list[str], cfg: EngineConfig) -> list[str]:
    """The post-tokenize analysis chain (no-op for "standard")."""
    if cfg.analyzer == "minimal_english":
        return [stem_minimal_english(t) for t in tokens]
    if cfg.analyzer != "standard":
        raise ValueError(f"unknown analyzer {cfg.analyzer!r}")
    return tokens


def tokenize_series(texts: pd.Series, cfg: EngineConfig) -> pd.Series:
    """text -> list[str] tokens (pinned: lowercase regex findall, then
    the configured analysis chain).  EVERY engine path — index builds,
    all serving topologies, positional store, clone/verify kernels —
    tokenizes through here, so index and query sides always agree."""
    pat = re.compile(cfg.token_pattern)
    toks = texts.fillna("").str.lower().map(pat.findall)
    if cfg.analyzer != "standard":
        toks = toks.map(lambda ts: apply_analyzer(ts, cfg))
    return toks


def terms_for_tokens(tokens: list[str], cfg: EngineConfig) -> np.ndarray:
    """tokens -> int64 term ids (token hashes, or n-gram rolling hashes
    when gram_size > 1; optionally distinct per the reference's set
    semantics, entity/TokenSequence.kt:11)."""
    th = np.fromiter((_hash_token(t) for t in tokens), dtype=np.int64, count=len(tokens))
    if cfg.gram_size > 1:
        th = ngram_hashes_np(th, cfg.gram_size)
    if cfg.distinct_ngrams:
        th = np.unique(th)
    return th


def make_tokenize_udf(cfg: EngineConfig):
    """Returns a scalar pandas UDF: text -> struct(dl int, terms array<long>).

    ``dl`` is the BM25 document length = raw token count (pinned),
    independent of shingling/distinct.
    """

    @F.pandas_udf("struct<dl:int, terms:array<bigint>>")
    def tok(it: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        for texts in it:
            toks = tokenize_series(texts, cfg)
            dl = toks.map(len).astype("int32")
            terms = toks.map(lambda ts: terms_for_tokens(ts, cfg))
            yield pd.DataFrame({"dl": dl, "terms": terms})

    return tok


def make_term_counts_udf(cfg: EngineConfig):
    """Scalar pandas UDF: text -> struct(dl int,
    tcs array<struct<term bigint, tf int>>) — per-doc (term, tf) pairs
    computed IN the tokenizer (np.unique), so the index build needs no
    (term, doc_id) hash aggregation at all: the 10^12-row groupBy whose
    group count ~= its input count (map-side combine useless) vanishes;
    the only index-build shuffle left is the segment range partition.
    Terms are emitted term-ascending (np.unique order) — deterministic.
    """

    @F.pandas_udf("struct<dl:int, tcs:array<struct<term:bigint, tf:int>>>")
    def tok(it: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        for texts in it:
            toks = tokenize_series(texts, cfg)
            dl = toks.map(len).astype("int32")

            def counts(ts: list[str]):
                th = terms_for_tokens(ts, cfg)
                if cfg.distinct_ngrams:
                    return [(int(t), 1) for t in th]  # already unique+sorted
                u, c = np.unique(th, return_counts=True)
                return list(zip(u.tolist(), c.tolist()))

            yield pd.DataFrame({"dl": dl, "tcs": toks.map(counts)})

    return tok


def with_term_counts(df: DataFrame, cfg: EngineConfig, text_col: str = "text") -> DataFrame:
    """Append ``dl`` and ``tcs`` (per-doc (term, tf) pairs) with the
    min-size scan predicates, mirroring :func:`with_terms`."""
    out = df.withColumn("_tk", make_term_counts_udf(cfg)(F.col(text_col)))
    out = out.withColumn("dl", F.col("_tk.dl")).withColumn("tcs", F.col("_tk.tcs")).drop("_tk")
    # threshold 1 is NOT a no-op: it drops empty-text / zero-token docs
    # (the oracle's >= semantics) — guard on > 0, not > 1
    if cfg.min_chars > 0:
        out = out.filter(F.length(F.col(text_col)) >= cfg.min_chars)
    if cfg.min_tokens > 0:
        out = out.filter(F.col("dl") >= cfg.min_tokens)
    return out


def with_terms(df: DataFrame, cfg: EngineConfig, text_col: str = "text") -> DataFrame:
    """Append ``dl`` (token count) and ``terms`` (array<long> term ids)
    and apply the reference's min-size scan predicates
    (JavaTransformer.kt:40-45: minLine/minToken) *before* any shuffle so
    Catalyst keeps them at the scan."""
    out = df.withColumn("_tk", make_tokenize_udf(cfg)(F.col(text_col)))
    out = out.withColumn("dl", F.col("_tk.dl")).withColumn("terms", F.col("_tk.terms")).drop("_tk")
    # threshold 1 is NOT a no-op: it drops empty-text / zero-token docs
    # (the oracle's >= semantics) — guard on > 0, not > 1
    if cfg.min_chars > 0:
        out = out.filter(F.length(F.col(text_col)) >= cfg.min_chars)
    if cfg.min_tokens > 0:
        out = out.filter(F.col("dl") >= cfg.min_tokens)
    return out
