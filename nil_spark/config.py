"""Engine configuration.

Mirrors the reference's CLI config surface (NILConfig:
/root/reference/src/main/kotlin/jp/ac/osaka_u/sdl/nil/NILConfig.kt:5-21 —
minLine=6, minToken=50, gramSize=5, partitionNum=10,
filtrationThreshold=10, verificationThreshold=70) re-expressed for a
Spark engine over transcript tables.  All hash/scoring constants are
*pinned*: rank-identity between the Spark engine and the pure-Python
oracle is a correctness requirement (SURVEY.md §2.8).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class EngineConfig:
    # ---- tokenization / shingling (reference: gramSize=5, minToken=50) ----
    gram_size: int = 5            # n-gram window; 1 = unigram BM25 terms
    min_tokens: int = 1           # drop docs with fewer tokens (ref minToken)
    min_chars: int = 1            # drop docs shorter than this (ref minLine analog)
    token_pattern: str = r"[a-z0-9]+"  # applied to lowercased text
    distinct_ngrams: bool = False  # reference collapses tf to 1 (TokenSequence.kt:11);
                                   # we keep tf for BM25 (superset semantics)
    # analysis chain applied AFTER tokenization, at BOTH index and query
    # time (Lucene analyzer semantics — the same chain must see both
    # sides or terms never meet):
    #  * "standard"        — tokens as-is (the pinned default);
    #  * "minimal_english" — plural folding per the published minimal
    #    English stemmer (Harman, "How Effective Is Suffixing?"; the
    #    shape Lucene ships as EnglishMinimalStemmer): strip ONE
    #    trailing 's' when len > 3 and the token doesn't end in
    #    'ss'/'us'/'is'.  Pure string ops — expressible identically in
    #    Python, Spark SQL, and DuckDB SQL.
    # Part of the index config fingerprint when non-standard.
    analyzer: str = "standard"

    # ---- BM25 (pinned) ----
    bm25_k1: float = 1.2
    bm25_b: float = 0.75

    # ---- LM Dirichlet similarity module (query-time; NOT part of the
    # index fingerprint — like Lucene's setSimilarity, the same index
    # serves either scoring) ----
    lmd_mu: float = 2000.0

    # ---- candidate filter / verify thresholds (reference defaults) ----
    filtration_threshold: int = 10    # % overlap to survive filtration (ref -f 10)
    verification_threshold: int = 70  # % to accept (ref -v 70)

    # ---- index layout / scale knobs ----
    num_segments: int = 32        # term-range segments of the merged index
    block_size: int = 128         # postings per block (block-max metadata)
    df_stopword_cutoff: float = 0.5  # prune terms with df > cutoff * N (set >1 to disable)
    # hot-term skew: segments are range-partitioned on the composite
    # (term, doc_id) key — the doc_id dimension is the salt, splitting a
    # hot term's postings across adjacent partitions in doc order with
    # no second-stage merge (chunks are self-contained; see segments.py)

    # ---- runtime ----
    shuffle_partitions: int = 32

    # ---- pinned hash constants (see functions/hashing.py) ----
    hash_seed: int = field(default=0x9E3779B97F4A7C15, repr=False)

    def with_(self, **kw) -> "EngineConfig":
        from dataclasses import replace

        return replace(self, **kw)


DEFAULT = EngineConfig()
