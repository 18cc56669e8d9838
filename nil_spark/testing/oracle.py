"""Pure-Python single-process oracle engine.

The in-repo analog of the reference's Python analysis port
(/root/reference/analysis/similarity_calculator.py:23-166) with its
``hash()`` nondeterminism fixed (similarity_calculator.py:96): every
hash here is the same pinned FNV/polynomial function the Spark pandas
UDFs use, so "oracle == engine" is a meaningful rank-identity check,
not a coincidence of one process's hash salt.

Covers: tokenize → terms → postings/docstats → BM25 top-k (ties by
ascending doc_id) → overlap-similarity clone detection → Hunt-Szymanski
LCS verification (port of /root/reference/src/main/kotlin/jp/ac/
osaka_u/sdl/nil/entity/HuntSzymanskiLCS.kt:8-34).
"""

from __future__ import annotations

import re
from bisect import bisect_left
from collections import Counter, defaultdict

import pandas as pd

from nil_spark.config import EngineConfig
from nil_spark.functions.hashing import fnv1a64, ngram_hash
from nil_spark.operators.query import SCORE_DECIMALS, idf_py


def tokenize(text: str, cfg: EngineConfig) -> list[str]:
    from nil_spark.functions.tokenize import apply_analyzer

    return apply_analyzer(
        re.findall(cfg.token_pattern, (text or "").lower()), cfg
    )


def terms_of(text: str, cfg: EngineConfig) -> list[int]:
    toks = tokenize(text, cfg)
    hs = [fnv1a64(t) for t in toks]
    if cfg.gram_size > 1:
        hs = [
            ngram_hash(hs, i, cfg.gram_size)
            for i in range(len(hs) - cfg.gram_size + 1)
        ]
    if cfg.distinct_ngrams:
        hs = sorted(set(hs))
    return hs


class OracleIndex:
    """In-memory index over (doc_id -> text), doc ids dense by stable
    (conv_id, turn_idx) order."""

    def __init__(self, transcripts: pd.DataFrame, cfg: EngineConfig):
        self.cfg = cfg
        t = transcripts.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
        self.doc_text = t["text"].tolist()
        self.tokens = [tokenize(x, cfg) for x in self.doc_text]
        self.dl = [len(x) for x in self.tokens]
        self.terms = [terms_of(x, cfg) for x in self.doc_text]
        # min-size scan predicates (reference T4/T5: minLine/minToken,
        # AntlrTransformer.kt:41-47) — filtered docs keep their ids but
        # are absent from postings AND docstats
        self.kept = [
            did
            for did in range(len(self.doc_text))
            if len(self.doc_text[did] or "") >= cfg.min_chars
            and self.dl[did] >= cfg.min_tokens
        ]
        self.postings: dict[int, dict[int, int]] = defaultdict(dict)
        for did in self.kept:
            for term, tf in Counter(self.terms[did]).items():
                self.postings[term][did] = tf
        self.n_docs = len(self.kept)
        self.avgdl = sum(self.dl[d] for d in self.kept) / max(1, self.n_docs)
        # df-based stopword pruning, identical to the engine
        cutoff = cfg.df_stopword_cutoff
        if cutoff is not None and cutoff < 1.0:
            lim = int(cutoff * self.n_docs)
            self.pruned = {t for t, pl in self.postings.items() if len(pl) > lim}
        else:
            self.pruned = set()

    def bm25_topk(self, query_text: str, k: int) -> list[tuple[int, int, float]]:
        """[(rank, doc_id, bm25)] — pinned scoring, ties by doc_id."""
        cfg = self.cfg
        qterms = sorted(set(terms_of(query_text, cfg)))
        scores: dict[int, float] = defaultdict(float)
        for term in qterms:
            if term in self.pruned or term not in self.postings:
                continue
            pl = self.postings[term]
            idf = idf_py(len(pl), self.n_docs)
            for did, tf in pl.items():
                dl = self.dl[did]
                tfn = (tf * (cfg.bm25_k1 + 1.0)) / (
                    tf
                    + cfg.bm25_k1
                    * (1.0 - cfg.bm25_b + cfg.bm25_b * dl / self.avgdl)
                )
                scores[did] += idf * tfn
        ranked = sorted(
            ((round(s, SCORE_DECIMALS), did) for did, s in scores.items()),
            key=lambda x: (-x[0], x[1]),
        )[:k]
        return [(i + 1, did, s) for i, (s, did) in enumerate(ranked)]

    def topk_frame(self, queries: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for _, q in queries.iterrows():
            for rank, did, s in self.bm25_topk(q["text"], int(q["k"])):
                rows.append((int(q["query_id"]), rank, did, s))
        return pd.DataFrame(rows, columns=["query_id", "rank", "doc_id", "bm25"])

    def lmd_topk(
        self, query_text: str, k: int, mu: float = 2000.0
    ) -> list[tuple[int, int, float]]:
        """[(rank, doc_id, score)] under LM Dirichlet similarity
        (Lucene LMDirichletSimilarity): per matched term
        ln(1 + tf/(mu*cf_t/T)) + ln(mu/(dl+mu)) with cf_t the term's
        collection frequency over indexed docs and T the indexed
        token total.  Same rounding/tie pins as bm25_topk."""
        import math

        qterms = sorted(set(terms_of(query_text, self.cfg)))
        total = float(sum(self.dl[d] for d in self.kept))
        scores: dict[int, float] = defaultdict(float)
        for term in qterms:
            if term in self.pruned or term not in self.postings:
                continue
            pl = self.postings[term]
            cf = float(sum(pl.values()))
            for did, tf in pl.items():
                scores[did] += math.log(1.0 + tf / (mu * cf / total)) + math.log(
                    mu / (self.dl[did] + mu)
                )
        ranked = sorted(
            ((round(s, SCORE_DECIMALS), did) for did, s in scores.items()),
            key=lambda x: (-x[0], x[1]),
        )[:k]
        return [(i + 1, did, s) for i, (s, did) in enumerate(ranked)]

    def _bm25_raw(self, query_text: str) -> dict:
        """Unrounded BM25 totals per matching doc (shared by the
        combined-score paths, which round AFTER their multiply)."""
        cfg = self.cfg
        scores: dict[int, float] = defaultdict(float)
        for term in sorted(set(terms_of(query_text, cfg))):
            if term in self.pruned or term not in self.postings:
                continue
            pl = self.postings[term]
            idf = idf_py(len(pl), self.n_docs)
            for did, tf in pl.items():
                dl = self.dl[did]
                tfn = (tf * (cfg.bm25_k1 + 1.0)) / (
                    tf
                    + cfg.bm25_k1
                    * (1.0 - cfg.bm25_b + cfg.bm25_b * dl / self.avgdl)
                )
                scores[did] += idf * tfn
        return scores

    def decay_topk(
        self,
        query_text: str,
        k: int,
        values: dict,
        origin: float,
        sigma: float,
    ) -> list[tuple[int, int, float]]:
        """function_score gaussian decay (ES gauss): combined =
        bm25 * exp(-(v-origin)^2/(2 sigma^2)), missing value = factor
        1.0; rounded (SCORE_DECIMALS) before ranking, ties by doc_id."""
        import math

        ranked = []
        for did, s in self._bm25_raw(query_text).items():
            v = values.get(did)
            f = (
                1.0
                if v is None
                else math.exp(-((v - origin) ** 2) / (2.0 * sigma * sigma))
            )
            ranked.append((round(s * f, SCORE_DECIMALS), did))
        ranked.sort(key=lambda x: (-x[0], x[1]))
        return [(i + 1, did, s) for i, (s, did) in enumerate(ranked[:k])]

    def sortfield_topk(
        self, query_text: str, k: int, values: dict, ascending: bool = False
    ) -> list[tuple[int, int, float]]:
        """Sort-by-field over matching docs (ES sort clause): docs
        matching >= 1 unpruned query term ranked by the field value
        (missing last in either direction), ties by doc_id."""
        cand = set()
        for term in sorted(set(terms_of(query_text, self.cfg))):
            if term in self.pruned or term not in self.postings:
                continue
            cand.update(self.postings[term])
        missing = float("inf") if ascending else float("-inf")
        key = (
            (lambda d: (values.get(d, missing), d))
            if ascending
            else (lambda d: (-values.get(d, missing), d))
        )
        ranked = sorted(cand, key=key)[:k]
        return [
            (
                i + 1,
                did,
                round(values[did], SCORE_DECIMALS)
                if did in values
                else float("nan"),
            )
            for i, did in enumerate(ranked)
        ]

    def lmd_topk_frame(
        self, queries: pd.DataFrame, mu: float = 2000.0
    ) -> pd.DataFrame:
        rows = []
        for _, q in queries.iterrows():
            for rank, did, s in self.lmd_topk(q["text"], int(q["k"]), mu):
                rows.append((int(q["query_id"]), rank, did, s))
        return pd.DataFrame(rows, columns=["query_id", "rank", "doc_id", "score"])

    def explain_parts(
        self, query_text: str, k: int, excluded: set[int] | None = None
    ) -> list[tuple[int, int, int, float, float, float]]:
        """Per-term score breakdown of the top-k: [(rank, doc_id, term,
        idf, contrib, bm25)] — ``bm25_topk``'s scoring BEFORE its sum,
        restricted to the winners.  idf/contrib rounded like every
        emitted score (SCORE_DECIMALS); the engine explain kernel must
        match these rows exactly."""
        cfg = self.cfg
        excluded = excluded or set()
        qterms = sorted(set(terms_of(query_text, cfg)))
        scores: dict[int, float] = defaultdict(float)
        parts: dict[int, list[tuple[int, float, float]]] = defaultdict(list)
        for term in qterms:
            if term in self.pruned or term not in self.postings:
                continue
            pl = self.postings[term]
            idf = idf_py(len(pl), self.n_docs)
            for did, tf in pl.items():
                if did in excluded:
                    continue
                dl = self.dl[did]
                tfn = (tf * (cfg.bm25_k1 + 1.0)) / (
                    tf
                    + cfg.bm25_k1
                    * (1.0 - cfg.bm25_b + cfg.bm25_b * dl / self.avgdl)
                )
                scores[did] += idf * tfn
                parts[did].append((term, idf, idf * tfn))
        ranked = sorted(
            ((round(s, SCORE_DECIMALS), did) for did, s in scores.items()),
            key=lambda x: (-x[0], x[1]),
        )[:k]
        out = []
        for i, (s, did) in enumerate(ranked):
            for term, idf, contrib in parts[did]:
                out.append(
                    (i + 1, did, term,
                     round(idf, SCORE_DECIMALS), round(contrib, SCORE_DECIMALS), s)
                )
        return out


def overlap_similarity(a: set[int], b: set[int]) -> int:
    """Reference scoring fn: |A∩B|·100 / min(|A|,|B|), integer division
    (NGramSimilarity.kt:6-7)."""
    if not a or not b:
        return 0
    return len(a & b) * 100 // min(len(a), len(b))


def hunt_szymanski_lcs(a: list[int], b: list[int]) -> int:
    """O((r+n)log n) LCS length — same algorithm as the reference's
    HuntSzymanskiLCS.kt:8-34 (inverted index of the longer sequence +
    patience-style binary search)."""
    if len(a) > len(b):
        a, b = b, a
    pos: dict[int, list[int]] = defaultdict(list)
    for j in range(len(b) - 1, -1, -1):
        pos[b[j]].append(j)  # descending j
    tails: list[int] = []
    for x in a:
        for j in pos.get(x, ()):  # descending order keeps this correct
            i = bisect_left(tails, j)
            if i == len(tails):
                tails.append(j)
            else:
                tails[i] = j
    return len(tails)


def lcs_similarity(a: list[int], b: list[int]) -> int:
    """lcs·100 / min(|a|,|b|), integer division (LCSBasedVerification.kt:9-10)."""
    if not a or not b:
        return 0
    return hunt_szymanski_lcs(a, b) * 100 // min(len(a), len(b))


def naive_lcs(a: list[int], b: list[int]) -> int:
    """O(NM) DP test oracle (NaiveLCS.kt:6-23)."""
    m, n = len(a), len(b)
    prev = [0] * (n + 1)
    for i in range(1, m + 1):
        cur = [0] * (n + 1)
        for j in range(1, n + 1):
            cur[j] = prev[j - 1] + 1 if a[i - 1] == b[j - 1] else max(prev[j], cur[j - 1])
        prev = cur
    return prev[n]


def track_cascade(
    old: pd.DataFrame,
    new: pd.DataFrame,
    cfg: EngineConfig,
    sig_cols: list[str],
    use_lcs: bool = True,
) -> list[tuple[int, int, str, int | None, int | None]]:
    """Pure-Python oracle for operators/tracking.track_snapshots —
    the P4 cascade (method_tracker.py:239-375) with the repo's pinned
    determinism rules: positional (rank-by-id) pairing within equal-key
    groups, and mutual-best assignment for the similarity stage.

    ``old``/``new`` carry doc_id, text and the signature columns.
    Returns [(id_old, id_new, stage, ngram_sim, lcs_sim)].
    """
    import hashlib

    out: list[tuple[int, int, str, int | None, int | None]] = []
    mo: set[int] = set()
    mn: set[int] = set()

    def positional(stage: str, keyfn, o_df, n_df):
        go: dict = defaultdict(list)
        gn: dict = defaultdict(list)
        for r in o_df.sort_values("doc_id").itertuples():
            go[keyfn(r)].append(int(r.doc_id))
        for r in n_df.sort_values("doc_id").itertuples():
            gn[keyfn(r)].append(int(r.doc_id))
        for key, olds in go.items():
            for a, b in zip(olds, gn.get(key, [])):
                out.append((a, b, stage, None, None))
                mo.add(a)
                mn.add(b)

    if sig_cols:
        positional("exact", lambda r: tuple(getattr(r, c) for c in sig_cols), old, new)
    old1 = old[~old["doc_id"].isin(mo)]
    new1 = new[~new["doc_id"].isin(mn)]
    positional(
        "content_hash",
        lambda r: hashlib.md5((r.text or "").encode("utf-8")).hexdigest(),
        old1,
        new1,
    )
    old2 = old1[~old1["doc_id"].isin(mo)]
    new2 = new1[~new1["doc_id"].isin(mn)]

    dcfg = cfg.with_(distinct_ngrams=True)
    ot = {int(r.doc_id): set(terms_of(r.text, dcfg)) for r in old2.itertuples()}
    nt = {int(r.doc_id): set(terms_of(r.text, dcfg)) for r in new2.itertuples()}
    # df-based hot-term pruning over the union vocabulary (mirrors
    # bipartite_candidates: sizes from full term sets, inter over pruned)
    pruned: set[int] = set()
    cutoff = cfg.df_stopword_cutoff
    if cutoff is not None and cutoff < 1.0:
        n_docs = len(ot) + len(nt)
        dfc: Counter = Counter()
        for ts in list(ot.values()) + list(nt.values()):
            dfc.update(ts)
        lim = int(cutoff * n_docs)
        pruned = {t for t, c in dfc.items() if c > lim}

    inv: dict[int, list[int]] = defaultdict(list)
    for nid, ts in nt.items():
        for t in ts - pruned:
            inv[t].append(nid)
    tok_old = {
        int(r.doc_id): [fnv1a64(t) for t in tokenize(r.text, cfg)]
        for r in old2.itertuples()
    }
    tok_new = {
        int(r.doc_id): [fnv1a64(t) for t in tokenize(r.text, cfg)]
        for r in new2.itertuples()
    }
    cands: list[tuple[int, int, int, int | None]] = []
    for oid, ts in ot.items():
        if not ts:
            continue
        counts: Counter = Counter()
        for t in ts - pruned:
            for nid in inv[t]:
                counts[nid] += 1
        for nid, inter in counts.items():
            if not nt[nid]:
                continue
            sim = inter * 100 // min(len(ts), len(nt[nid]))
            if sim < cfg.filtration_threshold:
                continue
            if use_lcs:
                ls = lcs_similarity(tok_old[oid], tok_new[nid])
                if ls < cfg.verification_threshold:
                    continue
                cands.append((oid, nid, sim, ls))
            else:
                cands.append((oid, nid, sim, None))

    def order(c):  # (lcs desc, ngram desc) then id tiebreaks per side
        return (-(c[3] or 0), -c[2]) if use_lcs else (-c[2],)

    best_o = {}
    best_n = {}
    for c in cands:
        if c[0] not in best_o or (order(c), c[1]) < (order(best_o[c[0]]), best_o[c[0]][1]):
            best_o[c[0]] = c
        if c[1] not in best_n or (order(c), c[0]) < (order(best_n[c[1]]), best_n[c[1]][0]):
            best_n[c[1]] = c
    for c in cands:
        if best_o.get(c[0]) is c and best_n.get(c[1]) is c:
            out.append((c[0], c[1], "similarity", c[2], c[3]))
    return sorted(out)


def clone_pairs(index: OracleIndex) -> list[tuple[int, int, int, int | None]]:
    """Two-tier filter-then-verify self-detection over the corpus —
    oracle for the reference's OptimizedCloneDetection.kt:17-56 pipeline:
    locate (shared distinct terms) → filtration (θ) → n-gram verify (δ,
    tier-1 short-circuit: lcs=None) → LCS verify (δ)."""
    cfg = index.cfg
    term_sets = [set(t) for t in index.terms]
    # token-hash sequences for LCS (the reference verifies on token
    # sequences, not n-grams: OptimizedCloneDetection.kt:36-53)
    tok_hashes = [[fnv1a64(t) for t in toks] for toks in index.tokens]
    inv: dict[int, list[int]] = defaultdict(list)
    for did in index.kept:
        for term in term_sets[did]:
            inv[term].append(did)
    out = []
    for did in index.kept:
        counts: Counter = Counter()
        for term in term_sets[did]:
            for other in inv[term]:
                if other < did:  # triangular guard (NGramBasedLocation.kt:16)
                    counts[other] += 1
        for other, inter in counts.items():
            na, nb = len(term_sets[did]), len(term_sets[other])
            if not na or not nb:
                continue
            sim = inter * 100 // min(na, nb)
            if sim < cfg.filtration_threshold:
                continue  # filtration (NGramBasedFiltration.kt:6-12)
            if sim >= cfg.verification_threshold:
                out.append((other, did, sim, None))  # tier-1 accept
                continue
            ls = lcs_similarity(tok_hashes[other], tok_hashes[did])
            if ls >= cfg.verification_threshold:
                out.append((other, did, sim, ls))
    return sorted(out)
