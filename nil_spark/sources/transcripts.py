"""Deterministic synthetic transcript corpus + query set (FIXTURES.md).

The engine's primary input shape (BASELINE.json ``input_hint``): a table
of multi-turn conversation / agent transcripts
``(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp)``.  No external data; everything is seed-pinned so the
pure-Python oracle and the Spark engine see byte-identical inputs.

Generator properties (mirroring the reference's planted-clone fixtures,
/root/reference/src/test/resources/examples/FizzBuzz.py:1-23):
 * Zipf(s~1.1) token frequencies over a ~20k vocabulary → hot terms,
   exercising df-based stopword pruning and salted aggregation;
 * ~5% near-duplicate turns (small edits) → LCS verification tier;
 * ~2% exact duplicates → tier-1 short-circuit path;
 * conversations of 2-50 turns, roles cycling user/assistant/tool.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

VOCAB_SIZE = 20_000
ZIPF_S = 1.1
BASE_TS = np.datetime64("2025-01-01T00:00:00")
ROLES = ["user", "assistant", "tool"]
TOOLS = ["search", "python", "browser", "calculator"]


def _vocab() -> np.ndarray:
    return np.array([f"w{i:05d}" for i in range(VOCAB_SIZE)])


def _zipf_p(n: int = VOCAB_SIZE, s: float = ZIPF_S) -> np.ndarray:
    p = 1.0 / np.arange(1, n + 1) ** s
    return p / p.sum()


def gen_transcripts(n_turns: int, seed: int = 42) -> pd.DataFrame:
    """Deterministic transcript table with exactly ``n_turns`` rows."""
    rng = np.random.RandomState(seed)
    vocab = _vocab()
    p = _zipf_p()

    # conversation lengths: 2..50, skewed short
    lens = []
    total = 0
    while total < n_turns:
        ln = int(min(50, 2 + rng.zipf(1.6)))
        lens.append(ln)
        total += ln
    lens[-1] -= total - n_turns
    if lens[-1] < 1:
        lens[-1] = 1  # keep exact row count; a 1-turn tail conv is fine

    # token counts per turn: 5..400, skewed short
    tcounts = np.minimum(400, 5 + rng.exponential(40, size=n_turns).astype(np.int64))
    flat = rng.choice(VOCAB_SIZE, size=int(tcounts.sum()), p=p)

    texts: list[str] = []
    pos = 0
    for i in range(n_turns):
        c = int(tcounts[i])
        toks = vocab[flat[pos : pos + c]]
        pos += c
        r = rng.rand()
        if i > 10 and r < 0.02:  # exact duplicate of an earlier turn
            texts.append(texts[rng.randint(0, i)])
            continue
        if i > 10 and r < 0.07:  # near-duplicate: copy + small edits
            src = texts[rng.randint(0, i)].split(" ")
            src = list(src)
            n_edit = max(1, len(src) // 20)
            for _ in range(n_edit):
                j = rng.randint(0, len(src))
                src[j] = vocab[rng.choice(VOCAB_SIZE, p=p)]
            texts.append(" ".join(src))
            continue
        texts.append(" ".join(toks))

    conv_id = np.concatenate(
        [np.repeat(f"conv{ci:08d}", ln) for ci, ln in enumerate(lens)]
    )
    turn_idx = np.concatenate([np.arange(ln) for ln in lens]).astype(np.int32)
    role = np.array([ROLES[t % 3] for t in turn_idx])
    tool = np.where(
        role == "tool", np.array(TOOLS)[rng.randint(0, len(TOOLS), n_turns)], None
    )
    conv_no = np.concatenate(
        [np.repeat(ci, ln) for ci, ln in enumerate(lens)]
    ).astype("timedelta64[h]")
    ts = BASE_TS + conv_no + (turn_idx * np.timedelta64(13, "s"))

    return pd.DataFrame(
        {
            "conv_id": conv_id,
            "turn_idx": turn_idx,
            "role": role,
            "text": texts,
            "tool": tool,
            "ts": pd.Series(ts),
        }
    )


def gen_queries(transcripts: pd.DataFrame, n_queries: int = 30, k: int = 10, seed: int = 43) -> pd.DataFrame:
    """Reference query set: (a) verbatim snippets (guaranteed hits),
    (b) edited snippets (partial overlap), (c) vocab-random strings."""
    rng = np.random.RandomState(seed)
    vocab = _vocab()
    p = _zipf_p()
    texts = transcripts["text"].tolist()
    rows = []
    for qid in range(n_queries):
        kind = qid % 3
        src = texts[rng.randint(0, len(texts))].split(" ")
        if kind == 0:  # verbatim snippet
            lo = rng.randint(0, max(1, len(src) - 12))
            q = " ".join(src[lo : lo + 12])
        elif kind == 1:  # edited snippet
            lo = rng.randint(0, max(1, len(src) - 12))
            snip = list(src[lo : lo + 12])
            for _ in range(max(1, len(snip) // 4)):
                snip[rng.randint(0, len(snip))] = vocab[rng.choice(VOCAB_SIZE, p=p)]
            q = " ".join(snip)
        else:  # random
            q = " ".join(vocab[rng.choice(VOCAB_SIZE, size=8, p=p)])
        rows.append((qid, q, k))
    return pd.DataFrame(rows, columns=["query_id", "text", "k"]).astype(
        {"query_id": "int64", "k": "int32"}
    )


TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)


def spark_transcripts(spark, n_turns: int, seed: int = 42):
    """Materialize the generated corpus as a Spark DataFrame."""
    return spark.createDataFrame(gen_transcripts(n_turns, seed), schema=TRANSCRIPT_SCHEMA)
