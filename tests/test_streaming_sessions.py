"""Watermarked streaming session windows vs a pinned pandas oracle:
closed sessions are emitted exactly once (append mode), late-data
tolerance comes from the watermark, and the >= gap boundary semantics
of session_window are pinned explicitly."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from nil_spark.streaming.sessions import sessions_table, streaming_sessionize

GAP_S = 1800


def _events() -> pd.DataFrame:
    rows = []
    eid = 0
    base = np.datetime64("2025-03-01T00:00:00")
    for u in range(8):
        t = base + np.timedelta64(u * 7919, "s")
        # session 1: 3 events, small gaps
        for d in (0, 60, 120):
            rows.append((eid, u, "click", t + np.timedelta64(d, "s"))); eid += 1
        # > gap: session 2 with 2 events
        t2 = t + np.timedelta64(120 + GAP_S + 1, "s")
        for d in (0, 300):
            rows.append((eid, u, "view", t2 + np.timedelta64(d, "s"))); eid += 1
        if u == 3:  # boundary: exactly GAP seconds later -> MERGED
            # (session_window end is inclusive: split only when the gap
            # is strictly greater — same semantics as the batch query)
            rows.append((eid, u, "edge", t2 + np.timedelta64(300 + GAP_S, "s"))); eid += 1
    return pd.DataFrame(rows, columns=["event_id", "user_id", "event_type", "ts"])


def _oracle(ev: pd.DataFrame) -> pd.DataFrame:
    out = []
    for u, g in ev.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        cur = []
        last = None
        for r in g.itertuples():
            if last is not None and (r.ts - last).total_seconds() > GAP_S:
                out.append((u, len(cur), cur[0], cur[-1]))
                cur = []
            cur.append(r.ts)
            last = r.ts
        if cur:
            out.append((u, len(cur), cur[0], cur[-1]))
    return pd.DataFrame(
        out, columns=["user_id", "n_events", "session_start", "session_end"]
    )


def test_streaming_sessions_match_oracle(spark, tmp_path):
    ev = _events()
    in_dir = str(tmp_path / "ev")
    os.makedirs(in_dir)
    ck = str(tmp_path / "ck")
    out_dir = str(tmp_path / "sessions_out")
    spark.createDataFrame(ev).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(in_dir, "arrival0")
    )
    streaming_sessionize(spark, in_dir + "/arrival*", ck, out_dir)
    # sessions can only close once the watermark passes them: push it
    # with a far-future sentinel arrival, then drain again
    sent = pd.DataFrame(
        [(99999, 999, "tick", np.datetime64("2025-06-01T00:00:00"))],
        columns=["event_id", "user_id", "event_type", "ts"],
    )
    spark.createDataFrame(sent).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(in_dir, "arrival1")
    )
    streaming_sessionize(spark, in_dir + "/arrival*", ck, out_dir)

    got = (
        sessions_table(spark, out_dir)
        .toPandas()
        .query("user_id != 999")
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )
    exp = _oracle(ev).sort_values(["user_id", "session_start"]).reset_index(drop=True)
    assert len(got) == len(exp), f"{len(got)} sessions vs {len(exp)}"
    for c in ["user_id", "n_events"]:
        assert (got[c].values == exp[c].values).all(), c
    for c in ["session_start", "session_end"]:
        assert (pd.to_datetime(got[c]).values == pd.to_datetime(exp[c]).values).all(), c
    # the exact-gap boundary event MERGES (strict-> split pinned): the
    # boundary user still has 2 sessions, the second with 3 events
    u3 = got[got.user_id == 3]
    assert u3.shape[0] == 2 and sorted(u3["n_events"]) == [3, 3]
