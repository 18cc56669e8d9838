"""Streaming soak (slow): ≥12 micro-batches through stateful dedup
(TTL), incremental absorb, generational compaction, and query probes —
asserting the state store plateaus and latency stays flat.  The
full-size (24-batch) run lives in bench_soak.py / BENCH.md."""

from __future__ import annotations

import pytest

from bench_soak import run_soak

pytestmark = pytest.mark.slow


def test_streaming_soak_state_plateau_and_flat_latency(spark, tmp_path):
    m = run_soak(
        spark,
        str(tmp_path),
        n_batches=12,
        rows_per_batch=250,
        ttl_batches=3,
        compact_every=4,
        latency_every=4,
    )
    sb = m["state_bytes"]
    assert len(sb) == 12
    # plateau: TTL eviction balances arrivals once past the horizon —
    # the last-quarter average must not keep climbing over the
    # mid-stream level (unbounded growth would be ~2x by batch 12)
    mid = sb[5]
    tail = sum(sb[-3:]) / 3
    assert tail <= 1.35 * mid, (sb, mid, tail)
    # state is live and nontrivial
    assert sb[-1] > 0 and m["dedup_dup_rows"] > 0

    # compaction keeps the delta count bounded by the cadence
    assert max(m["uncompacted_deltas"]) <= 4, m["uncompacted_deltas"]
    assert m["compactions"], "compaction never ran"

    # latency flat-ish: final probe within 2.5x of the first (the index
    # has 3x the docs by then; without compaction every term would
    # decode 12 chunk-groups and the probe would blow past this bound)
    lat = m["latency_s"]
    assert lat[-1] <= 2.5 * lat[0], lat
