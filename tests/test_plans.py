"""Plan-shape regression guards: the scale properties the engine claims
must be visible in the physical plans Catalyst actually produces —
no accidental cartesian products, small sides broadcast, filters pushed
to the parquet scan."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"

# exact brute-force baseline is the one deliberate all-pairs operator
CARTESIAN_OK = {"ann_cosine_topk"}


def _plan(df) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


ALL = sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("name", ALL)
def test_no_accidental_cartesian(spark, name):
    df = entry_mod.queries()[name](spark, SF_DIR)
    plan = _plan(df)
    if name in CARTESIAN_OK:
        return
    assert "CartesianProduct" not in plan, (
        f"{name} plans a cartesian product:\n{plan[:4000]}"
    )


def test_bm25_broadcasts_query_side(spark):
    plan = _plan(entry_mod.queries()["bm25_topk"](spark, SF_DIR))
    assert "BroadcastExchange" in plan or "BroadcastHashJoin" in plan, plan[:3000]


def test_snapshot_diff_pushes_source_filter(spark):
    plan = _plan(entry_mod.queries()["snapshot_diff"](spark, SF_DIR))
    assert "PushedFilters" in plan and "src0" in plan, plan[:3000]


def test_doc_stats_prunes_scan_columns(spark):
    """A 2-column aggregate must not read the whole documents schema."""
    plan = _plan(entry_mod.queries()["doc_stats"](spark, SF_DIR))
    read = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read, plan[:2000]
    assert "lang" not in read[0] and "source" not in read[0], read[0]
