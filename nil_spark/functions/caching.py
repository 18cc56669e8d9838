"""Persist-lifecycle helpers.

Operators that persist intermediates (shingle tables, banded signatures,
bucketed vectors) must not leak them into a long-lived session's block
manager (the CLI serving path keeps one SparkSession open across many
operator calls).  The operators stay *lazy* — eager materialization
would truncate the logical plans that tests/test_plans.py inspects — so
the unpersist can't be a try/finally around construction.  Instead the
cached inputs are tethered to the *returned* DataFrame: when the result
object is garbage-collected (consumed and dropped by the caller), the
intermediates are unpersisted.

``unpersist`` is always safe — a released cache is recomputed from
lineage, never wrong — so a conservative-early release (caller derived a
child frame and dropped the parent) costs only recompute time.
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame


def tether(out: DataFrame, *cached: DataFrame) -> DataFrame:
    """Unpersist ``cached`` when ``out`` is garbage-collected.

    The finalizer holds references to the cached frames (not to ``out``),
    calls ``unpersist(blocking=False)`` on each, and swallows errors from
    an already-stopped SparkContext at interpreter shutdown.
    """
    held = list(cached)

    def _release(dfs=held):
        for d in dfs:
            try:
                d.unpersist()
            except Exception:
                pass

    weakref.finalize(out, _release)
    return out
