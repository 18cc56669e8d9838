"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All implementations live in ``nil_spark/plans/entry_queries.py``; this
module is a thin adapter so the engine package stays importable on its
own via ``spark-submit --py-files``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from nil_spark.plans import entry_queries as EQ


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: BM25 top-k over documents at sf0.001."""
    return EQ.q_bm25_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return EQ.queries()


def oracle_sql() -> dict[str, str]:
    return EQ.oracle_sql()
