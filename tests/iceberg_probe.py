"""Subprocess body for tests/test_iceberg.py — needs a FRESH JVM because
``spark.jars.packages`` only resolves at SparkContext creation.

Attempts: resolve the Iceberg Spark runtime, create a local hadoop
catalog, write the transcript fixture as an Iceberg table, read it back
through the cli's ``read_docs(..., fmt="iceberg")`` path, build the
index, and answer one query.  Prints ICEBERG_OK on success or
ICEBERG_UNAVAILABLE: <reason> when the environment cannot provide the
runtime jar (this sandbox has no network route to Maven Central —
``curl https://repo1.maven.org`` → exit 6, couldn't resolve host).
"""

from __future__ import annotations

import sys
import traceback


def _find_local_runtime_jar() -> str | None:
    """Search the usual offline locations for an Iceberg Spark runtime
    jar before falling back to network resolution: ivy/coursier caches,
    $SPARK_HOME/jars, and the pyspark wheel's jar dir.  Returns a path
    or None — so the probe auto-activates the moment any cache on this
    machine acquires the jar, without code changes."""
    import glob
    import os

    spark_home = os.environ.get("SPARK_HOME", "")
    try:
        import pyspark

        pyspark_jars = os.path.join(os.path.dirname(pyspark.__file__), "jars")
    except Exception:
        pyspark_jars = ""
    roots = [
        os.path.expanduser("~/.ivy2"),
        os.path.expanduser("~/.m2"),
        os.path.expanduser("~/.cache/coursier"),
        os.path.join(spark_home, "jars") if spark_home else "",
        pyspark_jars,
    ]
    for root in filter(None, roots):
        hits = glob.glob(
            os.path.join(root, "**", "iceberg-spark-runtime*.jar"), recursive=True
        )
        if hits:
            return sorted(hits)[-1]
    return None


def main() -> int:
    warehouse = sys.argv[1]
    pkg = "org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.10.0"
    local_jar = _find_local_runtime_jar()
    try:
        from pyspark.sql import SparkSession

        builder = SparkSession.builder.master("local[2]").appName("iceberg_probe")
        if local_jar:
            builder = builder.config("spark.jars", local_jar)
        else:
            builder = builder.config("spark.jars.packages", pkg)
        spark = (
            builder
            .config(
                "spark.sql.extensions",
                "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
            )
            .config("spark.sql.catalog.local", "org.apache.iceberg.spark.SparkCatalog")
            .config("spark.sql.catalog.local.type", "hadoop")
            .config("spark.sql.catalog.local.warehouse", warehouse)
            .config("spark.sql.shuffle.partitions", "4")
            .getOrCreate()
        )
    except Exception as e:  # jar resolution happens here (ivy, needs network)
        print(
            f"ICEBERG_UNAVAILABLE: local_jar={local_jar!r} "
            f"(searched ivy2/m2/coursier/SPARK_HOME/pyspark jars) "
            f"{type(e).__name__}: {e}"
        )
        return 0
    try:
        from nil_spark.cli import read_docs
        from nil_spark.config import EngineConfig
        from nil_spark.operators.docids import assign_doc_ids
        from nil_spark.operators.index import build_index
        from nil_spark.operators.query import bm25_topk
        from nil_spark.sources.transcripts import (
            TRANSCRIPT_SCHEMA,
            gen_queries,
            gen_transcripts,
        )

        pdf = gen_transcripts(500, seed=11)
        spark.createDataFrame(pdf, schema=TRANSCRIPT_SCHEMA).writeTo(
            "local.db.transcripts"
        ).using("iceberg").createOrReplace()

        docs = read_docs(spark, "local.db.transcripts", "iceberg")
        assert docs.count() == len(pdf)
        cfg = EngineConfig(gram_size=1)
        idx = build_index(assign_doc_ids(docs, ["conv_id", "turn_idx"]), cfg)
        q = gen_queries(pdf, n_queries=3, k=5, seed=12)
        out = bm25_topk(
            spark.createDataFrame(q, "query_id long, text string, k int"), idx, cfg
        )
        n = out.count()
        assert n > 0
        print(f"ICEBERG_OK rows={n} n_docs={idx['n_docs']}")
        return 0
    except Exception:
        traceback.print_exc()
        print("ICEBERG_FAILED")
        return 1
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
