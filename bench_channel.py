"""JVM↔Python Arrow channel saturation proof (BENCH.md appendix).

Round-1 finding: on this sandbox the JVM→Python Arrow channel delivers
~120 MB/s AGGREGATE regardless of core count, because all local[k]
threads share one loopback channel + one memory bus; on a real cluster
each executor has its own.  This script produces the two measurements
that turn that claim into an accounting:

1. **Channel throughput at each parallelism level** — a passthrough
   ``mapInPandas`` over a JVM-synthesized text relation (no disk scan in
   the loop), timed in a fresh JVM per level.
2. **Byte-volume accounting for the fused build** — text bytes that
   must enter Python (Arrow-channel path) vs compressed blob bytes that
   must exit (both paths), measured on the actual corpus + actual
   segment output.

Lower-bound channel seconds per path = bytes_crossing / channel_MBps.
Compare with the measured build times in BENCH.md: when the bound is a
large share of the build time at 4N but not at N, the channel — not the
engine — is what caps the Arrow-channel path's scaling, and the
file-direct path (text never crosses) is the cluster-correct design.

Usage: python bench_channel.py   (env: NIL_CHAN_MB, NIL_CHAN_TURNS)
Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

TARGET_MB = int(os.environ.get("NIL_CHAN_MB", "400"))
TURNS = int(os.environ.get("NIL_CHAN_TURNS", "300000"))


def channel_worker(cores: int) -> None:
    from pyspark.sql import functions as F

    from nil_spark.session import get_spark

    spark = get_spark(
        app=f"chan_{cores}", master=f"local[{cores}]", shuffle_partitions=cores
    )
    # ~256 bytes/row, synthesized JVM-side (no scan in the timed loop)
    bytes_per_row = 256
    n_rows = TARGET_MB * 1_000_000 // bytes_per_row
    df = (
        spark.range(n_rows)
        .repartition(cores)
        .select(
            F.concat(
                *[
                    F.md5(F.concat(F.col("id").cast("string"), F.lit(str(i))))
                    for i in range(8)
                ]
            ).alias("text")
        )
        .persist()
    )
    df.count()  # materialize the cache; timed loop is cache -> Python -> noop

    def passthrough(it):
        for pdf in it:
            yield pdf[["text"]].head(1)  # ship IN fully, return ~nothing

    shipped = df.selectExpr("sum(octet_length(text))").collect()[0][0]
    # warm-up (codegen + worker spawn)
    df.limit(50_000).mapInPandas(passthrough, schema="text string").write.format(
        "noop"
    ).mode("overwrite").save()
    t0 = time.perf_counter()
    df.mapInPandas(passthrough, schema="text string").write.format("noop").mode(
        "overwrite"
    ).save()
    dt = time.perf_counter() - t0
    print(
        "CHAN_RESULT "
        + json.dumps(
            {
                "cores": cores,
                "mb": round(shipped / 1e6, 1),
                "seconds": round(dt, 3),
                "mbps": round(shipped / 1e6 / dt, 1),
            }
        )
    )
    spark.stop()


def accounting() -> dict:
    """Text-bytes-in vs blob-bytes-out for the fused build on the real
    corpus (TURNS rows, seed 42)."""
    import numpy as np

    from nil_spark.config import EngineConfig
    from nil_spark.operators.docids import assign_doc_ids
    from nil_spark.operators.segments import build_partial_segments
    from nil_spark.session import get_spark
    from nil_spark.sources.transcripts import gen_transcripts

    from pyspark.sql import functions as F

    spark = get_spark(app="chan_acct", master="local[8]", shuffle_partitions=8)
    cfg = EngineConfig(gram_size=1, num_segments=8)
    pdf = gen_transcripts(TURNS, seed=42)
    text_bytes = int(pdf["text"].str.encode("utf-8").str.len().sum())
    docs = assign_doc_ids(spark.createDataFrame(pdf).repartition(8))
    segs = build_partial_segments(docs, cfg)
    row = segs.select(
        F.sum(
            F.octet_length("doc_blob")
            + F.octet_length("tf_blob")
            + F.octet_length("dl_blob")
            + F.size("bm_first") * 8
            + F.size("bm_max") * 8
        ).alias("blob_bytes")
    ).collect()[0]
    spark.stop()
    return {
        "turns": TURNS,
        "text_mb_in": round(text_bytes / 1e6, 1),
        "blob_mb_out": round(int(row["blob_bytes"]) / 1e6, 1),
    }


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--worker":
        channel_worker(int(sys.argv[2]))
        return
    levels = {}
    for cores in (2, 8, 32):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker", str(cores)],
            capture_output=True, text=True, timeout=1200,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        for line in out.stdout.splitlines():
            if line.startswith("CHAN_RESULT "):
                levels[cores] = json.loads(line[len("CHAN_RESULT "):])
        if cores not in levels:
            sys.stderr.write(out.stdout[-2000:] + out.stderr[-3000:])
            raise RuntimeError(f"channel worker {cores} failed")
    acct = accounting()
    mbps8 = levels[8]["mbps"]
    result = {
        "metric": "arrow_channel_saturation",
        "channel": levels,
        "fused_build_accounting": acct,
        "derived": {
            "channel_path_bytes_mb": round(
                acct["text_mb_in"] + acct["blob_mb_out"], 1
            ),
            "filedirect_path_bytes_mb": acct["blob_mb_out"],
            "channel_seconds_lower_bound_at_8c": round(
                (acct["text_mb_in"] + acct["blob_mb_out"]) / mbps8, 2
            ),
            "filedirect_seconds_lower_bound_at_8c": round(
                acct["blob_mb_out"] / mbps8, 2
            ),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
