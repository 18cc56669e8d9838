"""Streaming BM25 query serving: queries arrive as a Structured
Streaming source; each micro-batch is answered rank-identically against
a fixed index via the replica-resident path and written to an
idempotent, batch_id-keyed result sink.

This closes the serving side of the streaming story (incremental.py
builds the index from a stream; this serves a stream against it): a
production deployment tails a query log topic and emits top-k result
files per micro-batch with exactly-once output semantics.

Exactly-once: ``foreachBatch`` is at-least-once, so the sink is
idempotent on ``batch_id`` — results land under a batch_id-keyed
partition directory with ``mode("overwrite")`` and a batch whose id is
already recorded in the manifest is skipped on redelivery (the same
discipline as IncrementalIndexer.absorb_batch).

Scale shape: the replica workers hold the decoded index via the
node-shared mmap store (segments._load_replica) — serving a stream of
micro-batches costs ~ms of attach per worker cohort, never a
re-decode; each micro-batch is one zero-shuffle query job (per-split
top-k emitted in-kernel).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from nil_spark.config import EngineConfig
from nil_spark.operators.segments import topk_replica_resident

QUERY_SCHEMA = "query_id long, text string, k int"


class StreamingQueryServer:
    """Tail a query stream; answer each micro-batch against a fixed
    index snapshot (shard paths + termdict + corpus stats)."""

    def __init__(
        self,
        out_dir: str,
        shard_paths: list[str],
        termdict_pdf: pd.DataFrame,
        n_docs: int,
        avgdl: float,
        cfg: EngineConfig,
        tokenize_on: str = "driver",
        default_k: int = 10,
        excluded=None,
    ):
        self.out_dir = out_dir
        # live-docs tombstones (operators/deletes): applied per batch
        # via over-retrieve(k+T)+trim — exact, and the tombstone set is
        # fixed for the server's lifetime like the index itself
        import numpy as _np

        self._excluded = (
            _np.unique(_np.asarray(excluded, _np.int64))
            if excluded is not None and len(excluded)
            else None
        )
        self.shard_paths = list(shard_paths)
        self.termdict_pdf = termdict_pdf
        self.n_docs = int(n_docs)
        self.avgdl = float(avgdl)
        self.cfg = cfg
        self.tokenize_on = tokenize_on
        self.default_k = int(default_k)
        # the index is fixed for the server's lifetime: build the
        # O(|vocab|) term→df dict ONCE (and broadcast it once, lazily,
        # when the first batch gives us a SparkContext) instead of per
        # micro-batch — a per-batch broadcast never unpersists and
        # accumulates for the life of the stream
        self._df_map = dict(
            zip(
                termdict_pdf["term"].astype(np.int64),
                termdict_pdf["df"].astype(np.int64),
            )
        )
        self._df_bc = None
        os.makedirs(out_dir, exist_ok=True)
        self._manifest_path = os.path.join(out_dir, "manifest.json")
        if os.path.exists(self._manifest_path):
            with open(self._manifest_path) as f:
                self.manifest = json.load(f)
        else:
            self.manifest = {"batches": []}

    def _save(self) -> None:
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.manifest, f, indent=1)
        os.replace(tmp, self._manifest_path)

    # -- sink --------------------------------------------------------------
    def answer_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        t0 = time.time()
        if any(b["batch_id"] == int(batch_id) for b in self.manifest["batches"]):
            return  # redelivered; results already complete on disk
        # a micro-batch of queries is driver-bounded by definition (it
        # is the stream increment, not the corpus) — collect it and let
        # the serving path partition it across workers
        qpdf = batch_df.toPandas()
        if len(qpdf) == 0:
            return
        # a query file without a k column reads as nulls under the
        # forced stream schema — default it instead of crashing the
        # stream inside foreachBatch
        if "k" not in qpdf.columns:
            qpdf["k"] = self.default_k
        qpdf["k"] = qpdf["k"].fillna(self.default_k).astype("int64")
        spark = batch_df.sparkSession
        if self.tokenize_on == "worker" and self._df_bc is None:
            self._df_bc = spark.sparkContext.broadcast(self._df_map)
        orig_k = None
        if self._excluded is not None:
            orig_k = spark.createDataFrame(
                qpdf[["query_id", "k"]].rename(columns={"k": "__trim_k"})
            )
            qpdf = qpdf.assign(k=qpdf["k"] + len(self._excluded))
        res = topk_replica_resident(
            spark,
            qpdf,
            self.shard_paths,
            self.termdict_pdf,
            self.n_docs,
            self.avgdl,
            self.cfg,
            tokenize_on=self.tokenize_on,
            df_map=self._df_map,
            df_bc=self._df_bc,
        )
        if orig_k is not None:
            from pyspark.sql import functions as F

            from nil_spark.operators.deletes import exclude_and_trim

            res = exclude_and_trim(
                res.join(F.broadcast(orig_k), "query_id"),
                self._excluded,
                "__trim_k",
            ).drop("__trim_k")
        res.write.mode("overwrite").parquet(
            os.path.join(self.out_dir, f"batch_id={int(batch_id)}")
        )
        self.manifest["batches"].append(
            {
                "batch_id": int(batch_id),
                "n_queries": int(len(qpdf)),
                "wall_s": round(time.time() - t0, 3),
            }
        )
        self._save()

    # -- stream driver -----------------------------------------------------
    def run_available(self, spark: SparkSession, query_dir: str) -> None:
        """Answer all currently-available query files once
        (Trigger.AvailableNow) and stop; the checkpoint under out_dir
        makes re-runs skip already-answered files."""
        stream = (
            spark.readStream.schema(QUERY_SCHEMA)
            .option("maxFilesPerTrigger", 1)  # deterministic batch split
            .parquet(query_dir)
        )
        q = (
            stream.writeStream.foreachBatch(self.answer_batch)
            .option(
                "checkpointLocation",
                os.path.join(self.out_dir, "_stream_checkpoint"),
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # -- results -----------------------------------------------------------
    def results(self, spark: SparkSession) -> DataFrame:
        """All answered batches as one DataFrame."""
        return spark.read.option("basePath", self.out_dir).parquet(
            os.path.join(self.out_dir, "batch_id=*")
        )
