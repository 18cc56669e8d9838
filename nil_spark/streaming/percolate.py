"""Streaming percolation: the saved-search / alerting primitive over a
document stream.  Stored DSL queries (parsed once, compiled once to an
array of boolean structs) are evaluated against every incoming
micro-batch of documents; fired (doc_id, query_id) match rows land in
an idempotent batch_id-keyed sink.

This is the reverse of ``serving.StreamingQueryServer`` (stream of
queries vs a fixed index): here the QUERY SET is fixed and the
DOCUMENTS stream.  Nothing is indexed — percolation needs only the
incoming batch itself, so each micro-batch is one map-only job:
tokenize → evaluate the compiled match array → explode → filter.  Zero
shuffles, zero state, cost O(batch × stored queries).

Exactly-once: same discipline as the rest of the streaming layer —
``foreachBatch`` is at-least-once, so results are written under
``batch_id=N`` partition dirs with overwrite and a manifest skips
redelivered batch ids.

Reference analog: NIL has no streaming surface; this is the standard
Lucene/Elasticsearch percolator (public semantics) applied to the
transcript stream the BASELINE input describes.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nil_spark.functions.querylang import (
    compile_spark,
    field_predicates,
    parse_query,
)

from nil_spark.sources.transcripts import TRANSCRIPT_SCHEMA as DOC_SCHEMA


class StreamingPercolator:
    """Match a fixed stored-query set against a document stream.

    ``stored_queries`` — [(query_id, dsl_text)]; parsed at construction
    (a bad stored query fails fast, not inside the stream).
    ``token_split`` — the split regex of the DSL family (the shared
    parity tokenizer by default).
    """

    def __init__(
        self,
        out_dir: str,
        stored_queries: list[tuple[int, str]],
        token_split: str = "[^a-z0-9]+",
    ):
        self.out_dir = out_dir
        self.token_split = token_split
        self.parsed = [(int(qid), parse_query(t)) for qid, t in stored_queries]
        if not self.parsed:
            raise ValueError("percolator needs at least one stored query")
        # field predicates (role:user, ts:[a TO b], ...) resolve against
        # the incoming doc columns — validate at construction so a
        # stored query naming an unknown field fails fast, not per batch
        known = {
            c.split()[0] for c in DOC_SCHEMA.split(",")
        } - {"text"}
        for qid, ast in self.parsed:
            bad = {f for _k, f in field_predicates(ast)} - known
            if bad:
                raise ValueError(
                    f"stored query {qid} uses unknown doc field(s) "
                    f"{sorted(bad)} — available: {sorted(known)}"
                )
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

    # -- core (shared by batch and stream paths) ---------------------------
    def matches(self, docs: DataFrame) -> DataFrame:
        """(conv_id, turn_idx, query_id) for every stored query each doc
        satisfies — pure column expressions, map-only."""
        toksed = docs.withColumn(
            "toks",
            F.filter(
                F.split(
                    F.lower(F.coalesce("text", F.lit(""))), self.token_split
                ),
                lambda x: x != "",
            ),
        ).withColumn(
            "padded",
            F.concat(F.lit(" "), F.array_join("toks", " "), F.lit(" ")),
        )
        field_cols = {
            f.name: F.col(f.name)
            for f in docs.schema.fields
            if f.name not in ("text",)
        }
        match_arr = F.array(
            *[
                F.struct(
                    F.lit(qid).cast("long").alias("query_id"),
                    compile_spark(
                        ast, F.col("toks"), F.col("padded"), field_cols
                    ).alias("m"),
                )
                for qid, ast in self.parsed
            ]
        )
        return (
            toksed.select("conv_id", "turn_idx", F.explode(match_arr).alias("qm"))
            .filter(F.col("qm.m"))
            .select("conv_id", "turn_idx", F.col("qm.query_id").alias("query_id"))
        )

    # -- sink --------------------------------------------------------------
    def percolate_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        t0 = time.time()
        if any(b["batch_id"] == int(batch_id) for b in self.manifest["batches"]):
            return  # redelivered; results already complete on disk
        out = self.matches(batch_df)
        out.write.mode("overwrite").parquet(
            os.path.join(self.out_dir, f"batch_id={int(batch_id)}")
        )
        self.manifest["batches"].append(
            {
                "batch_id": int(batch_id),
                "wall_s": round(time.time() - t0, 3),
            }
        )
        self._save()

    # -- stream driver -----------------------------------------------------
    def run_available(self, spark: SparkSession, docs_dir: str) -> None:
        """Percolate all currently-available document files once
        (Trigger.AvailableNow) and stop; the checkpoint under out_dir
        makes re-runs skip already-processed files."""
        stream = (
            spark.readStream.schema(DOC_SCHEMA)
            .option("maxFilesPerTrigger", 1)  # deterministic batch split
            .parquet(docs_dir)
        )
        q = (
            stream.writeStream.foreachBatch(self.percolate_batch)
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
        """All fired matches as one DataFrame."""
        return spark.read.option("basePath", self.out_dir).parquet(
            os.path.join(self.out_dir, "batch_id=*")
        )
