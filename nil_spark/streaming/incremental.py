"""Incremental (Structured Streaming) index build.

The reference is batch-only (SURVEY.md §2.7), but its longitudinal
tracking workflow (scripts/nil.sh --batch + per-commit catalogs,
/root/reference/METHOD_TRACKING.md:44-59) is exactly an
append-only-corpus pattern: new snapshots arrive, the index must absorb
them without rebuilding.  Spark-first re-expression: a file-source
``readStream`` over the transcripts directory, ``foreachBatch``
appending *segment deltas* — per-batch compressed posting segments plus
docstats — with batch lineage in a manifest.  Query time unions all
segments: the MaxScore traversal (segments.topk_maxscore) already
accepts many chunks per term in any doc order, and block-max bounds are
avgdl-independent (segments._encode_group), so late batches never
invalidate earlier ones.

Semantics vs the batch build:
 * docIDs are dense and stable *per arrival order of batches*, and
   stable (conv_id, turn_idx)-ordered *within* a batch — the streaming
   relaxation of the global stable ordering (exact parity with the
   batch build holds when batches arrive in (conv_id, turn_idx) order,
   which the test asserts).
 * df-based stopword pruning moves to query time (a term may be cool in
   every batch but hot globally) — same cutoff, same result set.
 * exactly-once: foreachBatch is at-least-once, so the sink itself is
   idempotent on ``batch_id`` — each batch writes its segments/docstats
   under a batch_id-keyed partition directory with mode("overwrite"),
   and a batch whose id is already recorded in the manifest is skipped
   entirely on redelivery.  Crash between write and manifest-record →
   the retry overwrites the same directories (no duplicates); crash
   between record and checkpoint-commit → the retry skips (files are
   complete, id lineage intact).  The manifest records per-batch
   lineage (rows, id range, wall time).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nil_spark.config import EngineConfig
from nil_spark.functions.tokenize import with_term_counts
from nil_spark.operators import index as index_ops
from nil_spark.operators.segments import build_segments
from nil_spark.sources.transcripts import TRANSCRIPT_SCHEMA


class IncrementalIndexer:
    """Maintains an append-only segment store under ``index_dir`` fed by
    a Structured Streaming query over ``input_dir``."""

    def __init__(
        self, index_dir: str, cfg: EngineConfig, positions: bool | None = None
    ):
        """``positions``: also absorb a positional side-car delta per
        batch (phrase/proximity serving on the streaming layout).
        ``None`` adopts whatever the existing manifest says (fresh
        index: off).  Soundness constraint: the positional store must
        cover EVERY absorbed doc (term absence must imply no match), so
        enabling it on an index that already absorbed batches without
        it is refused — rebuild or keep it off."""
        from nil_spark.operators.segments import _cfg_fingerprint

        self.index_dir = index_dir
        self.cfg = cfg
        self.manifest_path = os.path.join(index_dir, "stream_manifest.json")
        os.makedirs(index_dir, exist_ok=True)
        fp = _cfg_fingerprint(cfg)
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as f:
                self.manifest = json.load(f)
            has_pos = bool(self.manifest.get("positions", False))
            if positions is None:
                positions = has_pos
            elif positions and not has_pos and self.manifest["batches"]:
                raise ValueError(
                    f"index at {index_dir} absorbed "
                    f"{len(self.manifest['batches'])} batches WITHOUT a "
                    "positional store — enabling positions now would leave "
                    "those docs invisible to phrase search; rebuild the "
                    "streaming index with positions on from the start"
                )
            elif not positions and has_pos:
                # keep absorbing positions: turning them off mid-stream
                # would silently break the coverage invariant
                positions = True
            # config drift fails fast: absorbing or querying with a
            # different tokenization/scoring config than the deltas
            # were built with silently corrupts the index / results —
            # the same guard the batch CLI applies (cli._open_index)
            built_fp = self.manifest.get("config_fingerprint")
            if built_fp and built_fp != fp:
                raise ValueError(
                    f"config mismatch: index at {index_dir} was built with "
                    f"fingerprint {built_fp}, current config is {fp} — use "
                    "the same gram_size/EngineConfig the index was built with"
                )
            if "config_fingerprint" not in self.manifest:
                # pre-guard (legacy) manifest: blindly stamping the
                # CURRENT fingerprint would bypass the drift guard and
                # later fail with a raw AnalysisException (v1 segments
                # lack last_doc) — verify the on-disk segment schema
                # actually matches the current format before stamping
                self._verify_legacy_segment_schema()
                self.manifest["config_fingerprint"] = fp
            self.manifest["positions"] = bool(positions)
        else:
            self.manifest = {
                "next_doc_id": 0,
                "batches": [],
                "config_fingerprint": fp,
                "positions": bool(positions),
            }
        self.positions = bool(positions)

    def _verify_legacy_segment_schema(self) -> None:
        """For a manifest written before the config-fingerprint guard,
        check that on-disk segments carry the CURRENT segment schema
        (v2 = has ``last_doc`` per chunk).  A v1 index must be rebuilt;
        stamping it would surface later as a raw missing-column error
        mid-query instead of a structured config-mismatch one."""
        import glob as _glob

        parts = sorted(
            _glob.glob(
                os.path.join(self.index_dir, "segments", "batch_id=*", "part-*.parquet")
            )
        ) or sorted(  # fully-compacted index: deltas deleted, store lives in gen dirs
            _glob.glob(
                os.path.join(self.index_dir, "compacted", "gen=*", "part-*.parquet")
            )
        )
        if not parts:
            return  # nothing absorbed yet — safe to stamp
        import pyarrow.parquet as pq

        names = set(pq.read_schema(parts[0]).names)
        if "last_doc" not in names:
            raise ValueError(
                f"config mismatch: index at {self.index_dir} predates the "
                "config-fingerprint guard and its segments use the v1 "
                "schema (no last_doc column) — rebuild the streaming "
                "index with the current engine version"
            )

    def _save(self):
        with open(self.manifest_path, "w") as f:
            json.dump(self.manifest, f, indent=2)

    # -- foreachBatch sink -------------------------------------------------
    def absorb_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        t0 = time.time()
        # idempotence on redelivery (foreachBatch is at-least-once): a
        # batch whose id is already recorded was fully written — skip it
        if any(b["batch_id"] == int(batch_id) for b in self.manifest["batches"]):
            return
        offset = self.manifest["next_doc_id"]
        # stable within-batch ordering; cheap global window is fine here
        # because a micro-batch is bounded (it is NOT the full corpus)
        w = Window.orderBy("conv_id", "turn_idx")
        docs = batch_df.withColumn(
            "doc_id", F.row_number().over(w).cast("long") + F.lit(offset) - 1
        )
        dt = with_term_counts(docs, self.cfg).persist()
        docstats = index_ops.doc_stats(dt)
        postings = index_ops.exploded_postings(dt, self.cfg)
        segs = build_segments(postings, self.cfg)

        # batch_id-keyed partition dirs + overwrite: a retried partial
        # write replaces itself instead of appending duplicates
        segs.write.mode("overwrite").parquet(
            os.path.join(self.index_dir, "segments", f"batch_id={int(batch_id)}")
        )
        docstats.write.mode("overwrite").parquet(
            os.path.join(self.index_dir, "docstats", f"batch_id={int(batch_id)}")
        )
        if self.positions:
            # positional side-car delta, same batch_id-keyed idempotence;
            # term-range sorted within the batch so a phrase query's
            # term IN (...) scan prunes each delta's row groups
            from nil_spark.operators.positions import build_position_segments

            n_part = max(
                int(
                    batch_df.sparkSession.conf.get(
                        "spark.sql.shuffle.partitions", "32"
                    )
                )
                // 8,
                1,
            )
            (
                build_position_segments(docs.select("doc_id", "text"), self.cfg)
                .repartitionByRange(n_part, "term")
                .sortWithinPartitions("term", "first_doc")
                .write.mode("overwrite")
                .parquet(
                    os.path.join(
                        self.index_dir, "positions", f"batch_id={int(batch_id)}"
                    )
                )
            )
        n_rows = docs.count()
        dt.unpersist()
        self.manifest["next_doc_id"] = offset + n_rows
        self.manifest["batches"].append(
            {
                "batch_id": int(batch_id),
                "rows": int(n_rows),
                "doc_id_range": [offset, offset + n_rows],
                "wall_s": round(time.time() - t0, 3),
            }
        )
        self._save()

    # -- stream driver -----------------------------------------------------
    def run_available(
        self, spark: SparkSession, input_dir: str, fmt: str = "parquet"
    ) -> None:
        """Process all currently-available input once
        (Trigger.AvailableNow) and stop.  The streaming checkpoint under
        the index dir makes re-runs skip already-absorbed files — or,
        with ``fmt="iceberg"``, already-absorbed table snapshots: the
        index then *follows the Iceberg table*, each drain picking up
        exactly the snapshots committed since the last one.
        """
        if fmt == "iceberg":
            from nil_spark.sources.iceberg_stream import IcebergStreamSource

            spark.dataSource.register(IcebergStreamSource)
            stream = (
                spark.readStream.format("nil_iceberg")
                .option("path", input_dir)
                .load()
            )
        else:
            stream = (
                spark.readStream.schema(TRANSCRIPT_SCHEMA)
                .option("maxFilesPerTrigger", 1)  # deterministic batch split
                .parquet(input_dir)
            )
        q = (
            stream.writeStream.foreachBatch(self.absorb_batch)
            .option(
                "checkpointLocation", os.path.join(self.index_dir, "_stream_checkpoint")
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # -- compaction --------------------------------------------------------
    def compact(self, spark: SparkSession, publish: bool = False) -> dict:
        """Merge the accumulated per-batch segment deltas (plus any
        previous compacted generation) into ONE term-sorted store.

        Why: every micro-batch appends its own chunk-group per term, so
        after B batches a query term decodes B chunk groups — correct
        (the MaxScore traversal accepts chunks in any doc order, and
        block-max bounds are avgdl-independent so old segments stay
        valid), but B× the per-term decode and seek cost.  Compaction
        restores the batch build's one-range-per-term layout without
        rescoring anything.

        Crash safety (same discipline as absorb_batch): the merged
        store is written to a NEW generation dir, then the manifest
        records the generation and the absorbed batch ids, then the
        old dirs are deleted.  A crash before the manifest record
        leaves an orphan generation dir that the next compact
        overwrites; a crash after the record but before deletion is
        handled by ``load_index``, which partition-prunes delta dirs
        whose batch_id is already inside the compacted store.
        """
        import shutil

        from nil_spark.operators.segments import merge_segments

        seg_root = os.path.join(self.index_dir, "segments")
        gen = int(self.manifest.get("compacted_gen", 0))
        already = set(self.manifest.get("compacted_batch_ids", []))
        delta_ids = [
            int(b["batch_id"])
            for b in self.manifest["batches"]
            if int(b["batch_id"]) not in already
        ]
        parts = [
            os.path.join(seg_root, f"batch_id={i}")
            for i in delta_ids
            if os.path.isdir(os.path.join(seg_root, f"batch_id={i}"))
        ]
        old_gen_dir = os.path.join(self.index_dir, "compacted", f"gen={gen}")
        if gen > 0 and os.path.isdir(old_gen_dir):
            parts.append(old_gen_dir)
        if not parts:
            return {"compacted_gen": gen, "merged_batches": 0}
        segs = spark.read.parquet(*parts).drop("batch_id")
        new_gen = gen + 1
        new_dir = os.path.join(self.index_dir, "compacted", f"gen={new_gen}")
        merge_segments(segs, self.cfg).write.mode("overwrite").parquet(new_dir)
        self.manifest["compacted_gen"] = new_gen
        self.manifest["compacted_batch_ids"] = sorted(
            already | {int(i) for i in delta_ids}
        )
        self._save()
        # deletion is opportunistic — load_index stays correct without it
        for i in delta_ids:
            shutil.rmtree(os.path.join(seg_root, f"batch_id={i}"), ignore_errors=True)
        if gen > 0:
            shutil.rmtree(old_gen_dir, ignore_errors=True)
        out = {"compacted_gen": new_gen, "merged_batches": len(delta_ids)}
        if publish:
            # publish-at-compact: every compaction changes the shard
            # path set, which keys a NEW replica store — without this,
            # the first serving batch after each generation pays the
            # full index decode (the same cold cost publish-at-build
            # removes for batch indexes).  Path set + avgdl are derived
            # exactly as the serving side does (generation dir + any
            # deltas absorbed after this compaction's id snapshot).
            import glob as _glob

            from nil_spark.operators.segments import publish_replica

            paths = sorted(_glob.glob(os.path.join(new_dir, "part-*.parquet")))
            done = set(self.manifest["compacted_batch_ids"])
            for b in self.manifest["batches"]:
                if int(b["batch_id"]) not in done:
                    paths += sorted(
                        _glob.glob(
                            os.path.join(
                                seg_root, f"batch_id={int(b['batch_id'])}",
                                "part-*.parquet",
                            )
                        )
                    )
            _, avgdl = index_ops.corpus_stats(
                spark.read.parquet(os.path.join(self.index_dir, "docstats"))
            )
            out["replica_store"] = publish_replica(
                paths, avgdl, self.cfg, spark=spark
            )
        return out

    # -- query-side view ---------------------------------------------------
    def position_store(self, spark: SparkSession) -> DataFrame:
        """Union of all per-batch positional deltas — directly
        consumable by positions.phrase_search_positional /
        proximity_search_positional (their kernels sort concatenated
        chunk rows per term, so delta boundaries are invisible).  No
        compaction step exists or is needed for correctness: each
        delta is term-range sorted internally, so footer stats still
        prune, and per-query cost is Σ df over deltas — the same
        postings a compacted store would decode."""
        pos_root = os.path.join(self.index_dir, "positions")
        if not self.manifest.get("positions") or not os.path.isdir(pos_root):
            raise FileNotFoundError(
                f"no positional store under {self.index_dir} — build the "
                "streaming index with positions=True"
            )
        return spark.read.parquet(pos_root).drop("batch_id")

    def load_index(self, spark: SparkSession) -> dict:
        """Handle dict compatible with segments.topk_maxscore, derived
        from the compacted generation (if any) plus the not-yet-compacted
        batch deltas (df from segment n_postings — postings are per
        (term, doc) so Σ n_postings = df), with stopword pruning applied
        at query time."""
        seg_root = os.path.join(self.index_dir, "segments")
        gen = int(self.manifest.get("compacted_gen", 0))
        compacted_ids = set(self.manifest.get("compacted_batch_ids", []))
        sources = []
        gen_dir = os.path.join(self.index_dir, "compacted", f"gen={gen}")
        if gen > 0 and os.path.isdir(gen_dir):
            sources.append(spark.read.parquet(gen_dir))
        if os.path.isdir(seg_root) and any(
            e.startswith("batch_id=") for e in os.listdir(seg_root)
        ):
            deltas = spark.read.parquet(seg_root)
            if compacted_ids:
                # a crash between manifest record and dir deletion can
                # leave already-merged deltas on disk: partition-prune
                # them out instead of double-counting their postings
                deltas = deltas.filter(
                    ~F.col("batch_id").isin([int(i) for i in compacted_ids])
                )
            sources.append(deltas.drop("batch_id"))
        if not sources:
            raise FileNotFoundError(f"no segments under {self.index_dir}")
        segs = sources[0]
        for s in sources[1:]:
            segs = segs.unionByName(s)
        docstats = spark.read.parquet(os.path.join(self.index_dir, "docstats"))
        n_docs, avgdl = index_ops.corpus_stats(docstats)
        termdict = segs.groupBy("term").agg(
            F.sum("n_postings").cast("long").alias("df")
        )
        cutoff = self.cfg.df_stopword_cutoff
        if cutoff is not None and cutoff < 1.0:
            termdict = termdict.filter(F.col("df") <= int(cutoff * n_docs))
            segs = segs.join(F.broadcast(termdict.select("term")), "term", "inner")
        return {
            "segments": segs,
            "termdict": termdict,
            "docstats": docstats,
            "n_docs": n_docs,
            "avgdl": avgdl,
        }
