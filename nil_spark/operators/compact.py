"""Compaction ("expunge deletes"): physically remove tombstoned docs.

Deletes (operators/deletes.py) are logical — tombstones applied at
query time over stats-as-built segments.  Compaction is the merge that
actually reclaims them, Lucene's forceMergeDeletes rendered Spark-side:

 * every segment file (partial_segments + merged segments) is decoded
   (the vectorized ``_decode_chunk_table``), tombstoned postings are
   masked out, and the survivors re-encode through the SAME
   ``_encode_run_table`` the build uses — one file per task, so the
   doc-exclusive shard layout survives intact;
 * per-file docstat sentinels are decoded, filtered, and re-encoded,
   so corpus statistics (N, avgdl) reflect the live corpus — scores
   CHANGE at the compaction boundary, exactly as they do after a
   Lucene merge;
 * the positional side-car (when present) is rewritten the same way
   through ``_encode_pos_table``;
 * the term dictionary is re-derived from the live postings and the
   manifest's corpus stats updated;
 * the tombstone sidecar is cleared LAST.

Surviving docs KEEP their original ids (no renumber — external
references stay valid), so ids are no longer dense afterwards; every
serving path already handles sparse ids (replica arrays size to
max_doc, the DSL dense-universe guard refuses and points to
universe_mode='indexed').

Crash safety: new files land in a ``.compact_tmp`` sibling and swap in
via directory rename; a crash between the data swap and the
stats/tombstone updates leaves a consistent-but-stale view (tombstones
still present are a no-op against already-compacted data) and a
re-run converges.
"""

from __future__ import annotations

import glob
import json
import os
import shutil

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from nil_spark.config import EngineConfig
from nil_spark.functions import varint
from nil_spark.operators.deletes import TOMBSTONE_DIR, load_tombstones
from nil_spark.operators.phrase import _membership
from nil_spark.operators.segments import (
    DOCSTAT_SENTINEL,
    _SEG_COLS,
    _decode_chunk_table,
    _encode_run_table,
)

_SEG_MAX_CHUNK = 1 << 20


def _seg_arrow_schema():
    import pyarrow as pa

    return pa.schema([
        ("term", pa.int64()),
        ("chunk_idx", pa.int32()),
        ("first_doc", pa.int64()),
        ("last_doc", pa.int64()),
        ("n_postings", pa.int64()),
        ("doc_blob", pa.binary()),
        ("tf_blob", pa.binary()),
        ("dl_blob", pa.binary()),
        ("bm_first", pa.list_(pa.int64())),
        ("bm_max", pa.list_(pa.float64())),
    ])


def _pos_arrow_schema():
    import pyarrow as pa

    return pa.schema([
        ("term", pa.int64()),
        ("chunk_idx", pa.int32()),
        ("first_doc", pa.int64()),
        ("last_doc", pa.int64()),
        ("n_postings", pa.int64()),
        ("doc_blob", pa.binary()),
        ("cnt_blob", pa.binary()),
        ("pos_blob", pa.binary()),
    ])


def _rewrite_segment_file(path: str, out_path: str, tombs: np.ndarray,
                          cfg: EngineConfig) -> tuple[int, float]:
    """Rewrite one segment shard without its tombstoned postings;
    returns (live_docs_in_sentinels, live_dl_sum) for stats."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    pdf = pq.read_table(path).to_pandas()
    sent = pdf[pdf["term"] == DOCSTAT_SENTINEL]
    seg = pdf[pdf["term"] != DOCSTAT_SENTINEL].reset_index(drop=True)

    frames = []
    if len(seg):
        terms, docs, tfs, dls = _decode_chunk_table(seg)
        live = ~_membership(tombs, docs)
        if live.any():
            rows = _encode_run_table(
                terms[live], docs[live], tfs[live], dls[live], cfg,
                _SEG_MAX_CHUNK,
            )
            frames.append(pd.DataFrame(rows, columns=_SEG_COLS))

    n_live, dl_sum = 0, 0.0
    if len(sent):
        # sentinel rows carry (sorted doc ids as delta-varint, dls)
        sdocs, sdls = [], []
        for r in sent.itertuples():
            gaps = varint.decode(bytes(r.doc_blob)).astype(np.int64)
            sdocs.append(np.cumsum(gaps))
            sdls.append(varint.decode(bytes(r.dl_blob)).astype(np.int64))
        sdocs = np.concatenate(sdocs)
        sdls = np.concatenate(sdls)
        o = np.argsort(sdocs, kind="stable")
        sdocs, sdls = sdocs[o], sdls[o]
        keep = ~_membership(tombs, sdocs)
        sdocs, sdls = sdocs[keep], sdls[keep]
        n_live, dl_sum = len(sdocs), float(sdls.sum())
        if n_live:
            frames.append(pd.DataFrame(
                [(
                    DOCSTAT_SENTINEL, 0, int(sdocs[0]), int(sdocs[-1]),
                    n_live, varint.encode_deltas(sdocs), b"",
                    varint.encode(sdls.astype(np.uint64)), [], [dl_sum],
                )],
                columns=_SEG_COLS,
            ))

    out = (
        pd.concat(frames, ignore_index=True)
        if frames
        else pd.DataFrame(columns=_SEG_COLS)
    )
    pq.write_table(
        pa.Table.from_pandas(out, schema=_seg_arrow_schema(),
                             preserve_index=False),
        out_path,
    )
    return n_live, dl_sum


def _rewrite_pos_file(path: str, out_path: str, tombs: np.ndarray) -> int:
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nil_spark.operators.positions import (
        _decode_pos_chunk,
        _encode_pos_table,
        _POS_COLS,
    )

    pdf = pq.read_table(path).to_pandas()
    t_parts, d_parts, p_parts = [], [], []
    for r in pdf.itertuples():
        d, p = _decode_pos_chunk(r)
        t_parts.append(np.full(len(d), int(r.term), np.int64))
        d_parts.append(d.astype(np.int64))
        p_parts.append(p.astype(np.int64))
    if t_parts:
        terms = np.concatenate(t_parts)
        docs = np.concatenate(d_parts)
        poss = np.concatenate(p_parts)
        live = ~_membership(tombs, docs)
        terms, docs, poss = terms[live], docs[live], poss[live]
    else:
        terms = docs = poss = np.empty(0, np.int64)
    if len(terms):
        order = np.lexsort((poss, docs, terms))
        rows = _encode_pos_table(
            terms[order], docs[order], poss[order], _SEG_MAX_CHUNK
        )
        out = pd.DataFrame(rows, columns=_POS_COLS)
    else:
        out = pd.DataFrame(columns=_POS_COLS)
    pq.write_table(
        pa.Table.from_pandas(out, schema=_pos_arrow_schema(),
                             preserve_index=False),
        out_path,
    )
    return len(out)


def _swap_dir(live: str, tmp: str) -> None:
    old = live + ".old"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(live, old)
    os.rename(tmp, live)
    shutil.rmtree(old, ignore_errors=True)


def compact_index(
    spark: SparkSession, index_dir: str, cfg: EngineConfig
) -> dict:
    """Expunge tombstoned docs from a batch-built index.  Returns a
    summary dict; no-op (``{"compacted": False}``) when the index has
    no tombstones."""
    tombs = load_tombstones(spark, index_dir)
    if tombs is None:
        return {"compacted": False, "reason": "no tombstones"}
    tombs_bc = spark.sparkContext.broadcast(tombs)

    layouts = [
        d for d in ("partial_segments", "segments")
        if glob.glob(os.path.join(index_dir, d, "part-*.parquet"))
    ]
    stats_totals = {"n": 0, "dl": 0.0}
    for layout in layouts:
        live_dir = os.path.join(index_dir, layout)
        tmp_dir = live_dir + ".compact_tmp"
        shutil.rmtree(tmp_dir, ignore_errors=True)
        os.makedirs(tmp_dir)
        files = sorted(glob.glob(os.path.join(live_dir, "part-*.parquet")))

        def _task(item, _cfg=cfg, _tmp=tmp_dir):
            i, p = item
            return _rewrite_segment_file(
                p, os.path.join(_tmp, f"part-{i:05d}.parquet"),
                tombs_bc.value, _cfg,
            )

        results = (
            spark.sparkContext.parallelize(
                list(enumerate(files)), len(files)
            ).map(_task).collect()
        )
        if layout == "partial_segments" or len(layouts) == 1:
            # count docstats from exactly one layout (the merged store
            # carries no sentinels in the classic layout; when both
            # exist the partial layout is the authoritative one)
            stats_totals["n"] += sum(r[0] for r in results)
            stats_totals["dl"] += sum(r[1] for r in results)
        open(os.path.join(tmp_dir, "_SUCCESS"), "w").close()
        _swap_dir(live_dir, tmp_dir)

    pos_dir = os.path.join(index_dir, "positions")
    n_pos = None
    if os.path.exists(os.path.join(pos_dir, "_SUCCESS")):
        tmp_dir = pos_dir + ".compact_tmp"
        shutil.rmtree(tmp_dir, ignore_errors=True)
        os.makedirs(tmp_dir)
        files = sorted(glob.glob(os.path.join(pos_dir, "part-*.parquet")))

        def _ptask(item, _tmp=tmp_dir):
            i, p = item
            return _rewrite_pos_file(
                p, os.path.join(_tmp, f"part-{i:05d}.parquet"),
                tombs_bc.value,
            )

        n_pos = sum(
            spark.sparkContext.parallelize(
                list(enumerate(files)), len(files)
            ).map(_ptask).collect()
        )
        open(os.path.join(tmp_dir, "_SUCCESS"), "w").close()
        _swap_dir(pos_dir, tmp_dir)

    # docstats dir (classic layout): per-doc rows, plain anti-filter
    ds_dir = os.path.join(index_dir, "docstats")
    if os.path.isdir(ds_dir):
        ds = spark.read.parquet(ds_dir)
        tomb_df = spark.createDataFrame(
            [(int(t),) for t in tombs], "doc_id long"
        )
        kept = ds.join(F.broadcast(tomb_df), "doc_id", "left_anti")
        tmp_dir = ds_dir + ".compact_tmp"
        kept.write.mode("overwrite").parquet(tmp_dir)
        _swap_dir(ds_dir, tmp_dir)
        if not stats_totals["n"]:
            # classic layout carries no sentinels — stats come from
            # the rewritten docstats table
            from nil_spark.operators.index import corpus_stats

            n, avg = corpus_stats(spark.read.parquet(ds_dir))
            stats_totals["n"], stats_totals["dl"] = n, avg * n

    # term dictionary: re-derive df from the live postings
    td_dir = os.path.join(index_dir, "termdict")
    if os.path.isdir(td_dir):
        src = "partial_segments" if "partial_segments" in layouts else "segments"
        raw = spark.read.parquet(os.path.join(index_dir, src))
        td = (
            raw.filter(F.col("term") != DOCSTAT_SENTINEL)
            .groupBy("term")
            .agg(F.sum("n_postings").cast("long").alias("df"))
        )
        tmp_dir = td_dir + ".compact_tmp"
        td.write.mode("overwrite").parquet(tmp_dir)
        _swap_dir(td_dir, tmp_dir)

    # manifest corpus stats (fused layout reads these at query time)
    summary = {
        "compacted": True,
        "removed": int(len(tombs)),
        "layouts": layouts,
        "n_docs": int(stats_totals["n"]),
        "avgdl": (
            round(stats_totals["dl"] / stats_totals["n"], 9)
            if stats_totals["n"]
            else 0.0
        ),
    }
    if n_pos is not None:
        summary["position_chunks"] = n_pos
    man_path = os.path.join(index_dir, "manifest.json")
    if os.path.exists(man_path):
        with open(man_path) as f:
            man = json.load(f)
        if man.get("corpus"):
            man["corpus"]["n_docs"] = summary["n_docs"]
            man["corpus"]["avgdl"] = summary["avgdl"]
        man.setdefault("compactions", []).append(
            {"removed": summary["removed"]}
        )
        tmp = man_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(man, f, indent=1)
        os.replace(tmp, man_path)

    # tombstones cleared LAST: a crash before this line leaves them
    # applied over already-compacted data — a harmless no-op
    shutil.rmtree(os.path.join(index_dir, TOMBSTONE_DIR),
                  ignore_errors=True)
    return summary
