"""Per-document numeric doc-values side-car (Lucene NumericDocValues).

A column-per-field store the serving kernels read POSITIONALLY: field
values land in a dense float64 array indexed by doc_id, published once
per node through the same publish-or-attach mmap store as the replica
posting arrays (``_published_arrays``), so N workers share one
physical copy and a fresh worker's "load" is a single mmap call.

Built at index time (CLI ``build --docvalues ts,turn_idx``) from the
same doc-id-assigned corpus the index saw, one parquet per field:
``<index_dir>/docvalues/<field>`` with (doc_id, value:double).
Timestamps cast to epoch seconds.  Docs missing a value (or ids never
written) read NaN — scoring treats NaN as "no decay" (factor 1.0) and
sorting places NaN last, both directions.

Two serving features consume it in-kernel (replica topology):
 * gaussian decay rescoring (Elasticsearch ``function_score``/``gauss``):
   combined = bm25 * exp(-(v - origin)^2 / (2 sigma^2));
 * sort-by-field retrieval (Lucene index-sort / ES ``sort`` clause):
   matching docs ranked by field value, score never computed.
"""

from __future__ import annotations

import glob
import os

import numpy as np


def write_docvalues(docs_with_ids, index_dir: str, fields: list) -> dict:
    """Materialize one (doc_id, value:double) parquet per field under
    ``<index_dir>/docvalues/<field>``.  ``docs_with_ids`` must be the
    SAME doc-id assignment the index build used (stable
    (conv_id, turn_idx) order)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import DateType, TimestampNTZType, TimestampType

    out = {}
    for f in fields:
        if f not in docs_with_ids.columns:
            raise ValueError(
                f"docvalues field {f!r} not in corpus columns "
                f"{docs_with_ids.columns}"
            )
        dt = docs_with_ids.schema[f].dataType
        path = os.path.join(index_dir, "docvalues", f)
        if isinstance(dt, (TimestampType, TimestampNTZType, DateType)):
            # epoch seconds (micro fraction kept), naive values pinned
            # as UTC regardless of the host zone — deterministic across
            # clusters and identical to the pandas naive-as-UTC oracle
            spark = docs_with_ids.sparkSession
            old_tz = spark.conf.get("spark.sql.session.timeZone")
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            try:
                (
                    docs_with_ids.select(
                        "doc_id",
                        (
                            F.unix_micros(F.col(f).cast("timestamp"))
                            / F.lit(1000000.0)
                        ).alias("value"),
                    )
                    .write.mode("overwrite")
                    .parquet(path)
                )
            finally:
                spark.conf.set("spark.sql.session.timeZone", old_tz)
        else:
            (
                docs_with_ids.select(
                    "doc_id", F.col(f).cast("double").alias("value")
                )
                .write.mode("overwrite")
                .parquet(path)
            )
        out[f] = path
    return out


def docvalues_dir(index_dir: str, field: str) -> str | None:
    """The field's store dir if it exists and is complete, else None."""
    d = os.path.join(index_dir, "docvalues", field)
    return d if os.path.exists(os.path.join(d, "_SUCCESS")) else None


def _build_dense_array(dv_dir: str) -> tuple:
    import pyarrow.parquet as pq

    parts = sorted(glob.glob(os.path.join(dv_dir, "part-*.parquet")))
    ids_list, vals_list = [], []
    for p in parts:
        t = pq.read_table(p, columns=["doc_id", "value"])
        ids_list.append(t.column("doc_id").to_numpy(zero_copy_only=False))
        vals_list.append(t.column("value").to_numpy(zero_copy_only=False))
    if not ids_list:
        return (np.full(1, np.nan),)
    ids = np.concatenate(ids_list).astype(np.int64)
    vals = np.concatenate(vals_list).astype(np.float64)
    dense = np.full(int(ids.max()) + 1 if len(ids) else 1, np.nan)
    dense[ids] = vals
    return (dense,)


def load_docvalues(dv_dir: str) -> np.ndarray:
    """Node-shared dense doc-values array (publish once, mmap after)."""
    from nil_spark.operators.segments import _published_arrays

    parts = tuple(sorted(glob.glob(os.path.join(dv_dir, "part-*.parquet"))))
    (arr,) = _published_arrays(
        ("docvalues", dv_dir),
        parts,
        lambda: _build_dense_array(dv_dir),
        names=("values",),
    )
    return arr


# ------------------------------------------- keyword (sorted) doc-values
#
# Lucene SortedDocValues: a per-field ORDINAL per doc plus a sorted term
# dictionary — the structure ES terms aggregations and keyword sorts
# read.  On-disk: <index_dir>/docvalues_kw/<field>/ords (doc_id, ord)
# parquet + dict.json (ordinal-indexed sorted term list).  Missing
# values get ordinal -1 (ES missing-bucket semantics: skipped).


def write_keyword_docvalues(docs_with_ids, index_dir: str, fields: list) -> dict:
    """Materialize ordinal-encoded keyword doc-values.  The dictionary
    is the field's SORTED distinct value set (vocabulary-sized by
    definition of a keyword field — collected to the driver the way
    Lucene keeps the terms dict per segment), broadcast into a map-only
    ordinal projection."""
    import json as _json

    from pyspark.sql import functions as F

    out = {}
    for f in fields:
        if f not in docs_with_ids.columns:
            raise ValueError(
                f"keyword docvalues field {f!r} not in corpus columns "
                f"{docs_with_ids.columns}"
            )
        base = os.path.join(index_dir, "docvalues_kw", f)
        vals = sorted(
            r[0]
            for r in docs_with_ids.select(F.col(f).cast("string"))
            .distinct()
            .collect()
            if r[0] is not None
        )
        ords = {v: i for i, v in enumerate(vals)}
        spark = docs_with_ids.sparkSession
        omap = F.create_map(
            *[x for v, i in ords.items() for x in (F.lit(v), F.lit(i))]
        )
        (
            docs_with_ids.select(
                "doc_id",
                F.coalesce(
                    omap[F.col(f).cast("string")], F.lit(-1)
                ).cast("int").alias("ord"),
            )
            .write.mode("overwrite")
            .parquet(os.path.join(base, "ords"))
        )
        with open(os.path.join(base, "dict.json"), "w") as fh:
            _json.dump(vals, fh)
        out[f] = base
    return out


def keyword_docvalues_dir(index_dir: str, field: str) -> str | None:
    """The field's keyword store dir if complete, else None."""
    d = os.path.join(index_dir, "docvalues_kw", field)
    if os.path.exists(os.path.join(d, "ords", "_SUCCESS")) and os.path.exists(
        os.path.join(d, "dict.json")
    ):
        return d
    return None


def _build_ord_array(kw_dir: str) -> tuple:
    import pyarrow.parquet as pq

    parts = sorted(glob.glob(os.path.join(kw_dir, "ords", "part-*.parquet")))
    ids_list, ord_list = [], []
    for p in parts:
        t = pq.read_table(p, columns=["doc_id", "ord"])
        ids_list.append(t.column("doc_id").to_numpy(zero_copy_only=False))
        ord_list.append(t.column("ord").to_numpy(zero_copy_only=False))
    if not ids_list:
        return (np.full(1, -1, np.int32),)
    ids = np.concatenate(ids_list).astype(np.int64)
    os_ = np.concatenate(ord_list).astype(np.int32)
    dense = np.full(int(ids.max()) + 1 if len(ids) else 1, -1, np.int32)
    dense[ids] = os_
    return (dense,)


def load_keyword_docvalues(kw_dir: str) -> tuple:
    """(dense int32 ordinal array, sorted term list) — the ordinal
    array is node-shared (publish once, mmap after); the dict is a
    tiny JSON read per process."""
    import json as _json

    from nil_spark.operators.segments import _published_arrays

    parts = tuple(
        sorted(glob.glob(os.path.join(kw_dir, "ords", "part-*.parquet")))
    )
    (arr,) = _published_arrays(
        ("docvalues_kw", kw_dir),
        parts,
        lambda: _build_ord_array(kw_dir),
        names=("ords",),
    )
    with open(os.path.join(kw_dir, "dict.json")) as fh:
        terms = _json.load(fh)
    return arr, terms


def gauss_factor(
    values: np.ndarray, doc_ids: np.ndarray, origin: float, sigma: float
) -> np.ndarray:
    """ES gauss decay factor per doc id; NaN (missing value, or id past
    the array end) decays nothing (factor 1.0)."""
    v = np.where(
        doc_ids < len(values), values[np.minimum(doc_ids, len(values) - 1)], np.nan
    )
    f = np.exp(-((v - origin) ** 2) / (2.0 * sigma * sigma))
    return np.where(np.isnan(v), 1.0, f)


def sort_key(
    values: np.ndarray, doc_ids: np.ndarray, ascending: bool
) -> np.ndarray:
    """Field values for sorting with NaN/missing placed LAST in either
    direction (ES missing: _last default)."""
    v = np.where(
        doc_ids < len(values), values[np.minimum(doc_ids, len(values) - 1)], np.nan
    )
    return np.where(np.isnan(v), np.inf if ascending else -np.inf, v)
