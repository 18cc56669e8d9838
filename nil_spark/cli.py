"""spark-submit entry point (north-rule packaging clause).

Mirrors the reference's CLI-config-driven batch surface
(/root/reference/src/main/kotlin/jp/ac/osaka_u/sdl/nil/NILConfig.kt:23-86)
as a Spark application.  On a cluster:

    zip -r nil_spark.zip nil_spark
    spark-submit --master <cluster> --py-files nil_spark.zip \\
        cli_main.py build --input <transcripts dir/table> --index-dir <dir>
    spark-submit --master <cluster> --py-files nil_spark.zip \\
        cli_main.py query --index-dir <dir> --queries <parquet> --out <dir>

(`cli_main.py` is the thin launcher at the repo root; inside the zip the
same logic is `python -m`-able as ``nil_spark.cli:main``.)

Inputs may be parquet paths, CSV/JSONL dirs, or Iceberg tables
(``--format iceberg``).  An Iceberg *path* (a directory with
``metadata/version-hint.text``) is read by the engine-native
pure-Python metadata layer (``nil_spark/sources/iceberg.py`` — manifest
planning, bounds pruning, merge-on-read position deletes), which needs
no runtime jar; anything else is treated as a catalog table identifier
and read via ``spark.read.table`` (runtime jar + catalog conf
environment-provided).
"""

from __future__ import annotations

import argparse
import json
import sys

from nil_spark.config import EngineConfig
from nil_spark.operators.docids import assign_doc_ids
from nil_spark.operators.segments import CheckpointedIndexBuilder, topk_maxscore
from nil_spark.session import get_spark


def _cfg_from_args(args) -> EngineConfig:
    """Engine config from the shared CLI flags (one place, so build and
    every query path fingerprint identically)."""
    kw = {"gram_size": args.gram_size}
    if getattr(args, "stopword_cutoff", None) is not None:
        kw["df_stopword_cutoff"] = float(args.stopword_cutoff)
    if getattr(args, "analyzer", None):
        kw["analyzer"] = args.analyzer
    return EngineConfig(**kw)


def read_docs(spark, path: str, fmt: str):
    """Transcripts source: parquet dir, CSV/JSONL dir (schema-applied —
    the reference's own on-disk model is CSV, SURVEY §1.2), or Iceberg
    table (gated)."""
    if fmt == "iceberg":
        import os as _os

        if _os.path.exists(_os.path.join(path, "metadata", "version-hint.text")):
            # engine-native reader (no runtime jar needed): manifest-planned
            # file list, bounds pruning, merge-on-read position deletes
            from nil_spark.sources.iceberg import read_iceberg

            return read_iceberg(spark, path)
        # catalog table identifier: the official runtime-jar route; jar +
        # catalog conf must be on the cluster (not bundled)
        return spark.read.table(path)
    if fmt == "csv":
        from nil_spark.sources.transcripts import TRANSCRIPT_SCHEMA

        return (
            spark.read.schema(TRANSCRIPT_SCHEMA)
            .option("header", "true")
            # with a user-supplied schema Spark maps CSV columns by
            # POSITION by default (enforceSchema=true) — a header whose
            # column order differs from the schema would be silently
            # misassigned; enforceSchema=false makes Spark validate the
            # header names against the schema instead
            .option("enforceSchema", "false")
            .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss[.SSSSSS][XXX]")
            .csv(path)
        )
    if fmt == "json":
        from nil_spark.sources.transcripts import TRANSCRIPT_SCHEMA

        return spark.read.schema(TRANSCRIPT_SCHEMA).json(path)
    return spark.read.parquet(path)


def cmd_build(args) -> int:
    spark = get_spark(app="nil_spark_build", master=args.master,
                      shuffle_partitions=args.shuffle_partitions)
    cfg = _cfg_from_args(args)
    docs = read_docs(spark, args.input, args.format)
    docs = assign_doc_ids(docs, ["conv_id", "turn_idx"])
    builder = CheckpointedIndexBuilder(args.index_dir, cfg)
    idx = builder.build_fused(docs) if args.build_path == "fused" else builder.build(docs)
    published = None
    if getattr(args, "publish_replica", False):
        # publish-at-build: materialize the node-shared mmap replica
        # store now (per-shard decode as a parallel Spark stage) so the
        # first `query --topology replica` pays a ~ms mmap attach
        # instead of the full index decode
        import glob as _glob
        import os as _os

        from nil_spark.operators.segments import publish_replica

        # derive avgdl exactly the way cmd_query's _open_index does, so
        # the store key matches what serving computes (a float that
        # differs in the last bit would key a second, useless store)
        if _os.path.isdir(f"{args.index_dir}/docstats"):
            from nil_spark.operators.index import corpus_stats

            _, pub_avgdl = corpus_stats(
                spark.read.parquet(f"{args.index_dir}/docstats")
            )
        else:
            pub_avgdl = float(builder.manifest["corpus"]["avgdl"])
        # same shard-set preference as cmd_query's replica topology:
        # the doc-exclusive partial_segments layout when present, else
        # the merged segments store
        paths = sorted(
            _glob.glob(f"{args.index_dir}/partial_segments/part-*.parquet")
        ) or sorted(_glob.glob(f"{args.index_dir}/segments/part-*.parquet"))
        published = publish_replica(paths, pub_avgdl, cfg, spark=spark)
    dv_out = None
    if getattr(args, "docvalues", None):
        # numeric doc-values side-car (operators/docvalues.py): one
        # (doc_id, value) parquet per field, consumed positionally by
        # the replica kernel for --decay / --sort-by serving
        from nil_spark.operators.docvalues import write_docvalues

        try:
            dv_out = write_docvalues(
                docs, args.index_dir,
                [f for f in args.docvalues.split(",") if f],
            )
        except ValueError as e:
            print(json.dumps({"error": "bad docvalues field",
                              "detail": str(e)}), file=sys.stderr)
            spark.stop()
            return 2
    kw_out = None
    if getattr(args, "keyword_docvalues", None):
        # keyword (sorted) doc-values: ordinal array + sorted term
        # dictionary per field — the structure terms aggregations and
        # keyword sorts read (Lucene SortedDocValues)
        from nil_spark.operators.docvalues import write_keyword_docvalues

        try:
            kw_out = write_keyword_docvalues(
                docs, args.index_dir,
                [f for f in args.keyword_docvalues.split(",") if f],
            )
        except ValueError as e:
            print(json.dumps({"error": "bad keyword docvalues field",
                              "detail": str(e)}), file=sys.stderr)
            spark.stop()
            return 2
    n_pos = None
    if getattr(args, "positions", False):
        # positional side-car store (operators/positions.py): token-level
        # position lists for phrase / proximity queries, term-range
        # sorted so a query's term IN (...) scan prunes row groups
        from nil_spark.operators.positions import build_position_segments

        pos_df = (
            build_position_segments(docs, cfg)
            .repartitionByRange(max(args.shuffle_partitions // 4, 1), "term")
            .sortWithinPartitions("term", "first_doc")
        )
        pos_df.write.mode("overwrite").parquet(f"{args.index_dir}/positions")
        n_pos = spark.read.parquet(f"{args.index_dir}/positions").count()
    print(json.dumps({
        "n_docs": idx["n_docs"], "avgdl": round(idx["avgdl"], 3),
        "segments": idx["segments"].count(),
        "manifest": builder.manifest_path,
        **({"replica_store": published} if published else {}),
        **({"position_chunks": n_pos} if n_pos is not None else {}),
        **({"docvalues": sorted(dv_out)} if dv_out else {}),
        **({"keyword_docvalues": sorted(kw_out)} if kw_out else {}),
    }))
    spark.stop()
    return 0


def _is_streaming_layout(index_dir: str) -> bool:
    import os

    return os.path.exists(
        os.path.join(index_dir, "stream_manifest.json")
    ) and not os.path.exists(os.path.join(index_dir, "manifest.json"))


def _open_streaming_index(spark, index_dir: str, cfg):
    """Resolve an IncrementalIndexer-layout index for serving: handle
    dict from load_index plus the concrete segment file paths (for the
    replica-resident path — compacted generation + not-yet-compacted
    batch deltas).  Returns the tuple or an int exit code."""
    import glob as _glob
    import os

    from nil_spark.streaming.incremental import IncrementalIndexer

    # a typo'd or batch-layout dir must fail structured BEFORE
    # IncrementalIndexer.__init__, which creates the directory as a side
    # effect and whose load_index would then raise a raw traceback
    if not os.path.exists(os.path.join(index_dir, "stream_manifest.json")):
        print(json.dumps({
            "error": "not a streaming-layout index",
            "index_dir": index_dir,
            "hint": "no stream_manifest.json found — pass an index built by "
                    "`nil_spark build-stream`, or drop --layout streaming "
                    "for a batch-layout index",
        }), file=sys.stderr)
        return 2
    try:
        inc = IncrementalIndexer(index_dir, cfg)
    except ValueError as e:  # config-fingerprint drift
        print(json.dumps({"error": "config mismatch", "detail": str(e)}),
              file=sys.stderr)
        return 2
    idx = inc.load_index(spark)
    gen = int(inc.manifest.get("compacted_gen", 0))
    compacted = set(inc.manifest.get("compacted_batch_ids", []))
    paths = sorted(
        _glob.glob(os.path.join(index_dir, "compacted", f"gen={gen}", "part-*.parquet"))
    )
    for b in inc.manifest["batches"]:
        if int(b["batch_id"]) not in compacted:
            paths += sorted(
                _glob.glob(
                    os.path.join(
                        index_dir, "segments", f"batch_id={int(b['batch_id'])}",
                        "part-*.parquet",
                    )
                )
            )
    return inc, idx, paths


def _open_index(spark, args, cfg, builder):
    """Shared query-side index resolution: config-drift check, corpus
    stats (either layout), stopword-pruned term dictionary.  Returns
    (segs, termdict, n_docs, avgdl) or an int exit code on structured
    failure."""
    if _is_streaming_layout(args.index_dir):
        print(json.dumps({
            "error": "streaming-layout index",
            "hint": "this index was built by build-stream "
                    "(IncrementalIndexer layout); use `query --layout "
                    "streaming`, `query-stream`, or `stats` — they detect "
                    "this layout — not the batch manifest path",
        }), file=sys.stderr)
        return 2
    # fail fast on config drift: querying with a tokenization/scoring
    # config that differs from the one the index was built with would
    # silently tokenize queries differently and return wrong results
    from nil_spark.operators.segments import _cfg_fingerprint

    built_fp = builder.manifest.get("config_fingerprint")
    if built_fp and built_fp != _cfg_fingerprint(cfg):
        print(json.dumps({
            "error": "config mismatch",
            "index_fingerprint": built_fp,
            "query_fingerprint": _cfg_fingerprint(cfg),
            "hint": "pass the same --gram-size (and cfg) the index was built with",
        }), file=sys.stderr)
        return 2
    import os

    segs = spark.read.parquet(f"{args.index_dir}/segments")
    termdict = spark.read.parquet(f"{args.index_dir}/termdict")
    if os.path.isdir(f"{args.index_dir}/docstats"):  # classic layout
        from nil_spark.operators.index import corpus_stats

        n_docs, avgdl = corpus_stats(spark.read.parquet(f"{args.index_dir}/docstats"))
    else:  # fused layout: corpus scalars recorded in the manifest
        c = builder.manifest.get("corpus")
        if not c:  # crashed build or hand-copied index dir — fail structured
            print(json.dumps({
                "error": "manifest missing corpus stats",
                "manifest": builder.manifest_path,
                "hint": "the index build did not complete (no termdict stage); "
                        "rebuild with `nil_spark build`",
            }), file=sys.stderr)
            return 2
        n_docs, avgdl = int(c["n_docs"]), float(c["avgdl"])
    # stopword-prune the term dictionary: the serving paths score
    # whatever postings the shard files hold, and the doc-sharded
    # (partial) layout still carries hot-term postings that the merged
    # store drops — the df cutoff must come from the dictionary, not
    # from which layout happens to be on disk
    from pyspark.sql import functions as F

    if cfg.df_stopword_cutoff is not None and cfg.df_stopword_cutoff < 1.0:
        termdict = termdict.filter(
            F.col("df") <= int(cfg.df_stopword_cutoff * n_docs)
        )
    return segs, termdict, n_docs, avgdl


def _cmd_query_positional(spark, args, cfg, mode: str) -> int:
    """Phrase / proximity serving from the positional side-car store
    (`build --positions`).  Answers come from position lists alone —
    the corpus text is never re-read."""
    import os

    from nil_spark.operators.segments import _cfg_fingerprint

    if _is_streaming_layout(args.index_dir):
        from nil_spark.streaming.incremental import IncrementalIndexer

        try:
            inc = IncrementalIndexer(args.index_dir, cfg)
        except ValueError as e:  # config-fingerprint drift
            print(json.dumps({"error": "config mismatch", "detail": str(e)}),
                  file=sys.stderr)
            return 2
        try:
            store = inc.position_store(spark)
        except FileNotFoundError:
            print(json.dumps({
                "error": "no positional store",
                "index_dir": args.index_dir,
                "hint": f"--mode {mode} needs positional deltas; rebuild "
                        "the streaming index with `build-stream --positions`",
            }), file=sys.stderr)
            return 2
    else:
        builder = CheckpointedIndexBuilder(args.index_dir, cfg)
        built_fp = builder.manifest.get("config_fingerprint")
        if built_fp and built_fp != _cfg_fingerprint(cfg):
            print(json.dumps({
                "error": "config mismatch",
                "index_fingerprint": built_fp,
                "query_fingerprint": _cfg_fingerprint(cfg),
                "hint": "pass the same --gram-size (and cfg) the index "
                        "was built with",
            }), file=sys.stderr)
            return 2
        pos_dir = f"{args.index_dir}/positions"
        # _SUCCESS required, not just the dir: a build killed mid-write
        # leaves a partial store, and serving it would silently report
        # "no match" for every doc whose chunks are missing — the same
        # completeness discipline CheckpointedIndexBuilder applies to
        # every other stage
        if not os.path.exists(os.path.join(pos_dir, "_SUCCESS")):
            print(json.dumps({
                "error": "no positional store",
                "index_dir": args.index_dir,
                "hint": f"--mode {mode} needs a COMPLETE positional "
                        "side-car store (positions/_SUCCESS); rebuild "
                        "with `build --positions`",
            }), file=sys.stderr)
            return 2
        store = spark.read.parquet(pos_dir)
    qpdf = spark.read.parquet(args.queries).toPandas()
    from nil_spark.operators.deletes import (
        exclude_and_trim,
        load_tombstones,
    )
    from nil_spark.operators.positions import (
        min_window_positional,
        phrase_search_positional,
        proximity_search_positional,
    )

    tombs = load_tombstones(spark, args.index_dir)
    # live-docs deletes: phrase emits ALL hits (anti-join is exact);
    # the top-k modes over-retrieve k+T then trim (operators/deletes)
    k_eff = args.k + (len(tombs) if tombs is not None else 0)
    try:
        if mode == "phrase":
            out = phrase_search_positional(spark, qpdf, store, cfg)
            if tombs is not None:
                tomb_df = spark.createDataFrame(
                    [(int(t),) for t in tombs], "doc_id long"
                )
                from pyspark.sql import functions as F

                out = out.join(F.broadcast(tomb_df), "doc_id", "left_anti")
        elif mode == "window":
            out = min_window_positional(spark, qpdf, store, cfg, k=k_eff)
        else:
            out = proximity_search_positional(spark, qpdf, store, cfg, k=k_eff)
        if tombs is not None and mode in ("window", "proximity"):
            out = exclude_and_trim(out, tombs, args.k)
    except ValueError as e:  # e.g. proximity query with one distinct term
        print(json.dumps({"error": "bad query", "detail": str(e)}),
              file=sys.stderr)
        return 2
    out.write.mode("overwrite").parquet(args.out)
    print(json.dumps({"results": spark.read.parquet(args.out).count(),
                      "mode": mode}))
    return 0


def _cmd_query_dsl(spark, args, cfg) -> int:
    """Boolean query-DSL serving (operators/dsl_exec.py): parse each
    ``dsl`` string, resolve phrases from the positional store, execute
    the boolean algebra + BM25 scoring against the replica postings.
    NOT complements against the docs the index contains
    (universe_mode='indexed' — sound for any build config)."""
    import glob as _glob
    import os

    from nil_spark.functions.querylang import (
        QueryParseError,
        field_predicates,
        parse_query,
    )
    from nil_spark.operators.docvalues import (
        docvalues_dir,
        keyword_docvalues_dir,
    )
    from nil_spark.operators.dsl_exec import (
        _collect_phrases,
        dsl_search_replica,
    )

    if _is_streaming_layout(args.index_dir):
        print(json.dumps({
            "error": "streaming-layout index",
            "hint": "--mode dsl serves batch-built indexes; query the "
                    "batch index or compact-and-copy the streaming one",
        }), file=sys.stderr)
        return 2
    builder = CheckpointedIndexBuilder(args.index_dir, cfg)
    opened = _open_index(spark, args, cfg, builder)
    if isinstance(opened, int):
        return opened
    _segs, termdict, n_docs, avgdl = opened

    q = spark.read.parquet(args.queries)
    if "dsl" not in q.columns or "query_id" not in q.columns:
        print(json.dumps({
            "error": "bad query schema",
            "columns": q.columns,
            "hint": "--mode dsl needs parquet with (query_id, dsl)",
        }), file=sys.stderr)
        return 2
    qpdf = q.select("query_id", "dsl").toPandas()

    # parse up front: a typo'd query should fail structured with the
    # offending query id, not as a worker-side traceback
    phrases: set = set()
    fields: set = set()
    for qid, text in zip(qpdf["query_id"], qpdf["dsl"]):
        try:
            if not isinstance(text, str):
                # a NULL dsl cell would str() into the literal term
                # 'none' and silently return hits for that token
                raise QueryParseError("dsl is null / not a string")
            ast = parse_query(text)
        except QueryParseError as e:
            print(json.dumps({
                "error": "bad dsl query",
                "query_id": int(qid),
                "detail": str(e),
            }), file=sys.stderr)
            return 2
        _collect_phrases(ast, phrases)
        fields |= field_predicates(ast)

    # field predicates resolve from the index's doc-values side-cars
    numeric_dv: dict = {}
    keyword_dv: dict = {}
    for kind, f in sorted(fields):
        d = (
            keyword_docvalues_dir(args.index_dir, f)
            if kind == "keyword"
            else docvalues_dir(args.index_dir, f)
        )
        if d is None:
            flag = (
                "--keyword-docvalues" if kind == "keyword"
                else "--docvalues"
            )
            print(json.dumps({
                "error": "no doc-values store for field",
                "field": f,
                "kind": kind,
                "hint": f"rebuild with `build {flag} {f}`",
            }), file=sys.stderr)
            return 2
        (keyword_dv if kind == "keyword" else numeric_dv)[f] = d

    pos_store = None
    if phrases:
        pos_dir = f"{args.index_dir}/positions"
        if not os.path.exists(os.path.join(pos_dir, "_SUCCESS")):
            print(json.dumps({
                "error": "no positional store",
                "index_dir": args.index_dir,
                "hint": "the query set contains phrases; rebuild with "
                        "`build --positions`",
            }), file=sys.stderr)
            return 2
        pos_store = spark.read.parquet(pos_dir)

    paths = sorted(
        _glob.glob(f"{args.index_dir}/partial_segments/part-*.parquet")
    ) or sorted(_glob.glob(f"{args.index_dir}/segments/part-*.parquet"))
    from nil_spark.operators.deletes import load_tombstones

    from nil_spark.operators.segments import (
        TermdictTooLargeError,
        collect_termdict,
    )

    try:
        td_pdf = collect_termdict(termdict)
    except TermdictTooLargeError as e:
        # DSL serving is replica-kernel-only — no join fallback exists
        print(json.dumps({
            "error": "termdict too large for the DSL replica kernel",
            "detail": str(e),
            "hint": "shrink the dictionary or raise "
                    "NIL_TERMDICT_DRIVER_MAX",
        }), file=sys.stderr)
        return 2
    from nil_spark.operators.dsl_exec import PhraseSetTooLargeError

    try:
        out = dsl_search_replica(
            spark, qpdf, paths, td_pdf, n_docs, avgdl, cfg,
            k=args.k, pos_store=pos_store, universe_mode="indexed",
            excluded=load_tombstones(spark, args.index_dir),
            numeric_dv=numeric_dv, keyword_dv=keyword_dv,
        )
    except PhraseSetTooLargeError as e:
        print(json.dumps({
            "error": "phrase matches too many docs",
            "detail": str(e),
        }), file=sys.stderr)
        return 2
    except ValueError as e:  # pruned dictionary / shingle-term index
        print(json.dumps({"error": "index unsuitable for dsl",
                          "detail": str(e)}), file=sys.stderr)
        return 2
    out.write.mode("overwrite").parquet(args.out)
    print(json.dumps({"results": spark.read.parquet(args.out).count(),
                      "mode": "dsl"}))
    return 0


def _cmd_query_federated(spark, args, cfg, dirs: list[str]) -> int:
    """Multi-index (alias) serving: comma-separated --index-dir, merged
    global statistics, docBase-offset doc ids, per-row `index` column
    (operators/federated.py)."""
    from pyspark.sql import functions as F

    from nil_spark.operators.federated import (
        FederatedIndexError,
        federated_topk,
        open_federated,
    )

    topology = getattr(args, "topology", "join")
    incompatible = [
        flag for flag, active in (
            (f"--mode {getattr(args, 'mode', 'bm25')}",
             getattr(args, "mode", "bm25") != "bm25"),
            (f"--topology {topology}", topology not in ("join", "replica")),
            ("--verify", getattr(args, "verify", "none") != "none"),
            ("--explain", getattr(args, "explain", False)),
            ("--filter-docs", bool(getattr(args, "filter_docs", None))),
            ("--layout streaming",
             getattr(args, "layout", "batch") == "streaming"),
        ) if active
    ]
    if incompatible:
        print(json.dumps({
            "error": f"{' '.join(incompatible)} unsupported with a "
                     "multi-index --index-dir",
            "hint": "federated search serves --mode bm25 with --topology "
                    "join or replica over batch-built members",
        }), file=sys.stderr)
        return 2
    try:
        fed = open_federated(spark, dirs, cfg)
    except FederatedIndexError as e:
        print(json.dumps({"error": "federated open failed",
                          "detail": str(e)}), file=sys.stderr)
        return 2
    q = spark.read.parquet(args.queries)
    if "after_doc" in q.columns or "after_score" in q.columns:
        print(json.dumps({
            "error": "search_after cursors are unsupported with a "
                     "multi-index --index-dir",
            "hint": "cursor pagination is a single-replica kernel feature",
        }), file=sys.stderr)
        return 2
    if "k" not in q.columns:
        q = q.withColumn("k", F.lit(args.k))
    out = federated_topk(spark, q, fed, cfg, topology=topology)
    out.write.mode("overwrite").parquet(args.out)
    print(json.dumps({
        "results": spark.read.parquet(args.out).count(),
        "members": [m.name for m in fed.members],
        "n_docs": fed.n_docs,
        "avgdl": round(fed.avgdl, 3),
    }))
    return 0


def cmd_query(args) -> int:
    spark = get_spark(app="nil_spark_query", master=args.master,
                      shuffle_partitions=args.shuffle_partitions)
    cfg = _cfg_from_args(args)
    from pyspark.sql import functions as F

    similarity = getattr(args, "similarity", "bm25")
    decay_arg = getattr(args, "decay", None)
    sort_arg = getattr(args, "sort_by", None)
    dirs = [d for d in args.index_dir.split(",") if d]
    if len(dirs) > 1:
        if similarity != "bm25" or decay_arg or sort_arg:
            bad = ("--similarity" if similarity != "bm25"
                   else "--decay" if decay_arg else "--sort-by")
            print(json.dumps({
                "error": f"{bad} is unsupported for federated search",
                "hint": "federated merge serves BM25 global statistics; "
                        "serve a single index with --topology replica "
                        "for similarity modules / doc-values features",
            }), file=sys.stderr)
            spark.stop()
            return 2
        rc = _cmd_query_federated(spark, args, cfg, dirs)
        spark.stop()
        return rc
    mode = getattr(args, "mode", "bm25")
    if mode != "bm25":
        # the positional modes answer from position lists alone —
        # ranked-retrieval flags don't compose with them; refusing
        # beats silently ignoring (unfiltered/unverified results
        # reported as if the flag applied)
        incompatible = [
            flag for flag, active in (
                ("--filter-docs", bool(getattr(args, "filter_docs", None))),
                ("--verify", getattr(args, "verify", "none") != "none"),
                ("--topology", getattr(args, "topology", "join") != "join"),
                ("--explain", getattr(args, "explain", False)),
                ("--similarity", similarity != "bm25"),
                ("--decay", bool(decay_arg)),
                ("--sort-by", bool(sort_arg)),
            ) if active
        ]
        if incompatible:
            print(json.dumps({
                "error": f"{' '.join(incompatible)} unsupported with "
                         f"--mode {mode}",
                "hint": "phrase/proximity serve from the positional store; "
                        "filtered/verified/topology options apply to "
                        "--mode bm25 only",
            }), file=sys.stderr)
            spark.stop()
            return 2
        rc = (
            _cmd_query_dsl(spark, args, cfg)
            if mode == "dsl"
            else _cmd_query_positional(spark, args, cfg, mode)
        )
        spark.stop()
        return rc

    if getattr(args, "layout", "batch") == "streaming" or (
        getattr(args, "layout", "batch") == "batch"
        and _is_streaming_layout(args.index_dir)
    ):
        # index built by the streaming path (IncrementalIndexer):
        # per-batch delta dirs + optional compacted generation; one
        # serving surface for both builders (auto-detected by layout)
        if getattr(args, "topology", "join") != "join":
            print(json.dumps({
                "error": "unsupported topology for streaming layout",
                "hint": "query --layout streaming serves via the join "
                        "topology; use query-stream for replica-resident "
                        "serving of a streaming-built index",
            }), file=sys.stderr)
            spark.stop()
            return 2
        if getattr(args, "verify", "none") != "none":
            # streaming-index doc ids come from the absorb sequence
            # (next_doc_id), not the deterministic (conv_id, turn_idx)
            # assignment --corpus re-derivation assumes — verification
            # would silently score the wrong texts
            print(json.dumps({
                "error": "--verify is unsupported for streaming layout",
                "hint": "query the batch-built index for verified serving",
            }), file=sys.stderr)
            spark.stop()
            return 2
        if getattr(args, "filter_docs", None):
            # the streaming layout serves via the join topology, which
            # has no in-kernel admission filter — refuse rather than
            # return unfiltered results under a filter flag
            print(json.dumps({
                "error": "--filter-docs is unsupported for streaming layout",
                "hint": "--filter-docs needs --topology wand on a "
                        "batch-built index",
            }), file=sys.stderr)
            spark.stop()
            return 2
        if similarity != "bm25" or decay_arg or sort_arg:
            bad = ("--similarity" if similarity != "bm25"
                   else "--decay" if decay_arg else "--sort-by")
            print(json.dumps({
                "error": f"{bad} is unsupported for streaming layout",
                "hint": "similarity modules and doc-values serving are "
                        "replica-kernel features; query a batch-built "
                        "index with --topology replica",
            }), file=sys.stderr)
            spark.stop()
            return 2
        opened = _open_streaming_index(spark, args.index_dir, cfg)
        if isinstance(opened, int):
            spark.stop()
            return opened
        inc, idx, _paths = opened
        from nil_spark.operators.deletes import (
            exclude_and_trim as _trim,
            load_tombstones as _load_tombs,
        )

        s_tombs = _load_tombs(spark, args.index_dir)
        q = spark.read.parquet(args.queries)
        if "after_doc" in q.columns or "after_score" in q.columns:
            print(json.dumps({
                "error": "search_after cursors are unsupported for "
                         "streaming layout",
                "hint": "cursor pagination is a replica-kernel feature; "
                        "query a batch-built index with --topology replica",
            }), file=sys.stderr)
            spark.stop()
            return 2
        if "k" not in q.columns:
            q = q.withColumn("k", F.lit(args.k))
        s_trim = None
        if s_tombs is not None:  # over-retrieve + trim (exact)
            s_trim = q.select("query_id", F.col("k").alias("__trim_k"))
            q = q.withColumn(
                "k", (F.col("k") + F.lit(int(len(s_tombs)))).cast("int")
            )
        out = topk_maxscore(
            q, idx["segments"], idx["termdict"], idx["n_docs"], idx["avgdl"], cfg
        )
        if s_trim is not None:
            out = _trim(
                out.join(F.broadcast(s_trim), "query_id"), s_tombs,
                "__trim_k",
            ).drop("__trim_k")
        out.write.mode("overwrite").parquet(args.out)
        print(json.dumps({"results": spark.read.parquet(args.out).count(),
                          "layout": "streaming",
                          "compacted_gen": inc.manifest.get("compacted_gen", 0)}))
        spark.stop()
        return 0
    builder = CheckpointedIndexBuilder(args.index_dir, cfg)
    opened = _open_index(spark, args, cfg, builder)
    if isinstance(opened, int):
        spark.stop()
        return opened
    segs, termdict, n_docs, avgdl = opened
    from nil_spark.operators.deletes import (
        exclude_and_trim,
        load_tombstones,
    )

    tombs = load_tombstones(spark, args.index_dir)
    q = spark.read.parquet(args.queries)

    if "k" not in q.columns:
        q = q.withColumn("k", F.lit(args.k))
    verify = getattr(args, "verify", "none")
    q_final = q  # original k — what verification trims back to
    if verify != "none":
        if not getattr(args, "corpus", None):
            print(json.dumps({
                "error": "--verify needs --corpus",
                "hint": "the index stores postings, not text; point "
                        "--corpus at the transcripts the index was built "
                        "from (doc ids are re-derived deterministically)",
            }), file=sys.stderr)
            spark.stop()
            return 2
        # retrieve k+margin so verification has a residue to trim
        q = q.withColumn(
            "k", (F.col("k") + F.lit(int(args.verify_margin))).cast("int")
        )
    topology = getattr(args, "topology", "join")
    explain = getattr(args, "explain", False)
    if similarity != "bm25" and (
        topology != "replica" or verify != "none" or explain
    ):
        bad = (
            f"--topology {topology}" if topology != "replica"
            else ("--verify" if verify != "none" else "--explain")
        )
        print(json.dumps({
            "error": f"--similarity {similarity} is unsupported with {bad}",
            "hint": "the LM Dirichlet module serves from the replica "
                    "kernel's raw-statistics store; use --topology replica "
                    "without --verify/--explain (those paths score BM25)",
        }), file=sys.stderr)
        spark.stop()
        return 2
    if decay_arg or sort_arg:
        flag = "--decay" if decay_arg else "--sort-by"
        bad = None
        if decay_arg and sort_arg:
            bad = "--sort-by (one ranking per query)"
        elif topology != "replica":
            bad = f"--topology {topology}"
        elif verify != "none":
            bad = "--verify"
        elif explain:
            bad = "--explain"
        elif similarity != "bm25":
            bad = f"--similarity {similarity}"
        if bad is not None:
            print(json.dumps({
                "error": f"{flag} is unsupported with {bad}",
                "hint": "doc-values serving (decay rescoring / field sort) "
                        "runs in the replica kernel over BM25: use "
                        "--topology replica without --verify/--explain/"
                        "--similarity, and pick ONE of --decay/--sort-by",
            }), file=sys.stderr)
            spark.stop()
            return 2
    if explain and (topology != "replica" or verify != "none"):
        print(json.dumps({
            "error": "--explain requires --topology replica"
                     if topology != "replica"
                     else "--explain does not compose with --verify",
            "hint": "the per-term breakdown is read from the replica "
                    "kernel's posting arrays; serve with --topology "
                    "replica and no verification pass",
        }), file=sys.stderr)
        spark.stop()
        return 2
    if explain and ("after_doc" in q.columns or "after_score" in q.columns):
        print(json.dumps({
            "error": "--explain does not compose with search_after cursors",
            "hint": "explain the page you already retrieved: pass the "
                    "page's queries without cursor columns and k sized "
                    "to the page",
        }), file=sys.stderr)
        spark.stop()
        return 2
    if "after_doc" in q.columns or "after_score" in q.columns:
        # cursor pagination executes in-kernel on the replica topology;
        # everywhere else the columns would be silently ignored —
        # refuse rather than return page 1 labeled as page N
        bad = None
        if topology != "replica":
            bad = f"--topology {topology}"
        elif verify != "none":
            bad = "--verify"
        elif "after_doc" not in q.columns or "after_score" not in q.columns:
            bad = "a queries file with only one of after_doc/after_score"
        if bad is not None:
            print(json.dumps({
                "error": f"search_after cursors are unsupported with {bad}",
                "hint": "pass BOTH after_score and after_doc columns and "
                        "serve with --topology replica (in-kernel cursor "
                        "admission); other paths would silently ignore "
                        "the cursor",
            }), file=sys.stderr)
            spark.stop()
            return 2
    trim_k = None
    if tombs is not None and topology != "wand" and not explain:
        # live-docs deletes, over-retrieve strategy (exact): fetch
        # top-(k + T), drop tombstoned docs, renumber back to k.  The
        # WAND topology instead excludes in-kernel (scales to large T).
        # (--explain passes the tombstones into its kernel instead —
        # in-kernel admission, like WAND.)
        trim_k = q.select("query_id", F.col("k").alias("__trim_k"))
        q = q.withColumn(
            "k", (F.col("k") + F.lit(int(len(tombs)))).cast("int")
        )
    allowed = None
    if getattr(args, "filter_docs", None):
        # filtered search: the predicate's admissible doc ids, pushed
        # into the WAND kernel (the only topology with in-kernel
        # candidate admission)
        if topology != "wand":
            print(json.dumps({
                "error": "--filter-docs requires --topology wand",
                "hint": "the admissible-doc pre-filter is a WAND-kernel "
                        "feature; other topologies would silently ignore it",
            }), file=sys.stderr)
            spark.stop()
            return 2
        import numpy as _np

        allowed = (
            spark.read.parquet(args.filter_docs)
            .select("doc_id").toPandas()["doc_id"].to_numpy(_np.int64)
        )
    if topology != "join":
        # driver-resident termdict bound (segments.check_termdict_size):
        # every non-join topology collects the full dictionary to build
        # the broadcast term→df map.  When it's over the bound,
        # auto-switch to the join topology (streams the dictionary) —
        # unless a requested feature is pinned to the original topology,
        # in which case refuse with a structured error rather than
        # silently dropping the feature.
        from nil_spark.operators.segments import (
            TermdictTooLargeError,
            check_termdict_size,
        )

        try:
            check_termdict_size(termdict)
        except TermdictTooLargeError as e:
            pinned = (
                explain
                or getattr(args, "filter_docs", None)
                or similarity != "bm25"
                or decay_arg
                or sort_arg
                or "after_doc" in q.columns
                or "after_score" in q.columns
            )
            if pinned:
                print(json.dumps({
                    "error": "termdict too large for a driver-resident "
                             "topology",
                    "detail": str(e),
                    "hint": "the requested feature is pinned to "
                            f"--topology {topology}; shrink the "
                            "dictionary (df-stopword pruning) or raise "
                            "NIL_TERMDICT_DRIVER_MAX",
                }), file=sys.stderr)
                spark.stop()
                return 2
            print(json.dumps({
                "warning": "termdict over the driver-resident bound; "
                           "auto-switching to --topology join",
                "detail": str(e),
            }), file=sys.stderr)
            topology = "join"
    if topology == "join":
        out = topk_maxscore(q, segs, termdict, n_docs, avgdl, cfg)
    else:
        # serving topologies: the query batch is driver-resident (it is
        # the small side by design); posting data never moves
        import glob as _glob

        from nil_spark.operators.segments import (
            topk_maxscore_sharded,
            topk_replica_resident,
            topk_term_sharded,
        )

        qpdf = q.toPandas()
        # doc-sharded layout (fused build keeps it as partial_segments):
        # required by the sharded scatter/gather — each doc must live in
        # exactly ONE file or per-shard top-k drops partial scores.  The
        # replica path merges everything per node, so either layout works.
        doc_sharded = sorted(
            _glob.glob(f"{args.index_dir}/partial_segments/part-*.parquet")
        )
        paths = doc_sharded or sorted(
            _glob.glob(f"{args.index_dir}/segments/part-*.parquet")
        )
        if topology == "sharded" and not doc_sharded:
            print(json.dumps({
                "error": "no doc-sharded layout",
                "hint": "--topology sharded needs the fused build's "
                        "partial_segments (doc-exclusive shards); this index "
                        "has only the merged term-sorted store — use "
                        "--topology replica or join",
            }), file=sys.stderr)
            spark.stop()
            return 2
        td_pdf = termdict.toPandas()
        if topology == "replica" and explain:
            from nil_spark.operators.segments import explain_topk_replica

            out = explain_topk_replica(
                spark, qpdf, paths, td_pdf, n_docs, avgdl, cfg,
                excluded=tombs,
            )
        elif topology == "replica":
            if similarity != "bm25":
                cfg = cfg.with_(lmd_mu=float(getattr(args, "lmd_mu", 2000.0)))
            dk = sb = None
            if decay_arg or sort_arg:
                from nil_spark.operators.docvalues import (
                    docvalues_dir,
                    keyword_docvalues_dir,
                )

                spec = decay_arg or sort_arg
                field = spec.split(":")[0]
                dv = docvalues_dir(args.index_dir, field)
                kw = (
                    keyword_docvalues_dir(args.index_dir, field)
                    if dv is None and sort_arg
                    else None
                )
                if dv is None and kw is None:
                    print(json.dumps({
                        "error": f"no doc-values store for field {field!r}",
                        "index_dir": args.index_dir,
                        "hint": f"rebuild with `build --docvalues {field}` "
                                "(numeric) or `build --keyword-docvalues "
                                f"{field}` (keyword sort; --decay needs "
                                "numeric) — a COMPLETE side-car is required",
                    }), file=sys.stderr)
                    spark.stop()
                    return 2
                try:
                    if decay_arg:
                        _f, origin_s, sigma_s = decay_arg.split(":")
                        if origin_s == "max":
                            origin = float(
                                spark.read.parquet(dv)
                                .agg(F.max("value")).collect()[0][0]
                            )
                        else:
                            origin = float(origin_s)
                        dk = {"dv_dir": dv, "origin": origin,
                              "sigma": float(sigma_s)}
                    else:
                        p = sort_arg.split(":")
                        if len(p) > 2 or (len(p) == 2 and p[1] not in ("asc", "desc")):
                            raise ValueError(sort_arg)
                        sb = {"dv_dir": dv or kw,
                              "ascending": len(p) == 2 and p[1] == "asc"}
                        if kw is not None:
                            sb["kind"] = "keyword"
                except ValueError:
                    print(json.dumps({
                        "error": f"malformed doc-values spec {spec!r}",
                        "hint": "--decay FIELD:ORIGIN:SIGMA (ORIGIN numeric "
                                "or `max`); --sort-by FIELD[:asc|desc]",
                    }), file=sys.stderr)
                    spark.stop()
                    return 2
            out = topk_replica_resident(
                spark, qpdf, paths, td_pdf, n_docs, avgdl, cfg,
                tokenize_on="worker", similarity=similarity,
                decay=dk, sort_by=sb,
            )
        elif topology == "wand":
            from nil_spark.operators.wand import topk_replica_bmw

            out = topk_replica_bmw(
                spark, qpdf, paths, td_pdf, n_docs, avgdl, cfg,
                allowed=allowed, excluded=tombs,
            )
        elif topology == "term_sharded":
            # term-range routing reads the MERGED store's footers
            merged = sorted(
                _glob.glob(f"{args.index_dir}/segments/part-*.parquet")
            )
            out = topk_term_sharded(
                spark, qpdf, merged, td_pdf, n_docs, avgdl, cfg
            )
        else:
            out = topk_maxscore_sharded(
                spark, qpdf, paths, td_pdf, n_docs, avgdl, cfg
            )
    if trim_k is not None:
        out = exclude_and_trim(
            out.join(F.broadcast(trim_k), "query_id"), tombs, "__trim_k"
        ).drop("__trim_k")
    if similarity != "bm25" or decay_arg:
        # the kernel's output schema is fixed; the column is only BM25
        # when the BM25 module alone scored it
        out = out.withColumnRenamed("bm25", "score")
    elif sort_arg:
        out = out.withColumnRenamed("bm25", "sort_value")
        if sb is not None and sb.get("kind") == "keyword":
            # sort_value is the SortedDocValues ORDINAL (how Lucene
            # sorts keywords); surface the term itself alongside via
            # the tiny sorted dictionary
            import os

            with open(os.path.join(sb["dv_dir"], "dict.json")) as fh:
                _terms = json.load(fh)
            tdf = spark.createDataFrame(
                list(enumerate(_terms)), "___o long, sort_term string"
            )
            out = out.join(
                F.broadcast(tdf),
                out["sort_value"].cast("long") == tdf["___o"],
                "left",
            ).drop("___o")
    if verify != "none":
        from nil_spark.operators.search_verify import verify_topk

        docs_txt = assign_doc_ids(
            read_docs(spark, args.corpus, args.corpus_format),
            ["conv_id", "turn_idx"],
        ).select("doc_id", "text")
        out = verify_topk(
            out.select("query_id", "doc_id", "bm25"),
            q_final.select("query_id", "text", "k"),
            docs_txt,
            cfg,
            mode=verify,
            delta=args.delta,
        )
    out.write.mode("overwrite").parquet(args.out)
    print(json.dumps({"results": spark.read.parquet(args.out).count(),
                      "manifest": builder.manifest_path}))
    spark.stop()
    return 0


def cmd_build_stream(args) -> int:
    """Incremental index build: absorb all currently-available
    transcript files as micro-batches (Trigger.AvailableNow), then
    optionally compact the deltas into one term-sorted generation.
    Re-runs skip already-absorbed files via the stream checkpoint."""
    spark = get_spark(app="nil_spark_build_stream", master=args.master,
                      shuffle_partitions=args.shuffle_partitions)
    cfg = _cfg_from_args(args)
    from nil_spark.streaming.incremental import IncrementalIndexer

    try:
        inc = IncrementalIndexer(
            args.index_dir, cfg,
            positions=(True if getattr(args, "positions", False) else None),
        )
    except ValueError as e:  # config/positions drift vs existing index
        print(json.dumps({"error": "config mismatch", "detail": str(e)}),
              file=sys.stderr)
        spark.stop()
        return 2
    inc.run_available(spark, args.input, fmt=getattr(args, "format", "parquet"))
    info = {"batches": len(inc.manifest["batches"]),
            "n_docs": inc.manifest["next_doc_id"]}
    if args.compact:
        info["compact"] = inc.compact(
            spark, publish=getattr(args, "publish_replica", False)
        )
    print(json.dumps(info))
    spark.stop()
    return 0


def cmd_query_stream(args) -> int:
    """Streaming serving: tail a directory of query parquet files and
    answer each micro-batch against the index (replica-resident path),
    exactly-once batch_id-keyed results under --out."""
    import glob as _glob

    spark = get_spark(app="nil_spark_query_stream", master=args.master,
                      shuffle_partitions=args.shuffle_partitions)
    cfg = _cfg_from_args(args)
    if _is_streaming_layout(args.index_dir):
        opened = _open_streaming_index(spark, args.index_dir, cfg)
        if isinstance(opened, int):
            spark.stop()
            return opened
        _inc, idx, paths = opened
        termdict = idx["termdict"]
        n_docs, avgdl = idx["n_docs"], idx["avgdl"]
    else:
        builder = CheckpointedIndexBuilder(args.index_dir, cfg)
        opened = _open_index(spark, args, cfg, builder)
        if isinstance(opened, int):
            spark.stop()
            return opened
        _segs, termdict, n_docs, avgdl = opened
        paths = sorted(
            _glob.glob(f"{args.index_dir}/partial_segments/part-*.parquet")
        ) or sorted(_glob.glob(f"{args.index_dir}/segments/part-*.parquet"))
    from nil_spark.operators.deletes import load_tombstones
    from nil_spark.operators.segments import (
        TermdictTooLargeError,
        collect_termdict,
    )
    from nil_spark.streaming.serving import StreamingQueryServer

    try:
        td_pdf = collect_termdict(termdict)
    except TermdictTooLargeError as e:
        # the streaming server's worker-side tokenizer needs the full
        # broadcast df_map — no join fallback on this surface
        print(json.dumps({
            "error": "termdict too large for the streaming query server",
            "detail": str(e),
        }), file=sys.stderr)
        spark.stop()
        return 2
    srv = StreamingQueryServer(
        args.out, paths, td_pdf, n_docs, avgdl, cfg,
        tokenize_on="worker",
        excluded=load_tombstones(spark, args.index_dir),
    )
    srv.run_available(spark, args.queries_dir)
    print(json.dumps({
        "batches": len(srv.manifest["batches"]),
        "queries": sum(b["n_queries"] for b in srv.manifest["batches"]),
        "results": srv.results(spark).count() if srv.manifest["batches"] else 0,
        "manifest": srv._manifest_path,
    }))
    spark.stop()
    return 0


def cmd_percolate(args) -> int:
    """Streaming percolation (reverse search): match a stored DSL-query
    set against a directory of transcript files as micro-batches,
    exactly-once (conv_id, turn_idx, query_id) match rows under --out."""
    spark = get_spark(app="nil_spark_percolate", master=args.master,
                      shuffle_partitions=args.shuffle_partitions)
    import pandas as _pd

    from nil_spark.functions.querylang import QueryParseError
    from nil_spark.streaming.percolate import StreamingPercolator

    qpdf = _pd.read_parquet(args.queries)
    missing = {"query_id", "dsl"} - set(qpdf.columns)
    if missing:
        print(json.dumps({
            "error": f"stored-queries file lacks columns: {sorted(missing)}",
            "hint": "percolate needs parquet with (query_id, dsl)",
        }), file=sys.stderr)
        spark.stop()
        return 2
    try:
        perc = StreamingPercolator(
            args.out, list(zip(qpdf["query_id"], qpdf["dsl"]))
        )
    except (QueryParseError, ValueError) as e:
        print(json.dumps({"error": "bad stored query", "detail": str(e)}),
              file=sys.stderr)
        spark.stop()
        return 2
    perc.run_available(spark, args.docs_dir)
    print(json.dumps({
        "batches": len(perc.manifest["batches"]),
        "fired": perc.results(spark).count() if perc.manifest["batches"] else 0,
        "manifest": perc._manifest_path,
    }))
    spark.stop()
    return 0


def cmd_iceberg(args) -> int:
    """Engine-native Iceberg table maintenance: `stats` (snapshot/file
    inventory, one JSON line), `compact` (rewrite_data_files — fold
    small files, absorb delete files into a replace snapshot), `expire`
    (drop old snapshots + every file they alone reference)."""
    import os as _os

    from nil_spark.sources.iceberg import IcebergTable

    if not _os.path.exists(_os.path.join(args.table, "metadata", "version-hint.text")):
        print(json.dumps({"error": "not an Iceberg table", "table": args.table}),
              file=sys.stderr)
        return 2
    t = IcebergTable(args.table)
    if args.action == "stats":
        md = t.metadata()
        data, dels, _ = t.plan_files()
        print(json.dumps({
            "snapshots": len(md["snapshots"]),
            "current_snapshot_id": md["current-snapshot-id"],
            "last_sequence_number": md["last-sequence-number"],
            "schema_fields": len(t.schema().fields),
            "partition_columns": t.partition_columns(),
            "data_files": len(data),
            "delete_files": len(dels),
            "properties": md["properties"].get("streaming.last-batch-id"),
        }))
        return 0
    spark = get_spark(app="nil_spark_iceberg", master=args.master,
                      shuffle_partitions=args.shuffle_partitions)
    try:
        if args.action == "compact":
            t.rewrite_data_files(spark, target_files=args.target_files)
            data, dels, _ = t.plan_files()
            print(json.dumps({"compacted": True, "data_files": len(data),
                              "delete_files": len(dels)}))
        else:  # expire
            removed = t.expire_snapshots(keep_last=args.keep_last)
            print(json.dumps({"expired": True, "files_removed": removed,
                              "snapshots": len(t.snapshots())}))
    finally:
        spark.stop()
    return 0


def cmd_delete(args) -> int:
    """Live-docs deletes: append a tombstone batch to the index; every
    query path then excludes those docs exactly (operators/deletes —
    in-kernel for WAND/DSL, over-retrieve+trim elsewhere).  Corpus
    statistics stay as built (Lucene semantics); rebuild to reclaim."""
    import os

    spark = get_spark(app="nil_spark_delete", master=args.master,
                      shuffle_partitions=args.shuffle_partitions)
    is_batch = os.path.exists(os.path.join(args.index_dir, "manifest.json"))
    if not is_batch and not os.path.exists(
        os.path.join(args.index_dir, "stream_manifest.json")
    ):
        print(json.dumps({
            "error": "not an index directory",
            "index_dir": args.index_dir,
            "hint": "no manifest.json / stream_manifest.json found",
        }), file=sys.stderr)
        spark.stop()
        return 2
    ids = spark.read.parquet(args.ids)
    if "doc_id" not in ids.columns:
        print(json.dumps({
            "error": "bad ids schema",
            "columns": ids.columns,
            "hint": "delete --ids needs parquet with a doc_id column",
        }), file=sys.stderr)
        spark.stop()
        return 2
    from nil_spark.operators.deletes import append_tombstones

    try:
        total = append_tombstones(spark, args.index_dir, ids)
    except ValueError as e:  # null / uncastable doc ids
        print(json.dumps({"error": "bad ids", "detail": str(e)}),
              file=sys.stderr)
        spark.stop()
        return 2
    info = {"tombstones_total": total}
    if is_batch:
        import json as _json

        with open(os.path.join(args.index_dir, "manifest.json")) as f:
            man = _json.load(f)
        n_docs = (man.get("corpus") or {}).get("n_docs")
        if n_docs:
            info["deleted_fraction"] = round(total / int(n_docs), 4)
            if total > 0.2 * int(n_docs):
                info["hint"] = (
                    "over 20% of the corpus is tombstoned — serving "
                    "over-retrieves k+T per query; rebuild the index to "
                    "reclaim (the merge that actually drops postings)"
                )
    print(json.dumps(info))
    spark.stop()
    return 0


def cmd_compact(args) -> int:
    """Expunge deletes: rewrite segments (and the positional store)
    without tombstoned postings, refresh corpus stats + term
    dictionary, clear the tombstone sidecar (operators/compact.py).
    Scores change at this boundary — stats now reflect the live
    corpus, exactly as after a Lucene merge."""
    import os

    spark = get_spark(app="nil_spark_compact", master=args.master,
                      shuffle_partitions=args.shuffle_partitions)
    if not os.path.exists(os.path.join(args.index_dir, "manifest.json")):
        print(json.dumps({
            "error": "not a batch index",
            "index_dir": args.index_dir,
            "hint": "compact rewrites the batch layout (manifest.json); "
                    "streaming indexes compact via their own generational "
                    "compaction (build-stream)",
        }), file=sys.stderr)
        spark.stop()
        return 2
    cfg = _cfg_from_args(args)
    from nil_spark.operators.compact import compact_index

    print(json.dumps(compact_index(spark, args.index_dir, cfg)))
    spark.stop()
    return 0


def cmd_stats(args) -> int:
    """Operational index introspection: corpus scalars, term/posting/
    chunk counts, df distribution, on-disk bytes, build lineage."""
    import glob as _glob
    import os

    spark = get_spark(app="nil_spark_stats", master=args.master,
                      shuffle_partitions=args.shuffle_partitions)
    cfg = _cfg_from_args(args)
    if _is_streaming_layout(args.index_dir):
        opened = _open_streaming_index(spark, args.index_dir, cfg)
        if isinstance(opened, int):
            spark.stop()
            return opened
        inc, idx, _paths = opened
        segs, termdict = idx["segments"], idx["termdict"]
        n_docs, avgdl = idx["n_docs"], idx["avgdl"]
        fingerprint = inc.manifest.get("config_fingerprint")
        lineage = {
            "layout": "streaming",
            "batches": len(inc.manifest["batches"]),
            "compacted_gen": inc.manifest.get("compacted_gen", 0),
        }
        byte_globs = ("segments/batch_id=*", "compacted/gen=*", "docstats")
    else:
        builder = CheckpointedIndexBuilder(args.index_dir, cfg)
        opened = _open_index(spark, args, cfg, builder)
        if isinstance(opened, int):
            spark.stop()
            return opened
        segs, termdict, n_docs, avgdl = opened
        fingerprint = builder.manifest.get("config_fingerprint")
        lineage = {
            "layout": "batch",
            "build_stages": list(builder.manifest.get("stages", {}).keys()),
        }
        byte_globs = ("segments", "partial_segments", "termdict", "docstats")
    from pyspark.sql import functions as F

    seg_stats = segs.agg(
        F.count("*").alias("chunk_groups"),
        F.count_distinct("term").alias("terms_on_disk"),
        F.sum("n_postings").alias("postings"),
    ).collect()[0]
    df_hist = {
        f"df_le_{b}": termdict.filter(F.col("df") <= b).count()
        for b in (1, 10, 100, 1000)
    }
    disk = sum(
        os.path.getsize(p)
        for pat in byte_globs
        for p in _glob.glob(f"{args.index_dir}/{pat}/part-*.parquet")
    )
    from nil_spark.operators.deletes import load_tombstones

    tombs = load_tombstones(spark, args.index_dir)
    print(json.dumps({
        "n_docs": n_docs,
        "tombstoned_docs": int(len(tombs)) if tombs is not None else 0,
        "avgdl": round(avgdl, 3),
        "terms_after_stopword_cutoff": termdict.count(),
        "terms_on_disk": int(seg_stats["terms_on_disk"]),
        "chunk_groups": int(seg_stats["chunk_groups"]),
        "postings": int(seg_stats["postings"]),
        "df_histogram": df_hist,
        "index_bytes": disk,
        "bytes_per_posting": round(disk / max(int(seg_stats["postings"]), 1), 2),
        "config_fingerprint": fingerprint,
        **lineage,
    }))
    spark.stop()
    return 0


def cmd_agg(args) -> int:
    """Engine-native date_histogram over a doc-values field
    (operators/aggs_engine.py): bucket counts (plus an optional metric
    sub-aggregation) computed in-kernel from the node-shared mmap
    doc-values array, with an optional boolean-DSL filter evaluated
    index-natively — the corpus text is never read.  Tombstoned docs
    are excluded exactly."""
    import glob as _glob
    import os

    spark = get_spark(app="nil_spark_agg", master=args.master,
                      shuffle_partitions=args.shuffle_partitions)
    cfg = _cfg_from_args(args)
    if _is_streaming_layout(args.index_dir):
        print(json.dumps({
            "error": "doc-values aggregations need a batch-built index",
            "hint": "the streaming layout carries no doc-values side-car; "
                    "build with `build --docvalues <fields>`",
        }), file=sys.stderr)
        spark.stop()
        return 2
    builder = CheckpointedIndexBuilder(args.index_dir, cfg)
    opened = _open_index(spark, args, cfg, builder)
    if isinstance(opened, int):
        spark.stop()
        return opened
    _segs, _termdict, n_docs, avgdl = opened
    from nil_spark.operators.docvalues import (
        docvalues_dir,
        keyword_docvalues_dir,
    )

    terms_field = getattr(args, "terms_field", None)
    if terms_field and getattr(args, "field", None):
        print(json.dumps({
            "error": "--field and --terms-field are mutually exclusive",
            "hint": "date_histogram buckets a numeric field; the terms "
                    "aggregation buckets a keyword field — pick one",
        }), file=sys.stderr)
        spark.stop()
        return 2
    if not terms_field and not getattr(args, "field", None):
        print(json.dumps({
            "error": "one of --field / --terms-field is required",
        }), file=sys.stderr)
        spark.stop()
        return 2

    dv = mdv = kw = None
    missing = []
    if terms_field:
        kw = keyword_docvalues_dir(args.index_dir, terms_field)
        if kw is None:
            print(json.dumps({
                "error": "no keyword doc-values store for field",
                "fields": [terms_field],
                "hint": f"rebuild with `build --keyword-docvalues "
                        f"{terms_field}`",
            }), file=sys.stderr)
            spark.stop()
            return 2
        if getattr(args, "metric_field", None):
            mdv = docvalues_dir(args.index_dir, args.metric_field)
            if mdv is None:
                print(json.dumps({
                    "error": "no doc-values store for field(s)",
                    "fields": [args.metric_field],
                    "hint": f"rebuild with `build --docvalues "
                            f"{args.metric_field}`",
                }), file=sys.stderr)
                spark.stop()
                return 2
    else:
        dv = docvalues_dir(args.index_dir, args.field)
        if dv is None:
            missing.append(args.field)
        if getattr(args, "metric_field", None):
            mdv = docvalues_dir(args.index_dir, args.metric_field)
            if mdv is None:
                missing.append(args.metric_field)
        if missing:
            print(json.dumps({
                "error": "no doc-values store for field(s)",
                "fields": missing,
                "hint": f"rebuild with `build --docvalues "
                        f"{','.join(missing)}`",
            }), file=sys.stderr)
            spark.stop()
            return 2

    pos_store = None
    paths = None
    dsl_ndv: dict = {}
    dsl_kdv: dict = {}
    if getattr(args, "dsl", None):
        from nil_spark.functions.querylang import (
            QueryParseError,
            field_predicates,
            parse_query,
        )
        from nil_spark.operators.dsl_exec import _collect_phrases

        try:
            ast = parse_query(args.dsl)
        except QueryParseError as e:
            print(json.dumps({"error": "bad dsl filter",
                              "detail": str(e)}), file=sys.stderr)
            spark.stop()
            return 2
        for kind, f in sorted(field_predicates(ast)):
            d = (
                keyword_docvalues_dir(args.index_dir, f)
                if kind == "keyword"
                else docvalues_dir(args.index_dir, f)
            )
            if d is None:
                flag = (
                    "--keyword-docvalues" if kind == "keyword"
                    else "--docvalues"
                )
                print(json.dumps({
                    "error": "no doc-values store for field",
                    "field": f,
                    "kind": kind,
                    "hint": f"the DSL filter uses {f!r}; rebuild with "
                            f"`build {flag} {f}`",
                }), file=sys.stderr)
                spark.stop()
                return 2
            (dsl_kdv if kind == "keyword" else dsl_ndv)[f] = d
        phrases: set = set()
        _collect_phrases(ast, phrases)
        if phrases:
            pos_dir = f"{args.index_dir}/positions"
            if not os.path.exists(os.path.join(pos_dir, "_SUCCESS")):
                print(json.dumps({
                    "error": "no positional store",
                    "hint": "the DSL filter contains phrases; rebuild "
                            "with `build --positions`",
                }), file=sys.stderr)
                spark.stop()
                return 2
            pos_store = spark.read.parquet(pos_dir)
        paths = sorted(
            _glob.glob(f"{args.index_dir}/partial_segments/part-*.parquet")
        ) or sorted(_glob.glob(f"{args.index_dir}/segments/part-*.parquet"))

    pct = None
    if getattr(args, "percentiles", None):
        if terms_field:
            print(json.dumps({
                "error": "--percentiles needs a numeric --field",
                "hint": "percentiles sketch a numeric doc-values "
                        "column; --terms-field buckets keywords",
            }), file=sys.stderr)
            spark.stop()
            return 2
        try:
            pct = [float(x) for x in args.percentiles.split(",") if x]
            if not pct or any(not 0.0 <= q <= 1.0 for q in pct):
                raise ValueError(args.percentiles)
        except ValueError:
            print(json.dumps({
                "error": "bad --percentiles",
                "hint": "comma-separated fractions in [0,1], "
                        "e.g. 0.5,0.95,0.99",
            }), file=sys.stderr)
            spark.stop()
            return 2

    from nil_spark.operators.aggs_engine import (
        date_histogram_replica,
        percentiles_replica,
        terms_agg_replica,
    )
    from nil_spark.operators.deletes import load_tombstones

    tombs = load_tombstones(spark, args.index_dir)
    try:
        if terms_field:
            out = terms_agg_replica(
                spark, kw, n_docs, size=args.size,
                dsl=getattr(args, "dsl", None),
                shard_paths=paths, avgdl=avgdl, cfg=cfg,
                pos_store=pos_store, excluded=tombs,
                metric_dv_dir=mdv,
                dsl_numeric_dv=dsl_ndv, dsl_keyword_dv=dsl_kdv,
            )
        elif pct is not None:
            out = percentiles_replica(
                spark, dv, n_docs, pct,
                dsl=getattr(args, "dsl", None),
                shard_paths=paths, avgdl=avgdl, cfg=cfg,
                pos_store=pos_store, excluded=tombs,
                dsl_numeric_dv=dsl_ndv, dsl_keyword_dv=dsl_kdv,
            )
        else:
            out = date_histogram_replica(
                spark, dv, n_docs, args.interval,
                dsl=getattr(args, "dsl", None),
                shard_paths=paths, avgdl=avgdl, cfg=cfg,
                pos_store=pos_store, excluded=tombs,
                metric_dv_dir=mdv,
                dsl_numeric_dv=dsl_ndv, dsl_keyword_dv=dsl_kdv,
            )
        out.write.mode("overwrite").parquet(args.out)
    except ValueError as e:  # pruned dictionary / non-unigram index
        print(json.dumps({"error": "index unsuitable for agg",
                          "detail": str(e)}), file=sys.stderr)
        spark.stop()
        return 2
    print(json.dumps({
        "buckets": spark.read.parquet(args.out).count(),
        **({"terms_field": terms_field, "size": args.size}
           if terms_field else
           ({"field": args.field, "percentiles": pct}
            if pct is not None else
            {"field": args.field, "interval_s": args.interval})),
        **({"metric_field": args.metric_field}
           if getattr(args, "metric_field", None) else {}),
        **({"dsl": args.dsl} if getattr(args, "dsl", None) else {}),
    }))
    spark.stop()
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="nil_spark")
    ap.add_argument("--master", default="local[*]")
    ap.add_argument("--shuffle-partitions", type=int, default=32)
    ap.add_argument("--gram-size", type=int, default=1)
    ap.add_argument("--analyzer", choices=["standard", "minimal_english"],
                    default=None,
                    help="post-tokenize analysis chain applied at BOTH "
                         "index and query time (Lucene analyzer "
                         "semantics); minimal_english folds plurals "
                         "(published minimal stemmer). Part of the index "
                         "config fingerprint: pass the same value at "
                         "build and query time")
    ap.add_argument("--stopword-cutoff", type=float, default=None,
                    help="prune terms with df > cutoff*N from the term "
                         "dictionary (engine default 0.5; set >= 1.0 to "
                         "disable — required to build an index that can "
                         "serve --mode dsl / boolean queries, whose NOT "
                         "semantics need an unpruned dictionary). Part of "
                         "the index config fingerprint: pass the same "
                         "value at build and query time")
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build the checkpointed index")
    b.add_argument("--input", required=True)
    b.add_argument("--format", choices=["parquet", "csv", "json", "iceberg"],
                   default="parquet")
    b.add_argument("--index-dir", required=True)
    b.add_argument("--keyword-docvalues", default=None,
                    help="comma-separated keyword (string) fields to "
                         "materialize as ordinal doc-values (Lucene "
                         "SortedDocValues) for `agg --terms-field`")
    b.add_argument("--docvalues", default=None,
                   help="comma-separated corpus columns to materialize as "
                        "numeric doc-values side-cars (timestamps become "
                        "epoch seconds) — enables `query --decay` / "
                        "`query --sort-by` on the replica topology")
    b.add_argument("--publish-replica", action="store_true",
                   help="also publish the node-shared mmap replica store "
                        "at build time so the first replica-topology query "
                        "batch attaches instead of decoding")
    b.add_argument("--positions", action="store_true",
                   help="also build the positional side-car store "
                        "(<index-dir>/positions) for --mode phrase/proximity")
    b.add_argument("--build-path", choices=["fused", "classic"], default="fused",
                   help="fused = single-Arrow-stage build (fast path); "
                        "classic = explode/shuffle pipeline")
    b.set_defaults(fn=cmd_build)

    q = sub.add_parser("query", help="BM25 top-k over a built index")
    q.add_argument("--index-dir", required=True,
                   help="index directory; pass a comma-separated list for "
                        "federated (multi-index alias) search — merged "
                        "global stats, docBase-offset doc ids, per-row "
                        "`index` column (--mode bm25, --topology "
                        "join/replica)")
    q.add_argument("--queries", required=True, help="parquet with (query_id, text[, k])")
    q.add_argument("--out", required=True)
    q.add_argument("-k", type=int, default=10)
    q.add_argument("--mode",
                   choices=["bm25", "phrase", "proximity", "window", "dsl"],
                   default="bm25",
                   help="bm25: ranked top-k; phrase: exact-phrase hit counts "
                        "from the positional store; proximity: top-k by "
                        "minimum token distance between two terms; window: "
                        "top-k by smallest window containing ALL query terms "
                        "with its start offset (snippet bounds) — the "
                        "positional modes need `build --positions`; dsl: "
                        "boolean AND/OR/NOT/\"phrase\" queries (parquet with "
                        "(query_id, dsl)) executed index-natively — needs an "
                        "index built with --stopword-cutoff >= 1.0, and "
                        "build --positions when queries contain phrases")
    q.add_argument("--explain", action="store_true",
                   help="emit the Lucene-style per-term score breakdown "
                        "(query_id, rank, doc_id, term, idf, contrib, bm25) "
                        "for each top hit instead of the ranked list; "
                        "--topology replica only")
    q.add_argument("--filter-docs", default=None,
                   help="parquet of admissible doc_id rows — filtered search "
                        "pushed into retrieval (requires --topology wand)")
    q.add_argument("--layout", choices=["batch", "streaming"], default="batch",
                   help="batch = CheckpointedIndexBuilder layout (default); "
                        "streaming = IncrementalIndexer layout (per-batch "
                        "deltas + compacted generations)")
    q.add_argument("--topology",
                   choices=["join", "replica", "wand", "sharded",
                            "term_sharded"],
                   default="join",
                   help="join = segments stay a DataFrame (no residency "
                        "assumption); replica = node-shared mmap replica, "
                        "highest qps when a shard group fits node memory; "
                        "wand = replica store traversed document-at-a-time "
                        "with Block-Max WAND skipping (wins on huge posting "
                        "lists with small k); "
                        "sharded = document-sharded scatter/gather; "
                        "term_sharded = term-range scatter/gather over the "
                        "merged store (footer-statistics routing)")
    q.add_argument("--verify", choices=["none", "overlap", "two_tier",
                                        "always_lcs"],
                   default="none",
                   help="verification pass over retrieved candidates "
                        "(filter-then-verify, OptimizedCloneDetection "
                        "staging): overlap = tier-1 n-gram-overlap only; "
                        "two_tier = overlap fast-accept + LCS on the "
                        "residue; always_lcs = every candidate pays LCS. "
                        "Requires --corpus for document text.")
    q.add_argument("--delta", type=int, default=None,
                   help="verification threshold %% (default: config's "
                        "verification_threshold, 70)")
    q.add_argument("--verify-margin", type=int, default=20,
                   help="extra candidates retrieved per query before "
                        "verification trims back to k")
    q.add_argument("--corpus", default=None,
                   help="the transcripts the index was built from "
                        "(doc text for verification; ids re-derived by the "
                        "same (conv_id, turn_idx) assignment as the build)")
    q.add_argument("--corpus-format",
                   choices=["parquet", "csv", "json", "iceberg"],
                   default="parquet")
    q.add_argument("--similarity", choices=["bm25", "lmd"], default="bm25",
                   help="scoring module (Lucene setSimilarity analog): "
                        "bm25 (default) or lmd = LM Dirichlet smoothing "
                        "(ln(1+tf/(mu*p_t)) + ln(mu/(dl+mu)) per matched "
                        "term).  Query-time choice — the same index serves "
                        "both.  --topology replica only; output column is "
                        "`score` instead of `bm25`")
    q.add_argument("--lmd-mu", type=float, default=2000.0,
                   help="Dirichlet smoothing parameter mu (default 2000)")
    q.add_argument("--decay", default=None, metavar="FIELD:ORIGIN:SIGMA",
                   help="function_score gaussian decay on a doc-values "
                        "field (ES gauss): combined = bm25 * "
                        "exp(-(v-origin)^2/(2 sigma^2)).  ORIGIN is a "
                        "number or `max` (the field's max).  Needs "
                        "`build --docvalues FIELD`; --topology replica "
                        "only; output column `score`")
    q.add_argument("--sort-by", default=None, metavar="FIELD[:asc|desc]",
                   help="rank matching docs by a doc-values field instead "
                        "of scoring (ES sort clause; default desc, missing "
                        "last).  Needs `build --docvalues FIELD`; "
                        "--topology replica only; output column "
                        "`sort_value`")
    q.set_defaults(fn=cmd_query)

    bs = sub.add_parser(
        "build-stream",
        help="incremental streaming build over a transcript-file directory",
    )
    bs.add_argument("--input", required=True,
                    help="directory of transcript parquet files, or an "
                         "Iceberg table dir with --format iceberg")
    bs.add_argument("--format", choices=["parquet", "iceberg"],
                    default="parquet",
                    help="iceberg = incremental append scans of the table "
                         "(the index follows the table's snapshots)")
    bs.add_argument("--index-dir", required=True)
    bs.add_argument("--positions", action="store_true",
                    help="absorb a positional side-car delta per batch "
                         "(phrase/proximity serving on the streaming layout)")
    bs.add_argument("--publish-replica", action="store_true",
                    help="with --compact: also publish the node-shared mmap "
                         "replica store for the new generation, so the next "
                         "serving batch attaches instead of decoding")
    bs.add_argument("--compact", action="store_true",
                    help="merge batch deltas into one term-sorted generation "
                         "after the drain")
    bs.set_defaults(fn=cmd_build_stream)

    qs = sub.add_parser(
        "query-stream",
        help="streaming BM25 serving: tail a query-file directory, "
             "exactly-once per-batch results",
    )
    qs.add_argument("--index-dir", required=True)
    qs.add_argument("--queries-dir", required=True,
                    help="directory of parquet files with (query_id, text, k)")
    qs.add_argument("--out", required=True)
    qs.set_defaults(fn=cmd_query_stream)

    pc = sub.add_parser(
        "percolate",
        help="streaming reverse search: match stored DSL queries against "
             "a transcript-file directory, exactly-once per-batch matches",
    )
    pc.add_argument("--docs-dir", required=True,
                    help="directory of transcript parquet files (the "
                         "document stream)")
    pc.add_argument("--queries", required=True,
                    help="parquet with (query_id, dsl) — the stored-query set")
    pc.add_argument("--out", required=True)
    pc.set_defaults(fn=cmd_percolate)

    dl = sub.add_parser(
        "delete",
        help="tombstone docs (live-docs deletes): every query path then "
             "excludes them exactly; stats stay as built until a rebuild",
    )
    dl.add_argument("--index-dir", required=True)
    dl.add_argument("--ids", required=True,
                    help="parquet with a doc_id column to tombstone")
    dl.set_defaults(fn=cmd_delete)

    cp = sub.add_parser(
        "compact",
        help="expunge deletes: rewrite segments without tombstoned "
             "postings, refresh stats, clear the sidecar",
    )
    cp.add_argument("--index-dir", required=True)
    cp.set_defaults(fn=cmd_compact)

    stp = sub.add_parser("stats", help="index introspection (one JSON line)")
    stp.add_argument("--index-dir", required=True)
    stp.set_defaults(fn=cmd_stats)

    ag = sub.add_parser(
        "agg",
        help="engine-native date_histogram over a doc-values field, "
             "optionally filtered by a boolean-DSL query — served from "
             "the index stores, corpus text never read",
    )
    ag.add_argument("--index-dir", required=True)
    ag.add_argument("--field", default=None,
                    help="numeric doc-values field to bucket as a "
                         "date_histogram (built with `build --docvalues`)")
    ag.add_argument("--terms-field", default=None,
                    help="keyword doc-values field for a terms "
                         "aggregation (built with `build "
                         "--keyword-docvalues`); exclusive with --field")
    ag.add_argument("--size", type=int, default=10,
                    help="terms aggregation: top-N buckets (default 10)")
    ag.add_argument("--interval", type=float, default=86400.0,
                    help="bucket width in field units (epoch seconds for "
                         "timestamp fields; default 1 day)")
    ag.add_argument("--metric-field", default=None,
                    help="optional second doc-values field: per-bucket "
                         "value_sum / value_avg sub-aggregation")
    ag.add_argument("--percentiles", default=None,
                    help="comma-separated quantiles in [0,1] (e.g. "
                         "0.5,0.95,0.99): t-digest percentiles of "
                         "--field instead of a histogram (composable "
                         "with --dsl)")
    ag.add_argument("--dsl", default=None,
                    help="optional boolean-DSL filter (AND/OR/NOT/"
                         "\"phrase\"/ATLEAST) evaluated index-natively; "
                         "needs an unpruned dictionary "
                         "(--stopword-cutoff 2.0 at build and here)")
    ag.add_argument("--out", required=True)
    ag.set_defaults(fn=cmd_agg)

    ice = sub.add_parser(
        "iceberg",
        help="engine-native Iceberg table maintenance "
             "(stats / compact / expire)",
    )
    ice.add_argument("--table", required=True, help="Iceberg table directory")
    ice.add_argument("--action", choices=["stats", "compact", "expire"],
                     default="stats")
    ice.add_argument("--keep-last", type=int, default=2,
                     help="snapshots to keep on expire")
    ice.add_argument("--target-files", type=int, default=None,
                     help="repartition target on compact")
    ice.set_defaults(fn=cmd_iceberg)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
