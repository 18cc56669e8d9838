"""Connected components over near-duplicate pair lists — the group
assignment stage of a dedup pipeline (pairs → clusters → one canonical
doc per cluster).

The reference's unique-clone analysis dedupes pairs but never forms
groups (/root/reference/analysis/unique_clone_analyzer.py:47-110); at
training-data scale the pair relation must be collapsed to components
so each near-dup cluster keeps exactly one representative.

Algorithm: iterative min-label propagation — each vertex repeatedly
adopts the smallest label in its closed neighborhood until a fixpoint.
Every iteration is one join + one groupBy (all JVM-side); rounds needed
= graph diameter.  Near-dup clusters are small and dense (diameter ≤ a
few hops), so this converges in 2-4 rounds; for adversarial
long-diameter graphs swap in the large-star/small-star contraction
(Kiveris et al., "Connected Components in MapReduce", SoCC'14) — same
operator surface.

Convergence is checked with a count aggregate per round (a scalar to
the driver, not data), and ``max_iter`` bounds the loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    max_iter: int = 20,
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, component) — component = min vertex id reachable through
    ``edges`` (id1, id2).  Vertices absent from edges are their own
    singleton components."""
    verts = vertices.select(F.col(id_col).cast("long").alias("id")).distinct()
    sym = (
        edges.select(F.col("id1").cast("long").alias("src"), F.col("id2").cast("long").alias("dst"))
        .unionByName(
            edges.select(
                F.col("id2").cast("long").alias("src"), F.col("id1").cast("long").alias("dst")
            )
        )
        .distinct()
        .persist()
    )
    # Propagate over the ACTIVE vertex set only — vertices incident to
    # at least one edge.  A near-dup pair graph touches a small
    # fraction of the corpus (typically a few %), and dragging every
    # singleton through every round multiplies each round's shuffle by
    # |V|/|active| for labels that can never change.  Singletons join
    # back as their own components at the end (one left join).
    # localCheckpoint per round truncates the iterative lineage —
    # without it Catalyst re-analyzes an exponentially deepening plan
    # (the standard pitfall of iterative DataFrame algorithms)
    active = sym.select(F.col("src").alias("id")).distinct()
    labels = active.withColumn("comp", F.col("id")).localCheckpoint(eager=True)
    changed = 0
    for _ in range(max_iter):
        # smallest label in the closed neighborhood
        neigh = (
            sym.join(labels, sym["dst"] == labels["id"])
            .select(F.col("src").alias("id"), "comp")
            .unionByName(labels.select("id", "comp"))
            .groupBy("id")
            .agg(F.min("comp").alias("new_comp"))
        )
        nxt = neigh.select("id", F.col("new_comp").alias("comp")).localCheckpoint(
            eager=True
        )
        changed = (
            labels.join(nxt.withColumnRenamed("comp", "c2"), "id")
            .filter(F.col("comp") != F.col("c2"))
            .count()
        )
        labels = nxt
        if changed == 0:
            break
    sym.unpersist()
    if changed != 0:
        # min-label propagation advances one hop per round; exiting with
        # unconverged labels would silently split long-diameter clusters.
        # Raise instead — callers with adversarial graphs should raise
        # max_iter or switch to large-star/small-star contraction.
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            f"({changed} labels still changing); the component graph has "
            f"diameter > max_iter — raise max_iter or use large-star/"
            f"small-star contraction for long-chain graphs"
        )
    return verts.join(labels, "id", "left").select(
        F.col("id").alias(id_col),
        F.coalesce(F.col("comp"), F.col("id")).alias("component"),
    )


def connected_components_star(
    vertices: DataFrame,
    edges: DataFrame,
    max_iter: int = 30,
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, component) — large-star/small-star contraction
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14).  Converges in O(log n) rounds regardless of graph
    diameter — the scale path for adversarial long-chain graphs where
    min-label propagation (``connected_components``) would need
    diameter rounds.  Each round is two (groupBy + join) passes over
    the edge list; no step ever materializes a neighborhood list.

    * large-star: for every vertex u, connect each strictly-larger
      neighbor v > u to m = min(N(u) ∪ {u}).
    * small-star: orient edges parent>child; connect each child (and u
      itself) to the minimum child m = min(N⁻(u) ∪ {u}).

    Fixpoint: the edge set stabilizes as a forest of stars whose
    centers are component minima; detected with a scalar
    (count, xor-of-row-hashes) aggregate — no edge-set diff join.
    """
    verts = vertices.select(F.col(id_col).cast("long").alias("id")).distinct()
    e = (
        edges.select(F.col("id1").cast("long").alias("u"), F.col("id2").cast("long").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )  # canonical parent>child orientation
        .distinct()
        .localCheckpoint(eager=True)
    )

    def _sig(df: DataFrame) -> tuple:
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(u, v))").alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    sig = _sig(e)
    converged = False
    for _ in range(max_iter):
        # ---- large-star: symmetric neighborhoods ----
        sym = e.select("u", "v").unionByName(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        m_all = sym.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
        large = (
            sym.join(m_all, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # ---- small-star: parent>child orientation only ----
        m_small = large.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            large.join(m_small, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(m_small.select(F.col("u"), F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
            .distinct()
        )
        e = small.localCheckpoint(eager=True)
        nsig = _sig(e)
        if nsig == sig:
            converged = True
            break
        sig = nsig
    if not converged:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_iter} rounds "
            f"— at O(log n) rounds this indicates a bug or a graph far "
            f"larger than max_iter=2·log2(n) allows"
        )
    # stars: (u=child, v=root).  Roots and edge-absent vertices label
    # themselves.
    labels = (
        verts.join(e.withColumnRenamed("u", "id"), "id", "left")
        .groupBy("id")
        .agg(F.least(F.min("v"), F.first("id")).alias("component"))
    )
    return labels.select(F.col("id").alias(id_col), "component")


def dedup_groups(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    algorithm: str = "auto",
    minlabel_max_iter: int = 20,
) -> DataFrame:
    """(doc_id, component, is_canonical) — canonical = the component's
    min id; downstream keeps ``is_canonical`` rows only.

    ``algorithm``:
     * "auto" (default) — min-label propagation first (near-dup clusters
       are small and dense, so it converges in 2-4 cheap rounds); if the
       graph turns out long-diameter and min-label exhausts
       ``minlabel_max_iter``, fall back to large-star/small-star
       contraction instead of raising.  Both produce identical labels
       (component = min reachable id), so the fallback is transparent —
       a 100 TB job never dies at hour 10 just because the pair graph
       grew a long chain.
     * "minlabel" — diameter-bounded propagation only (raises on
       non-convergence);
     * "star" — large-star/small-star, O(log n) rounds regardless of
       diameter.
    """
    if algorithm == "auto":
        try:
            comp = connected_components(
                docs.select(id_col), pairs, max_iter=minlabel_max_iter, id_col=id_col
            )
        except RuntimeError:
            comp = connected_components_star(docs.select(id_col), pairs, id_col=id_col)
    else:
        cc = connected_components if algorithm == "minlabel" else connected_components_star
        comp = cc(docs.select(id_col), pairs, id_col=id_col)
    return comp.select(
        id_col,
        "component",
        (F.col(id_col) == F.col("component")).alias("is_canonical"),
    )
