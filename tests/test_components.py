"""Connected-components operator (operators/components.py): known
graphs, multi-round convergence, canonical flags."""

from __future__ import annotations

from nil_spark.operators.components import connected_components, dedup_groups


def test_components_known_graph(spark):
    verts = spark.createDataFrame([(i,) for i in range(10)], "doc_id long")
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (5, 6), (8, 9)], "id1 long, id2 long"
    )
    got = {
        r["doc_id"]: r["component"]
        for r in connected_components(verts, edges).collect()
    }
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 4, 5: 5, 6: 5, 7: 7, 8: 8, 9: 8}


def test_components_chain_converges(spark):
    """A length-12 chain needs multiple propagation rounds — the loop
    must iterate to the fixpoint, not stop after one join."""
    n = 13
    verts = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id1 long, id2 long"
    )
    got = connected_components(verts, edges).collect()
    assert all(r["component"] == 0 for r in got)


def test_dedup_groups_canonical(spark):
    verts = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    edges = spark.createDataFrame([(3, 4), (4, 5)], "id1 long, id2 long")
    rows = {r["doc_id"]: r for r in dedup_groups(verts, edges).collect()}
    assert [rows[i]["is_canonical"] for i in range(6)] == [
        True, True, True, True, False, False,
    ]
    assert rows[5]["component"] == 3
