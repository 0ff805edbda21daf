"""Connected components (large-star/small-star): correctness on known
graphs, singleton handling, determinism."""

from __future__ import annotations

from entity_resolution_engine_spark.operators.cluster import connected_components


def _assign(spark, edges, nodes=None):
    e = spark.createDataFrame(edges, ["src", "dst"])
    n = spark.createDataFrame([(u,) for u in nodes], ["url"]) if nodes else None
    out = connected_components(e, all_nodes=n)
    return {r.url: r.cluster_id for r in out.collect()}


def test_chain_collapses_to_min(spark):
    a = _assign(spark, [("b", "a"), ("c", "b"), ("d", "c"), ("e", "d")])
    assert a == {u: "a" for u in "abcde"}


def test_two_components_and_singleton(spark):
    a = _assign(
        spark,
        [("n2", "n1"), ("n3", "n2"), ("m2", "m1")],
        nodes=["n1", "n2", "n3", "m1", "m2", "solo"],
    )
    assert a["n1"] == a["n2"] == a["n3"] == "n1"
    assert a["m1"] == a["m2"] == "m1"
    assert a["solo"] == "solo"


def test_cycle_and_self_loop(spark):
    a = _assign(spark, [("y", "x"), ("z", "y"), ("x", "z"), ("x", "x")])
    assert a == {"x": "x", "y": "x", "z": "x"}


def test_star_graph_large(spark):
    edges = [(f"leaf{i:03d}", "center") for i in range(100)]
    a = _assign(spark, edges)
    assert len(a) == 101
    assert set(a.values()) == {"center"}


def test_deterministic_across_runs(spark):
    edges = [(f"u{i}", f"u{i+1}") for i in range(0, 60, 2)] + [
        (f"u{i}", f"u{i+3}") for i in range(0, 50, 5)
    ]
    a1 = _assign(spark, edges)
    a2 = _assign(spark, edges)
    assert a1 == a2


def test_resume_from_checkpoint_table(spark, tmp_path):
    """CC resumes from a committed iteration state: when the checkpoint
    table exists, iteration starts from it (not the raw edges) and the
    final assignment is identical; the checkpoint is dropped on
    completion."""
    from entity_resolution_engine_spark.sources.catalog import (
        ParquetSnapshotCatalog,
    )

    cat = ParquetSnapshotCatalog(spark, str(tmp_path / "cat"))
    edges = [(f"n{i}", f"n{i+1}") for i in range(30)]
    e = spark.createDataFrame(edges, ["src", "dst"])

    # uninterrupted run for the expected answer
    want = {
        r.url: r.cluster_id
        for r in connected_components(e, catalog=cat, checkpoint_table="cc_a").collect()
    }
    assert not cat.exists("cc_a")  # cleaned up after convergence

    # simulate a kill mid-clustering: commit a partially-contracted edge
    # set (one large-star/small-star round applied) in the surrogate-id
    # space plus the url↔id map — the on-disk checkpoint format
    from entity_resolution_engine_spark.operators.cluster import (
        edges_to_ids,
        large_star,
        node_id_map,
        small_star,
    )

    partial = small_star(large_star(edges_to_ids(e)))
    cat.write("cc_b", partial)
    cat.write("cc_b_idmap", node_id_map(e))
    got = {
        r.url: r.cluster_id
        for r in connected_components(
            spark.createDataFrame([("zz", "zz")], ["src", "dst"]),  # ignored: resume wins
            catalog=cat,
            checkpoint_table="cc_b",
        ).collect()
    }
    assert got == want
    assert not cat.exists("cc_b")
