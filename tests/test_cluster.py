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


def test_unmapped_edge_endpoint_fails_loudly(spark):
    """all_nodes that does not cover every edge endpoint is a contract
    violation — the recovery join must raise, not silently drop the
    node (ADVICE r3: the inner join version lost such rows)."""
    import pytest

    e = spark.createDataFrame([("a", "b"), ("b", "zzz_not_in_nodes")], ["src", "dst"])
    n = spark.createDataFrame([("a",), ("b",)], ["url"])
    with pytest.raises(Exception, match="not covered by all_nodes"):
        connected_components(e, all_nodes=n).collect()


def test_stale_checkpoint_without_idmap_restarts_fresh(spark, tmp_path):
    """A checkpoint table WITHOUT its id-map sidecar (the pre-surrogate
    on-disk format, or a partially-written commit) must not be resumed
    from — the run restarts from the raw edges instead of crashing on
    the missing sidecar (ADVICE r3)."""
    from entity_resolution_engine_spark.operators.cluster import edges_to_ids
    from entity_resolution_engine_spark.sources.catalog import (
        ParquetSnapshotCatalog,
    )

    cat = ParquetSnapshotCatalog(spark, str(tmp_path / "cat"))
    e = spark.createDataFrame([("a", "b"), ("b", "c")], ["src", "dst"])
    # stale state: edges committed under the checkpoint name, NO idmap —
    # and deliberately from a DIFFERENT graph, so resuming from it would
    # give a wrong answer even if it didn't crash
    stale = spark.createDataFrame([("x", "y")], ["src", "dst"])
    cat.write("cc_stale", edges_to_ids(stale))
    got = {
        r.url: r.cluster_id
        for r in connected_components(
            e, catalog=cat, checkpoint_table="cc_stale"
        ).collect()
    }
    assert got == {"a": "a", "b": "a", "c": "a"}


def _union_find_min(edges, nodes):
    """Python oracle: cluster_id = min(url) per component."""
    parent = {u: u for u in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d in edges:
        rs, rd = find(s), find(d)
        if rs != rd:
            parent[rs] = rd
    comps = {}
    for u in nodes:
        comps.setdefault(find(u), []).append(u)
    out = {}
    for members in comps.values():
        root = min(members)
        for u in members:
            out[u] = root
    return out


def test_property_random_graphs_vs_union_find(spark):
    """Property test for the window-star large/small-star algebra: 100
    seeded random graphs (GNM, chains with shortcuts, stars, joined
    cliques, self-loop/duplicate-edge mixes, isolated nodes) batched
    into ONE CC call via per-seed node namespaces — components can
    never cross seeds — and compared against a Python union-find
    (VERDICT r3 item 8)."""
    import random

    all_edges: list[tuple[str, str]] = []
    all_nodes: list[str] = []
    expected: dict[str, str] = {}

    for seed in range(100):
        rng = random.Random(seed)
        pre = f"g{seed:03d}n"
        shape = seed % 5
        n = rng.randint(2, 50)
        nodes = [f"{pre}{i:03d}" for i in range(n)]
        edges: list[tuple[str, str]] = []
        if shape == 0:  # GNM random
            m = rng.randint(0, 80)
            for _ in range(m):
                edges.append((rng.choice(nodes), rng.choice(nodes)))
        elif shape == 1:  # chain with shortcuts
            edges = [(nodes[i], nodes[i + 1]) for i in range(n - 1)]
            for _ in range(rng.randint(0, 5)):
                edges.append((rng.choice(nodes), rng.choice(nodes)))
        elif shape == 2:  # star (hub picked mid-list, not the min)
            hub = nodes[n // 2]
            edges = [(hub, v) for v in nodes if v != hub]
        elif shape == 3:  # two cliques, optionally bridged
            half = max(2, n // 2)
            c1, c2 = nodes[:half], nodes[half:]
            edges = [(a, b) for i, a in enumerate(c1) for b in c1[i + 1 :]]
            edges += [(a, b) for i, a in enumerate(c2) for b in c2[i + 1 :]]
            if rng.random() < 0.5 and c2:
                edges.append((c1[-1], c2[0]))
        else:  # mix: self-loops, duplicate + reversed edges
            for _ in range(rng.randint(1, 30)):
                a, b = rng.choice(nodes), rng.choice(nodes)
                edges.append((a, b))
                if rng.random() < 0.3:
                    edges.append((a, b))  # duplicate
                if rng.random() < 0.3:
                    edges.append((b, a))  # reversed
            edges.append((nodes[0], nodes[0]))  # self-loop
        # isolated nodes exist in every graph where edges miss some node
        all_edges.extend(edges)
        all_nodes.extend(nodes)
        expected.update(_union_find_min(edges, nodes))

    e = spark.createDataFrame(all_edges, ["src", "dst"])
    nodes_df = spark.createDataFrame([(u,) for u in all_nodes], ["url"])
    for rpc in (1, 3):
        got = {
            r.url: r.cluster_id
            for r in connected_components(
                e, all_nodes=nodes_df, rounds_per_check=rpc
            ).collect()
        }
        assert got == expected, f"rounds_per_check={rpc}"
