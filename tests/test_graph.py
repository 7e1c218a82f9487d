"""connected_components (large-star/small-star) on graphs with known structure."""

from __future__ import annotations

import pytest

from spider_spark.graph import connected_components, dedup_cluster_reps, kcore, triangle_counts


def _labels(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src string, dst string")
    return {r["node"]: r["rep"] for r in connected_components(df, **kw).collect()}


def test_two_components(spark):
    lab = _labels(spark, [("b", "a"), ("b", "c"), ("x", "y")])
    assert lab == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_long_path_converges_logarithmically(spark):
    # 33-node path: min-label must travel 32 hops; star-contraction does it
    # in O(log²) rounds — 8 is ample, 32 sequential label-prop rounds is not.
    edges = [(f"n{i:02d}", f"n{i + 1:02d}") for i in range(32)]
    lab = _labels(spark, edges, max_iters=8)
    assert set(lab.values()) == {"n00"}
    assert len(lab) == 33


def test_cycle_and_clique(spark):
    lab = _labels(
        spark,
        [("a", "b"), ("b", "c"), ("c", "a"),  # 3-cycle
         ("p", "q"), ("p", "r"), ("q", "r"), ("r", "s")],  # clique + tail
    )
    assert {lab[k] for k in "abc"} == {"a"}
    assert {lab[k] for k in "pqrs"} == {"p"}


def test_self_loops_and_duplicate_edges_ignored(spark):
    lab = _labels(spark, [("a", "a"), ("a", "b"), ("b", "a"), ("a", "b")])
    assert lab == {"a": "a", "b": "a"}


def test_empty_edges(spark):
    df = spark.createDataFrame([], "src string, dst string")
    assert connected_components(df).count() == 0


def test_bigint_ids_min_is_numeric(spark):
    df = spark.createDataFrame([(10, 2), (2, 9)], "src long, dst long")
    lab = {r["node"]: r["rep"] for r in connected_components(df).collect()}
    assert lab == {2: 2, 9: 2, 10: 2}


def test_nonconvergence_raises(spark):
    df = spark.createDataFrame([(f"n{i}", f"n{i + 1}") for i in range(20)],
                               "src string, dst string")
    with pytest.raises(RuntimeError):
        connected_components(df, max_iters=1)


def test_dedup_cluster_reps_survivor_flags(spark):
    docs = spark.createDataFrame([(i,) for i in range(1, 7)], "doc_id long")
    pairs = spark.createDataFrame([(1, 3), (3, 5), (2, 6)], "a_id long, b_id long")
    rows = {r["doc_id"]: (r["rep"], r["is_survivor"])
            for r in dedup_cluster_reps(docs, pairs).collect()}
    assert rows == {
        1: (1, True), 3: (1, False), 5: (1, False),
        2: (2, True), 6: (2, False),
        4: (4, True),
    }


def test_cc_matches_union_find_on_random_graph(spark):
    """Seeded 300-edge random graph vs an independent pure-Python
    union-find — catches star-step bookkeeping errors no hand-built
    topology would."""
    import random

    rng = random.Random(1234)
    nodes = [f"n{i:03d}" for i in range(200)]
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(300)]

    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    touched = set()
    for a, b in edges:
        if a != b:
            touched.update((a, b))
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    expected = {n: find(n) for n in sorted(touched)}

    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["rep"] for r in connected_components(df).collect()}
    assert got == expected


def test_dedup_cluster_reps_no_pairs(spark):
    """Empty pair list: every doc is its own survivor."""
    docs = spark.createDataFrame([(i,) for i in range(4)], "doc_id long")
    pairs = spark.createDataFrame([], "a_id long, b_id long")
    rows = {r["doc_id"]: (r["rep"], r["is_survivor"])
            for r in dedup_cluster_reps(docs, pairs).collect()}
    assert rows == {i: (i, True) for i in range(4)}


# ---------------------------------------------------------------- triangles
def _tri(spark, edges):
    df = spark.createDataFrame(edges, "src string, dst string")
    return {
        r["node"]: (r["degree"], r["n_triangles"], round(r["clustering"], 8))
        for r in triangle_counts(df).collect()
    }


def test_triangle_k4(spark):
    # K4: every node degree 3, sits in 3 of the 4 triangles, clustering 1.0
    nodes = "abcd"
    edges = [(x, y) for i, x in enumerate(nodes) for y in nodes[i + 1:]]
    out = _tri(spark, edges)
    assert out == {n: (3, 3, 1.0) for n in nodes}


def test_triangle_square_with_diagonal_and_pendant(spark):
    # square a-b-c-d-a plus diagonal a-c plus pendant e on d:
    # triangles abc and acd; b,d in one each, a,c in two
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"), ("a", "c"), ("d", "e")]
    out = _tri(spark, edges)
    assert out["a"] == (3, 2, round(2 * 2 / (3 * 2), 8))
    assert out["c"] == (3, 2, round(2 * 2 / (3 * 2), 8))
    assert out["b"] == (2, 1, 1.0)
    assert out["d"] == (3, 1, round(2 * 1 / (3 * 2), 8))
    assert out["e"] == (1, 0, 0.0)


def test_triangle_counts_direction_and_duplicate_invariant(spark):
    # same triangle expressed with reversed/duplicated/self-loop edges
    edges = [("b", "a"), ("a", "b"), ("b", "c"), ("c", "a"), ("a", "a")]
    out = _tri(spark, edges)
    assert out == {n: (2, 1, 1.0) for n in "abc"}


def test_triangle_free_graph(spark):
    # star: wedges everywhere, zero closures
    out = _tri(spark, [("hub", f"s{i}") for i in range(5)])
    assert out["hub"] == (5, 0, 0.0)
    assert all(out[f"s{i}"] == (1, 0, 0.0) for i in range(5))


# ------------------------------------------------------------------- k-core
def _kcore(spark, edges, k):
    df = spark.createDataFrame(edges, "src string, dst string")
    return {
        r["node"]: (r["in_core"], r["core_degree"])
        for r in kcore(df, k=k).collect()
    }


def test_kcore_clique_survives_tail_peels(spark):
    # K4 (a..d) with a path tail d-e-f-g: 2-core = K4 only — the tail
    # peels from g inward, one layer per round (depth > 1 exercises the
    # cascade, not just the first sweep)
    nodes = "abcd"
    edges = [(x, y) for i, x in enumerate(nodes) for y in nodes[i + 1:]]
    edges += [("d", "e"), ("e", "f"), ("f", "g")]
    out = _kcore(spark, edges, k=2)
    assert out == {
        "a": (True, 3), "b": (True, 3), "c": (True, 3), "d": (True, 3),
        "e": (False, 0), "f": (False, 0), "g": (False, 0),
    }


def test_kcore_everything_peels(spark):
    # a 12-node path has no 2-core: synchronous peel takes 6 rounds
    edges = [(f"n{i:02d}", f"n{i + 1:02d}") for i in range(11)]
    out = _kcore(spark, edges, k=2)
    assert all(v == (False, 0) for v in out.values())
    assert len(out) == 12


def test_kcore_k1_keeps_every_incident_node(spark):
    out = _kcore(spark, [("a", "b"), ("b", "c")], k=1)
    assert out == {"a": (True, 1), "b": (True, 2), "c": (True, 1)}


def test_kcore_duplicate_and_reversed_edges(spark):
    # triangle given with duplicates/reversals/self-loop: 2-core = triangle
    edges = [("a", "b"), ("b", "a"), ("b", "c"), ("c", "a"), ("c", "c")]
    out = _kcore(spark, edges, k=2)
    assert out == {n: (True, 2) for n in "abc"}


def test_kcore_long_chain_converges_to_fixpoint(spark):
    """Chains peel 2 edges per round (O(n) depth): the default must run to
    the fixed point, not crash on a legitimate pagination chain."""
    from spider_spark.graph import kcore

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 31)], "src long, dst long"
    )
    out = kcore(edges, k=2)
    assert all(not r.in_core for r in out.collect())  # a path has no 2-core
