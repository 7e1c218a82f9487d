"""TrustRank (pagerank.trustrank) spam-demotion properties on planted graphs."""

from __future__ import annotations

from spider_spark.pagerank import pagerank, trustrank


def _ranks(spark, edges, trusted, **kw):
    df = spark.createDataFrame(edges, "src string, dst string")
    tr = spark.createDataFrame([(u,) for u in trusted], "url string")
    return {r["url"]: r["rank"] for r in trustrank(df, tr, **kw).collect()}


def test_trustrank_unreachable_farm_scores_zero(spark):
    """A densely interlinked farm {f1,f2,f3} unreachable from the trusted
    seed gets exactly 0 mass, while it would earn PageRank mass."""
    edges = [
        ("seed", "good"), ("good", "seed"),
        ("f1", "f2"), ("f2", "f3"), ("f3", "f1"), ("f1", "f3"),
    ]
    t = _ranks(spark, edges, ["seed"], iters=5)
    assert t["good"] > 0.0
    assert t["f1"] == 0.0 and t["f2"] == 0.0 and t["f3"] == 0.0
    links = spark.createDataFrame(edges, "src string, dst string")
    p = {r["url"]: r["rank"] for r in pagerank(links, iters=5).collect()}
    assert p["f1"] > 0.0  # plain PageRank is fooled; TrustRank is not


def test_trustrank_decays_with_distance(spark):
    """Chain seed→a→b→c: trust decays monotonically along the path."""
    t = _ranks(spark, [("seed", "a"), ("a", "b"), ("b", "c")], ["seed"], iters=8)
    assert t["seed"] > t["a"] > t["b"] > t["c"] > 0.0


def test_trustrank_no_seed_in_graph_is_all_zero(spark):
    t = _ranks(spark, [("a", "b")], ["elsewhere"], iters=3)
    assert set(t.values()) == {0.0}


def test_trustrank_dangling_mass_returns_to_seeds(spark):
    """'sink' has no out-edges; its mass must teleport back through the
    seed vector, never leak — total mass stays 1 each iteration."""
    t = _ranks(spark, [("seed", "sink"), ("seed", "mid"), ("mid", "sink")],
               ["seed"], iters=6)
    assert abs(sum(t.values()) - 1.0) < 1e-9
