"""HITS hub/authority scores (pagerank.hits) on graphs with known structure."""

from __future__ import annotations

from spider_spark.pagerank import hits


def _scores(spark, edges, iters=5):
    df = spark.createDataFrame(edges, "src string, dst string")
    return {r["url"]: (r["hub"], r["auth"]) for r in hits(df, iters=iters).collect()}


def test_hits_star_graph(spark):
    """h → {a, b, c}: h is the sole hub (hub=1), targets split auth evenly."""
    s = _scores(spark, [("h", "a"), ("h", "b"), ("h", "c")])
    assert abs(s["h"][0] - 1.0) < 1e-9
    assert abs(s["h"][1]) < 1e-9
    for t in ("a", "b", "c"):
        assert abs(s[t][1] - 1.0 / 3) < 1e-9
        assert abs(s[t][0]) < 1e-9


def test_hits_popular_target_beats_obscure(spark):
    """Two hubs endorse 'pop', one endorses 'rare' ⇒ auth(pop) > auth(rare),
    and the hub pointing at both pop+rare outranks the pop-only hub."""
    s = _scores(spark, [("u1", "pop"), ("u2", "pop"), ("u2", "rare")])
    assert s["pop"][1] > s["rare"][1]
    assert s["u2"][0] > s["u1"][0]


def test_hits_l1_normalized(spark):
    """Hub and auth vectors each sum to 1 after every run."""
    s = _scores(spark, [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")])
    assert abs(sum(v[0] for v in s.values()) - 1.0) < 1e-9
    assert abs(sum(v[1] for v in s.values()) - 1.0) < 1e-9


def test_hits_empty_graph(spark):
    df = spark.createDataFrame([], "src string, dst string")
    assert hits(df, iters=2).count() == 0


# ------------------------------------------------------------ OPIC cash

def test_opic_conservation_and_hub_preference(spark):
    """Σ(hist+cash) after T steps = T+1 (unit cash conserved, one unit
    banked per step), and a node pointed at by everyone out-earns a leaf."""
    from spider_spark.pagerank import opic_cash

    edges = [("a", "hub"), ("b", "hub"), ("c", "hub"), ("hub", "a"), ("a", "leaf")]
    df = spark.createDataFrame(edges, "src string, dst string")
    out = {r["url"]: r["rank"] for r in opic_cash(df, iters=4).collect()}
    assert abs(sum(out.values()) - 5.0) < 1e-9
    assert out["hub"] > out["leaf"]


def test_opic_in_crawl_loop(spark, tmp_path):
    """priority_source='opic' drives the reprioritization hook end-to-end."""
    from spider_spark import corpus, tables
    from spider_spark.crawl import crawl
    from spider_spark.round import CrawlConfig

    pages_pd = corpus.make_pages(n_pages=120, n_hosts=6, seed=11)
    seeds = list(zip(*(corpus.make_seeds(pages_pd)[c] for c in ("url", "depth"))))
    pages = spark.createDataFrame(pages_pd)
    policy = spark.createDataFrame(corpus.make_host_policy(pages_pd))
    s = crawl(spark, str(tmp_path / "wd"), pages, seeds, policy,
              CrawlConfig(max_depth=3, max_rounds=8, pagerank_every=2,
                          priority_source="opic"))
    assert s.n_done > 0
    fr = tables.read_table(spark, str(tmp_path / "wd"), tables.latest_round(str(tmp_path / "wd")), "frontier")
    # reprioritized rows carry negated OPIC scores (non-integer priorities)
    assert fr.where("priority < 0").count() > 0


def test_opic_empty_graph(spark):
    from spider_spark.pagerank import opic_cash

    df = spark.createDataFrame([], "src string, dst string")
    assert opic_cash(df, iters=2).count() == 0
