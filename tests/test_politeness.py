"""Politeness / priority coverage: per-host budgets (A12), robots deny
(A13), crawl-delay-derived budgets, and PageRank reprioritization (A6)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from spider_spark import corpus, tables
from spider_spark.crawl import crawl
from spider_spark.pagerank import apply_priority, pagerank
from spider_spark.round import CrawlConfig, budget_from_delay


@pytest.fixture(scope="module")
def fixture(spark):
    pages_pd = corpus.make_pages(n_pages=150, n_hosts=8, seed=11)
    seeds_pd = corpus.make_seeds(pages_pd, n_seeds=3, include_missing=False)
    pages = spark.createDataFrame(pages_pd)
    seeds = list(zip(seeds_pd["url"], seeds_pd["depth"]))
    return pages_pd, pages, seeds


def test_host_budget_cap(spark, fixture, tmp_path):
    pages_pd, pages, seeds = fixture
    policy = spark.createDataFrame(corpus.make_host_policy(pages_pd, host_budget=2))
    crawl(spark, tmp_path / "wd", pages, seeds, policy,
          CrawlConfig(max_depth=3, max_rounds=8))
    fl = tables.read_appended(spark, tmp_path / "wd", "fetch_log")
    mx = (
        fl.groupBy("round", "host").agg(F.sum("n_claimed").alias("c"))
        .agg(F.max("c")).collect()[0][0]
    )
    assert mx is not None and mx <= 2


def test_robots_deny_blocks_paths(spark, fixture, tmp_path):
    pages_pd, pages, seeds = fixture
    policy = spark.createDataFrame(corpus.make_host_policy(pages_pd, deny=["/p/"]))
    s = crawl(spark, tmp_path / "wd", pages, seeds, policy,
              CrawlConfig(max_depth=3, max_rounds=8))
    frontier = tables.read_table(spark, tmp_path / "wd", s.last_round, "frontier")
    rows = frontier.collect()
    # every /p/ url that entered the frontier must be denied, never fetched
    for r in rows:
        if "/p/" in r["url"]:
            assert r["status"] == "denied", r["url"]
    assert s.n_denied > 0


def test_budget_from_delay(spark, fixture):
    pages_pd, _, _ = fixture
    policy = spark.createDataFrame(
        corpus.make_host_policy(pages_pd, crawl_delay=10.0, host_budget=-1)
    )
    out = budget_from_delay(policy, round_duration=60.0)
    budgets = {r["host"]: r["host_budget"] for r in out.collect()}
    assert set(budgets.values()) == {6}  # floor(60 / 10)
    # explicit budgets are preserved
    explicit = spark.createDataFrame(
        corpus.make_host_policy(pages_pd, crawl_delay=10.0, host_budget=3)
    )
    out2 = budget_from_delay(explicit, round_duration=60.0)
    assert {r["host_budget"] for r in out2.collect()} == {3}


def test_pagerank_priority_changes_pop_order(spark, fixture, tmp_path):
    pages_pd, pages, seeds = fixture
    policy = spark.createDataFrame(corpus.make_host_policy(pages_pd))
    s = crawl(spark, tmp_path / "wd", pages, seeds, policy,
              CrawlConfig(max_depth=4, max_rounds=12, pagerank_every=2))
    assert s.n_done > 0
    frontier = tables.read_table(spark, tmp_path / "wd", s.last_round, "frontier")
    # pagerank_every landed real ranks: negative priorities (= -rank) exist
    assert frontier.where(F.col("priority") < 0).count() > 0


def test_pagerank_sums_to_one(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("d", "a")],
        "src string, dst string",
    )
    ranks = pagerank(edges, alpha=0.9, iters=20)
    total = ranks.agg(F.sum("rank")).collect()[0][0]
    assert abs(total - 1.0) < 1e-6
    by = {r["url"]: r["rank"] for r in ranks.collect()}
    assert by["a"] > by["d"]  # a receives links, d only gives


def test_items_latest_upsert_view(spark, fixture, tmp_path):
    """D2: latest-wins read over the append-only items table."""
    from spider_spark.tables import read_items_latest

    pages_pd, pages, seeds = fixture
    policy = spark.createDataFrame(corpus.make_host_policy(pages_pd))
    crawl(spark, tmp_path / "wd", pages, seeds, policy,
          CrawlConfig(max_depth=3, max_rounds=8))
    latest = read_items_latest(spark, tmp_path / "wd")
    assert latest is not None
    assert latest.count() == latest.select("url_md5").distinct().count()
