"""Crawl parity: the Spark engine must reproduce the reference model
(SURVEY.md §5.2) — final seen set, per-URL fetch-round assignment, depths,
in-link counters, link graph, and byte-identical extracted text."""

from __future__ import annotations

import pytest

from spider_spark import corpus, model, tables
from spider_spark.crawl import crawl
from spider_spark.round import CrawlConfig


N_PAGES = 120


@pytest.fixture(scope="module")
def fixture_data():
    pages_pd = corpus.make_pages(n_pages=N_PAGES, n_hosts=10, seed=42)
    seeds_pd = corpus.make_seeds(pages_pd, n_seeds=3)
    policy_pd = corpus.make_host_policy(pages_pd)
    return pages_pd, seeds_pd, policy_pd


@pytest.fixture(scope="module")
def spark_inputs(spark, fixture_data):
    pages_pd, seeds_pd, policy_pd = fixture_data
    pages = spark.createDataFrame(pages_pd)
    policy = spark.createDataFrame(policy_pd)
    seeds = list(zip(seeds_pd["url"], seeds_pd["depth"]))
    return pages, seeds, policy


def run_both(spark, fixture_data, spark_inputs, tmp_path, cfg, **model_kw):
    pages_pd, seeds_pd, _ = fixture_data
    pages, seeds, policy = spark_inputs
    golden = model.run_model(
        pages=dict(zip(pages_pd["url"], pages_pd["html"])),
        seeds=list(seeds_pd["url"]),
        max_depth=cfg.max_depth,
        max_tries=cfg.max_tries,
        **model_kw,
    )
    summary = crawl(spark, tmp_path / "wd", pages, seeds, policy, cfg)
    frontier = {
        r["url"]: r
        for r in tables.read_table(spark, tmp_path / "wd", summary.last_round, "frontier").collect()
    }
    return golden, summary, frontier


def assert_frontier_parity(golden, frontier):
    assert set(frontier) == golden.seen, "URL-seen set mismatch"
    for url, e in golden.frontier.items():
        r = frontier[url]
        assert r["status"] == e.status, (url, r["status"], e.status)
        assert r["depth"] == e.depth, (url, "depth")
        assert r["fetched_round"] == e.fetched_round, (url, "fetched_round")
        assert r["discovered_round"] == e.discovered_round, (url, "discovered_round")
        assert r["discovered_seq"] == e.discovered_seq, (url, "seq")
        assert r["inlink_count"] == e.inlink_count, (url, "inlinks")
        assert r["url_md5"] == e.url_md5


def test_bfs_parity(spark, fixture_data, spark_inputs, tmp_path):
    cfg = CrawlConfig(max_depth=3, max_rounds=20)
    golden, summary, frontier = run_both(spark, fixture_data, spark_inputs, tmp_path, cfg)
    assert summary.rounds_run == golden.rounds_run
    assert_frontier_parity(golden, frontier)


def test_links_parity(spark, fixture_data, spark_inputs, tmp_path):
    cfg = CrawlConfig(max_depth=2, max_rounds=20)
    golden, summary, _ = run_both(spark, fixture_data, spark_inputs, tmp_path, cfg)
    got = {
        (r["src"], r["dst"], r["pos"])
        for r in tables.read_appended(spark, tmp_path / "wd", "links").collect()
    }
    assert got == set(golden.links)


def test_text_byte_parity(spark, fixture_data, spark_inputs, tmp_path):
    """input_hint: extracted text byte-identical per url — vs the model AND
    vs the corpus golden text column."""
    pages_pd, _, _ = fixture_data
    cfg = CrawlConfig(max_depth=2, max_rounds=20)
    golden, summary, _ = run_both(spark, fixture_data, spark_inputs, tmp_path, cfg)
    items = tables.read_appended(spark, tmp_path / "wd", "items").collect()
    got = {r["url"]: r["text"] for r in items}
    assert got.keys() == golden.text.keys()
    corpus_text = dict(zip(pages_pd["url"], pages_pd["text"]))
    for url, text in golden.text.items():
        assert got[url].encode() == text.encode(), url
        assert got[url].encode() == corpus_text[url].encode(), url
    # extraction errors are data; none expected on this corpus
    assert all(r["error"] is None for r in items)


def test_qcc_extraction_fields(spark, fixture_data, spark_inputs, tmp_path):
    cfg = CrawlConfig(max_depth=1, max_rounds=10)
    _, summary, _ = run_both(spark, fixture_data, spark_inputs, tmp_path, cfg)
    items = tables.read_appended(spark, tmp_path / "wd", "items").collect()
    assert items, "no items extracted"
    for r in items:
        c = r["company"]
        assert c["company_name"].startswith("company_name-")
        assert c["business_scope"].startswith("business_scope-")


def test_bloom_seen_set_equivalence(spark, fixture_data, spark_inputs, tmp_path):
    """Bloom prefilter + exact escape must give the identical frontier."""
    cfg = CrawlConfig(max_depth=3, max_rounds=20, use_bloom=True,
                      bloom_buckets=8, bloom_fpp=0.01)
    golden, summary, frontier = run_both(spark, fixture_data, spark_inputs, tmp_path, cfg)
    assert_frontier_parity(golden, frontier)


def test_resume_mid_crawl(spark, fixture_data, spark_inputs, tmp_path):
    """North_rule: any round resumable; interrupted + resumed == uninterrupted."""
    pages, seeds, policy = spark_inputs
    full_cfg = CrawlConfig(max_depth=3, max_rounds=20)
    crawl(spark, tmp_path / "full", pages, seeds, policy, full_cfg)

    crawl(spark, tmp_path / "part", pages, seeds, policy,
          CrawlConfig(max_depth=3, max_rounds=2))
    summary = crawl(spark, tmp_path / "part", pages, seeds, policy, full_cfg, resume=True)

    a = {tuple(r) for r in tables.read_table(
        spark, tmp_path / "full", tables.latest_round(tmp_path / "full"), "frontier").collect()}
    b = {tuple(r) for r in tables.read_table(
        spark, tmp_path / "part", summary.last_round, "frontier").collect()}
    assert a == b


def test_honor_meta_robots_gates_frontier_and_items(spark, tmp_path):
    """In-loop REP directives: rel=nofollow drops one link, page-level
    nofollow empties a page's link set, noindex keeps a fetched page out
    of items — and the default config ignores all three (reference
    parity)."""
    from spider_spark.crawl import crawl
    from spider_spark.round import CrawlConfig
    from spider_spark import tables

    H = "https://site.example.com"
    pages = [
        (f"{H}/s",
         f'<html><body><a href="{H}/a">a</a><a rel="nofollow" href="{H}/c">c</a>'
         f'<a href="{H}/b">b</a></body></html>'),
        (f"{H}/a",
         f'<html><head><meta name="robots" content="nofollow"></head>'
         f'<body><a href="{H}/d">d</a></body></html>'),
        (f"{H}/b",
         f'<html><head><meta name="robots" content="noindex"></head>'
         f'<body><a href="{H}/e">e</a></body></html>'),
        (f"{H}/c", "<html><body>c</body></html>"),
        (f"{H}/d", "<html><body>d</body></html>"),
        (f"{H}/e", "<html><body>e</body></html>"),
    ]
    pages_df = spark.createDataFrame(pages, "url string, html string")
    policy = spark.createDataFrame(
        [("site.example.com", 5.0, ["/"], [], -1)],
        "host string, crawl_delay double, robots_allow array<string>, "
        "robots_deny array<string>, host_budget int",
    )
    seeds = [(f"{H}/s", 0)]

    wd1 = str(tmp_path / "honor")
    crawl(spark, wd1, pages_df, seeds, policy,
          CrawlConfig(max_rounds=10, honor_meta_robots=True))
    frontier = tables.read_table(spark, wd1, tables.latest_round(wd1), "frontier")
    fetched = {r["url"] for r in frontier.where("status = 'done'").collect()}
    # c dropped (rel=nofollow), d dropped (a is page-nofollow), e followed
    assert fetched == {f"{H}/s", f"{H}/a", f"{H}/b", f"{H}/e"}
    items = {r["url"] for r in tables.read_appended(spark, wd1, "items").collect()}
    assert items == {f"{H}/s", f"{H}/a", f"{H}/e"}  # b noindex'd away

    wd2 = str(tmp_path / "ignore")
    crawl(spark, wd2, pages_df, seeds, policy, CrawlConfig(max_rounds=10))
    frontier2 = tables.read_table(spark, wd2, tables.latest_round(wd2), "frontier")
    fetched2 = {r["url"] for r in frontier2.where("status = 'done'").collect()}
    assert fetched2 == {f"{H}/{p}" for p in "sabcde"}
    items2 = tables.read_appended(spark, wd2, "items")
    assert items2.count() == 6


def test_fresh_crawl_clears_stale_snapshots(spark, tmp_path):
    """A fresh (resume=False) crawl into a used workdir must not leave the
    previous crawl's higher rounds behind: latest_round/read_appended
    would otherwise mix two crawls' data."""
    from spider_spark import corpus, tables
    from spider_spark.crawl import crawl
    from spider_spark.round import CrawlConfig

    pages_pd = corpus.make_pages(n_pages=120, n_hosts=6, seed=7)
    pages = spark.createDataFrame(pages_pd)
    policy = spark.createDataFrame(corpus.make_host_policy(pages_pd))
    seeds = list(zip(*(corpus.make_seeds(pages_pd)[c] for c in ("url", "depth"))))
    wd = str(tmp_path / "wd")
    s1 = crawl(spark, wd, pages, seeds, policy, CrawlConfig(max_depth=4, max_rounds=30))
    assert s1.last_round >= 3
    # shorter fresh crawl into the SAME workdir
    s2 = crawl(spark, wd, pages, seeds[:1], policy,
               CrawlConfig(max_depth=1, max_rounds=30))
    assert s2.last_round < s1.last_round
    assert tables.latest_round(wd) == s2.last_round  # stale rounds gone
    items = tables.read_appended(spark, wd, "items")
    assert items.count() == s2.n_done  # no mixing with crawl 1's items
