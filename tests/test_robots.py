"""robots.txt parser (robots.py) — RFC 9309 subset semantics + crawl wiring."""

from __future__ import annotations

import pyspark.sql.functions as F

from spider_spark.robots import DEFAULT_CRAWL_DELAY, parse_robots, policy_from_robots


def test_star_group():
    p = parse_robots("User-agent: *\nDisallow: /admin/\nAllow: /admin/pub\nCrawl-delay: 7")
    assert p == {"robots_allow": ["/admin/pub"], "robots_deny": ["/admin/"],
                 "crawl_delay": 7.0, "sitemaps": []}


def test_specific_group_beats_star():
    body = ("User-agent: *\nDisallow: /\n\n"
            "User-agent: spider\nDisallow: /priv\nCrawl-delay: 1\n")
    p = parse_robots(body, agent="spider")
    assert p["robots_deny"] == ["/priv"] and p["crawl_delay"] == 1.0
    # a different agent falls back to the star group
    q = parse_robots(body, agent="otherbot")
    assert q["robots_deny"] == ["/"] and q["crawl_delay"] == DEFAULT_CRAWL_DELAY


def test_shared_group_multiple_agents():
    body = "User-agent: a\nUser-agent: spider\nDisallow: /x\n"
    assert parse_robots(body, agent="spider")["robots_deny"] == ["/x"]


def test_agent_prefix_match_and_case():
    body = "USER-AGENT: Spi\ndisallow: /y\n"
    assert parse_robots(body, agent="spider")["robots_deny"] == ["/y"]


def test_messy_input():
    body = "# top\n\nbroken line\nUser-agent: *\nDisallow:\nAllow: /ok # tail\nCrawl-delay: abc\n"
    p = parse_robots(body)
    # empty Disallow = no rule; bad delay ignored; comment stripped
    assert p == {"robots_allow": ["/ok"], "robots_deny": [],
                 "crawl_delay": DEFAULT_CRAWL_DELAY, "sitemaps": []}


def test_empty_and_none():
    for body in ("", None):
        p = parse_robots(body)
        assert p == {"robots_allow": ["/"], "robots_deny": [],
                     "crawl_delay": DEFAULT_CRAWL_DELAY, "sitemaps": []}


def test_second_group_after_rules_resets():
    body = ("User-agent: spider\nDisallow: /a\n\n"
            "User-agent: *\nDisallow: /b\n")
    p = parse_robots(body, agent="spider")
    assert p["robots_deny"] == ["/a"]  # star rules don't leak into mine


def test_crawl_bootstraps_policy_from_robots(spark, tmp_path):
    """End-to-end: robots bodies -> policy_from_robots -> crawl enforces
    the parsed deny prefix (A13 with no hand-built policy)."""
    import pandas as pd

    from spider_spark import corpus, tables
    from spider_spark.crawl import crawl
    from spider_spark.round import CrawlConfig

    pages_pd = corpus.make_pages(n_pages=120, n_hosts=5, seed=13)
    pages = spark.createDataFrame(pages_pd)
    seeds_pd = corpus.make_seeds(pages_pd, n_seeds=2, include_missing=False)
    seeds = list(zip(seeds_pd["url"], seeds_pd["depth"]))
    hosts = sorted({u.split("/")[2] for u in pages_pd["url"]})
    robots = spark.createDataFrame(pd.DataFrame({
        "host": hosts,
        "robots_txt": ["User-agent: *\nDisallow: /p/\n"] * len(hosts),
    }))
    policy = policy_from_robots(robots)
    s = crawl(spark, tmp_path / "wd", pages, seeds, policy,
              CrawlConfig(max_depth=3, max_rounds=6))
    frontier = tables.read_table(spark, tmp_path / "wd", s.last_round, "frontier")
    for r in frontier.collect():
        if "/p/" in r["url"]:
            assert r["status"] == "denied", r["url"]
    assert s.n_denied > 0


def test_sitemap_directive_is_global():
    body = ("Sitemap: https://a.com/s1.xml\nUser-agent: *\nDisallow: /x\n"
            "Sitemap: https://a.com/s2.xml\n")
    p = parse_robots(body)
    assert p["sitemaps"] == ["https://a.com/s1.xml", "https://a.com/s2.xml"]
    assert p["robots_deny"] == ["/x"]


def test_sitemap_to_seeds_pipeline(spark):
    """robots Sitemap: -> sitemap body -> seed DataFrame -> crawl's
    distributed seed path (A10)."""
    import pandas as pd

    from spider_spark.sitemap import seeds_from_sitemaps, sitemap_entries_udf

    urlset = """<?xml version="1.0"?>
    <urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
      <url><loc>https://a.com/p?x=1&amp;y=2</loc><lastmod>2026-01-01</lastmod></url>
      <url><loc> https://a.com/q </loc></url>
      <url><lastmod>2026-01-02</lastmod></url>
    </urlset>"""
    index = """<sitemapindex>
      <sitemap><loc>https://a.com/s-part1.xml</loc></sitemap>
      <sitemap><loc>https://a.com/s-part2.xml</loc></sitemap>
    </sitemapindex>"""
    df = spark.createDataFrame(pd.DataFrame({"sitemap_xml": [
        urlset.encode("utf8"), index.encode("utf8"), None]}))
    seeds = seeds_from_sitemaps(df).collect()
    assert {(r.url, r.lastmod) for r in seeds} == {
        ("https://a.com/p?x=1&y=2", "2026-01-01"),  # entity decoded
        ("https://a.com/q", None),                   # whitespace stripped
    }
    entries = df.select(F.explode(sitemap_entries_udf()(F.col("sitemap_xml"))).alias("e")).collect()
    kinds = [r["e"]["kind"] for r in entries]
    assert kinds.count("index") == 2  # nested index surfaced for the fetch loop
