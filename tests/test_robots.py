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
    # RFC-faithful defaults: NO implicit Allow rule (no rule matching ⇒
    # allowed already, and an implicit '/' would tie-beat 'Disallow: /')
    for body in ("", None):
        p = parse_robots(body)
        assert p == {"robots_allow": [], "robots_deny": [],
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


# -- RFC 9309 §2.2.2-2.2.3 matching: wildcards + longest-match ---------------

def test_compile_rule_forms():
    from spider_spark.robots import compile_rule

    assert compile_rule("/a/b") == {"prefix": "/a/b", "re": None, "ln": 4}
    # '*' → '.*', terminal '$' anchors, metacharacters escaped
    assert compile_rule("/*.php$") == {
        "prefix": None, "re": "^/.*\\.php$", "ln": 7}
    # mid-rule '$' is literal — stays a plain prefix rule
    assert compile_rule("/a$b") == {"prefix": "/a$b", "re": None, "ln": 4}
    # '*'-rule with a mid-rule '$': the '$' must be escaped in the regex
    assert compile_rule("/a$*b") == {"prefix": None, "re": "^/a\\$.*b", "ln": 5}
    # regex metachars in a wildcard rule never escape into syntax
    assert compile_rule("/a+(x)*z") == {
        "prefix": None, "re": "^/a\\+\\(x\\).*z", "ln": 8}


def test_longest_match_semantics():
    from spider_spark.robots import robots_denied

    # classic RFC example: longer allow re-opens a denied subtree
    assert robots_denied("/a/b", ["/a/b"], ["/a"]) is False
    assert robots_denied("/a/c", ["/a/b"], ["/a"]) is True
    # equal length → allow wins
    assert robots_denied("/page", ["/page"], ["/page"]) is False
    # deny-all works without an implicit allow rule
    assert robots_denied("/anything", [], ["/"]) is True
    # no rule matches → allowed
    assert robots_denied("/free", ["/x"], ["/y"]) is False
    # wildcard deny, longer literal allow
    assert robots_denied("/x/file.php", [], ["/*.php$"]) is True
    assert robots_denied("/x/file.php?q=1", [], ["/*.php$"]) is False
    assert robots_denied("/pri/ok/file", ["/pri/ok"], ["/pri/*/file"]) is True


def test_jvm_matcher_parity_with_python_model(spark):
    """denied_col (JVM expression) must agree with robots_denied (python
    model) rule-for-rule on a grid including wildcard and metachar rules."""
    import pandas as pd
    from pyspark.sql import functions as F

    from spider_spark.robots import compile_policy, denied_col, robots_denied

    allow = ["/a/b", "/pub*", "/d/e$", "/m+n"]
    deny = ["/a", "/pub/priv", "/*.cgi$", "/d", "/m"]
    paths = [
        "/a/b/c", "/a/x", "/pub/priv/1", "/pubX", "/x/y.cgi", "/x/y.cgiZ",
        "/d/e", "/d/ee", "/m+n/t", "/mq", "/", "/free",
    ]
    pol = spark.createDataFrame(pd.DataFrame({
        "host": ["h"], "crawl_delay": [1.0],
        "robots_allow": [allow], "robots_deny": [deny], "host_budget": [-1],
    }))
    df = spark.createDataFrame(pd.DataFrame({"host": ["h"] * len(paths),
                                             "path": paths}))
    got = {
        r["path"]: r["denied"]
        for r in df.join(compile_policy(pol), "host").select(
            "path",
            denied_col(F.col("path"), F.col("allow_rules"),
                       F.col("deny_rules")).alias("denied"),
        ).collect()
    }
    for p in paths:
        assert got[p] == robots_denied(p, allow, deny), p


def test_crawl_enforces_wildcard_rules(spark, tmp_path):
    """End-to-end: a '*'-wildcard Disallow plus a longer Allow carve-out,
    enforced by run_round's JVM matcher inside a real crawl."""
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
        "robots_txt": ["User-agent: *\nDisallow: /p/*1\nAllow: /p/*11\n"]
        * len(hosts),
    }))
    policy = policy_from_robots(robots)
    s = crawl(spark, tmp_path / "wd", pages, seeds, policy,
              CrawlConfig(max_depth=3, max_rounds=6))
    frontier = tables.read_table(spark, tmp_path / "wd", s.last_round, "frontier")
    from spider_spark.robots import robots_denied

    seen_denied = 0
    for r in frontier.collect():
        host = r["url"].split("/")[2]
        if host not in hosts:
            continue  # dangling-link host: no policy row ⇒ never denied
        path = "/" + r["url"].split("/", 3)[-1]
        if robots_denied(path, ["/p/*11"], ["/p/*1"]):
            assert r["status"] == "denied", r["url"]
            seen_denied += 1
        else:
            assert r["status"] != "denied", r["url"]
    assert seen_denied > 0


def test_round_robots_matching_includes_query_string(spark):
    """The engine's rule matching must see path AND query — the same
    everything-after-host string robots_denied (the parity model) checks.
    'Disallow: /*?sessionid=*' must bind; '/*.php$' must NOT deny a .php
    url that carries a query (the $ anchor no longer terminates it)."""
    from spider_spark.round import CrawlConfig, run_round, seeds_to_frontier

    urls = [
        "http://h.example.com/a?sessionid=1",   # denied by the query rule
        "http://h.example.com/a",               # allowed (no query)
        "http://h.example.com/x/file.php?q=1",  # allowed ($ anchor misses)
        "http://h.example.com/x/file.php",      # denied by the $ rule
    ]
    frontier = seeds_to_frontier(spark, [(u, 0) for u in urls])
    pages = spark.createDataFrame(
        [(u, b"<html></html>") for u in urls], "url string, html binary"
    )
    policy = spark.createDataFrame(
        [("h.example.com", -1, 0.0, ["/*?sessionid=*", "/*.php$"], [])],
        "host string, host_budget int, crawl_delay double, "
        "robots_deny array<string>, robots_allow array<string>",
    )
    res = run_round(spark, frontier, pages, policy, 1, CrawlConfig())
    status = {r.url: r.status for r in res.frontier.collect()}
    assert status["http://h.example.com/a?sessionid=1"] == "denied"
    assert status["http://h.example.com/a"] == "done"
    assert status["http://h.example.com/x/file.php?q=1"] == "done"
    assert status["http://h.example.com/x/file.php"] == "denied"


def test_rule_specificity_counts_octets_not_characters():
    """RFC 9309 §2.2.2 longest-match counts rule OCTETS (utf-8 bytes).
    allow '/p/中' is 4 chars but 6 octets; deny '/p/*q$' is 6 of each.
    Character counting says deny (6 > 4) — octet counting ties (6 == 6)
    and the tie goes to allow, matching Google's open-source matcher."""
    from spider_spark.robots import compile_rule, robots_denied

    assert compile_rule("/p/中")["ln"] == 6
    assert compile_rule("/p/*q$")["ln"] == 6
    assert robots_denied("/p/中q", allow=["/p/中"], deny=["/p/*q$"]) is False
    # and a strictly longer deny still wins
    assert robots_denied("/p/中q", allow=["/p/"], deny=["/p/*q$"]) is True
