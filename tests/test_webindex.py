"""webindex.py: SURT keys, CDX capture index, URL trap-shape scoring,
change-rate recrawl tiers — plus dedup.containment_pairs."""

from __future__ import annotations

from pyspark.sql import functions as F

from spider_spark import dedup, webindex


def _surt(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [
        r.k for r in df.select(webindex.surt_col(F.col("url")).alias("k")).collect()
    ]


def test_surt_normalizes_case_www_port_and_query_order(spark):
    keys = _surt(spark, [
        "HTTPS://WWW.Site.Example.COM:8080/A/B?b=2&a=1",
        "https://site.example.com/a/b?a=1&b=2",
    ])
    # same resource modulo scheme/case/www/port/param-order → same key
    assert keys[0] == keys[1] == "com,example,site)/a/b?a=1&b=2"


def test_surt_empty_path_and_no_query(spark):
    keys = _surt(spark, ["https://example.com", "http://example.com/"])
    assert keys == ["com,example)/", "com,example)/"]


def test_surt_malformed_url_yields_null_not_throw(spark):
    # ANSI parse_url throws on stray % escapes; surt_col must pass them to
    # null (ADVICE r01 failure mode)
    keys = _surt(spark, ["https://h0.example.com/%zz", "not a url"])
    assert keys == [None, None]


def test_cdx_index_seq_within_urlkey(spark):
    caps = spark.createDataFrame(
        [
            ("https://a.example.com/x", "2024-03-01 00:00:00", b"v1"),
            ("https://a.example.com/x", "2024-04-01 00:00:00", b"v2"),
            ("https://b.example.com/y", "2024-03-15 00:00:00", b"v1"),
        ],
        "url string, warc_ts string, html binary",
    ).withColumn("warc_ts", F.col("warc_ts").cast("timestamp"))
    out = webindex.cdx_index(caps).collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r.urlkey, []).append(r)
    a = sorted(by_key["com,example,a)/x"], key=lambda r: r.seq)
    assert [r.seq for r in a] == [1, 2]
    assert a[0].cdx_ts == "20240301000000" and a[1].cdx_ts == "20240401000000"
    assert a[0].digest != a[1].digest  # content changed between captures
    assert [r.seq for r in by_key["com,example,b)/y"]] == [1]
    assert all(r.n_bytes == 2 for r in out)


def _traps(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return webindex.score_traps(df).collect()


def test_trap_repeated_segments_flagged(spark):
    rows = _traps(spark, ["https://e.com/loop/loop/loop/p", "https://e.com/a/b/c"])
    assert rows[0].max_seg_repeat == 3 and rows[0].is_trap == 1
    assert rows[1].max_seg_repeat == 1 and rows[1].is_trap == 0


def test_trap_depth_params_calendar(spark):
    deep = "https://e.com/" + "/".join("s%d" % i for i in range(9))
    many = "https://e.com/p?" + "&".join("k%d=1" % i for i in range(9))
    cal = "https://e.com/blog/2024/01/5"
    rows = _traps(spark, [deep, many, cal])
    assert rows[0].path_depth == 9 and rows[0].is_trap == 1
    assert rows[1].n_params == 9 and rows[1].is_trap == 1
    assert rows[2].has_calendar == 1 and rows[2].is_trap == 0


def test_trap_malformed_url_scores_without_throwing(spark):
    rows = _traps(spark, ["https://h0.example.com/%zz/a"])
    assert rows[0].path_depth == 0 and rows[0].is_trap == 0  # unparseable → neutral


def test_recrawl_priority_tiers(spark):
    # url A: digest changes every capture (rate 1.0 → hot); B: one change
    # in 4 intervals (0.25 → cold); C: single capture (rate 0 → cold)
    hist = spark.createDataFrame(
        [("A", i, "d%d" % i) for i in range(5)]
        + [("B", i, "x" if i < 4 else "y") for i in range(5)]
        + [("C", 0, "z")],
        "url string, obs_ts long, digest string",
    )
    out = {r.url: r for r in webindex.recrawl_priority(hist).collect()}
    assert out["A"].change_rate == 1.0 and out["A"].tier == "hot"
    assert out["B"].n_changes == 1 and out["B"].tier == "cold"
    assert out["C"].n_obs == 1 and out["C"].change_rate == 0.0


def test_containment_asymmetric(spark):
    long = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    prefix = "w1 w2 w3 w4 w5 w6"  # all its 3-grams appear in long
    docs = spark.createDataFrame(
        [(1, long), (2, prefix), (3, "q1 q2 q3 q4 q5")],
        "doc_id long, text string",
    )
    pairs = {(r.a_id, r.b_id): r.containment
             for r in dedup.containment_pairs(docs, 0.9, 3).collect()}
    assert pairs == {(2, 1): 1.0}  # prefix ⊂ long; never the reverse


def test_write_cdx_lookup_is_partition_pruned(spark, tmp_path):
    caps = spark.createDataFrame(
        [("https://h%d.example.com/p/%d" % (i % 5, i),
          "2024-03-%02d 00:00:00" % (1 + i % 28), b"x%d" % i)
         for i in range(50)],
        "url string, warc_ts string, html binary",
    ).withColumn("warc_ts", F.col("warc_ts").cast("timestamp"))
    idx = webindex.cdx_index(caps)
    path = str(tmp_path / "cdx")
    webindex.write_cdx(idx, path, n_buckets=8)
    key = "com,example,h1)/p/1"
    out = webindex.lookup_captures(spark, path, key, n_buckets=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "kb" in plan  # pruned scan
    rows = out.collect()
    assert [r.urlkey for r in rows] == [key] and rows[0].seq == 1


def test_dsir_weights_prefer_target_like_docs(spark):
    from spider_spark import curation

    target = spark.createDataFrame(
        [(100 + i, "alpha beta gamma delta epsilon") for i in range(5)],
        "doc_id long, text string",
    )
    pool = spark.createDataFrame(
        [(1, "alpha beta gamma zeta"),      # mostly target vocabulary
         (2, "qq ww ee rr tt yy uu")],       # disjoint vocabulary
        "doc_id long, text string",
    )
    out = {r.doc_id: r.dsir_weight
           for r in curation.dsir_weights(pool, target).collect()}
    assert out[1] > out[2]  # target-like doc gets the higher weight


# ------------------------------------------------------- resolve_aliases
def _resolve(spark, edges, **kw):
    from spider_spark.webindex import resolve_aliases
    df = spark.createDataFrame(edges, "src string, dst string")
    return {r["url"]: (r["target"], r["hops"], r["resolved"])
            for r in resolve_aliases(df, **kw).collect()}


def test_resolve_chain_exact_hops(spark):
    out = _resolve(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    assert out == {"a": ("d", 3, True), "b": ("d", 2, True), "c": ("d", 1, True)}


def test_resolve_cycles_flagged_unresolved(spark):
    out = _resolve(spark, [("x", "y"), ("y", "x"), ("s", "s")])
    assert out["x"] == (None, None, False)
    assert out["y"] == (None, None, False)
    assert out["s"] == (None, None, False)


def test_resolve_multi_edge_min_dst(spark):
    out = _resolve(spark, [("m", "n"), ("m", "zzz")])
    assert out["m"] == ("n", 1, True)


def test_resolve_over_cap_chain_unresolved(spark):
    """A 10-hop chain with max_hops=4: heads too deep are unresolved,
    tails within reach resolve with exact hop counts."""
    edges = [(f"u{i}", f"u{i+1}") for i in range(10)]
    out = _resolve(spark, edges, max_hops=4)
    assert out["u0"] == (None, None, False)
    assert out["u6"] == ("u10", 4, True)
    assert out["u9"] == ("u10", 1, True)


# ------------------------------------------------------- fair_share_alloc
def _fair(spark, rows, total):
    from spider_spark.webindex import fair_share_alloc
    df = spark.createDataFrame(rows, "host string, demand long")
    return {r["host"]: r["alloc"] for r in fair_share_alloc(df, total).collect()}


def test_fair_share_waterfill_exact(spark):
    """W=12 over demands (10,3,1,8): level 4, no remainder."""
    a = _fair(spark, [("a", 10), ("b", 3), ("c", 1), ("d", 8)], 12)
    assert a == {"a": 4, "b": 3, "c": 1, "d": 4}
    assert sum(a.values()) == 12


def test_fair_share_remainder_deterministic(spark):
    """W=13: one extra slot goes to exactly one above-level host, and the
    choice is stable across runs (md5 order)."""
    rows = [("a", 10), ("b", 3), ("c", 1), ("d", 8)]
    a1, a2 = _fair(spark, rows, 13), _fair(spark, rows, 13)
    assert a1 == a2 and sum(a1.values()) == 13
    assert a1["b"] == 3 and a1["c"] == 1
    assert sorted((a1["a"], a1["d"])) == [4, 5]


def test_fair_share_budget_exceeds_demand(spark):
    a = _fair(spark, [("a", 2), ("b", 5)], 100)
    assert a == {"a": 2, "b": 5}


def test_fair_share_zero_budget_and_empty(spark):
    from spider_spark.webindex import fair_share_alloc
    assert set(_fair(spark, [("a", 4)], 0).values()) == {0}
    empty = spark.createDataFrame([], "host string, demand long")
    assert fair_share_alloc(empty, 10).count() == 0


# ----------------------------------------------------- mirror-host detection

def _mirror_fixture(spark):
    rows = []
    # h-a: 4 unique pages; h-b: full mirror of h-a; h-c: holds 2 of them
    for i in range(4):
        rows.append((f"https://h-a.example.com/p{i}", f"<html>page-{i}</html>"))
        rows.append((f"https://h-b.example.com/q{i}", f"<html>page-{i}</html>"))
    for i in range(2):
        rows.append((f"https://h-c.example.com/r{i}", f"<html>page-{i}</html>"))
    # h-d: unrelated
    rows.append(("https://h-d.example.com/x", "<html>other</html>"))
    rows.append(("https://h-d.example.com/y", "<html>other2</html>"))
    return spark.createDataFrame(rows, "url string, html string")


def test_mirror_full_and_partial(spark):
    from spider_spark.webindex import mirror_host_pairs

    out = {(r["a_host"], r["b_host"]): r
           for r in mirror_host_pairs(_mirror_fixture(spark), threshold=0.5).collect()}
    full = out[("h-a.example.com", "h-b.example.com")]
    assert full["containment_min"] == 1.0 and full["jaccard"] == 1.0
    part = out[("h-a.example.com", "h-c.example.com")]
    assert part["containment_min"] == 1.0  # c ⊂ a: min-containment flags it
    assert abs(part["jaccard"] - 2 / 4) < 1e-12
    assert ("h-b.example.com", "h-c.example.com") in out
    assert not any("h-d" in k[0] or "h-d" in k[1] for k in out)


def test_mirror_hot_digest_capped(spark):
    from spider_spark.webindex import mirror_host_pairs

    # one page shared by 30 hosts (default-index syndrome) + no other overlap
    rows = [(f"https://h{i}.example.com/", "<html>default</html>") for i in range(30)]
    rows += [(f"https://h{i}.example.com/u{i}", f"<html>unique-{i}</html>")
             for i in range(30)]
    df = spark.createDataFrame(rows, "url string, html string")
    assert mirror_host_pairs(df, threshold=0.1, max_hosts_per_digest=8).count() == 0
    # uncapped, the shared digest manufactures 30·29/2 candidate pairs
    assert mirror_host_pairs(df, threshold=0.1, max_hosts_per_digest=None).count() == 435


def test_mirror_min_digests_suppresses_tiny_hosts(spark):
    from spider_spark.webindex import mirror_host_pairs

    rows = [("https://big.example.com/a", "<html>a</html>"),
            ("https://big.example.com/b", "<html>b</html>"),
            ("https://tiny.example.com/a", "<html>a</html>")]
    df = spark.createDataFrame(rows, "url string, html string")
    assert mirror_host_pairs(df, threshold=0.1, min_digests=2).count() == 0
    assert mirror_host_pairs(df, threshold=0.1, min_digests=1).count() == 1


# ------------------------------------------------------- content-seen test

def test_content_seen_first_wins_by_ts_then_url(spark):
    from spider_spark.webindex import content_seen
    import datetime as dt

    t0 = dt.datetime(2024, 3, 1, 12, 0, 0)
    t1 = dt.datetime(2024, 3, 1, 12, 5, 0)
    rows = [
        ("https://a.example.com/1", t1, "<html>same</html>"),
        ("https://b.example.com/1", t0, "<html>same</html>"),  # earliest ts
        ("https://c.example.com/1", t0, "<html>same</html>"),  # ts tie: url order
        ("https://d.example.com/u", t0, "<html>unique</html>"),
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, html string")
    out = {r["url"]: r for r in content_seen(df).collect()}
    assert out["https://b.example.com/1"]["is_first_seen"]
    assert out["https://b.example.com/1"]["dup_of_url"] is None
    assert not out["https://c.example.com/1"]["is_first_seen"]
    assert out["https://c.example.com/1"]["dup_of_url"] == "https://b.example.com/1"
    assert out["https://a.example.com/1"]["dup_of_url"] == "https://b.example.com/1"
    assert out["https://d.example.com/u"]["is_first_seen"]


def test_content_seen_same_url_recapture_is_revisit(spark):
    """A re-capture of the SAME url with identical bytes must be a revisit
    pointer, not a second canonical row — exactly one is_first_seen per
    digest (row_number semantics; the old url-equality key re-stored every
    same-url recrawl as a duplicate full record). Digest is the full
    SHA-256: truncation makes silent-loss collisions at 10^10 captures."""
    from spider_spark.webindex import content_seen
    import datetime as dt

    t0 = dt.datetime(2024, 3, 1, 12, 0, 0)
    t1 = dt.datetime(2024, 3, 2, 12, 0, 0)
    rows = [
        ("https://a.example.com/1", t0, "<html>same</html>"),
        ("https://a.example.com/1", t1, "<html>same</html>"),  # recrawl, unchanged
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, html string")
    out = sorted(content_seen(df).collect(), key=lambda r: r["warc_ts"])
    assert len(out[0]["digest"]) == 64
    assert out[0]["is_first_seen"] and out[0]["dup_of_url"] is None
    assert not out[1]["is_first_seen"]
    assert out[1]["dup_of_url"] == "https://a.example.com/1"
    assert out[1]["dup_of_ts"] == t0


# ------------------------------------------------- anchor-text profile

def test_anchor_profile_salted_equals_naive_groupby(spark):
    """The salted two-stage anchor aggregation must be EXACTLY the naive
    one-shuffle groupBy: counts, distinct-doc counts, and the sorted
    top-N distinct anchor cap — on a fixture with a hot target whose
    in-links span every salt and exceed the cap."""
    import pyspark.sql.functions as F
    from spider_spark.webindex import anchor_profile

    rows = []
    for doc in range(120):
        # hot target gets a link from every doc with 2 distinct anchors
        rows.append((doc, "https://hot.example.com/", f"anchor-{doc % 70:03d}"))
        rows.append((doc, "https://hot.example.com/", f"zz-{doc:03d}"))
        # cold targets: a few links each
        rows.append((doc, f"https://t{doc % 7}.example.com/", f"a{doc % 5}"))
    pairs = spark.createDataFrame(rows, "doc_id long, target string, anchor string")

    naive = pairs.groupBy("target").agg(
        F.count(F.lit(1)).cast("long").alias("n_links"),
        F.countDistinct("doc_id").cast("long").alias("n_src_docs"),
        F.slice(F.array_sort(F.collect_set("anchor")), 1, 50).alias("anchor_texts"),
    )
    salted = anchor_profile(pairs, n_anchors=50, n_salt=16)

    def canon(df):
        return {
            r["target"]: (r["n_links"], r["n_src_docs"], tuple(r["anchor_texts"]))
            for r in df.collect()
        }

    a, b = canon(naive), canon(salted)
    assert a == b
    # the hot target really exercises the cap (190 distinct anchors > 50)
    assert a["https://hot.example.com/"][0] == 240
    assert len(a["https://hot.example.com/"][2]) == 50


# ------------------------------------------------- rel=canonical collapse

def test_absolutize_href_branches(spark):
    from spider_spark.canon import absolutize_href_col
    import pyspark.sql.functions as F

    rows = [
        ("https://A.Example.com:8080/a/b/page.html", "https://other.com/x"),
        ("https://a.example.com/a/b/page.html", "//cdn.example.com/y"),
        ("https://A.Example.com:8080/a/b/page.html", "/root.html"),
        ("https://a.example.com/a/b/page.html", "sibling.html"),
        ("https://a.example.com/noslash", "rel.html"),
        ("https://a.example.com/a/b/", None),
    ]
    df = spark.createDataFrame(rows, "base string, href string")
    out = [r["abs"] for r in df.select(
        absolutize_href_col(F.col("href"), F.col("base")).alias("abs")).collect()]
    assert out == [
        "https://other.com/x",
        "https://cdn.example.com/y",
        "https://a.example.com:8080/root.html",
        "https://a.example.com/a/b/sibling.html",
        "https://a.example.com/rel.html",
        None,
    ]


def test_canonical_alias_edges_forms_and_selfdrop(spark):
    from spider_spark.webindex import canonical_alias_edges

    rows = [
        ("https://h.example.com/d/1",
         '<html><head><link rel="canonical" href="/d/0"></head><body>x</body></html>'),
        ("https://h.example.com/d/2",
         '<html><head><link rel="canonical" href="https://h.example.com/d/1"></head></html>'),
        ("https://h.example.com/d/3",
         '<html><head><link rel="canonical" href="//h.example.com/d/2"></head></html>'),
        # self-canonical: dropped
        ("https://h.example.com/d/0",
         '<html><head><link rel="canonical" href="https://h.example.com/d/0"></head></html>'),
        # no canonical at all: dropped
        ("https://h.example.com/d/9", "<html><body>plain</body></html>"),
    ]
    df = spark.createDataFrame(rows, "url string, html string")
    edges = {(r["src"], r["dst"]) for r in canonical_alias_edges(df).collect()}
    assert edges == {
        ("https://h.example.com/d/1", "https://h.example.com/d/0"),
        ("https://h.example.com/d/2", "https://h.example.com/d/1"),
        ("https://h.example.com/d/3", "https://h.example.com/d/2"),
    }


def test_canonical_chain_collapses_via_resolve(spark):
    from spider_spark.webindex import canonical_alias_edges, resolve_aliases

    rows = [
        (f"https://h.example.com/d/{i}",
         f'<html><head><link rel="canonical" href="/d/{i - 1}"></head></html>')
        for i in range(1, 4)
    ]
    df = spark.createDataFrame(rows, "url string, html string")
    res = {r["url"]: (r["target"], r["hops"], r["resolved"])
           for r in resolve_aliases(canonical_alias_edges(df)).collect()}
    assert res["https://h.example.com/d/3"] == ("https://h.example.com/d/0", 3, True)
    assert res["https://h.example.com/d/1"] == ("https://h.example.com/d/0", 1, True)


# --------------------------------------------------- URL template mining

def test_url_templates_counts_and_example(spark):
    from spider_spark.webindex import url_templates

    urls = [f"https://shop.example.com/product/{i}/review/{j}"
            for i in (3, 17, 99) for j in (1, 2)]
    urls += ["https://shop.example.com/about", "https://blog.example.com/post/7"]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    out = {(r["host"], r["template"]): (r["n_urls"], r["example_url"])
           for r in url_templates(df).collect()}
    assert out[("shop.example.com", "/product/{d}/review/{d}")] == (
        6, "https://shop.example.com/product/17/review/1")
    assert out[("shop.example.com", "/about")] == (1, "https://shop.example.com/about")
    assert out[("blog.example.com", "/post/{d}")][0] == 1


def test_absolutize_rfc3986_query_fragment_scheme(spark):
    from spider_spark.canon import absolutize_href_col
    import pyspark.sql.functions as F

    base = "https://h.example.com/a/b/page.html?k=1"
    rows = [
        (base, "?page=all"),   # query-only: keep base PATH
        (base, "#top"),        # fragment-only: keep path AND query
        (base, "mailto:x@y.example"),  # scheme without //: absolute
        (base, "tel:+15551234"),
    ]
    df = spark.createDataFrame(rows, "base string, href string")
    out = [r["abs"] for r in df.select(
        absolutize_href_col(F.col("href"), F.col("base")).alias("abs")).collect()]
    assert out == [
        "https://h.example.com/a/b/page.html?page=all",
        "https://h.example.com/a/b/page.html?k=1#top",
        "mailto:x@y.example",
        "tel:+15551234",
    ]


# -------------------------------------------- sitemap-driven recrawl

def test_sitemap_staleness_reasons(spark):
    from spider_spark.webindex import sitemap_staleness

    seeds = spark.createDataFrame(
        [
            ("https://h/a", "2024-04-01"),            # modified after capture
            ("https://h/b", "2024-03-01T09:00:00Z"),  # before capture: fresh
            ("https://h/c", "2024-04-01"),            # never captured
            ("https://h/d", "not-a-date"),            # malformed claim: fresh
            ("https://h/e", None),                    # no claim: fresh
        ],
        "url string, lastmod string",
    )
    caps = spark.createDataFrame(
        [("https://h/a", "2024-03-15 00:00:00"),
         ("https://h/b", "2024-03-15 00:00:00"),
         ("https://h/d", "2024-03-15 00:00:00"),
         ("https://h/e", "2024-03-15 00:00:00")],
        "url string, warc_ts string",
    ).withColumn("warc_ts", F.col("warc_ts").cast("timestamp"))
    out = {r["url"]: (r["reason"], r["is_stale"])
           for r in sitemap_staleness(seeds, caps).collect()}
    assert out["https://h/a"] == ("modified", True)
    assert out["https://h/b"] == ("fresh", False)
    assert out["https://h/c"] == ("never_captured", True)
    assert out["https://h/d"] == ("fresh", False)
    assert out["https://h/e"] == ("fresh", False)
