"""Regex-dialect parity properties: the engine extracts links with JVM
regexp_extract_all while the parity model uses Python re — the two dialects
must agree on the exact reference patterns (SURVEY.md §7 hard part (a))."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

import pyspark.sql.functions as F

from spider_spark import parse

_attr = st.from_regex(r'[a-z]{1,6}="[A-Za-z0-9/:.%#?&=_-]{0,20}"', fullmatch=True)
_text = st.from_regex(r"[A-Za-z0-9 <>/=.\"'-]{0,40}", fullmatch=True)
_jd = st.from_regex(r"//item\.jd\.com/[0-9]{7,11}\.html", fullmatch=True)


@st.composite
def html_docs(draw):
    parts = draw(
        st.lists(
            st.one_of(
                _text,
                _attr.map(lambda a: f"<a {a}>x</a>"),
                _jd.map(lambda u: f'<a href="{u}">jd</a>'),
                st.just('<a href="">empty</a>'),
                st.just("href=\"unclosed"),
            ),
            min_size=0,
            max_size=8,
        )
    )
    return "".join(parts)


def _spark_extract(spark, docs, col_fn):
    df = spark.createDataFrame([(i, d) for i, d in enumerate(docs)], "i long, html string")
    return {r["i"]: list(r["m"]) for r in df.select("i", col_fn(F.col("html")).alias("m")).collect()}


def test_href_and_jd_patterns_agree_with_python(spark):
    import hypothesis

    docs: list[str] = []

    @hypothesis.given(html_docs())
    @hypothesis.settings(max_examples=250, deadline=None, database=None)
    def collect(d):
        docs.append(d)

    collect()
    got_href = _spark_extract(spark, docs, parse.links_col)
    got_jd = _spark_extract(spark, docs, parse.jd_links_col)
    for i, d in enumerate(docs):
        assert got_href[i] == parse.extract_links(d), d
        assert got_jd[i] == parse.extract_jd_links(d), d


def test_dom_byte_parity_on_messy_qcc_corpus(spark):
    """BASELINE.json input_hint per-row invariant, on the DOM surface:
    extracted field values must be BYTE-IDENTICAL to the planted golden
    columns across a messy corpus (unclosed tags, entities, attr noise,
    mixed case, ~25% gb18030 bytes) — the reference's lxml family
    (qcc.py:52-59) run by the from-scratch engine."""
    from spider_spark import corpus

    pages = corpus.make_qcc_pages(n_pages=120, seed=7)
    fields = [n for n, _ in parse.QCC_XPATH_FIELDS]
    df = spark.createDataFrame(pages[["url", "html"]])
    out = (
        df.select("url", parse.xpath_fields_udf(parse.QCC_XPATH_FIELDS)(F.col("html")).alias("p"))
        .select("url", "p.*")
        .toPandas()
        .set_index("url")
    )
    golden = pages.set_index("url")
    assert len(out) == len(golden)
    for f in fields:
        got = out[f].to_dict()
        want = golden[f].to_dict()
        mismatches = {u: (got[u], want[u]) for u in want if got[u] != want[u]}
        assert not mismatches, (f, dict(list(mismatches.items())[:3]))
    # encoding split actually exercised both decode paths
    assert set(golden["encoding"].unique()) == {"utf-8", "gb18030"}


def test_jvm_parse_equals_udf_parse(spark):
    """parse_page_cols (builtin regexp, codegen) must be byte-identical to
    parse_page_udf (python re) over the UTF-8 corpus — the cross-dialect
    field-extraction parity the crawl fast path rests on."""
    from spider_spark import corpus

    pages = corpus.make_pages(n_pages=150, n_hosts=8, seed=3)
    df = spark.createDataFrame(pages[["url", "html"]])
    jvm = (
        df.select("url", parse.parse_page_cols(F.col("html").cast("string")).alias("p"))
        .select("url", "p.*").collect()
    )
    py = (
        df.select("url", parse.parse_page_udf(F.col("html")).alias("p"))
        .select("url", "p.*").collect()
    )
    jvm_map = {r["url"]: r.asDict() for r in jvm}
    for r in py:
        assert jvm_map[r["url"]] == r.asDict(), r["url"]


def test_non_utf8_page_does_not_crash_round(spark, tmp_path):
    """Regression: decode('UTF-8') THROWS on invalid bytes under ANSI —
    a single binary/gb18030 page must not kill the crawl round."""
    import pandas as pd
    from spider_spark import tables
    from spider_spark.crawl import crawl
    from spider_spark.round import CrawlConfig

    good = ('<html><head><title>ok</title></head><body><p>t</p>'
            '<a href="https://h0.example.com/bin">x</a></body></html>').encode("utf8")
    bad = b"\xff\xfe\x00garbage" + "中文gb".encode("gb18030") + b'<a href="https://h0.example.com/next">l</a>'
    pages = spark.createDataFrame(pd.DataFrame({
        "url": ["https://h0.example.com/", "https://h0.example.com/bin",
                "https://h0.example.com/next"],
        "html": [good, bad, good],
    }))
    policy = spark.createDataFrame(pd.DataFrame({
        "host": ["h0.example.com"], "crawl_delay": [5.0],
        "robots_allow": [["/"]], "robots_deny": [[]], "host_budget": [-1],
    }))
    s = crawl(spark, tmp_path / "wd", pages, [("https://h0.example.com/", 0)],
              policy, CrawlConfig(max_rounds=5))
    assert s.n_done >= 2  # the bad page fetched + link-extracted, no crash
    frontier = tables.read_table(spark, tmp_path / "wd", s.last_round, "frontier")
    by_url = {r["url"]: r["status"] for r in frontier.collect()}
    assert by_url["https://h0.example.com/bin"] == "done"
    assert by_url["https://h0.example.com/next"] == "done"  # link through bad bytes


def test_dom_links_udf_beats_regex_on_messy_anchors(spark):
    """C4 structural variant: DOM link discovery handles single-quoted and
    entity-encoded hrefs the C4 regex scan (double-quote only) cannot,
    while agreeing with it on clean anchors."""
    html_clean = b'<a href="/a">1</a><a href="/b">2</a>'
    html_messy = (
        b"<a href='/sq'>s</a>"                      # single quotes
        b'<a href="/e?x=1&amp;y=2">e</a>'           # entity in href
        b"<a class='z' href=/bare>b</a>"            # unquoted attr
    )
    df = spark.createDataFrame([(html_clean,), (html_messy,), (None,)], "html binary")
    dom_links = [r.l for r in df.select(parse.dom_links_udf()(F.col("html")).alias("l")).collect()]
    assert dom_links[0] == ["/a", "/b"]
    assert dom_links[1] == ["/sq", "/e?x=1&y=2", "/bare"]
    assert dom_links[2] is None
    regex_links = [
        list(r.l) if r.l is not None else None
        for r in df.select(parse.links_col(F.col("html").cast("string")).alias("l")).collect()
    ]
    assert regex_links[0] == ["/a", "/b"]      # agreement on clean anchors
    # regex catches only the double-quoted href and returns it RAW
    # (undecoded entity) — the DOM path is the one that matches browser
    # semantics on all three messy forms
    assert regex_links[1] == ["/e?x=1&amp;y=2"]


# ------------------------------------------------- in-page robots directives

def test_robots_directives_tokens_and_link_filter(spark):
    from pyspark.sql import functions as F
    from spider_spark.parse import robots_directives_udf

    rows = [
        # plain page, one nofollow link among two
        ("u1", '<html><body><a href="/a">a</a>'
               '<a rel="external nofollow" href="/b">b</a></body></html>'),
        # noindex only: links still followed
        ("u2", '<html><head><meta name="robots" content="NOINDEX"></head>'
               '<body><a href="/c">c</a></body></html>'),
        # page-level nofollow: link set empty
        ("u3", '<html><head><meta name="robots" content="index, nofollow"></head>'
               '<body><a href="/d">d</a></body></html>'),
        # none = noindex + nofollow
        ("u4", '<html><head><meta name="robots" content="none"></head>'
               '<body><a href="/e">e</a></body></html>'),
        # substring must not trip: content and rel both near-miss
        ("u5", '<html><head><meta name="robots" content="nofollowup"></head>'
               '<body><a rel="nofollower" href="/f">f</a></body></html>'),
    ]
    df = spark.createDataFrame(rows, "url string, html string")
    out = {
        r["url"]: (r["d"]["noindex"], r["d"]["nofollow"], r["d"]["follow_hrefs"])
        for r in df.select("url", robots_directives_udf()(F.col("html")).alias("d")).collect()
    }
    assert out["u1"] == (False, False, ["/a"])
    assert out["u2"] == (True, False, ["/c"])
    assert out["u3"] == (False, True, [])
    assert out["u4"] == (True, True, [])
    assert out["u5"] == (False, False, ["/f"])


def test_meta_robots_jvm_fast_path_attribute_variants(spark):
    """The codegen regex path must agree with the DOM UDF on real-HTML
    attribute variation: reversed attribute order, unquoted values,
    uppercase names — and still reject token near-misses."""
    from pyspark.sql import functions as F
    from spider_spark.parse import (
        follow_links_col, meta_nofollow_col, meta_noindex_col,
    )

    rows = [
        ("rev", '<html><head><meta content="noindex, nofollow" name="robots"></head></html>'),
        ("unq", '<html><head><meta name=robots content=noindex,nofollow></head></html>'),
        ("upper", '<html><head><META NAME="ROBOTS" CONTENT="NONE"></head></html>'),
        ("miss", '<html><head><meta name="robots" content="nofollowup"></head></html>'),
        ("other", '<html><head><meta name="viewport" content="noindex"></head></html>'),
    ]
    df = spark.createDataFrame(rows, "k string, html string")
    out = {r["k"]: (r["ni"], r["nf"]) for r in df.select(
        "k", meta_noindex_col(F.col("html")).alias("ni"),
        meta_nofollow_col(F.col("html")).alias("nf")).collect()}
    assert out["rev"] == (True, True)
    assert out["unq"] == (True, True)
    assert out["upper"] == (True, True)
    assert out["miss"] == (False, False)
    assert out["other"] == (False, False)

    # uppercase HREF kept; empty href dropped, never a "" url
    links = df.where("k = 'miss'").select(
        follow_links_col(F.lit(
            '<html><body><a HREF="/up">u</a><a href="">e</a>'
            '<a rel="nofollow" href="/no">n</a></body></html>'
        )).alias("l")).collect()[0]["l"]
    assert links == ["/up"]


def test_meta_robots_ignores_data_prefixed_attributes(spark):
    from pyspark.sql import functions as F

    from spider_spark.parse import follow_links_col, meta_noindex_col

    rows = [
        ('<meta data-name="robots" content="noindex">', False),
        ('<meta name="robots" data-content="noindex" content="index">', False),
        ('<meta name="robots" content="noindex">', True),
    ]
    df = spark.createDataFrame([(h,) for h, _ in rows], "html string")
    got = [r[0] for r in df.select(meta_noindex_col(F.col("html"))).collect()]
    assert got == [want for _, want in rows]

    # data-rel must not strip a followable link; x-nofollow is not nofollow
    links = spark.createDataFrame(
        [('<a data-rel="nofollow" href="/x">k</a>',),
         ('<a rel="x-nofollow" href="/y">k</a>',),
         ('<a rel="nofollow" href="/z">k</a>',)],
        "html string",
    )
    out = [list(r[0]) for r in links.select(follow_links_col(F.col("html"))).collect()]
    assert out == [["/x"], ["/y"], []]


def test_decode_series_keeps_literal_replacement_char():
    import pandas as pd

    from spider_spark.parse import _decode_series

    # valid UTF-8 containing a LITERAL U+FFFD must NOT be re-decoded as
    # gb18030 (which would mangle the whole page); genuinely broken bytes
    # still take the gb18030 retry
    clean = "title � body".encode("utf-8")
    gbk = "你好".encode("gb18030")
    out = _decode_series(pd.Series([clean, gbk]))
    assert out.iloc[0] == "title � body"
    assert out.iloc[1] == "你好"


def test_decode_series_matches_dom_policy_on_divergent_payloads():
    """ADVICE r4 #1: the vectorized parse-tier decode must agree with
    dom.decode_html_bytes on every policy branch — declared-utf-8 pages
    with invalid bytes (declared wins over the gb18030 byte-failure
    retry), utf-16 BOM pages, declared-gb pages whose bytes are valid
    utf-8, and undeclared broken bytes."""
    import pandas as pd

    from spider_spark.dom import decode_html_bytes
    from spider_spark.parse import _decode_series

    payloads = [
        # declared utf-8, bytes invalid → utf-8 errors=replace, NOT gb18030
        b'<meta charset="utf-8"><p>\xff\xfe broken</p>',
        # utf-16 LE BOM → utf-16 decode
        "<p>utf16 page</p>".encode("utf-16"),
        # declared gb2312, bytes coincidentally valid utf-8 → gb18030
        b'<meta charset="gb2312"><p>' + "注".encode("gb18030") + b"</p>",
        # undeclared, broken utf-8 → gb18030 retry
        "你好".encode("gb18030"),
        # undeclared valid utf-8 → fast path
        "plain utf-8 ✓".encode("utf-8"),
        # BOM'd utf-8
        b"\xef\xbb\xbfbom page",
    ]
    out = _decode_series(pd.Series(payloads))
    for i, p in enumerate(payloads):
        assert out.iloc[i] == decode_html_bytes(p), f"tier divergence on payload {i}"
