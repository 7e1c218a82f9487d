"""Property-based URL canonicalization tests (SURVEY.md §5.4).

hypothesis generates adversarial URL shapes (unicode paths, fragments,
scheme-relative ``//host/path`` like client_crawler.py:111 produces, odd
ports); properties: canonicalization is idempotent, dedup keys are stable,
and the Spark column expression agrees with the pure-python model that the
parity fixtures are built on.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

import pyspark.sql.functions as F

from spider_spark.canon import (
    canonical_col,
    canonicalize,
    host_col,
    host_of,
    normalize_href,
    url_md5,
)

# RFC-valid labels (no leading/trailing '-'): java.net.URI treats a label
# ending in '-' as a registry-based authority with NULL host, while python's
# urlsplit happily returns it — a known, documented divergence; the engine
# treats null-host rows as policy-less, so only the property test cares.
_host = st.from_regex(
    r"[a-z]([a-z0-9-]{0,8}[a-z0-9])?(\.[a-z]{2,5}){1,2}", fullmatch=True
)
# Path alphabet deliberately includes the char classes java.net.URI rejects
# (space, excluded ASCII, NBSP, a control char) plus allowed non-ASCII
# (é, 中, U+FEFF) — ADVICE r01: the old [A-Za-z0-9._~%-] alphabet could not
# generate the inputs where engine and python model used to drift.
_pathchar = st.sampled_from(
    list("abcz019._~%-")
    + list(' {}|\\^`<>"[]')
    + ["é", "中", " ", "﻿", "\x07"]
)
_path = st.lists(
    st.lists(_pathchar, max_size=6).map("".join), max_size=4
).map(lambda segs: "".join("/" + s for s in segs))
_query = st.one_of(st.just(""), st.from_regex(r"\?[a-z]=[0-9]{1,3}", fullmatch=True))
_frag = st.one_of(st.just(""), st.from_regex(r"#[A-Za-z0-9]{0,6}", fullmatch=True))
_scheme = st.sampled_from(["http", "https", "HTTP", "HTTPS", "Http"])
_port = st.sampled_from(["", ":80", ":443", ":8080"])


@st.composite
def urls(draw):
    return (
        f"{draw(_scheme)}://{draw(_host)}{draw(_port)}{draw(_path)}"
        f"{draw(_query)}{draw(_frag)}"
    )


@given(urls())
@settings(max_examples=200, deadline=None)
def test_canonicalize_idempotent(u):
    c = canonicalize(u)
    assert canonicalize(c) == c


@given(urls())
@settings(max_examples=200, deadline=None)
def test_canonical_strips_fragment_and_default_port(u):
    c = canonicalize(u)
    h = host_of(u)
    if c == u and h is None:
        return  # unparseable (malformed escape) ⇒ raw pass-through contract
    assert "#" not in c
    assert ":80/" not in c + "/" or not c.startswith("http://")
    assert h is not None and h == h.lower()


@given(st.from_regex(r"//[a-z]{1,8}\.com(/[a-z0-9]{0,5}){0,2}", fullmatch=True))
@settings(max_examples=100, deadline=None)
def test_scheme_relative_fixup(href):
    out = normalize_href(href)
    assert out.startswith("https:") and out[6:] == href


@given(st.lists(urls(), min_size=1, max_size=30, unique=True))
@settings(max_examples=10, deadline=None)
def test_md5_keys_unique_per_raw_url(batch):
    # the parity dedup key is the RAW url string (mongo_redis_mgr.py:43-47)
    assert len({url_md5(u) for u in batch}) == len(set(batch))


def test_spark_columns_match_python_model(spark):
    """canonical_col/host_col (JVM) ≡ canonicalize/host_of (python model)
    over a hypothesis-generated corpus — the two implementations feed the
    engine and the parity fixtures respectively, so drift breaks parity."""
    import hypothesis

    samples: list[str] = []

    @hypothesis.given(urls())
    @hypothesis.settings(max_examples=300, deadline=None, database=None)
    def collect(u):
        samples.append(u)

    collect()
    samples = sorted(set(samples))
    df = spark.createDataFrame([(u,) for u in samples], "url string").select(
        "url",
        canonical_col(F.col("url")).alias("canon"),
        host_col(F.col("url")).alias("host"),
    )
    for r in df.collect():
        assert r["canon"] == canonicalize(r["url"]), r["url"]
        assert r["host"] == host_of(r["url"]), r["url"]


# --------------------------------------------------- registrable_domain_col
def test_registrable_domain_psl_rules(spark):
    from pyspark.sql import functions as F

    from spider_spark.canon import registrable_domain_col

    cases = {
        "www.x.co.uk": "x.co.uk",       # 2-level public suffix
        "a.com": "a.com",               # simple
        "com": None,                    # host IS a public suffix
        "co.uk": None,
        "x.github.io": "x.github.io",   # private-registry suffix
        "github.io": None,
        "localhost": None,              # single label, no rule
        "deep.sub.a.blogspot.com": "a.blogspot.com",
        "weird.zz": "weird.zz",         # unknown TLD -> implicit * rule
    }
    df = spark.createDataFrame([(h,) for h in cases], "host string")
    got = {r["host"]: r["rd"] for r in df.select(
        "host", registrable_domain_col(F.col("host")).alias("rd")).collect()}
    assert got == cases


def test_absolutize_matches_stdlib_urljoin(spark):
    """Differential vs urllib.parse.urljoin (the independent model) over
    the reference-resolution subset the engine claims (RFC 3986 §5 minus
    dot-segment normalization — documented in absolutize_href_col)."""
    from urllib.parse import urljoin

    from pyspark.sql import functions as F

    from spider_spark.canon import absolutize_href_col

    bases = [
        "https://ex.com/a/b/c?q=1",
        "https://ex.com/a/",
        "http://ex.com",          # empty path
        "https://u@ex.com:8443/p/x",
    ]
    hrefs = [
        "", "d", "d/e.html", "/root.html", "//cdn.com/x.js",
        "?page=2", "#frag", "https://other.com/abs", "mailto:a@b.c",
        "img.png?s=1", "sub/",
    ]
    rows = [(b, h) for b in bases for h in hrefs]
    df = spark.createDataFrame(rows, "base string, href string")
    got = {(r.base, r.href): r.abs for r in df.select(
        "base", "href",
        absolutize_href_col(F.col("href"), F.col("base")).alias("abs")).collect()}
    for b, h in rows:
        expect = urljoin(b, h)
        # urljoin strips the fragment-only same-doc marker differently:
        # urljoin(base, '#f') keeps base?query#f — same as ours; and for
        # empty href returns base minus fragment — same as ours.
        assert got[(b, h)] == expect, (b, h, got[(b, h)], expect)
