"""Extraction operators (SURVEY.md §2.C) — the byte-parity surface.

The per-row invariant (BASELINE.json input_hint): extracted text must be
byte-identical per url to the reference semantics. The pure functions here
ARE the single source of truth: the reference model (tests/model) and the
Spark engine (pandas UDFs below) both call them, and the synthetic corpus's
golden ``pages.text`` column is independently asserted against.

Link-discovery regexes reproduce the reference's exact patterns:
- JD item pages: ``//item.jd.com/\\d{7,11}.html``
  (分布式京东商品详情页/client_crawler.py:111,139)
- qcc firm pages: ``/firm_[0-9a-zA-Z]*?.html`` (企查查工商数据/qcc.py:41,98)
- generic anchors: href attribute scan (our engine's general crawl mode).

Everything Spark-side is either a built-in column expression (JVM,
whole-stage codegen) or a vectorized pandas/Arrow UDF — never per-row Python
(input_hint requirement).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType, StructField, StructType

# reference patterns, kept verbatim (unescaped dots and all) for parity
JD_ITEM_PATTERN = r"//item.jd.com/\d{7,11}.html"      # client_crawler.py:111
QCC_FIRM_PATTERN = r"/firm_[0-9a-zA-Z]*?.html"        # qcc.py:41
HREF_PATTERN = r'href="([^"]+)"'                       # generic anchor scan

_RE_HREF = re.compile(HREF_PATTERN)
_RE_TITLE = re.compile(r"<title>(.*?)</title>", re.S)
_RE_TEXT = re.compile(r"<p>(.*?)</p>", re.S)
_RE_JD = re.compile(JD_ITEM_PATTERN)

# qcc company fields: reference extracts 8 labeled cells from the company
# info table via XPath `contains(text(),'<label>')/following-sibling::td[1]`
# (qcc.py:52-59). Same label→field mapping, regex row scan over the
# synthetic ntable.
QCC_FIELDS = [
    ("company_name", "企业名称"),
    ("registered_capital", "注册资本"),
    ("contributed_capital", "实缴资本"),
    ("management_forms", "经营状态"),
    ("established_data", "成立日期"),
    ("Organization_Number", "组织机构代码"),
    ("address", "地址"),
    ("business_scope", "经营范围"),
]
_RE_QCC = {
    field: re.compile(r"<td>%s</td><td>(.*?)</td>" % re.escape(label), re.S)
    for field, label in QCC_FIELDS
}


# ---------------------------------------------------------------- pure python
def extract_title(html: str) -> str | None:
    m = _RE_TITLE.search(html)
    return m.group(1) if m else None


def extract_text(html: str) -> str | None:
    """First <p> block — the byte-parity text target."""
    m = _RE_TEXT.search(html)
    return m.group(1) if m else None


def extract_links(html: str) -> list[str]:
    """All anchor hrefs in document order (raw, pre-normalization)."""
    return _RE_HREF.findall(html)


def extract_jd_links(html: str) -> list[str]:
    """Reference link discovery, exact pattern (client_crawler.py:139)."""
    return _RE_JD.findall(html)


def extract_qcc(html: str) -> dict[str, str | None]:
    out: dict[str, str | None] = {}
    for field, _ in QCC_FIELDS:
        m = _RE_QCC[field].search(html)
        out[field] = m.group(1) if m else None
    return out


# --------------------------------------------------------------- spark side
_PARSE_SCHEMA = StructType(
    [StructField("title", StringType(), True), StructField("text", StringType(), True)]
    + [StructField(f"company_{f}", StringType(), True) for f, _ in QCC_FIELDS]
    + [StructField("error", StringType(), True)]
)


def _decode_series(html: pd.Series) -> pd.Series:
    """bytes → str with EXACTLY dom.decode_html_bytes's precedence
    (ADVICE r4 #1: the two tiers used to disagree on declared-utf-8 pages
    with invalid bytes and on utf-16 BOM pages — same payload, different
    text per tier). Vectorized shape: the common case (no prescan verdict,
    valid utf-8 — the overwhelming majority of the web) stays on the
    pandas .str.decode('utf-8') fast path; only rows where the shared
    policy differs from plain utf-8-replace (prescan says gb18030/utf-16,
    or undeclared bytes failing strict utf-8 → gb18030 retry) drop to a
    per-row decode_html_bytes call. A prescan verdict of utf-8 keeps the
    fast path even when bytes are invalid — declared utf-8 wins over the
    byte-failure retry, matching the dom tier."""
    from spider_spark.dom import decode_html_bytes, sniff_encoding

    is_bytes = html.map(lambda v: isinstance(v, (bytes, bytearray)))
    s = html.copy()
    if is_bytes.any():
        dec = html[is_bytes].str.decode("utf-8", errors="replace")
        # the '�'-probe alternative would also trip on pages legitimately
        # CONTAINING a literal U+FFFD and mangle them through the retry;
        # testing the BYTES keeps those on the utf-8 path
        def _needs_slow_path(r) -> bool:
            b = bytes(r)
            verdict = sniff_encoding(b)
            return verdict in ("gb18030", "utf-16") or (
                verdict is None and not _is_utf8(b)
            )

        bad = html[is_bytes].map(_needs_slow_path)
        if bad.any():
            dec.loc[bad] = html[is_bytes][bad].map(
                lambda r: decode_html_bytes(bytes(r))
            )
        s.loc[is_bytes] = dec
    return s


def _is_utf8(b: bytes) -> bool:
    try:
        b.decode("utf-8")
        return True
    except UnicodeDecodeError:
        return False


@pandas_udf(_PARSE_SCHEMA)
def parse_page_udf(html: pd.Series) -> pd.DataFrame:
    """Vectorized page parser: html bytes → (title, text, qcc fields, error).

    Fully vectorized pandas ``.str.extract`` per field (the crawl flagship
    spends its parse CPU here — the round-1 python row loop was the single
    hottest python-side cost); failures become the ``error`` column, never
    exceptions (the reference swallows them with bare except — qcc.py:60-62;
    we surface them as data, SURVEY.md §2.H.10). For structural extraction
    on messy real-world HTML use the DOM UDFs below; this regex surface is
    the JD-parity fast path (client_crawler.py's parsers are regex)."""
    s = _decode_series(html)
    out = pd.DataFrame(index=html.index)
    out["title"] = s.str.extract(_RE_TITLE, expand=False)
    out["text"] = s.str.extract(_RE_TEXT, expand=False)
    for f, _ in QCC_FIELDS:
        out[f"company_{f}"] = s.str.extract(_RE_QCC[f], expand=False)
    out["error"] = None
    out.loc[html.isna(), "error"] = "ValueError: null html"
    return out[[f.name for f in _PARSE_SCHEMA.fields]]


def parsed_struct(html_bin: Column) -> Column:
    """Parse html and re-nest the company fields into a struct column."""
    return parse_page_udf(html_bin)


# JVM equivalents of the python field regexes (java.util.regex dialect:
# same (?s)/.*? semantics for these patterns — the cross-dialect agreement
# is property-tested for the link patterns and byte-parity-tested for the
# field extractions)
_JVM_TITLE = r"(?s)<title>(.*?)</title>"
_JVM_TEXT = r"(?s)<p>(.*?)</p>"
_JVM_QCC = {
    field: r"(?s)<td>%s</td><td>(.*?)</td>" % re.escape(label)
    for field, label in QCC_FIELDS
}


def _extract_or_null(s: Column, pattern: str) -> Column:
    """regexp_extract with python-re None semantics: NULL when the pattern
    does not match (builtin returns '' — indistinguishable from an empty
    group match, which the parity model must distinguish).

    One full-document scan, not two: regexp_substr finds the first match
    (NULL on miss — the null signal), then the group is re-extracted from
    that SHORT matched substring (the pattern re-matches at its start, so
    groups are identical). The previous rlike+regexp_extract form scanned
    the whole html twice per field — 20 whole-page regex passes per row in
    the crawl round's widest projection."""
    m = F.regexp_substr(s, F.lit(pattern))
    return F.when(m.isNotNull(), F.regexp_extract(m, pattern, 1))


def parse_page_cols(html_str: Column) -> Column:
    """The JVM fast path of parse_page_udf: identical (title, text, qcc
    fields, error) struct computed entirely with builtin regexp_extract —
    whole-stage codegen, zero python workers in the crawl hot loop. Input
    is a STRING column; produce it with ``html.cast("string")``, which
    (unlike ``decode(html,'UTF-8')`` — ANSI-throwing on invalid bytes, a
    round-killer on crawl-wild pages) passes malformed bytes through as
    replacement-mapped text. For charset-faithful extraction of non-UTF-8
    pages use parse_page_udf / the DOM UDFs (gb18030 double-decode)."""
    fields = [
        _extract_or_null(html_str, _JVM_TITLE).alias("title"),
        _extract_or_null(html_str, _JVM_TEXT).alias("text"),
    ] + [
        _extract_or_null(html_str, _JVM_QCC[f]).alias(f"company_{f}")
        for f, _ in QCC_FIELDS
    ] + [
        F.when(html_str.isNull(), F.lit("ValueError: null html"))
        .otherwise(F.lit(None).cast("string"))
        .alias("error")
    ]
    return F.struct(*fields)


def links_col(html_str: Column) -> Column:
    """Link discovery as a pure built-in (JVM regex, no Python):
    ``regexp_extract_all(html, href_pattern, 1)`` — SURVEY.md §2 C4."""
    return F.regexp_extract_all(html_str, F.lit(HREF_PATTERN), 1)


def jd_links_col(html_str: Column) -> Column:
    return F.regexp_extract_all(html_str, F.lit(JD_ITEM_PATTERN), 0)


# ------------------------------------------------- DOM structural surface
# C1/C2/C3: the reference's extraction is lxml XPath + pyquery CSS. Those
# libraries are absent here and installing packages is out of scope, so the
# from-scratch stdlib engine in dom.py carries the parity surface — REAL
# structural extraction over broken/entity-laden/gb18030 HTML, not regex.
# The expressions below are the reference's verbatim.

# 企查查工商数据/qcc.py:52-59 — the 8-field family, exact expressions
# (python-side .strip() applied by qcc.py's consumers is NOT applied here;
# the raw lxml .text value is the parity target).
QCC_XPATH_FIELDS: list[tuple[str, str]] = [
    ("company_name", '//div[@class="row title"]/h1'),
] + [
    (field, '//table[@class="ntable"]//tr/td[contains(text(),"%s")]'
            "/following-sibling::td[1]" % label)
    for field, label in [
        ("registered_capital", "注册资本："),
        ("contributed_capital", "实缴资本："),
        ("management_forms", "经营状态："),
        ("established_data", "成立日期："),
        ("credit_code", "统一社会信用代码："),
        ("address", "企业地址："),
        ("business_scope", "经营范围："),
    ]
]


def xpath_fields_udf(fields: list[tuple[str, str]]):
    """C1/C2: DOM XPath extraction — one parse per page, N compiled
    expressions evaluated against it; each value is ``tree.xpath(expr)[0]``
    with lxml result semantics (element hit → ``.text``, ``text()``/@attr
    hit → the string itself; no hit → NULL). Arrow-batched; the DOM walk is
    inherently per-document (same shape lxml itself has under the hood)."""
    from spider_spark import dom

    compiled = [(name, dom.XPath(expr)) for name, expr in fields]
    schema = StructType([StructField(n, StringType(), True) for n, _ in fields])

    @pandas_udf(schema)
    def extract(html: pd.Series) -> pd.DataFrame:
        names = [n for n, _ in compiled]
        rows = []
        for raw in html:
            if raw is None:
                rows.append(dict.fromkeys(names))
                continue
            tree = dom.parse_html_bytes(raw)
            rec = {}
            for n, xp in compiled:
                hits = xp(tree)
                if not hits:
                    rec[n] = None
                else:
                    h = hits[0]
                    rec[n] = h if isinstance(h, str) else h.text
            rows.append(rec)
        return pd.DataFrame(rows, columns=names)

    return extract


def css_fields_udf(fields: list[tuple[str, str]], strip: str | None = None):
    """C3: pyquery-semantics CSS extraction (ProxyPool/proxypool/
    crawler.py:50-67 ``td:nth-child(1)`` / ``.tbBottomLine:nth-child(2)``).
    ``strip`` reproduces crawler.py:81's ``td.find('p').remove()`` before
    ``.text()``: matching subtrees are excluded from the text value."""
    from spider_spark import dom

    compiled = [(name, dom.CssSelector(sel)) for name, sel in fields]
    strip_sel = dom.CssSelector(strip) if strip else None
    schema = StructType([StructField(n, StringType(), True) for n, _ in fields])

    def node_text(node) -> str:
        if strip_sel is None:
            return dom.text_content(node).strip()
        dead = {id(n) for n in strip_sel(node)}
        out: list[str] = []

        def walk(n):
            for c in n.children:
                if isinstance(c, str):
                    out.append(c)
                elif id(c) not in dead:
                    walk(c)

        walk(node)
        return "".join(out).strip()

    @pandas_udf(schema)
    def extract(html: pd.Series) -> pd.DataFrame:
        names = [n for n, _ in compiled]
        rows = []
        for raw in html:
            if raw is None:
                rows.append(dict.fromkeys(names))
                continue
            tree = dom.parse_html_bytes(raw)
            rec = {}
            for n, sel in compiled:
                hits = sel(tree)
                rec[n] = node_text(hits[0]) if hits else None
            rows.append(rec)
        return pd.DataFrame(rows, columns=names)

    return extract


def anchor_pairs_udf():
    """Every ``<a href>`` in document order as (href, anchor-text) pairs via
    the DOM engine — the extraction half of the anchor-text corpus op (the
    per-target link-context profile web-corpus pipelines aggregate for
    ranking/training signals). href-less anchors (``<a name=...>``) and
    empty hrefs are dropped; anchor text is the entity-decoded
    ``text_content`` of the element (nested markup flattened).

    Arrow-batched map pass; returns array<struct<href,anchor>> so the
    caller explodes and aggregates — extraction itself never shuffles."""
    from pyspark.sql.types import ArrayType, StructField, StructType

    from spider_spark import dom

    xp = dom.XPath("//a")
    out = ArrayType(
        StructType(
            [StructField("href", StringType()), StructField("anchor", StringType())]
        )
    )

    @pandas_udf(out)
    def extract(html: pd.Series) -> pd.Series:
        def pairs(raw):
            if raw is None:
                return None
            res = []
            for n in xp(dom.parse_html_bytes(raw)):
                href = n.get("href")
                if href:
                    res.append((href, dom.text_content(n)))
            return res

        return html.map(pairs)

    return extract


def dom_links_udf():
    """C4 structural variant: every <a href> in document order via the DOM
    (handles entity-encoded and single-quoted hrefs the C4 regex scan
    cannot). Returns array<string>."""
    from pyspark.sql.types import ArrayType

    from spider_spark import dom

    xp = dom.XPath("//a/@href")

    @pandas_udf(ArrayType(StringType()))
    def extract(html: pd.Series) -> pd.Series:
        return html.map(
            lambda raw: None if raw is None else list(xp(dom.parse_html_bytes(raw)))
        )

    return extract


def main_text_udf():
    """Boilerplate removal (readability-lite, dom.main_text): the standard
    webtext step between raw fetched HTML and every text-quality operator —
    nav/menu/footer chrome and link farms must not reach dedup or the
    quality gates. Arrow-batched; the DOM engine is pure python."""
    from spider_spark import dom

    @pandas_udf(StringType())
    def extract(html: pd.Series) -> pd.Series:
        return html.map(
            lambda raw: None if raw is None else dom.main_text(dom.parse_html_bytes(raw))
        )

    return extract


# --------------------------------------------------------- JSON field maps
# weibo user projection (weibo/spiders/weibocn.py:31-43): the reference's
# field_map dict rename-projects 12 fields off the mobile-API JSON. Schema +
# select — from_json stays fully JVM-side (C7).
WEIBO_USER_SCHEMA = (
    "id long, screen_name string, profile_image_url string, profile_url string, "
    "verified boolean, description string, gender string, "
    "followers_count long, follow_count long, statuses_count long"
)
WEIBO_FIELD_MAP = {  # api field → item field, as the reference renames them
    "id": "uid",
    "screen_name": "nickname",
    "profile_image_url": "avatar",
    "verified": "verified",
    "description": "description",
    "gender": "gender",
    "followers_count": "fans",
    "follow_count": "follows",
    "statuses_count": "weibos",
}


def project_weibo_user(json_col: Column) -> list[Column]:
    """field_map projection: parse once, alias per the reference's map."""
    p = F.from_json(json_col, WEIBO_USER_SCHEMA)
    return [p[src].alias(dst) for src, dst in WEIBO_FIELD_MAP.items()]


def canonical_link_udf():
    """First ``<link rel="canonical" href=...>`` per document (RFC 6596) via
    the DOM engine — THE explicit same-content signal webmasters publish;
    an archive pipeline turns it into alias edges and collapses them with
    webindex.resolve_aliases (its sibling signals: 3xx chains, content
    digests). First match wins, as the major engines document for
    conflicting canonicals. Returns the raw href (possibly relative —
    canon.absolutize_href_col resolves it against the page url JVM-side);
    NULL when absent."""
    from spider_spark import dom

    xp = dom.XPath("//link[@rel='canonical']/@href")

    @pandas_udf(StringType())
    def extract(html: pd.Series) -> pd.Series:
        def first_href(raw):
            if raw is None:
                return None
            hits = xp(dom.parse_html_bytes(raw))
            return hits[0] if hits else None

        return html.map(first_href)

    return extract


def robots_directives_udf():
    """In-page robots directives — the page-level complement to robots.txt
    (REP meta tag, documented by the robotstxt.org / search-engine specs):
    ``<meta name="robots" content="noindex, nofollow">`` plus per-link
    ``<a rel="nofollow">``. Returns
    struct(noindex, nofollow, follow_hrefs array<string>):

    - noindex:  'noindex' or 'none' token in the meta content — the page
      must not land in the items/index sink.
    - nofollow: 'nofollow' or 'none' token — NO link on the page may enter
      the frontier.
    - follow_hrefs: hrefs in document order, minus per-link rel=nofollow
      (token match within whitespace-split rel, per the microformat), and
      empty when the page-level nofollow is set — directly joinable into
      link discovery.

    Token parsing is exact (split on commas/whitespace), not substring:
    content="nofollowup" must NOT trip the directive."""
    from pyspark.sql.types import ArrayType, BooleanType, StructField, StructType

    from spider_spark import dom

    meta_xp = dom.XPath("//meta[@name='robots']/@content")
    a_xp = dom.XPath("//a")
    out = StructType(
        [
            StructField("noindex", BooleanType()),
            StructField("nofollow", BooleanType()),
            StructField("follow_hrefs", ArrayType(StringType())),
        ]
    )

    @pandas_udf(out)
    def extract(html: pd.Series) -> pd.DataFrame:
        import re as _re

        def one(raw):
            if raw is None:
                return (None, None, None)
            root = dom.parse_html_bytes(raw)
            toks: set[str] = set()
            for content in meta_xp(root):
                toks.update(
                    t.strip().lower()
                    for t in _re.split(r"[,\s]+", content or "")
                    if t.strip()
                )
            noindex = "noindex" in toks or "none" in toks
            nofollow = "nofollow" in toks or "none" in toks
            hrefs: list[str] = []
            if not nofollow:
                for n in a_xp(root):
                    href = n.get("href")
                    if not href:
                        continue
                    rel = (n.get("rel") or "").lower().split()
                    if "nofollow" not in rel:
                        hrefs.append(href)
            return (noindex, nofollow, hrefs)

        rows = html.map(one)
        return pd.DataFrame(
            rows.tolist(), columns=["noindex", "nofollow", "follow_hrefs"]
        )

    return extract


# -------------------------------------------- in-page robots, JVM fast path
# Token-exact by \b word boundaries: content="nofollowup" must not trip
# ('nofollow' followed by a word char fails \b). 'none' implies both
# noindex and nofollow per the REP meta spec. Attribute ORDER is free in
# HTML (content-before-name is common), so name=robots is asserted with a
# lookahead rather than positionally, and values may be quoted either way
# or bare. Known fast-path limit (shared by every regex-over-markup
# scanner): a directive inside an HTML comment still matches — the DOM
# UDF (robots_directives_udf) is the exact surface; this path trades that
# edge for zero-Python codegen in the crawl hot loop.
#: attribute names use (?<![\w-]) not \b: a plain word boundary also
#: matches after '-', so data-name= / data-content= would satisfy \bname /
#: \bcontent and a '<meta data-name="robots" ...>' would falsely gate the
#: page. Directive tokens get the symmetric guard so 'x-nofollow' is not
#: 'nofollow' (the DOM UDF's split()-token semantics).
_META_RE = (
    r'(?i)<meta(?=[^>]*(?<![\w-])name\s*=\s*["\']?robots\b)[^>]*'
    r'(?<![\w-])content\s*=\s*'
    r'(?:"[^"]*{tok}|\'[^\']*{tok}|[^"\'\s>]*{tok})'
)
_TOK_NOINDEX = r"(?<![\w-])(?:noindex|none)(?![\w-])"
_TOK_NOFOLLOW = r"(?<![\w-])(?:nofollow|none)(?![\w-])"
META_NOINDEX_RE = _META_RE.format(tok=_TOK_NOINDEX)
META_NOFOLLOW_RE = _META_RE.format(tok=_TOK_NOFOLLOW)


def meta_noindex_col(html_str: Column) -> Column:
    """Page declares ``<meta name=robots content=...noindex/none...>`` —
    the item/index sink must skip it. Codegen rlike, no Python."""
    return html_str.rlike(META_NOINDEX_RE)


def meta_nofollow_col(html_str: Column) -> Column:
    """Page-level nofollow: no link on the page may enter the frontier."""
    return html_str.rlike(META_NOFOLLOW_RE)


# An <a>/<area> open tag whose rel contains the nofollow token (quoted
# either way or bare) — the only tags the rel=nofollow microformat applies
# to; link/base/frame hrefs are never nofollow-capable.
NOFOLLOW_TAG_RE = (
    r"(?i)<(?:a|area)\s[^>]*(?<![\w-])rel\s*=\s*"
    r"(?:\"[^\"]*(?<![\w-])nofollow(?![\w-])[^\"]*\""
    r"|'[^']*(?<![\w-])nofollow(?![\w-])[^']*'"
    r"|[^\"'\s>]*(?<![\w-])nofollow(?![\w-])[^\"'\s>]*)"
    r"[^>]*>"
)


def follow_links_col(html_str: Column) -> Column:
    """Link discovery honoring per-link ``rel=nofollow`` over the SAME
    href surface as :func:`links_col` (every ``href="..."`` attribute —
    link/area/base/frame as well as ``<a>``): nofollow'd ``<a>``/``<area>``
    open tags are pre-stripped (only those tags are nofollow-capable per
    the rel=nofollow microformat), then the whole document is scanned for
    hrefs — all builtin regex (codegen, no Python workers). Document order
    is preserved, so posexplode first-wins semantics match links_col on
    nofollow-free pages; the scan here is additionally case-insensitive
    (``HREF=``), a strict superset of links_col's lowercase pattern.
    Empty hrefs (href="") never match, so no ""-urls enter the frontier."""
    cleaned = F.regexp_replace(html_str, NOFOLLOW_TAG_RE, "<a>")
    return F.regexp_extract_all(
        cleaned, F.lit(r'(?i)href\s*=\s*"([^"]+)"'), 1
    )
