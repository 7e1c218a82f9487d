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


@pandas_udf(_PARSE_SCHEMA)
def parse_page_udf(html: pd.Series) -> pd.DataFrame:
    """Vectorized page parser: html bytes → (title, text, qcc fields, error).

    Arrow-batched; failures become the ``error`` column, never exceptions
    (the reference swallows them with bare except — qcc.py:60-62; we surface
    them as data, SURVEY.md §2.H.10).
    """
    rows = []
    for raw in html:
        rec: dict[str, str | None] = {}
        try:
            s = raw.decode("utf-8") if isinstance(raw, (bytes, bytearray)) else raw
            if s is None:
                raise ValueError("null html")
            rec["title"] = extract_title(s)
            rec["text"] = extract_text(s)
            qcc = extract_qcc(s)
            for f, _ in QCC_FIELDS:
                rec[f"company_{f}"] = qcc[f]
            rec["error"] = None
        except Exception as exc:  # noqa: BLE001 — error becomes data
            rec = {f.name: None for f in _PARSE_SCHEMA.fields}
            rec["error"] = f"{type(exc).__name__}: {exc}"
        rows.append(rec)
    return pd.DataFrame(rows, columns=[f.name for f in _PARSE_SCHEMA.fields])


def parsed_struct(html_bin: Column) -> Column:
    """Parse html and re-nest the company fields into a struct column."""
    return parse_page_udf(html_bin)


def links_col(html_str: Column) -> Column:
    """Link discovery as a pure built-in (JVM regex, no Python):
    ``regexp_extract_all(html, href_pattern, 1)`` — SURVEY.md §2 C4."""
    return F.regexp_extract_all(html_str, F.lit(HREF_PATTERN), 1)


def jd_links_col(html_str: Column) -> Column:
    return F.regexp_extract_all(html_str, F.lit(JD_ITEM_PATTERN), 0)


def xpath_extractor_udf(xpath: str):
    """C1/C2: real-lxml XPath extraction (qcc.py:41-59's
    ``contains(text(),…)/following-sibling::td[1]`` family). lxml is not in
    this container, so the UDF is import-gated — the regex parsers above
    carry the parity surface here; with lxml installed this becomes the
    byte-exact reference path (pin the lxml version, SURVEY.md §7 risk (a))."""
    try:
        from lxml import etree  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "lxml not installed in this environment; pip install lxml "
            "enables xpath_extractor_udf"
        ) from exc

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def extract(html: pd.Series) -> pd.Series:
        def one(raw):
            if raw is None:
                return None
            doc = etree.HTML(raw.decode("utf-8") if isinstance(raw, (bytes, bytearray)) else raw)
            hits = doc.xpath(xpath) if doc is not None else []
            return str(hits[0]) if hits else None

        return html.map(one)

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
