"""Sitemap ingestion → seed URLs (A10 feeder).

Completes the discovery story robots.py starts: robots.txt advertises
``Sitemap:`` URLs; the fetched sitemap bodies (urlset or nested
sitemapindex — sitemaps.org protocol, public spec) yield the seed list a
crawl starts from. Parsing runs on the from-scratch DOM engine (dom.py —
html.parser tolerates XML fine at this subset: lowercase tags, entities
decoded), Arrow-batched; output is a DataFrame ready for
``crawl(seeds=...)``'s distributed seed-injection path.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

from spider_spark import dom

_ENTRY = StructType([
    StructField("kind", StringType(), True),     # 'url' | 'index'
    StructField("loc", StringType(), True),
    StructField("lastmod", StringType(), True),
])

_URL_LOC = dom.XPath("//url/loc/text()")
_URL_LASTMOD = dom.XPath("//url")
_INDEX_LOC = dom.XPath("//sitemap/loc/text()")
_LOC_OF = dom.XPath("loc/text()")
_LASTMOD_OF = dom.XPath("lastmod/text()")


def _parse_one(raw) -> list[dict]:
    if raw is None:
        return []
    tree = dom.parse_html_bytes(raw)
    out: list[dict] = []
    for u in dom.xpath(tree, "//url"):
        loc = _LOC_OF(u)
        if not loc:
            continue
        lm = _LASTMOD_OF(u)
        out.append({"kind": "url", "loc": loc[0].strip(),
                    "lastmod": lm[0].strip() if lm else None})
    for loc in _INDEX_LOC(tree):
        out.append({"kind": "index", "loc": loc.strip(), "lastmod": None})
    return out


def sitemap_entries_udf():
    @pandas_udf(ArrayType(_ENTRY))
    def parse(body: pd.Series) -> pd.Series:
        return body.map(_parse_one)

    return parse


def seeds_from_sitemaps(
    sitemaps: DataFrame,
    body_col: str = "sitemap_xml",
    depth: int = 0,
) -> DataFrame:
    """(…, sitemap_xml) → (url, depth, lastmod) seed rows from <urlset>
    entries, ready for crawl()'s DataFrame seed path; nested
    <sitemapindex> references come back as (kind='index') rows from
    ``sitemap_entries_udf`` for the caller's fetch loop (one level per
    fetch round — the engine never follows URLs by itself)."""
    e = F.explode(sitemap_entries_udf()(F.col(body_col))).alias("e")
    return (
        sitemaps.select(e)
        .where(F.col("e.kind") == "url")
        .select(
            F.col("e.loc").alias("url"),
            F.lit(depth).alias("depth"),
            F.col("e.lastmod").alias("lastmod"),
        )
    )
