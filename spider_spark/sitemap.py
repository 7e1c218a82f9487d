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

_URL_NODES = dom.XPath("//url")
_INDEX_LOC = dom.XPath("//sitemap/loc/text()")
_LOC_OF = dom.XPath("loc/text()")
_LASTMOD_OF = dom.XPath("lastmod/text()")


# sitemaps.org caps an uncompressed sitemap at 50 MB; anything claiming
# more after gunzip is a decompression bomb, not a sitemap
_MAX_SITEMAP_BYTES = 64 * 1024 * 1024


def _gunzip_if_needed(raw):
    """Transparent gunzip for .xml.gz sitemap/feed bodies (the protocol
    explicitly allows gzip, and large sites serve nothing else). Bounded
    decompression — a bomb yields None (row parses to []) rather than an
    executor OOM."""
    if isinstance(raw, (bytes, bytearray)) and bytes(raw[:2]) == b"\x1f\x8b":
        import zlib

        try:
            d = zlib.decompressobj(16 + zlib.MAX_WBITS)
            out = d.decompress(bytes(raw), _MAX_SITEMAP_BYTES)
            if d.unconsumed_tail:
                return None  # exceeded the cap mid-stream
            return out
        except zlib.error:
            return None
    return raw


def _parse_one(raw) -> list[dict]:
    if raw is None:
        return []
    raw = _gunzip_if_needed(raw)
    if raw is None:
        return []
    # plain-text sitemap (sitemaps.org "Text file" format): one absolute
    # URL per line, no markup
    head = bytes(raw[:256]) if isinstance(raw, (bytes, bytearray)) else raw[:256].encode()
    if b"<" not in head:
        text = (bytes(raw) if isinstance(raw, (bytes, bytearray)) else raw.encode())
        text = text.decode("utf-8", errors="replace")
        lines = [
            {"kind": "url", "loc": line, "lastmod": None}
            for line in (ln.strip() for ln in text.splitlines())
            if line.startswith(("http://", "https://"))
        ]
        # ADVICE r4 #2: an XML sitemap behind >256 bytes of comment/
        # whitespace preamble sniffs as text and would silently parse to
        # [] (its <loc> lines don't start with http). Zero url lines ⇒
        # the text hypothesis produced nothing; fall through to the XML
        # parser, which handles junk preambles natively.
        if lines:
            return lines
    tree = dom.parse_html_bytes(raw)
    out: list[dict] = []
    for u in _URL_NODES(tree):
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


_FEED_ENTRY = StructType([
    StructField("link", StringType(), True),
    StructField("title", StringType(), True),
    StructField("published", StringType(), True),
])

_ITEM_NODES = dom.XPath("//item")
_ENTRY_NODES = dom.XPath("//entry")
_ITEM_LINK = dom.XPath("link/text()")
_ITEM_TITLE = dom.XPath("title/text()")
_ITEM_PUB = dom.XPath("pubdate/text()")        # RSS 2.0 <pubDate>
_ENTRY_UPDATED = dom.XPath("updated/text()")   # Atom <updated>


def _item_link(item: "dom.Node") -> str | None:
    """First usable link of an <item>/<entry>.

    ``<link>`` is a VOID tag to html.parser (it is one in HTML), so RSS's
    ``<link>https://…</link>`` parses as an EMPTY link node whose URL text
    becomes the next sibling — exactly how a browser reads a feed. Atom's
    ``<link href="…"/>`` keeps the URL in the attribute. Handle both:
    attribute first, else the text run immediately following the node."""
    kids = item.children
    for i, c in enumerate(kids):
        if not isinstance(c, dom.Node) or c.tag != "link":
            continue
        href = (c.attrs.get("href") or "").strip()
        if href:
            return href
        buf = []
        for sib in kids[i + 1:]:
            if isinstance(sib, dom.Node):
                break
            buf.append(sib)
        txt = "".join(buf).strip()
        if txt:
            return txt
    return None


def _parse_feed(raw) -> list[dict]:
    """RSS 2.0 <item> / Atom <entry> → (link, title, published) rows.

    html.parser lowercases tag names, so <pubDate> arrives as ``pubdate``.
    Out-of-spec bodies yield [] rather than throwing — crawl-wild input.
    """
    if raw is None:
        return []
    raw = _gunzip_if_needed(raw)
    if raw is None:
        return []
    tree = dom.parse_html_bytes(raw)
    out: list[dict] = []
    for node in _ITEM_NODES(tree) + _ENTRY_NODES(tree):
        link = _item_link(node)
        if not link:
            continue
        title = _ITEM_TITLE(node)
        pub = _ITEM_PUB(node) or _ENTRY_UPDATED(node)
        out.append({
            "link": link,
            "title": title[0].strip() if title else None,
            "published": pub[0].strip() if pub else None,
        })
    return out


def feed_entries_udf():
    @pandas_udf(ArrayType(_FEED_ENTRY))
    def parse(body: pd.Series) -> pd.Series:
        return body.map(_parse_feed)

    return parse


def seeds_from_feeds(
    feeds: DataFrame,
    body_col: str = "feed_xml",
    depth: int = 0,
) -> DataFrame:
    """(…, feed_xml) → (url, depth, title, published) seed rows from RSS
    2.0 ``<item>`` and Atom ``<entry>`` elements — the push-style discovery
    channel next to sitemaps' pull-style one (a news crawl seeds from feeds
    every cycle; sitemap lastmod drives the slow tier). Same Arrow-batched
    parse shape as ``seeds_from_sitemaps``; dedup/canonicalization stays
    downstream in the frontier, where it already exists."""
    e = F.explode(feed_entries_udf()(F.col(body_col))).alias("e")
    return (
        feeds.select(e)
        .where(F.col("e.link").isNotNull())
        .select(
            F.col("e.link").alias("url"),
            F.lit(depth).alias("depth"),
            F.col("e.title").alias("title"),
            F.col("e.published").alias("published"),
        )
    )


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
