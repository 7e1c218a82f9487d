"""RSS/Atom feed seed discovery — registry tier split out of the former
monolithic queries.py (round 4). Conventions live in
spider_spark/registry/__init__.py; enumeration order is preserved by
the import order there."""

from __future__ import annotations

from pyspark.sql import functions as F
from spider_spark.registry._base import T, q


# =====================================================================
# RSS/Atom feed seed discovery — spider_spark.sitemap
# =====================================================================

@q(
    "feed_seeds",
    """
    SELECT 'https://h' || (doc_id % 10)::VARCHAR || '.example.com/d/' || doc_id::VARCHAR AS url,
           0 AS depth,
           'Doc ' || doc_id::VARCHAR AS title,
           CASE WHEN doc_id % 10 < 5
                THEN '2024-03-0' || (1 + doc_id % 5)::VARCHAR
                ELSE '2024-03-0' || (1 + doc_id % 5)::VARCHAR || 'T00:00:00Z'
           END AS published
    FROM documents WHERE doc_id % 3 = 0
    """,
)
def feed_seeds(spark, sf_dir):
    """RSS 2.0 + Atom feed discovery (sitemap.seeds_from_feeds): hosts
    h0-h4 publish RSS (<item><link>text</link><pubDate>), h5-h9 publish
    Atom (<entry><link href=.../><updated>) — the two public feed dialects
    including the html.parser void-<link> hazard (RSS link text parses as
    a SIBLING of the empty link node; the extractor handles it). Feeds
    are synthesized per host from the documents table, pushed through the
    REAL Arrow-batched DOM parse, and the oracle states the planted truth
    directly — green means the parser recovered every link/title/date
    from raw XML. Plan: one host groupBy to build feeds, then the
    explode; at 10^10 scale feeds are per-host rows, so the parse is
    embarrassingly parallel with no further shuffle."""
    from spider_spark.sitemap import seeds_from_feeds

    d = T(spark, sf_dir, "documents").where(F.col("doc_id") % 3 == 0)
    did = F.col("doc_id")
    h = (did % 10).cast("string")
    url = F.concat(F.lit("https://h"), h, F.lit(".example.com/d/"), did.cast("string"))
    day = (F.lit(1) + did % 5).cast("string")
    is_rss = (did % 10) < 5
    item = F.when(
        is_rss,
        F.concat(
            F.lit("<item><title>Doc "), did.cast("string"), F.lit("</title><link>"),
            url, F.lit("</link><pubDate>2024-03-0"), day, F.lit("</pubDate></item>"),
        ),
    ).otherwise(
        F.concat(
            F.lit("<entry><title>Doc "), did.cast("string"),
            F.lit('</title><link href="'), url,
            F.lit('"/><updated>2024-03-0'), day,
            F.lit("T00:00:00Z</updated></entry>"),
        )
    )
    feeds = (
        d.select(h.alias("h"), F.struct(did.alias("doc_id"), item.alias("item")).alias("s"))
        .groupBy("h")
        .agg(F.array_sort(F.collect_list("s")).alias("items"))
        .select(
            F.concat(
                F.when(F.col("h").cast("int") < 5, F.lit("<rss version=\"2.0\"><channel>"))
                .otherwise(F.lit('<feed xmlns="http://www.w3.org/2005/Atom">')),
                F.array_join(F.transform(F.col("items"), lambda s: s.item), ""),
                F.when(F.col("h").cast("int") < 5, F.lit("</channel></rss>"))
                .otherwise(F.lit("</feed>")),
            ).alias("feed_xml")
        )
    )
    return seeds_from_feeds(feeds)


