"""RSS 2.0 / Atom feed seed discovery (sitemap.seeds_from_feeds)."""

from __future__ import annotations

from spider_spark.sitemap import _parse_feed, seeds_from_feeds

RSS = b"""<?xml version="1.0"?>
<rss version="2.0"><channel>
  <title>Example feed</title>
  <item>
    <title>First &amp; finest</title>
    <link>https://example.com/a?x=1&amp;y=2</link>
    <pubDate>Mon, 04 Mar 2024 08:00:00 GMT</pubDate>
  </item>
  <item>
    <title>No date</title>
    <link>
      https://example.com/b
    </link>
  </item>
  <item><title>No link at all</title></item>
</channel></rss>"""

ATOM = b"""<?xml version="1.0" encoding="utf-8"?>
<feed xmlns="http://www.w3.org/2005/Atom">
  <title>Atom feed</title>
  <entry>
    <title>Entry one</title>
    <link href="https://example.com/atom/1"/>
    <updated>2024-03-05T12:00:00Z</updated>
  </entry>
  <entry>
    <link rel="alternate" type="text/html" href="https://example.com/atom/2"></link>
    <title>Entry two</title>
  </entry>
</feed>"""


def test_parse_rss_void_link_sibling_text():
    rows = _parse_feed(RSS)
    assert rows == [
        {
            "link": "https://example.com/a?x=1&y=2",  # entities decoded
            "title": "First & finest",
            "published": "Mon, 04 Mar 2024 08:00:00 GMT",
        },
        {"link": "https://example.com/b", "title": "No date", "published": None},
    ]


def test_parse_atom_href_attribute():
    rows = _parse_feed(ATOM)
    assert rows == [
        {
            "link": "https://example.com/atom/1",
            "title": "Entry one",
            "published": "2024-03-05T12:00:00Z",
        },
        {"link": "https://example.com/atom/2", "title": "Entry two", "published": None},
    ]


def test_parse_feed_garbage_and_none():
    assert _parse_feed(None) == []
    assert _parse_feed(b"not xml at all <<<") == []
    assert _parse_feed(b"<rss><channel><item></item></channel></rss>") == []


def test_seeds_from_feeds_dataframe(spark):
    df = spark.createDataFrame(
        [(RSS.decode(),), (ATOM.decode(),), (None,)], "feed_xml string"
    )
    out = seeds_from_feeds(df, depth=2)
    rows = sorted(out.collect(), key=lambda r: r["url"])
    assert [r["url"] for r in rows] == [
        "https://example.com/a?x=1&y=2",
        "https://example.com/atom/1",
        "https://example.com/atom/2",
        "https://example.com/b",
    ]
    assert all(r["depth"] == 2 for r in rows)
    assert rows[0]["published"] == "Mon, 04 Mar 2024 08:00:00 GMT"
    assert rows[1]["published"] == "2024-03-05T12:00:00Z"


def test_feed_cdata_titles_and_links_survive():
    """CDATA sections carry content in real RSS 2.0 — they were silently
    dropped (CDATA titles became NULL, CDATA links lost the entry)."""
    from spider_spark.sitemap import _parse_feed

    rows = _parse_feed(
        b"<rss><channel>"
        b"<item><title><![CDATA[My Title]]></title>"
        b"<link>https://ex.com/a</link></item>"
        b"<item><link><![CDATA[https://ex.com/b]]></link>"
        b"<title>t2</title></item>"
        b"</channel></rss>"
    )
    got = {r["link"]: r["title"] for r in rows}
    assert got == {"https://ex.com/a": "My Title", "https://ex.com/b": "t2"}


def test_gzipped_sitemap_and_text_sitemap(spark):
    """sitemaps.org surface beyond XML urlsets: gzip-compressed bodies
    (.xml.gz — how large sites actually serve them) and the plain-text
    one-URL-per-line format. A decompression bomb over the 64 MB cap
    parses to zero rows instead of OOMing the executor."""
    import gzip

    from spider_spark.sitemap import seeds_from_sitemaps

    xml = (b"<?xml version='1.0'?><urlset>"
           b"<url><loc>https://a.com/1</loc><lastmod>2024-01-01</lastmod></url>"
           b"<url><loc>https://a.com/2</loc></url></urlset>")
    gz = gzip.compress(xml)
    txt = b"https://t.com/x\nnot-a-url\n  https://t.com/y  \n"
    bomb = gzip.compress(b"\x00" * (70 * 1024 * 1024))
    df = spark.createDataFrame(
        [(bytearray(gz),), (bytearray(txt),), (bytearray(bomb),)],
        "sitemap_xml binary",
    )
    rows = {r.url: r.lastmod for r in seeds_from_sitemaps(df).collect()}
    assert rows == {
        "https://a.com/1": "2024-01-01",
        "https://a.com/2": None,
        "https://t.com/x": None,
        "https://t.com/y": None,
    }


def test_gzipped_feed(spark):
    import gzip

    from spider_spark.sitemap import seeds_from_feeds

    rss = (b"<rss><channel><item><title>T</title>"
           b"<link>https://n.com/a</link><pubDate>x</pubDate></item>"
           b"</channel></rss>")
    df = spark.createDataFrame([(bytearray(gzip.compress(rss)),)], "feed_xml binary")
    out = seeds_from_feeds(df).collect()
    assert len(out) == 1 and out[0].url == "https://n.com/a"


def test_xml_sitemap_with_long_comment_preamble():
    """ADVICE r4 #2: >256 bytes of comment/whitespace before the first
    '<' used to sniff as a text sitemap and silently parse to []."""
    from spider_spark.sitemap import _parse_one

    preamble = "# generated by cms\n" + ("# filler line\n" * 40)  # > 256 bytes, no '<'
    xml = (preamble
           + '<?xml version="1.0"?><urlset>'
             "<url><loc>https://ex.com/a</loc><lastmod>2026-01-02</lastmod></url>"
             "<url><loc>https://ex.com/b</loc></url></urlset>")
    assert len(preamble.encode()) > 256
    got = _parse_one(xml.encode())
    assert [(e["kind"], e["loc"]) for e in got] == [
        ("url", "https://ex.com/a"), ("url", "https://ex.com/b")]
    assert got[0]["lastmod"] == "2026-01-02"


def test_text_sitemap_still_parses_as_text():
    from spider_spark.sitemap import _parse_one

    body = "https://ex.com/1\nnot-a-url\nhttps://ex.com/2\n".encode()
    assert [e["loc"] for e in _parse_one(body)] == ["https://ex.com/1", "https://ex.com/2"]
