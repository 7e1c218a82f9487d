"""Unit tests for the from-scratch DOM + XPath/CSS engine (dom.py) —
pure python, no Spark. Each case mirrors a selector the reference actually
uses (cited in dom.py's docstring)."""

from __future__ import annotations

from spider_spark.dom import (
    CssSelector,
    XPath,
    css,
    parse_html,
    parse_html_bytes,
    text_content,
    xpath,
)

QCC_HTML = """
<HTML><head><title>qcc &amp; co</title></head>
<body>
<div class="row title"><h1>深圳市腾讯计算机系统有限公司</h1><span>x</span></div>
<table class="other"><tr><td>注册资本：</td><td>WRONG</td></tr></table>
<div><table class="ntable">
 <tr><td>注册资本：</td><td>100万元</td><td>实缴资本：</td><td>80万元</td>
 <tr><td>经营状态：</td><td>存续</td><td>成立日期：</td><td>1998-11-11</td></tr>
 <tr><td>统一社会信用代码：</td><td>9144030071526726XG</td>
 <tr><td>企业地址：</td><td>深圳市南山区</td>
 <tr><td>经营范围：</td><td>计算机软硬件 &lt;增值电信&gt; &amp;服务</td>
</table></div>
</body></html>
"""


def test_qcc_xpath_family():
    """qcc.py:52-59 — the exact expressions, on messy HTML (unclosed <tr>,
    mixed-case HTML tag, entities in cell text)."""
    t = parse_html(QCC_HTML)
    name = xpath(t, '//div[@class="row title"]/h1')[0].text
    assert name == "深圳市腾讯计算机系统有限公司"

    def cell(label):
        hits = xpath(
            t,
            f'//table[@class="ntable"]//tr/td[contains(text(),"{label}")]'
            "/following-sibling::td[1]",
        )
        return hits[0].text if hits else None

    assert cell("注册资本：") == "100万元"
    assert cell("实缴资本：") == "80万元"
    assert cell("经营状态：") == "存续"
    assert cell("成立日期：") == "1998-11-11"
    assert cell("统一社会信用代码：") == "9144030071526726XG"
    assert cell("企业地址：") == "深圳市南山区"
    # entity decode inside the cell — the regex surface could never do this
    assert cell("经营范围：") == "计算机软硬件 <增值电信> &服务"


def test_text_nodes_and_attr_steps():
    """钓鱼技巧.py:62-87 — /text() lists split at element boundaries,
    @href steps, [@attr="v"] predicates, ''.join of //td/p/text()."""
    html = """
    <div class="h hm"><h1>标题A</h1>
      <p>2024-01-02 <a>作者B</a> <em>456</em> 评论 7</p></div>
    <dt class="xs2"><a target="_blank" href="/t1.html">x</a>
      <a href="/skip.html">y</a>
      <a target="_blank" href="/t2.html">z</a></dt>
    <td id="article_content"><p>第一段。</p><p>第二段。</p></td>
    """
    t = parse_html(html)
    assert xpath(t, '//div[@class="h hm"]/h1/text()')[0] == "标题A"
    texts = xpath(t, '//div[@class="h hm"]/p/text()')
    assert texts[0].strip() == "2024-01-02"
    assert texts[-1].strip() == "评论 7"
    assert xpath(t, '//div[@class="h hm"]/p/a/text()')[0] == "作者B"
    assert xpath(t, '//div[@class="h hm"]/p/em/text()')[0] == "456"
    links = xpath(t, '//dt[@class="xs2"]/a[@target="_blank"]/@href')
    assert links == ["/t1.html", "/t2.html"]
    content = "".join(xpath(t, '//td[@id="article_content"]/p/text()'))
    assert content == "第一段。第二段。"


def test_scrapy_relative_and_positional():
    """gj.py:14-21 — .//dd relative descent, @data-area attribute step,
    a[1] positional, //span[1] per-context position."""
    html = """
    <dl class="f-list-item-wrap f-clear">
      <dd class="dd-item title"><a>房名1</a></dd>
      <dd class="dd-item size" data-area="88平"></dd>
      <dd class="dd-item address"><span><a>街道1</a><a>别的</a></span></dd>
      <dd class="dd-item info"><i><span>4500元</span><span>x</span></i></dd>
    </dl>
    <dl class="f-list-item-wrap f-clear">
      <dd class="dd-item title"><a>房名2</a></dd>
      <dd class="dd-item size" data-area="66平"></dd>
      <dd class="dd-item address"><span><a>街道2</a></span></dd>
      <dd class="dd-item info"><i><span>3800元</span></i></dd>
    </dl>
    """
    t = parse_html(html)
    nodes = xpath(t, '//dl[@class="f-list-item-wrap f-clear"]')
    assert len(nodes) == 2
    row = nodes[0]
    assert xpath(row, './/dd[@class="dd-item title"]/a/text()')[0] == "房名1"
    assert xpath(row, './/dd[@class="dd-item size"]/@data-area')[0] == "88平"
    assert xpath(row, './/dd[@class="dd-item address"]/span/a[1]/text()')[0] == "街道1"
    # //span[1] = first span per context (the i element), not global first
    assert xpath(row, './/dd[@class="dd-item info"]//span[1]/text()')[0] == "4500元"
    assert xpath(nodes[1], './/dd[@class="dd-item title"]/a/text()')[0] == "房名2"


def test_css_proxypool_family():
    """ProxyPool crawler.py:50-67 — td:nth-child(1), .cls:nth-child(2),
    find('p') descendant search; nth-child counts element children."""
    html = """
    <table id="ip_list">
      <tr><th>ip</th><th>port</th></tr>
      <tr><td>1.2.3.4</td><td>8080</td></tr>
      <tr><td>5.6.7.8<p>hidden</p></td><td>3128</td></tr>
    </table>
    <div class="row"><span class="tbBottomLine">9.9.9.9</span
      ><span class="tbBottomLine">80</span></div>
    """
    t = parse_html(html)
    trs = css(t, "table#ip_list tr")
    assert len(trs) == 3
    assert [n.tag for n in css(trs[1], "td:nth-child(1)")] == ["td"]
    assert text_content(css(trs[1], "td:nth-child(1)")[0]) == "1.2.3.4"
    assert text_content(css(trs[1], "td:nth-child(2)")[0]) == "8080"
    # pyquery's td.find('p').remove() precursor: p is findable inside the td
    assert text_content(css(trs[2], "p")[0]) == "hidden"
    line = css(t, "div.row")[0]
    assert text_content(css(line, ".tbBottomLine:nth-child(1)")[0]) == "9.9.9.9"
    assert text_content(css(line, ".tbBottomLine:nth-child(2)")[0]) == "80"


def test_css_child_combinator_and_groups():
    html = "<ul><li id='a'><span>1</span></li><li id='b'>2</li></ul><span>top</span>"
    t = parse_html(html)
    assert [n.attrs["id"] for n in css(t, "ul > li")] == ["a", "b"]
    assert len(css(t, "ul span")) == 1
    assert len(css(t, "ul span, span")) == 2  # comma group, deduped
    assert css(t, "li:first-child")[0].attrs["id"] == "a"
    assert css(t, "li:last-child")[0].attrs["id"] == "b"


def test_broken_html_recovery():
    # unclosed p/li/td, stray end tag, void elements, self-closing
    html = (
        "<body><p>one<p>two</zzz><ul><li>A<li>B</ul>"
        "<br><img src='x.png'><hr/>"
        "<table><tr><td>c1<td>c2<tr><td>c3</table>tail</body>"
    )
    t = parse_html(html)
    ps = xpath(t, "//p")
    assert [p.text for p in ps] == ["one", "two"]
    assert [li.text for li in xpath(t, "//li")] == ["A", "B"]
    rows = xpath(t, "//table/tr")
    assert [len(r.element_children()) for r in rows] == [2, 1]
    assert [td.text for td in xpath(t, "//table//td")] == ["c1", "c2", "c3"]
    assert xpath(t, "//img/@src") == ["x.png"]


def test_entities_and_encoding():
    assert xpath(parse_html("<title>A &amp; B &lt;C&gt; &#20013;</title>"),
                 "//title/text()")[0] == "A & B <C> 中"
    # gb18030 fallback decode (抖音.py:12)
    raw = "<html><p>中文内容</p></html>".encode("gb18030")
    t = parse_html_bytes(raw)
    assert xpath(t, "//p/text()")[0] == "中文内容"
    t2 = parse_html_bytes("<p>utf8 é</p>".encode("utf-8"))
    assert xpath(t2, "//p/text()")[0] == "utf8 é"


def test_node_text_vs_text_content():
    t = parse_html("<td>label <b>bold</b> tail</td>")
    td = xpath(t, "//td")[0]
    assert td.text == "label "              # lxml Element.text
    assert text_content(td) == "label bold tail"
    assert td.direct_texts() == ["label ", " tail"]


def test_compiled_objects_reusable():
    xp = XPath("//a/@href")
    sel = CssSelector("a")
    for i in range(3):
        t = parse_html(f'<div><a href="/x{i}">l</a></div>')
        assert xp(t) == [f"/x{i}"]
        assert len(sel(t)) == 1


# ---------------------------------------------------------------- fuzzing
from hypothesis import given, settings, strategies as st

_tagname = st.sampled_from(["div", "p", "td", "tr", "table", "a", "li", "ul",
                            "span", "br", "img", "h1", "dd", "x-y", "script"])
_soup_bit = st.one_of(
    st.text(alphabet="ab<>&;/='\"中 \n\t%", max_size=12),
    _tagname.map(lambda t: f"<{t}>"),
    _tagname.map(lambda t: f"</{t}>"),
    _tagname.map(lambda t: f"<{t} class='c d' id=\"i\">"),
    st.just("<!-- comment -->"),
    st.just("<![CDATA[x]]>"),
    st.just("&amp;&bogus;&#65;&#xznope;"),
    st.just("<a href='/x?a=1&b=2'>t</a>"),
)


@given(st.lists(_soup_bit, max_size=30).map("".join))
@settings(max_examples=300, deadline=None)
def test_parser_never_raises_and_tree_is_consistent(soup):
    t = parse_html(soup)
    # parent links consistent, no text node ever has children
    stack = [t]
    while stack:
        n = stack.pop()
        for c in n.children:
            if isinstance(c, str):
                assert c  # text nodes are non-empty and maximal
            else:
                assert c.parent is n
                stack.append(c)
    # the selector engines never raise on a parsed soup
    for expr in ("//a/@href", "//td[1]/text()", '//div[@class="c"]',
                 "//p/following-sibling::td[1]"):
        XPath(expr)(t)
    for sel in ("a", ".c", "#i", "td:nth-child(1)", "div > p", "ul li, a"):
        CssSelector(sel)(t)


@given(st.lists(st.tuples(st.sampled_from("apd"), st.text(alphabet="xy&<", max_size=5)),
                max_size=12))
@settings(max_examples=200, deadline=None)
def test_escaped_text_roundtrips(parts):
    """Any text we escape into the doc comes back decoded byte-identically
    from text()-level reads — the byte-parity property the messy corpus
    relies on."""
    import html as _html
    body = "".join(
        f"<{'p' if k == 'p' else 'div'}>{_html.escape(txt)}</{'p' if k == 'p' else 'div'}>"
        for k, txt in parts
    )
    t = parse_html(f"<body>{body}</body>")
    got = [text_content(n) for n in xpath(t, "//p") + xpath(t, "//div")]
    want = [txt for k, txt in parts if k == "p"] + [txt for k, txt in parts if k != "p"]
    assert got == want


def test_main_content_extraction():
    """Readability-lite: chrome tags and link farms never win; deepest of
    equal scorers wins; chrome-only pages yield ''."""
    from spider_spark import dom

    h = ('<html><body><nav><a href="/">Home Home Home Home</a></nav>'
         '<div class="m"><a href="/1">pure link farm with many words here</a></div>'
         '<div id="w"><div id="main"><p>real article body text one</p>'
         '<p>second paragraph here</p></div></div>'
         '<aside>huge sidebar text that must not leak into the result at all'
         ' even though it is long</aside>'
         '<footer>&copy; chrome</footer></body></html>')
    assert dom.main_text(dom.parse_html(h)) == (
        "real article body text one second paragraph here"
    )
    # deepest equal scorer: #main (child) beats #w (parent, same text)
    assert dom.main_content(dom.parse_html(h)).get("id") == "main"
    # link-heavy td loses to a text td inside the same table
    h2 = ('<table><tr><td><a href="/a">nav nav nav nav nav</a></td>'
          "<td>dense cell prose that should win the page</td></tr></table>")
    assert dom.main_text(dom.parse_html(h2)) == (
        "dense cell prose that should win the page"
    )
    assert dom.main_text(dom.parse_html(
        "<body><nav><a href='/'>x</a></nav><script>var a=1</script></body>"
    )) == ""


def test_anchor_pairs_udf_edge_cases(spark):
    """(href, anchor) extraction: href-less and empty-href anchors dropped,
    entities decoded, nested markup flattened, document order kept,
    single-quoted/unquoted hrefs accepted, NULL html -> NULL."""
    from pyspark.sql import functions as F

    from spider_spark import parse

    h = (
        '<html><body><a name="top">skip</a><a href="">empty</a>'
        '<a href="https://a.example.com/1">R&amp;D &lt;lab&gt;</a>'
        "<a href='https://a.example.com/2'><b>bold</b> tail</a>"
        '<a href=https://a.example.com/3>unquoted</a></body></html>'
    )
    df = spark.createDataFrame(
        [(1, h.encode()), (2, None)], "id long, html binary"
    )
    rows = (
        df.select("id", parse.anchor_pairs_udf()(F.col("html")).alias("p"))
        .orderBy("id")
        .collect()
    )
    assert rows[0].p == [
        ("https://a.example.com/1", "R&D <lab>"),
        ("https://a.example.com/2", "bold tail"),
        ("https://a.example.com/3", "unquoted"),
    ]
    assert rows[1].p is None


# -------- review-fix regressions: lxml semantics edges -------------------
def test_descendant_text_includes_self_and_dedups():
    from spider_spark.dom import parse_html, xpath

    r = parse_html("<html><body><div>hello<span>world</span></div></body></html>")
    [d] = xpath(r, "//div")
    assert xpath(d, ".//text()") == ["hello", "world"]
    # nested contexts must not duplicate inner text nodes
    r2 = parse_html("<html><body><div><div>a<span>b</span></div></div></body></html>")
    assert xpath(r2, "//div//text()") == ["a", "b"]


def test_descendant_positional_predicate_binds_per_parent():
    from spider_spark.dom import parse_html, text_content, xpath

    r = parse_html(
        "<html><body><div><p><span>A</span></p><p><span>B</span></p></div></body></html>"
    )
    assert [text_content(n) for n in xpath(r, "//span[1]")] == ["A", "B"]


def test_dot_equals_uses_string_value():
    from spider_spark.dom import parse_html, text_content, xpath

    r = parse_html("<html><body><td><b>Reg</b>Cap</td><td>X</td></body></html>")
    assert [text_content(n) for n in xpath(r, '//td[.="RegCap"]')] == ["RegCap"]


def test_css_attr_value_quote_styles():
    from spider_spark.dom import css, parse_html, text_content

    r = parse_html('<html><body><a target="_blank" href="/x">k</a></body></html>')
    for sel in ("a[target='_blank']", 'a[target="_blank"]', "a[target=_blank]"):
        assert [text_content(n) for n in css(r, sel)] == ["k"], sel


def test_main_content_skips_noise_ancestors():
    from spider_spark.dom import main_text, parse_html

    h = ("<html><body><footer><div>" + "legal " * 600 + "</div></footer>"
         "<article>" + "body " * 200 + "</article></body></html>")
    assert main_text(parse_html(h)).startswith("body")
