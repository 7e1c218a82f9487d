"""Hypothesis fuzzing of the DOM engine on crawl-wild markup (VERDICT r3
item 4): unclosed tables, entity soup, misnested/stray tags, gb18030
mojibake, random truncation.

Three layers, strongest available first:

1. **In-container differential** — a ~40-line independent reference
   evaluator (`_ref_xpath`, plain recursive walks, no shared code with
   dom.py's compiled step machinery) for the simple expression family
   ``//tag``, ``//tag[@a='v']``, ``//tag/text()``, ``//tag/@attr`` is run
   against `dom.xpath` on every generated document. A divergence is a
   real bug in one of two independent implementations of the same spec.
2. **Invariants** — parse never raises, the tree is structurally coherent
   (parent links, tags lowercase, text nodes maximal), parsing is
   deterministic, and every character of document text survives into
   text_content IN ORDER (checked against stdlib HTMLParser's raw
   handle_data stream — what lxml/libxml2 also preserves).
3. **lxml-gated value diff** — the same generators feed
   test_dom_differential.py's engine-vs-engine comparison wherever lxml
   exists (skipped in this container; see that module's docstring).

Deep-run knob: DOM_FUZZ_EXAMPLES=10000 runs the 10^4-document sweep the
verdict asked for (CI default stays small for suite latency). The sweep
result is recorded in PLANS.md.
"""

from __future__ import annotations

import os

from html.parser import HTMLParser

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from spider_spark.dom import Node, css, parse_html, parse_html_bytes, text_content, xpath

N_EXAMPLES = int(os.environ.get("DOM_FUZZ_EXAMPLES", "150"))
FUZZ = settings(
    max_examples=N_EXAMPLES,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.filter_too_much],
)

# ----------------------------------------------------------- generators

TAGS = ["div", "p", "table", "tr", "td", "th", "a", "span", "em", "b",
        "ul", "li", "h1", "dt", "title", "img", "br"]
ATTRS = ["class", "id", "href", "target", "data-x"]
# text pool: ASCII, CJK (the reference's domain), entities incl. broken
# ones, and markup-significant characters entity-escaped by construction
TEXT_BITS = ["hello", "注册资本", "经营范围：", "123", "&amp;", "&nbsp;",
             "&#x4e2d;", "&amp", "&#badnum;", "&;", "x &lt y", "）（",
             " ", "\n", "评论 7"]

text_frag = st.lists(st.sampled_from(TEXT_BITS), min_size=0, max_size=4).map("".join)
attr_val = st.sampled_from(["row title", "ntable", "xs2", "t1", "中文", "a&b", ""])


@st.composite
def element(draw, depth: int):
    tag = draw(st.sampled_from(TAGS))
    attrs = draw(st.lists(
        st.tuples(st.sampled_from(ATTRS), attr_val), min_size=0, max_size=2))
    astr = "".join(f' {k}="{v}"' for k, v in attrs)
    if tag in ("img", "br"):
        return f"<{tag}{astr}>"
    n_kids = draw(st.integers(0, 3)) if depth > 0 else 0
    kids = [draw(st.one_of(text_frag, element(depth - 1))) for _ in range(n_kids)]
    body = "".join(kids)
    # markup damage: sometimes drop the close tag, close a different tag,
    # or emit a stray close before the open
    damage = draw(st.integers(0, 9))
    if damage == 0:
        return f"<{tag}{astr}>{body}"  # unclosed
    if damage == 1:
        other = draw(st.sampled_from(TAGS))
        return f"<{tag}{astr}>{body}</{other}>"  # misnested close
    if damage == 2:
        return f"</{tag}><{tag}{astr}>{body}</{tag}>"  # stray close first
    return f"<{tag}{astr}>{body}</{tag}>"


@st.composite
def document(draw):
    parts = draw(st.lists(st.one_of(text_frag, element(3)), min_size=1, max_size=6))
    doc = "".join(parts)
    if draw(st.booleans()):
        doc = "<!DOCTYPE html><html><body>" + doc  # unclosed body/html
    if draw(st.integers(0, 4)) == 0:
        doc = doc[: draw(st.integers(0, len(doc)))]  # random truncation
    return doc


# ------------------------------------------- independent reference model

def _ref_walk(n: Node):
    for c in n.children:
        if isinstance(c, Node):
            yield c
            yield from _ref_walk(c)


def _ref_xpath_tags(root: Node, tag: str) -> list[Node]:
    return [n for n in _ref_walk(root) if n.tag == tag]


def _ref_xpath_attr_eq(root: Node, tag: str, a: str, v: str) -> list[Node]:
    return [n for n in _ref_walk(root) if n.tag == tag and n.attrs.get(a) == v]


def _ref_texts(nodes: list[Node]) -> list[str]:
    out = []
    for n in nodes:
        out.extend(c for c in n.children if isinstance(c, str))
    return out


def _ref_attrs(nodes: list[Node], a: str) -> list[str]:
    return [n.attrs[a] for n in nodes if a in n.attrs]


class _RawText(HTMLParser):
    """Independent collector of the document's character-data stream —
    the same decoding stack dom.py builds on, but none of its tree logic."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.out: list[str] = []

    def handle_data(self, data: str) -> None:
        if data:
            self.out.append(data)

    def unknown_decl(self, data: str) -> None:
        if data.startswith("CDATA["):
            self.out.append(data[6:])


# ----------------------------------------------------------- properties

@FUZZ
@given(document())
def test_fuzz_parse_never_raises_and_tree_coherent(doc):
    root = parse_html(doc)
    for n in _ref_walk(root):
        assert n.tag == n.tag.lower()
        for c in n.children:
            if isinstance(c, Node):
                assert c.parent is n
        # text nodes maximal: no two adjacent strings
        for a, b in zip(n.children, n.children[1:]):
            assert not (isinstance(a, str) and isinstance(b, str))


@FUZZ
@given(document())
def test_fuzz_parse_deterministic(doc):
    def ser(n: Node) -> str:
        kids = "".join(
            ser(c) if isinstance(c, Node) else f"T({c!r})" for c in n.children)
        return f"<{n.tag}{sorted(n.attrs.items())}>{kids}"

    assert ser(parse_html(doc)) == ser(parse_html(doc))


@FUZZ
@given(document())
def test_fuzz_all_text_survives_in_order(doc):
    """Every character the HTML tokenizer emits as data must appear in
    text_content(root), in order — no matter how broken the tag soup."""
    rt = _RawText()
    rt.feed(doc)
    rt.close()
    assert text_content(parse_html(doc)) == "".join(rt.out)


@FUZZ
@given(document(), st.sampled_from(TAGS))
def test_fuzz_descendant_tag_matches_reference(doc, tag):
    root = parse_html(doc)
    ours = xpath(root, f"//{tag}")
    ref = _ref_xpath_tags(root, tag)
    assert ours == ref


@FUZZ
@given(document(), st.sampled_from(TAGS))
def test_fuzz_text_step_matches_reference(doc, tag):
    root = parse_html(doc)
    assert xpath(root, f"//{tag}/text()") == _ref_texts(_ref_xpath_tags(root, tag))


@FUZZ
@given(document(), st.sampled_from(TAGS), st.sampled_from(ATTRS))
def test_fuzz_attr_step_matches_reference(doc, tag, attr):
    root = parse_html(doc)
    assert xpath(root, f"//{tag}/@{attr}") == _ref_attrs(_ref_xpath_tags(root, tag), attr)


@FUZZ
@given(document(), st.sampled_from(TAGS), st.sampled_from(ATTRS),
       st.sampled_from(["row title", "ntable", "中文", ""]))
def test_fuzz_attr_eq_predicate_matches_reference(doc, tag, attr, val):
    root = parse_html(doc)
    ours = xpath(root, f'//{tag}[@{attr}="{val}"]')
    assert ours == _ref_xpath_attr_eq(root, tag, attr, val)


@FUZZ
@given(document(), st.sampled_from(TAGS))
def test_fuzz_css_tag_equals_xpath_descendant(doc, tag):
    root = parse_html(doc)
    assert css(root, tag) == xpath(root, f"//{tag}")


@FUZZ
@given(document(), st.sampled_from(TAGS))
def test_fuzz_positional_predicate_is_subset(doc, tag):
    root = parse_html(doc)
    first = xpath(root, f"//{tag}[1]")
    allof = xpath(root, f"//{tag}")
    assert set(map(id, first)) <= set(map(id, allof))
    # [1] binds per parent group (lxml semantics): one hit per parent
    parents = [id(n.parent) for n in first]
    assert len(parents) == len(set(parents))


# ----------------------------------------------------------- byte soup

@FUZZ
@given(st.binary(min_size=0, max_size=400))
def test_fuzz_arbitrary_bytes_never_raise(raw):
    parse_html_bytes(raw)


@FUZZ
@given(document(), st.integers(0, 400))
def test_fuzz_gb18030_mojibake(doc, cut):
    """gb18030-encoded documents truncated mid-multibyte-sequence must
    parse without raising. Decode-parity contract (the 10^4 sweep found
    the original stronger form undecidable: '注' in gb18030 is D7 A2,
    which is VALID utf-8 for 'ע'):
    - bytes that are invalid utf-8 → gb18030 fallback gives parity;
    - a declared <meta charset=gb*> gives parity even when the bytes are
      coincidentally valid utf-8 (HTML5-style prescan);
    - undeclared + valid-utf-8 bytes decode as utf-8 by documented
      precedence.
    """
    from spider_spark.dom import decode_html_bytes

    enc = doc.encode("gb18030", errors="replace")
    parse_html_bytes(enc[: min(cut, len(enc))])  # never raises
    if not any(ord(ch) > 127 for ch in doc):
        return  # pure ASCII decodes as utf-8; gb18030 parity is trivial
    via_str = parse_html(enc.decode("gb18030"))
    declared = ('<meta charset="gb2312">' + doc).encode("gb18030", errors="replace")
    via_meta = parse_html_bytes(declared)
    assert text_content(via_meta) == text_content(
        parse_html(declared.decode("gb18030")))
    # transport charset always wins
    assert decode_html_bytes(enc, charset="gb18030") == enc.decode("gb18030")
    try:
        enc.decode("utf-8")
    except UnicodeDecodeError:
        whole = parse_html_bytes(enc)  # invalid utf-8 → heuristic parity
        assert text_content(whole) == text_content(via_str)


def test_meta_prescan_tokens():
    from spider_spark.dom import sniff_encoding

    assert sniff_encoding('<meta charset="gb2312">'.encode()) == "gb18030"
    assert sniff_encoding(b"<META CHARSET=GBK>") == "gb18030"
    assert sniff_encoding(
        b'<meta http-equiv="Content-Type" content="text/html; charset=gb18030">'
    ) == "gb18030"
    assert sniff_encoding(b'<meta charset="UTF-8">') == "utf-8"
    assert sniff_encoding(b'<meta charset="x">') is None  # decoy ignored
    assert sniff_encoding(b"\xef\xbb\xbfhello") == "utf-8"  # BOM
    assert sniff_encoding(b"no meta here") is None
    # declaration outside the 1024-byte prescan window is ignored
    far = b" " * 1100 + b'<meta charset="gb2312">'
    assert sniff_encoding(far) is None


def test_declared_gb_beats_valid_utf8_bytes():
    """The exact sweep counterexample, now decoded correctly when the
    page declares its charset."""
    payload = ('<meta charset="gb2312"><p>注</p>').encode("gb18030")
    assert payload[-7:-4].decode("utf-8", "ignore") != "注"  # ambiguous bytes
    root = parse_html_bytes(payload)
    assert text_content(root) == "注"


# ------------------------------------------------- pinned recovery cases

UNCLOSED_TABLE = """<table class="ntable"><tr><td>注册资本：</td><td>100万
<tr><td>经营范围：<td>软件开发"""


def test_unclosed_table_rows_still_addressable():
    """The reference's qcc extraction (qcc.py:52-59) must keep working on
    tables whose tr/td are implicitly closed — the dominant real-world
    table markup."""
    root = parse_html(UNCLOSED_TABLE)
    rows = xpath(root, '//table[@class="ntable"]//tr')
    assert len(rows) == 2
    cap = xpath(root, '//table[@class="ntable"]//tr/td[contains(text(),"注册资本：")]'
                      "/following-sibling::td[1]")
    assert len(cap) == 1 and text_content(cap[0]).strip() == "100万"


def test_entity_soup_examples():
    # broken entities are preserved as literal text (html.parser model,
    # matching browser + libxml2 recovery for these families)
    root = parse_html("<p>&amp; &amp x &#x4e2d; &#badnum; &;</p>")
    assert xpath(root, "//p/text()") == ["& & x 中 &#badnum; &;"]


def test_stray_close_and_misnested_close_keep_following_content():
    root = parse_html("</div><p>a</span>b</p><em>c</em>")
    assert text_content(root) == "abc"
    assert [n.tag for n in _ref_walk(root)] == ["p", "em"]
