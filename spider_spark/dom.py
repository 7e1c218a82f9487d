"""From-scratch HTML DOM + XPath/CSS-selector engine (SURVEY.md §2 C1-C3).

The reference's extraction IS lxml XPath (企查查工商数据/qcc.py:52-59:
``//table[@class="ntable"]//tr/td[contains(text(),"注册资本：")]/
following-sibling::td[1]``; 钓鱼技巧.py:62-87: ``/text()``, ``/@href``,
``[@target="_blank"]``; scrapy-ganji gj.py:14-21: ``.//dd[@class=...]``,
``//span[1]/text()``) and pyquery CSS (ProxyPool/proxypool/crawler.py:50-67:
``td:nth-child(1)``, ``.tbBottomLine:nth-child(2)``). Neither lxml nor
pyquery is installed in this container and installing packages is out of
scope, so this module implements the needed subset FROM SCRATCH on the
stdlib ``html.parser`` — real structural extraction over broken crawl-wild
HTML, not a regex surface. Public knowledge only: the XPath/CSS grammars
are W3C specs; ``html.parser`` is CPython stdlib.

Semantics deliberately mirror lxml where the reference depends on them:

- ``Node.text`` = text before the first child ELEMENT (None if none) —
  what ``tree.xpath(...)[0].text`` reads in qcc.py:52.
- a ``text()`` step yields the DIRECT text-node children, split at element
  boundaries (钓鱼技巧.py:85 indexes ``[-1]`` of exactly that list).
- ``contains(text(), s)`` converts the text node-set to a string = FIRST
  text node (libxml2 string(node-set) rule).
- positional predicates are per-context-node (``//tr/td[1]`` = first td of
  EACH row; ``following-sibling::td[1]`` = nearest following td sibling).
- ``:nth-child(n)`` counts ELEMENT children of the parent, 1-based (CSS).

Parsing model: browser-ish auto-close rules (``<td>`` closed by the next
``<td>/<tr>``, ``<p>`` by block starts, ``<li>`` by ``<li>`` ...), void
elements never pushed, stray end tags ignored, EOF closes everything —
enough to round-trip the messy corpus (unclosed tags, entity refs, attr
noise, case mixing) byte-identically with what lxml would extract.

Everything here is pure python with zero Spark imports so the same code
runs in the parity model (tests) and inside Arrow-batched pandas UDFs
(parse.py) — one source of truth, per the input_hint's "vectorized
pandas/Arrow UDFs (no per-row Python)" contract at the Spark layer.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

__all__ = [
    "Node",
    "parse_html",
    "parse_html_bytes",
    "decode_html_bytes",
    "sniff_encoding",
    "text_content",
    "XPath",
    "CssSelector",
    "xpath",
    "css",
]


# ============================================================ DOM tree
class Node:
    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag: str, attrs: dict[str, str] | None = None,
                 parent: "Node | None" = None):
        self.tag = tag
        self.attrs = attrs or {}
        self.children: list[Node | str] = []
        self.parent = parent

    # --- lxml-compatible accessors -------------------------------------
    @property
    def text(self) -> str | None:
        """Text before the first child element — lxml Element.text."""
        if self.children and isinstance(self.children[0], str):
            return self.children[0]
        return None

    def get(self, name: str, default: str | None = None) -> str | None:
        return self.attrs.get(name, default)

    def element_children(self) -> list["Node"]:
        return [c for c in self.children if isinstance(c, Node)]

    def direct_texts(self) -> list[str]:
        """The text() node-set: direct text children in order."""
        return [c for c in self.children if isinstance(c, str)]

    def iter(self):
        """Pre-order traversal of element descendants (not self)."""
        for c in self.children:
            if isinstance(c, Node):
                yield c
                yield from c.iter()

    def __repr__(self) -> str:  # debugging aid only
        return f"<Node {self.tag} {self.attrs!r} n_children={len(self.children)}>"


def text_content(node: Node) -> str:
    """All descendant text, document order, no separators (lxml
    itertext()-join — what Scrapy's ::text / pyquery .text() read before
    their whitespace trims)."""
    out: list[str] = []

    def walk(n: Node) -> None:
        for c in n.children:
            if isinstance(c, str):
                out.append(c)
            else:
                walk(c)

    walk(node)
    return "".join(out)


_VOID = {
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
}
_BLOCK = {
    "address", "article", "aside", "blockquote", "div", "dl", "dt", "dd",
    "fieldset", "footer", "form", "h1", "h2", "h3", "h4", "h5", "h6",
    "header", "hr", "li", "main", "nav", "ol", "p", "pre", "section",
    "table", "ul", "tr", "td", "th", "thead", "tbody", "tfoot",
}
# open tag -> set of incoming start tags that implicitly close it
_CLOSED_BY = {
    "p": _BLOCK,
    "li": {"li"},
    "dt": {"dt", "dd"},
    "dd": {"dt", "dd"},
    "td": {"td", "th", "tr", "thead", "tbody", "tfoot"},
    "th": {"td", "th", "tr", "thead", "tbody", "tfoot"},
    "tr": {"tr", "thead", "tbody", "tfoot"},
    "thead": {"tbody", "tfoot"},
    "tbody": {"tbody", "tfoot"},
    "option": {"option", "optgroup"},
    "optgroup": {"optgroup"},
}


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)  # entities decoded in data
        self.root = Node("#document")
        self.stack: list[Node] = [self.root]

    # -- helpers --------------------------------------------------------
    def _top(self) -> Node:
        return self.stack[-1]

    def _append_text(self, data: str) -> None:
        top = self._top()
        # keep text nodes MAXIMAL: html.parser may deliver one run of text
        # as several handle_data calls; text()-list semantics require the
        # merged form
        if top.children and isinstance(top.children[-1], str):
            top.children[-1] += data
        else:
            top.children.append(data)

    # -- HTMLParser hooks ----------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        while len(self.stack) > 1 and tag in _CLOSED_BY.get(self._top().tag, ()):
            self.stack.pop()
        adict: dict[str, str] = {}
        for k, v in attrs:  # duplicate attributes: first wins (browsers)
            if k not in adict:
                adict[k] = v if v is not None else ""
        node = Node(tag, adict, self._top())
        self._top().children.append(node)
        if tag not in _VOID:
            self.stack.append(node)

    def handle_startendtag(self, tag: str, attrs) -> None:
        self.handle_starttag(tag, attrs)
        if tag not in _VOID:
            self.stack.pop()

    def handle_endtag(self, tag: str) -> None:
        if tag in _VOID:
            return
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return
        # stray end tag: ignore (browser error recovery)

    def handle_data(self, data: str) -> None:
        if data:
            self._append_text(data)

    def handle_decl(self, decl: str) -> None:  # <!DOCTYPE ...>: not text
        pass

    def unknown_decl(self, data: str) -> None:
        # CDATA sections carry CONTENT: '<![CDATA[x]]>' arrives here as
        # 'CDATA[x' and was silently dropped — real RSS 2.0 feeds wrap
        # titles AND links in CDATA, so feed ingestion lost entries whole
        if data.startswith("CDATA["):
            self._append_text(data[6:])


def parse_html(html: str) -> Node:
    """Parse (possibly broken) HTML into a DOM; never raises on bad markup."""
    b = _TreeBuilder()
    b.feed(html)
    b.close()
    return b.root


# HTML5-style encoding prescan (the spec's "changing the encoding while
# parsing" pre-step, simplified to the two families this engine ships):
# only RECOGNIZED tokens bind — crawl-wild pages declare junk charsets
# (the fixture corpus plants charset="x" decoys) and those must fall
# through to the byte heuristic, not force a decode.
_META_CHARSET_RE = re.compile(
    rb"""<meta[^>]{0,200}?charset\s*=\s*["']?\s*([A-Za-z0-9_\-]{1,20})""", re.I
)
_GB_TOKENS = {"gb2312", "gb-2312", "gbk", "gb18030"}
_UTF8_TOKENS = {"utf-8", "utf8"}


def sniff_encoding(raw: bytes) -> str | None:
    """BOM, then a 1024-byte <meta charset> prescan. None = no verdict."""
    if raw[:3] == b"\xef\xbb\xbf":
        return "utf-8"
    if raw[:2] in (b"\xff\xfe", b"\xfe\xff"):
        return "utf-16"
    m = _META_CHARSET_RE.search(raw[:1024])
    if m:
        tok = m.group(1).decode("ascii", "replace").lower()
        if tok in _GB_TOKENS:
            return "gb18030"
        if tok in _UTF8_TOKENS:
            return "utf-8"
    return None


def decode_html_bytes(raw: bytes, charset: str | None = None) -> str:
    """Bytes → text with the crawl decode policy: transport charset (the
    caller's Content-Type knowledge) wins, then the prescan verdict, then
    utf-8 with gb18030 fallback on real byte failures — the reference's
    double-decode (抖音/抖音.py:12 ``r.content.decode('gb18030')``;
    everything else utf-8). The prescan closes the mojibake hole the
    round-4 fuzz sweep found: short gb18030 CJK runs can be VALID utf-8
    bytes ('注' = D7 A2 → 'ע'), so a declared page no longer leans on the
    byte heuristic. Undeclared ambiguous bytes keep utf-8 precedence —
    that tie is undecidable without priors and utf-8 dominates the web."""
    enc = charset or sniff_encoding(raw)
    if enc in ("gb18030", "utf-16"):
        return raw.decode(enc, errors="replace")
    if enc == "utf-8":
        return raw.decode("utf-8", errors="replace")
    try:
        return raw.decode("utf-8")
    except UnicodeDecodeError:
        return raw.decode("gb18030", errors="replace")


def parse_html_bytes(raw: bytes | str, charset: str | None = None) -> Node:
    """Charset-tolerant entry — see decode_html_bytes for the policy."""
    if isinstance(raw, (bytes, bytearray)):
        raw = decode_html_bytes(bytes(raw), charset)
    return parse_html(raw)


# ============================================================ XPath subset
_STEP_RE = re.compile(
    r"""
    (?P<axis>following-sibling::|descendant::|parent::|self::|child::)?
    (?P<test>\*|[A-Za-z][A-Za-z0-9_-]*(?:\(\))?|@[A-Za-z][A-Za-z0-9:_-]*|\.\.|\.)
    (?P<preds>(?:\[[^\]]*\])*)
    $""",
    re.X,
)
_PRED_RE = re.compile(r"\[([^\]]*)\]")
_STR = r"""(?:"([^"]*)"|'([^']*)')"""
_PRED_ATTR_EQ = re.compile(r"@([A-Za-z][A-Za-z0-9:_-]*)\s*=\s*" + _STR + r"$")
_PRED_ATTR = re.compile(r"@([A-Za-z][A-Za-z0-9:_-]*)$")
_PRED_CONTAINS = re.compile(
    r"contains\(\s*(text\(\)|@[A-Za-z][A-Za-z0-9:_-]*|\.)\s*,\s*" + _STR + r"\s*\)$"
)
_PRED_TEXT_EQ = re.compile(r"text\(\)\s*=\s*" + _STR + r"$")
_PRED_DOT_EQ = re.compile(r"\.\s*=\s*" + _STR + r"$")
_PRED_LAST = re.compile(r"last\(\)$")


def _sv(m: re.Match, first_group: int) -> str:
    """String literal value from the double-alternative _STR groups."""
    a = m.group(first_group)
    return a if a is not None else m.group(first_group + 1)


class _Step:
    __slots__ = ("axis", "test", "preds", "descendant")

    def __init__(self, token: str, descendant: bool):
        m = _STEP_RE.match(token)
        if not m:
            raise ValueError(f"unsupported xpath step: {token!r}")
        self.descendant = descendant
        axis = (m.group("axis") or "child::")[:-2]
        test = m.group("test")
        if test == "..":
            axis, test = "parent", "*"
        elif test == ".":
            axis, test = "self", "*"
        self.axis = axis
        self.test = test.lower() if not test.startswith("@") else test
        self.preds = _PRED_RE.findall(m.group("preds") or "")


class _Hit:
    """A text()/@attr result with source identity for node-set dedup:
    key = (kind, owner element id, slot). Unwrapped to .value by
    XPath.__call__ after the per-step dedup."""

    __slots__ = ("key", "value")

    def __init__(self, kind: str, owner: int, slot, value: str):
        self.key = (kind, owner, slot)
        self.value = value


def _string_value(x: Node | str) -> str:
    return x if isinstance(x, str) else text_content(x)


def _first_text(n: Node) -> str:
    """string(text()) — libxml2: first text node or ''."""
    ts = n.direct_texts()
    return ts[0] if ts else ""


def _pred_filter(group: list, pred: str) -> list:
    pred = pred.strip()
    if pred.isdigit():
        i = int(pred)
        return [group[i - 1]] if 1 <= i <= len(group) else []
    if _PRED_LAST.match(pred):
        return group[-1:] if group else []
    m = _PRED_ATTR_EQ.match(pred)
    if m:
        name, val = m.group(1), _sv(m, 2)
        return [n for n in group if isinstance(n, Node) and n.attrs.get(name) == val]
    m = _PRED_ATTR.match(pred)
    if m:
        name = m.group(1)
        return [n for n in group if isinstance(n, Node) and name in n.attrs]
    m = _PRED_CONTAINS.match(pred)
    if m:
        target, val = m.group(1), _sv(m, 2)
        if target == "text()":
            return [n for n in group if isinstance(n, Node) and val in _first_text(n)]
        if target == ".":
            return [n for n in group if val in _string_value(n)]
        name = target[1:]
        return [
            n for n in group
            if isinstance(n, Node) and val in (n.attrs.get(name) or "")
        ]
    m = _PRED_TEXT_EQ.match(pred)
    if m:
        # node-set = string (XPath 1.0): true if ANY direct text node
        # equals — not just the first (that's string(text()), i.e. the
        # contains(text(), v) conversion above, which correctly keeps
        # _first_text)
        val = _sv(m, 1)
        return [
            n for n in group
            if isinstance(n, Node) and any(s == val for s in n.direct_texts())
        ]
    m = _PRED_DOT_EQ.match(pred)
    if m:
        # [.='v'] compares the node's full STRING-VALUE (all descendant
        # text), matching contains(., v) above — _first_text returned ''
        # whenever the first child was an element
        val = _sv(m, 1)
        return [n for n in group if _string_value(n) == val]
    raise ValueError(f"unsupported xpath predicate: [{pred}]")


class XPath:
    """Compiled XPath subset expression; call on a Node, get lxml-shaped
    results (Nodes for element paths, strings for text()/@attr paths)."""

    def __init__(self, expr: str):
        self.expr = expr
        e = expr.strip()
        self.steps: list[_Step] = []
        if e.startswith("//"):
            e, desc = e[2:], True
        elif e.startswith("/"):
            e, desc = e[1:], False
        else:
            desc = False  # relative: './/a' handled via '.' self step
        # split on '/' but honour '//' separators
        i = 0
        parts: list[tuple[str, bool]] = []
        cur_desc = desc
        depth = 0
        tok = ""
        while i < len(e):
            ch = e[i]
            if ch == "[":
                depth += 1
            elif ch == "]":
                depth -= 1
            if ch == "/" and depth == 0:
                if tok:
                    parts.append((tok, cur_desc))
                    tok = ""
                if i + 1 < len(e) and e[i + 1] == "/":
                    cur_desc = True
                    i += 1
                else:
                    cur_desc = False
            else:
                tok += ch
            i += 1
        if tok:
            parts.append((tok, cur_desc))
        for token, d in parts:
            self.steps.append(_Step(token, d))

    def __call__(self, node: Node) -> list:
        ctx: list = [node]
        for step in self.steps:
            nxt: list = []
            seen: set = set()
            for c in ctx:
                if not isinstance(c, Node):
                    continue
                group = self._step_group(c, step)
                for g in group:
                    if isinstance(g, Node):
                        key = id(g)
                        if key not in seen:
                            seen.add(key)
                            nxt.append(g)
                    elif isinstance(g, _Hit):
                        # text()/@attr results carry source identity so a
                        # value reached through NESTED contexts (e.g.
                        # '//div//text()' with <div><div>..) emits once —
                        # bare strings were duplicated per context before
                        if g.key not in seen:
                            seen.add(g.key)
                            nxt.append(g.value)
                    else:
                        nxt.append(g)
            ctx = nxt
        return ctx

    def _step_group(self, c: Node, step: _Step) -> list:
        if (
            (step.descendant or step.axis == "descendant")
            and not step.test.startswith("@")
            and step.test != "text()"
            and any(p.strip().isdigit() or _PRED_LAST.match(p.strip())
                    for p in step.preds)
        ):
            # positional predicate on a descendant step: '//span[1]'
            # expands to descendant-or-self::node()/child::span[1] — the
            # predicate binds PER PARENT, not over the flattened
            # descendant set (lxml returns the first span child of EVERY
            # parent; the flat filter returned one global node)
            out = []
            for parent in [c] + list(c.iter()):
                sub = parent.element_children()
                if step.test != "*":
                    sub = [n for n in sub if n.tag == step.test]
                for pred in step.preds:
                    sub = _pred_filter(sub, pred)
                out.extend(sub)
            return out
        group = self._axis_candidates(c, step)
        for pred in step.preds:
            group = _pred_filter(group, pred)
        return group

    @staticmethod
    def _axis_candidates(c: Node, step: _Step) -> list:
        test = step.test
        if step.axis == "parent":
            cands = [c.parent] if c.parent is not None else []
        elif step.axis == "self":
            cands = [c]
        elif step.axis == "following-sibling":
            if c.parent is None:
                cands = []
            else:
                sibs = c.parent.element_children()
                idx = sibs.index(c)
                cands = sibs[idx + 1:]
        elif step.descendant or step.axis == "descendant":
            cands = list(c.iter())
        else:  # child
            cands = c.element_children()

        if test == "text()":
            if step.descendant or step.axis == "descendant":
                # descendant-OR-SELF: './/text()' includes the context
                # node's own direct text ('<div>hello<span>world</span>'
                # previously lost 'hello'); cands is c.iter() (self excluded)
                return [
                    _Hit("t", id(n), i, s)
                    for n in [c] + cands
                    for i, s in enumerate(n.direct_texts())
                ]
            src = [c] if step.axis == "child" else cands
            return [
                _Hit("t", id(n), i, s)
                for n in src
                for i, s in enumerate(n.direct_texts())
            ]
        if test.startswith("@"):
            name = test[1:]
            if step.axis == "child" and not step.descendant:
                v = c.attrs.get(name)
                return [_Hit("a", id(c), name, v)] if v is not None else []
            if step.descendant or step.axis == "descendant":
                nodes = [c] + [n for n in cands if n is not c]
            else:
                nodes = cands
            return [
                _Hit("a", id(n), name, n.attrs[name])
                for n in nodes
                if n.attrs.get(name) is not None
            ]
        if test == "*":
            return cands
        return [n for n in cands if n.tag == test]


def xpath(node: Node, expr: str) -> list:
    return XPath(expr)(node)


# ============================================================ CSS subset
_CSS_TOKEN = re.compile(
    r"""
    (?P<tag>\*|[A-Za-z][A-Za-z0-9_-]*)
    | \.(?P<cls>[A-Za-z0-9_-]+)
    | \#(?P<id>[A-Za-z0-9_-]+)
    | \[(?P<aname>[A-Za-z][A-Za-z0-9:_-]*)(?:=(?P<aq>["']?)(?P<aval>[^\]"']*)(?P=aq))?\]
    | :(?P<pseudo>nth-child\(\d+\)|first-child|last-child)
    """,
    re.X,
)


class _Compound:
    __slots__ = ("tag", "classes", "id", "attrs", "nth", "first", "last")

    def __init__(self, token: str):
        self.tag = None
        self.classes: list[str] = []
        self.id = None
        self.attrs: list[tuple[str, str | None]] = []
        self.nth = None
        self.first = False
        self.last = False
        pos = 0
        while pos < len(token):
            m = _CSS_TOKEN.match(token, pos)
            if not m:
                raise ValueError(f"unsupported css selector part: {token[pos:]!r}")
            pos = m.end()
            if m.group("tag"):
                self.tag = None if m.group("tag") == "*" else m.group("tag").lower()
            elif m.group("cls"):
                self.classes.append(m.group("cls"))
            elif m.group("id"):
                self.id = m.group("id")
            elif m.group("aname"):
                self.attrs.append((m.group("aname"), m.group("aval")))
            else:
                p = m.group("pseudo")
                if p == "first-child":
                    self.first = True
                elif p == "last-child":
                    self.last = True
                else:
                    self.nth = int(p[len("nth-child("):-1])

    def matches(self, n: Node) -> bool:
        if self.tag is not None and n.tag != self.tag:
            return False
        if self.id is not None and n.attrs.get("id") != self.id:
            return False
        if self.classes:
            have = (n.attrs.get("class") or "").split()
            if any(c not in have for c in self.classes):
                return False
        for name, val in self.attrs:
            got = n.attrs.get(name)
            if got is None or (val is not None and got != val):
                return False
        if self.nth is not None or self.first or self.last:
            if n.parent is None:
                return False
            sibs = n.parent.element_children()  # CSS counts element children
            i = sibs.index(n) + 1
            if self.nth is not None and i != self.nth:
                return False
            if self.first and i != 1:
                return False
            if self.last and i != len(sibs):
                return False
        return True


class CssSelector:
    """Compiled CSS selector group (pyquery-compatible subset:
    ``td:nth-child(1)``, ``.cls:nth-child(2)``, ``#id``, ``[attr="v"]``,
    descendant and ``>`` combinators, comma groups)."""

    def __init__(self, selector: str):
        self.expr = selector
        self.paths: list[list[tuple[str, _Compound]]] = []
        for alt in selector.split(","):
            toks = alt.replace(">", " > ").split()
            path: list[tuple[str, _Compound]] = []
            comb = " "
            for t in toks:
                if t == ">":
                    comb = ">"
                    continue
                path.append((comb, _Compound(t)))
                comb = " "
            if path:
                self.paths.append(path)

    def __call__(self, node: Node) -> list[Node]:
        out: list[Node] = []
        seen: set[int] = set()
        for path in self.paths:
            ctx = [node]
            for comb, comp in path:
                nxt: list[Node] = []
                ns: set[int] = set()
                for c in ctx:
                    cands = c.element_children() if comb == ">" else list(c.iter())
                    for n in cands:
                        if id(n) not in ns and comp.matches(n):
                            ns.add(id(n))
                            nxt.append(n)
                ctx = nxt
            for n in ctx:
                if id(n) not in seen:
                    seen.add(id(n))
                    out.append(n)
        return out


def css(node: Node, selector: str) -> list[Node]:
    return CssSelector(selector)(node)


# ------------------------------------------------------- main content extract
# Readability-lite boilerplate removal (Mozilla readability / boilerpipe
# family, public algorithms): score candidate containers by link-density-
# discounted text mass, excluding chrome subtrees entirely.

NOISE_TAGS = {"script", "style", "nav", "aside", "footer", "header",
              "form", "noscript", "template", "iframe"}
CANDIDATE_TAGS = {"div", "article", "main", "section", "body", "td"}


def _text_and_link_len(node: Node) -> tuple[int, int]:
    """(clean text length, link text length) under ``node``, skipping
    NOISE_TAGS subtrees; whitespace runs count as one char."""
    total = link = 0

    def walk(n: Node, in_link: bool) -> None:
        nonlocal total, link
        for c in n.children:
            if isinstance(c, str):
                t = len(" ".join(c.split()))
                total += t
                if in_link:
                    link += t
            elif c.tag not in NOISE_TAGS:
                walk(c, in_link or c.tag == "a")

    walk(node, node.tag == "a")
    return total, link


def main_content(root: Node) -> Node | None:
    """The best candidate container: maximal (text - link_text) *
    (1 - link_density) — heavy link blocks (menus, related-links boxes)
    score near zero even when tag names give nothing away; chrome tags
    (nav/aside/footer/...) are excluded from every score. Ties break to
    the LAST candidate in document order (the deepest of nested equal
    scorers, since a parent precedes its child in iter())."""
    # ONE post-order pass computes every node's (text, link) lengths
    # bottom-up — re-walking each candidate's subtree (_text_and_link_len
    # per candidate) revisits the same leaves O(depth) times, quadratic on
    # crawl-wild nested-div soup inside the Arrow-batched UDF hot path.
    lens: dict[int, tuple[int, int]] = {}

    def measure(n: Node, in_link: bool) -> tuple[int, int]:
        total = link = 0
        for c in n.children:
            if isinstance(c, str):
                tl = len(" ".join(c.split()))
                total += tl
                if in_link:
                    link += tl
            elif c.tag not in NOISE_TAGS:
                ct, cl = measure(c, in_link or c.tag == "a")
                total += ct
                link += cl
        lens[id(n)] = (total, link)
        return total, link

    measure(root, root.tag == "a")
    best, best_score = None, 0.0
    for n in _iter_outside_noise(root):
        if n.tag not in CANDIDATE_TAGS:
            continue
        t, l = lens.get(id(n), (0, 0))
        if t == 0:
            continue
        score = (t - l) * (1.0 - l / t)
        if score >= best_score:
            best, best_score = n, score
    return best


def _iter_outside_noise(root: Node):
    """Pre-order elements, PRUNING noise subtrees whole: a candidate div
    nested inside <footer>/<nav>/... must never score (the old root.iter()
    walk let a 3000-char footer boilerplate div outscore the article —
    only the candidate's DESCENDANT noise was excluded, not its
    ancestors)."""
    for c in root.children:
        if isinstance(c, Node) and c.tag not in NOISE_TAGS:
            yield c
            yield from _iter_outside_noise(c)


def main_text(root: Node) -> str:
    """Whitespace-normalized text of the main content (noise subtrees
    dropped), '' when the page has no scoring container."""
    node = main_content(root)
    if node is None:
        return ""
    out: list[str] = []

    def walk(n: Node) -> None:
        for c in n.children:
            if isinstance(c, str):
                out.append(c)
            elif c.tag not in NOISE_TAGS:
                if c.tag in _BLOCK_TAGS:
                    out.append(" ")  # block boundary = word boundary
                walk(c)
                if c.tag in _BLOCK_TAGS:
                    out.append(" ")

    walk(node)
    return " ".join("".join(out).split())


_BLOCK_TAGS = {
    "p", "div", "section", "article", "li", "ul", "ol", "tr", "td", "th",
    "table", "br", "h1", "h2", "h3", "h4", "h5", "h6", "blockquote", "pre",
    "dd", "dt", "dl",
}
