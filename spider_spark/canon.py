"""URL canonicalization + normalization.

Two distinct keys, on purpose (SURVEY.md §2 C6):

- ``url`` (raw string): the parity dedup key. The reference's seen-set is
  keyed by the *raw, uncanonicalized* URL string (Redis GET url,
  mongo_redis_mgr.py:43-47), so crawl-order/seen-set parity uses raw equality.
- ``canonical(url)`` → ``xxhash64``: OUR seen-set key for the Bloom segments
  (north_rule: "keyed by canonicalized-URL xxhash64"). Canonicalization:
  lowercase scheme+host, strip fragment, drop default ports.

``normalize_href`` reproduces the reference's scheme fix-up
(client_crawler.py:151, 拉钩/lagou.py:43: ``'https:' + href`` for
scheme-relative links) — link-discovery parity depends on it.

Python and Spark implementations are kept semantically identical; the pure
functions feed the reference model (tests) and the column expressions feed
the engine.
"""

from __future__ import annotations

import hashlib
import re
import unicodedata
from urllib.parse import urlsplit

from pyspark.sql import Column
from pyspark.sql import functions as F

XXHASH_SEED = 42  # F.xxhash64 default seed

# Mirror of java.net.URI's strictness the JVM side applies (Spark's
# try_parse_url → NULL on malformed). Both sides must agree on
# "unparseable ⇒ fall back to the raw string" or engine and parity model
# drift. Empirically verified against Spark 4.1.2 try_parse_url
# (char-by-char probe, round 2): java rejects
#   - a stray % without two hex digits (the common crawl-wild case),
#   - the RFC-3986 "excluded" ASCII set  " < > [ \\ ] ^ ` { | },
#   - ISO control chars (0x00-0x1f, 0x7f-0x9f — includes NEL 0x85),
#   - Unicode space separators (categories Zs/Zl/Zp: space, NBSP, EN SPACE,
#     LINE SEPARATOR, ...),
# while ALLOWING other non-ASCII (é, 中, emoji, even U+FEFF — java's
# "other category" deviation from RFC 2396).
_BAD_ESCAPE = re.compile(r"%(?![0-9A-Fa-f]{2})")
_BAD_ASCII = set('"<>[\\]^`{|}')
# brackets are legal ONLY as an authority IP-literal (RFC 3986 §3.2.2) —
# java.net.URI (and thus try_parse_url) accepts 'http://[::1]:8080/x'
# (live-probed) while rejecting brackets anywhere else; mirror that
# instead of blanket-banning '[' ']'
_IPV6_AUTH = re.compile(
    r"^[A-Za-z][A-Za-z0-9+.-]*://(?:[^@/\[\]]*@)?\[[0-9A-Fa-f:.]+\]"
)


def _parseable(url: str) -> bool:
    if _BAD_ESCAPE.search(url):
        return False
    m = _IPV6_AUTH.match(url)
    scan = (
        url[: m.start()] + m.group(0).replace("[", "").replace("]", "")
        + url[m.end():]
        if m else url
    )
    for ch in scan:
        o = ord(ch)
        if o < 0x20 or 0x7F <= o <= 0x9F or ch in _BAD_ASCII:
            return False
        if unicodedata.category(ch) in ("Zs", "Zl", "Zp"):
            return False
    return True


# ---------------------------------------------------------------- pure python
def normalize_href(href: str, scheme: str = "https") -> str:
    """Scheme fix-up exactly as the reference does it (client_crawler.py:151)."""
    if href.startswith("//"):
        return f"{scheme}:{href}"
    return href


def canonicalize(url: str) -> str:
    """Lowercase scheme+host, strip fragment, drop default port.
    Unparseable URLs (malformed escapes — try_parse_url returns NULL for
    them JVM-side) pass through raw."""
    if not _parseable(url):
        return url
    try:
        p = urlsplit(url)
    except ValueError:
        return url
    if not p.scheme or not p.netloc:
        return url
    scheme = p.scheme.lower()
    netloc = p.netloc.lower()
    if (scheme == "http" and netloc.endswith(":80")) or (
        scheme == "https" and netloc.endswith(":443")
    ):
        netloc = netloc.rsplit(":", 1)[0]
    out = f"{scheme}://{netloc}{p.path}"
    if p.query:
        out += f"?{p.query}"
    return out


def host_of(url: str) -> str | None:
    if not _parseable(url):
        return None
    try:
        h = urlsplit(url).hostname
        return h.lower() if h else None
    except ValueError:
        return None


def url_md5(url: str) -> str:
    """Identifier parity with the reference (_id = md5(url),
    mongo_redis_mgr.py:49)."""
    return hashlib.md5(url.encode("utf8")).hexdigest()


# ------------------------------------------------------------ spark columns
def normalize_href_col(col: Column, scheme: str = "https") -> Column:
    return F.when(col.startswith("//"), F.concat(F.lit(scheme + ":"), col)).otherwise(col)


def canonical_col(url: Column) -> Column:
    """Column-expression canonicalization — stays in whole-stage codegen.
    try_parse_url, NOT parse_url: Spark 4's parse_url THROWS on malformed
    escapes, so one bad discovered href would fail the whole round
    (hypothesis-found; crawl-wild URLs make this a certainty at scale)."""
    proto = F.lower(F.try_parse_url(url, F.lit("PROTOCOL")))
    auth = F.lower(F.try_parse_url(url, F.lit("AUTHORITY")))
    auth = F.when(
        (proto == "http") & auth.endswith(":80"), F.regexp_replace(auth, ":80$", "")
    ).when(
        (proto == "https") & auth.endswith(":443"), F.regexp_replace(auth, ":443$", "")
    ).otherwise(auth)
    path = F.coalesce(F.try_parse_url(url, F.lit("PATH")), F.lit(""))
    query = F.try_parse_url(url, F.lit("QUERY"))
    base = F.concat(proto, F.lit("://"), auth, path)
    # empty query must behave like no query ('http://a/b?' → 'http://a/b'):
    # python's `if p.query` is falsy on '', but try_parse_url returns ''
    # (non-null) there — without the != '' guard the JVM canonical keeps
    # the bare '?' and the seen-set key diverges from the parity model
    out = F.when(
        query.isNotNull() & (query != ""), F.concat(base, F.lit("?"), query)
    ).otherwise(base)
    # malformed URLs pass through raw, matching canonicalize()
    return F.when(proto.isNull() | auth.isNull(), url).otherwise(out)


def host_col(url: Column) -> Column:
    """Host extraction matching python ``host_of`` (urlsplit().hostname):
    derived from AUTHORITY, not try_parse_url HOST — HOST goes through
    java.net.URI, which returns NULL for RFC-questionable-but-crawl-real
    hosts (underscores: 'a_b.com') and keeps IPv6 brackets ('[::1]'),
    so robots/politeness joins keyed on host silently missed those hosts
    and JVM- vs python-derived host columns disagreed. Authority → strip
    userinfo → unbracket IPv6 / strip port; all codegen regex."""
    auth = F.lower(F.try_parse_url(url, F.lit("AUTHORITY")))
    hostport = F.regexp_replace(auth, "^[^@]*@", "")
    host = F.when(
        hostport.startswith("["),
        F.regexp_extract(hostport, r"^\[([^\]]*)\]", 1),
    ).otherwise(F.regexp_replace(hostport, ":[0-9]*$", ""))
    return F.nullif(host, F.lit(""))


def url_hash_col(url: Column) -> Column:
    """Seen-set key: xxhash64 over the canonical URL (north_rule)."""
    return F.xxhash64(canonical_col(url))


def url_md5_col(url: Column) -> Column:
    return F.md5(url)


# --------------------------------------------------- registrable domain (PSL)
#: Embedded subset of the Public Suffix List (publicsuffix.org — public data).
#: Real crawlers scope politeness, trap caps, and dedup keys per REGISTRABLE
#: domain (eTLD+1), not per host: every *.blogspot.com subdomain is one
#: operator. Wildcard (*.ck) and exception (!www.ck) PSL rules are not in
#: this subset; swap in the full list via the `psl` parameter unchanged.
DEFAULT_PSL = [
    "com", "net", "org", "edu", "gov", "mil", "int", "io", "co", "ai",
    "info", "biz", "dev", "app", "xyz", "us", "uk", "cn", "jp", "de",
    "fr", "ru", "br", "in", "au", "ca", "it", "nl", "es", "se",
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn",
    "co.jp", "ne.jp", "or.jp", "ac.jp",
    "com.au", "net.au", "org.au", "com.br", "net.br",
    "co.in", "firm.in", "co.kr", "or.kr",
    # private-registry suffixes (PSL PRIVATE section — each subdomain is an
    # independent operator):
    "github.io", "blogspot.com", "herokuapp.com", "s3.amazonaws.com",
]


def registrable_domain_col(host: Column, psl: list[str] | None = None) -> Column:
    """host → eTLD+1 by longest-suffix match against the PSL, pure JVM.

    The PSL ships as an InSet literal into codegen (like the blocklist
    gate's term list) — no join, no shuffle, no UDF; at the full ~9k-rule
    list Catalyst still folds the membership test to an InSet hash probe.
    Suffixes are generated longest-first, so the FIRST match is the longest
    public suffix; eTLD+1 is the label before it joined back on.

    Edge rules (PSL algorithm, publicsuffix.org/list/):
    - host IS a public suffix exactly → NULL (no registrable domain);
    - no rule matches → implicit `*` rule: eTLD is the last label, so
      eTLD+1 = last two labels (single-label hosts → NULL).
    """
    rules = psl if psl is not None else DEFAULT_PSL
    labs = F.split(host, r"\.")
    n = F.size(labs)
    sfx = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.concat_ws(".", F.slice(labs, i, n)),
    )
    # 1-based index of the longest (= first) suffix that is a public suffix
    idx = F.array_min(
        F.filter(
            F.transform(sfx, lambda s, i: F.when(s.isin(*rules), i + 1)),
            lambda x: x.isNotNull(),
        )
    )
    return (
        F.when(idx.isNull() & (n >= 2), F.concat_ws(".", F.slice(labs, n - 1, 2)))
        .when(idx > 1, F.element_at(sfx, (idx - 1).cast("int")))
        .otherwise(F.lit(None).cast("string"))
    )


def absolutize_href_col(href: Column, base_url: Column) -> Column:
    """Resolve an href against its page URL (RFC 3986 §5 reference
    resolution, the subset crawl-wild hrefs actually use): absolute URIs
    pass through, ``//host/…`` takes the base scheme, ``/path`` takes the
    base origin, and bare relative paths merge onto the base path's
    directory. Dot-segment normalization is deliberately out of scope
    (§5.2.4) — the reference's crawler never emits ``..`` links and the
    canonicalizer treats paths opaquely; documented subset, not drift.

    Pure JVM column algebra (try_parse_url-hardened: an unparseable base
    yields NULL, never a throw), so link absolutization runs inside
    whole-stage codegen next to discovery itself."""
    scheme = F.lower(F.try_parse_url(base_url, F.lit("PROTOCOL")))
    auth = F.lower(F.try_parse_url(base_url, F.lit("AUTHORITY")))
    origin = F.concat(scheme, F.lit("://"), auth)
    path = F.coalesce(F.try_parse_url(base_url, F.lit("PATH")), F.lit("/"))
    query = F.try_parse_url(base_url, F.lit("QUERY"))
    base_noq = F.concat(origin, path)
    base_nofrag = F.when(
        query.isNotNull(), F.concat(base_noq, F.lit("?"), query)
    ).otherwise(base_noq)
    dirp = F.regexp_replace(path, "[^/]*$", "")
    dirp = F.when(dirp == "", F.lit("/")).otherwise(dirp)
    return (
        F.when(href.isNull(), F.lit(None).cast("string"))
        # empty reference = same document (§5.3): base path + query, NOT
        # the base directory the bare-relative branch would produce —
        # '<a href="">' is crawl-common (round-4 review fix)
        .when(href == "", base_nofrag)
        # any scheme-prefixed reference is absolute (RFC 3986 §4.3) —
        # https://, mailto:, tel:, javascript: all pass through untouched
        .when(href.rlike("^[A-Za-z][A-Za-z0-9+.-]*:"), href)
        .when(href.startswith("//"), F.concat(scheme, F.lit(":"), href))
        # query-only reference keeps the base PATH (§5.3), not its dir
        .when(href.startswith("?"), F.concat(base_noq, href))
        # fragment-only reference keeps base path AND query (§5.3)
        .when(href.startswith("#"), F.concat(base_nofrag, href))
        .when(href.startswith("/"), F.concat(origin, href))
        .otherwise(F.concat(origin, dirp, href))
    )
