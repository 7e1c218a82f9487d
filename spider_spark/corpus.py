"""Deterministic synthetic web corpus (FIXTURES.md §1-3).

Generates the (url, warc_ts, html, text, lang) pages table the crawler
"fetches" from, plus seeds and host_policy. Pure ``numpy.default_rng(seed)``
— no wall clock, no dict-order dependence (FIXTURES.md §7).

Properties engineered in:
- hot-domain skew: host ids ~ Zipf(1.2) (the north_star names skew handling);
- a JD-style subset ``https://item.jd.com/{7-11 digits}.html`` so the
  reference regex (client_crawler.py:111) has real targets;
- scheme-relative anchors (``//item.jd.com/...``) exercising the
  ``'https:' + href`` fix-up (client_crawler.py:151);
- an embedded qcc-style labeled table (qcc.py:52-59 fields);
- ~1% malformed pages (unclosed tags) exercising parser recovery;
- a small rate of dangling links (fetch-miss path, B6 retry budget).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

BASE_TS = np.datetime64("2026-01-01T00:00:00")

_VOCAB = np.array(
    "the quick brown fox jumps over lazy dog spark frontier crawl page link "
    "host depth queue parse fetch round snapshot bloom filter policy budget".split()
)


def make_pages(n_pages: int = 1000, n_hosts: int = 50, seed: int = 42) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    pid = np.arange(n_pages)

    is_jd = rng.random(n_pages) < 0.25
    host_id = np.minimum(rng.zipf(1.2, n_pages) - 1, n_hosts - 1)  # skewed
    jd_num = 1_000_000 + pid  # 7 digits
    urls = np.where(
        is_jd,
        [f"https://item.jd.com/{n}.html" for n in jd_num],
        [f"https://h{h:04d}.example.com/p/{i}" for h, i in zip(host_id, pid)],
    )
    url_of = {i: u for i, u in zip(pid, urls)}

    n_words = rng.integers(5, 30, n_pages)
    k_child = rng.poisson(3, n_pages)  # scheme-relative JD anchors
    m_child = rng.poisson(3, n_pages)  # absolute anchors
    malformed = rng.random(n_pages) < 0.01
    lang = np.where(rng.random(n_pages) < 0.9, "zh", "en")

    jd_ids = pid[is_jd]
    rows = []
    for i in range(n_pages):
        text = " ".join(rng.choice(_VOCAB, n_words[i]))
        anchors = []
        if len(jd_ids):
            for t in rng.choice(jd_ids, k_child[i]):
                anchors.append(f'<a href="//item.jd.com/{1_000_000 + t}.html">c</a>')
        for t in rng.integers(0, n_pages, m_child[i]):
            if rng.random() < 0.02:  # dangling link → fetch-miss path
                anchors.append(f'<a href="https://h9999.example.com/p/{n_pages + t}">x</a>')
            else:
                anchors.append(f'<a href="{url_of[t]}">a</a>')
        qcc_rows = "".join(
            f"<td>{label}</td><td>{field}-{i}</td>"
            for field, label in _QCC_FIELDS
        )
        html = (
            f"<html><head><title>T{i}</title></head><body><p>{text}</p>\n"
            + "\n".join(anchors)
            + f'\n<table class="ntable"><tr>{qcc_rows}</tr></table>'
        )
        if not malformed[i]:
            html += "\n</body></html>"
        rows.append(
            {
                "url": urls[i],
                "warc_ts": (BASE_TS + np.timedelta64(i, "s")).astype("datetime64[us]"),
                "html": html.encode("utf-8"),
                "text": text,  # golden byte-parity target
                "lang": lang[i],
            }
        )
    return pd.DataFrame(rows)


# mirror of parse.QCC_FIELDS without importing pyspark at corpus-build time
_QCC_FIELDS = [
    ("company_name", "企业名称"),
    ("registered_capital", "注册资本"),
    ("contributed_capital", "实缴资本"),
    ("management_forms", "经营状态"),
    ("established_data", "成立日期"),
    ("Organization_Number", "组织机构代码"),
    ("address", "地址"),
    ("business_scope", "经营范围"),
]


def make_qcc_pages(n_pages: int = 200, seed: int = 7) -> pd.DataFrame:
    """Messy company-detail pages for the DOM byte-parity surface (C1/C2).

    Deliberately adversarial-but-realistic HTML, deterministic per seed:
    mixed-case tags, randomized attribute noise on label cells, unclosed
    ``<tr>``/``<td>``, entity-encoded values (& < > " and CJK), a trailing
    ``<span>`` after value text, random inter-tag whitespace, a decoy table
    with the same labels, and ~25% of pages encoded gb18030 (抖音.py:12's
    double-decode case). Golden columns carry the planted values the
    reference's lxml XPath family (qcc.py:52-59) must recover byte-exactly.
    """
    rng = np.random.default_rng(seed)
    labels = [
        ("registered_capital", "注册资本："),
        ("contributed_capital", "实缴资本："),
        ("management_forms", "经营状态："),
        ("established_data", "成立日期："),
        ("credit_code", "统一社会信用代码："),
        ("address", "企业地址："),
        ("business_scope", "经营范围："),
    ]
    statuses = ["存续", "注销", "吊销", "在业"]
    rows = []
    for i in range(n_pages):
        vals = {
            "company_name": f"公司{i} & <子公司 {i % 7}> \"品牌\"",
            "registered_capital": f"{rng.integers(10, 99999)}万元",
            "contributed_capital": f"{rng.integers(10, 99999)}万元",
            "management_forms": statuses[int(rng.integers(0, len(statuses)))],
            "established_data": f"{1990 + i % 30}-0{1 + i % 9}-1{i % 9}",
            "credit_code": f"91{i:012d}X{'G' if i % 2 else 'A'}",
            "address": f"城市{i % 13}区 第{i}号 & 楼<A>",
            "business_scope": f"软件开发 & <增值电信业务> 第{i}类",
        }

        def esc(s: str) -> str:
            return (
                s.replace("&", "&amp;").replace("<", "&lt;")
                .replace(">", "&gt;").replace('"', "&quot;")
            )

        ws = lambda: " \n"[int(rng.integers(0, 2))] * int(rng.integers(0, 3))  # noqa: E731
        attr = lambda: (' width="20%"', ' class="tb"', "")[int(rng.integers(0, 3))]  # noqa: E731
        cells = []
        for field, label in labels:
            close_label = "</td>" if rng.random() < 0.5 else ""
            close_val = "</td></tr>" if rng.random() < 0.5 else ""
            tail = '<span class="tip">?</span>' if rng.random() < 0.3 else ""
            cells.append(
                f"<tr>{ws()}<td{attr()}>{label}{close_label}"
                f"<td>{esc(vals[field])}{tail}{close_val}"
            )
        table_tag = "TABLE" if i % 3 == 0 else "table"
        html = (
            f'<HTML><head><meta charset="x"><title>公司{i}</title></head><BODY>{ws()}'
            f'<table class="other"><tr><td>注册资本：</td><td>DECOY{i}</td></tr></table>'
            f'<div class="row title"><h1>{esc(vals["company_name"])}</h1>'
            f'<span class="tag">t</span></div>{ws()}'
            f'<{table_tag} width="100%" class="ntable">'
            + "".join(cells)
            + f"</{table_tag}>{'</BODY></html>' if rng.random() < 0.9 else ''}"
        )
        enc = "gb18030" if rng.random() < 0.25 else "utf-8"
        rows.append(
            {
                "url": f"https://www.qcc.com/firm_{i:08x}.html",
                "html": html.encode(enc),
                "encoding": enc,
                **vals,
            }
        )
    return pd.DataFrame(rows)


def make_seeds(pages: pd.DataFrame, n_seeds: int = 3, include_missing: bool = True) -> pd.DataFrame:
    """Seed list: first pages (deterministic) + one URL not in the corpus
    (FIXTURES.md §2: fetch-miss path). Reference seeds at depth 0
    (client_crawler.py:321)."""
    step = max(1, len(pages) // max(n_seeds, 1))
    urls = [pages["url"].iloc[i * step] for i in range(n_seeds)]
    if include_missing:
        urls.append("https://h9999.example.com/p/missing")
    return pd.DataFrame({"url": urls, "depth": [0] * len(urls)})


def make_host_policy(
    pages: pd.DataFrame,
    crawl_delay: float = 5.0,
    host_budget: int = -1,
    deny: list[str] | None = None,
) -> pd.DataFrame:
    """Parity fixture: allow-all robots + unlimited budget (the reference sets
    ROBOTSTXT_OBEY=False everywhere and rate-limits per worker, not per host
    — weibo/settings.py:21, client_crawler.py:84). Budgeted/deny variants for
    the politeness tests."""
    hosts = sorted(
        {u.split("/")[2].lower() for u in pages["url"]} | {"h9999.example.com"}
    )
    return pd.DataFrame(
        {
            "host": hosts,
            "crawl_delay": [crawl_delay] * len(hosts),
            "robots_allow": [["/"]] * len(hosts),
            "robots_deny": [list(deny or [])] * len(hosts),
            "host_budget": [host_budget] * len(hosts),
        }
    )
