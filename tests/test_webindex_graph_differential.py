"""Round-5 adversarial review (VERDICT r4 item 7): randomized differential
tests for the round-2/3 webindex + graph tiers against INDEPENDENT
brute-force models — pure python/numpy/pandas reimplementations written
from each operator's stated contract, sharing no code with the Spark
implementations. The round-4 review of the round-1 modules (kline/pool/
canon/robots) found 9 real parity bugs with exactly this technique; this
file gives webindex.py:293-846 and graph.py:157-354 the same pass.

Fixtures are seeded random with deliberately nasty shapes: hot keys
(mirror digests on many hosts, one anchor target owning ~30% of edges),
ties (equal timestamps/priorities/degrees), cycles and max_hops-exact
chains for the alias resolver, and remainder slots in the water-filler.
"""

from __future__ import annotations

import hashlib
import random

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from spider_spark import graph, webindex


# =====================================================================
# triangle_counts vs adjacency-matrix A^3
# =====================================================================

@pytest.mark.parametrize("seed,n,p", [(1, 60, 0.08), (2, 120, 0.04), (3, 40, 0.25)])
def test_triangles_match_matrix_cube(spark, seed, n, p):
    rng = random.Random(seed)
    edges = [(i, j) for i in range(n) for j in range(i + 1, n) if rng.random() < p]
    # feed duplicates + reversed orientations + self loops: must be ignored
    noisy = edges + [(b, a) for a, b in edges[::3]] + [(5, 5), (7, 7)]
    df = spark.createDataFrame(noisy, "src long, dst long")
    got = {r["node"]: (r["degree"], r["n_triangles"], r["clustering"])
           for r in graph.triangle_counts(df).collect()}

    A = np.zeros((n, n), dtype=np.int64)
    for a, b in edges:
        A[a, b] = A[b, a] = 1
    tri_per_node = np.diag(A @ A @ A) // 2
    deg = A.sum(axis=1)
    for v in range(n):
        if deg[v] == 0:
            assert v not in got
            continue
        d, t, c = got[v]
        assert d == deg[v], f"degree mismatch at {v}"
        assert t == tri_per_node[v], f"triangles mismatch at {v}"
        expect_c = 2.0 * tri_per_node[v] / (deg[v] * (deg[v] - 1)) if deg[v] > 1 else 0.0
        assert abs(c - expect_c) < 1e-12


# =====================================================================
# kcore vs python synchronous peel
# =====================================================================

def _model_kcore(edges: list[tuple[int, int]], k: int):
    es = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    nodes = {x for e in es for x in e}
    while True:
        deg: dict[int, int] = {}
        for a, b in es:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        drop = {v for v, d in deg.items() if d < k}
        if not drop:
            break
        es = {(a, b) for a, b in es if a not in drop and b not in drop}
    deg = {}
    for a, b in es:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    return {v: (v in deg, deg.get(v, 0)) for v in nodes}


@pytest.mark.parametrize("seed,n,p,k", [(4, 80, 0.05, 2), (5, 80, 0.09, 3), (6, 50, 0.2, 4)])
def test_kcore_matches_model_peel(spark, seed, n, p, k):
    rng = random.Random(seed)
    edges = [(i, j) for i in range(n) for j in range(i + 1, n) if rng.random() < p]
    df = spark.createDataFrame(edges + [(b, a) for a, b in edges[::2]],
                               "src long, dst long")
    got = {r["node"]: (r["in_core"], r["core_degree"])
           for r in graph.kcore(df, k=k).collect()}
    assert got == _model_kcore(edges, k)


# =====================================================================
# fair_share_alloc vs brute-force water level + md5 remainder
# =====================================================================

def _model_fair(demands: dict[str, int], total: int) -> dict[str, int]:
    dd = sum(demands.values())
    if not demands:
        return {}
    if dd <= total:
        return dict(demands)
    best = 0
    for level in range(0, max(demands.values()) + 1):
        if sum(min(d, level) for d in demands.values()) <= total:
            best = level
    alloc = {h: min(d, best) for h, d in demands.items()}
    r = total - sum(alloc.values())
    above = sorted(
        (h for h, d in demands.items() if d > best),
        key=lambda h: (hashlib.md5(h.encode()).hexdigest(), h),
    )
    for h in above[:r]:
        alloc[h] += 1
    return alloc


@pytest.mark.parametrize("seed,total", [(7, 37), (8, 100), (9, 5), (10, 999)])
def test_fair_share_matches_brute_force(spark, seed, total):
    rng = random.Random(seed)
    demands = {f"h{i:03d}.example.com": rng.choice([0, 1, 1, 2, 3, 5, 8, 40, 200])
               for i in range(60)}
    df = spark.createDataFrame(list(demands.items()), "host string, demand long")
    got = {r["host"]: r["alloc"]
           for r in webindex.fair_share_alloc(df, total).collect()}
    assert got == _model_fair(demands, total)
    assert sum(got.values()) == min(total, sum(demands.values()))


# =====================================================================
# resolve_aliases vs per-node walk (cycles, exact-max_hops chains)
# =====================================================================

def _model_resolve(aliases: list[tuple[str, str]], max_hops: int):
    base: dict[str, str] = {}
    for s, d in aliases:
        base[s] = min(base[s], d) if s in base else d
    out = {}
    for url in base:
        cur, hops, seen = base[url], 1, {url}
        ok = None
        while True:
            if cur not in base:
                ok = hops <= max_hops
                break
            if cur in seen or hops > max_hops:
                ok = False
                break
            seen.add(cur)
            cur, hops = base[cur], hops + 1
        out[url] = (cur, hops, True) if ok else (None, None, False)
    return out


def test_resolve_aliases_matches_walk_on_random_functional_graph(spark):
    rng = random.Random(11)
    urls = [f"u{i}" for i in range(120)]
    aliases = []
    for u in urls[:90]:
        # random successor; ~1/6 multi-edges to exercise min(dst) collapse
        aliases.append((u, rng.choice(urls)))
        if rng.random() < 0.17:
            aliases.append((u, rng.choice(urls)))
    df = spark.createDataFrame(aliases, "src string, dst string")
    got = {r["url"]: (r["target"], r["hops"], r["resolved"])
           for r in webindex.resolve_aliases(df, max_hops=32).collect()}
    model = _model_resolve(aliases, 32)
    assert got == model
    # at least one cycle-unresolved row in a random functional graph
    assert any(not v[2] for v in model.values())


def test_resolve_aliases_chain_exactly_max_hops_resolves(spark):
    chain = [(f"c{i}", f"c{i+1}") for i in range(32)]  # 32 edges → terminal c32
    over = [(f"d{i}", f"d{i+1}") for i in range(33)]   # 33 edges → over budget
    df = spark.createDataFrame(chain + over, "src string, dst string")
    got = {r["url"]: (r["target"], r["hops"], r["resolved"])
          for r in webindex.resolve_aliases(df, max_hops=32).collect()}
    assert got["c0"] == ("c32", 32, True)
    assert got["d0"] == (None, None, False)
    assert got == _model_resolve(chain + over, 32)


# =====================================================================
# mirror_host_pairs vs pandas set model (hot-digest cap active)
# =====================================================================

def test_mirror_pairs_match_set_model_with_hot_cap(spark):
    rng = random.Random(13)
    pages = [f"page-{i}" for i in range(40)]
    rows = []
    for h in range(12):
        host = f"h{h}.example.com"
        # mirrors: even hosts share a prefix pool; odd hosts mostly unique
        pool = pages[:20] if h % 2 == 0 else pages[20:] + [f"own-{h}-{i}" for i in range(10)]
        for p in rng.sample(pool, k=min(12, len(pool))):
            rows.append((f"https://{host}/{p}", p))
    # a boilerplate page on EVERY host → must be dropped by the hot cap
    for h in range(12):
        rows.append((f"https://h{h}.example.com/empty", "BOILERPLATE"))
    df = spark.createDataFrame(rows, "url string, html string")
    cap, min_d, thr = 8, 2, 0.5
    got = {(r["a_host"], r["b_host"]): (r["inter"], r["na"], r["nb"],
                                        round(r["containment_min"], 10),
                                        round(r["jaccard"], 10))
           for r in webindex.mirror_host_pairs(
               df, threshold=thr, max_hosts_per_digest=cap, min_digests=min_d
           ).collect()}

    # model: host → set of sha256[:16] digests; global hot-digest drop
    hd: dict[str, set] = {}
    for url, html in rows:
        host = url.split("/")[2]
        hd.setdefault(host, set()).add(hashlib.sha256(html.encode()).hexdigest()[:16])
    counts: dict[str, int] = {}
    for s in hd.values():
        for dg in s:
            counts[dg] = counts.get(dg, 0) + 1
    hot = {dg for dg, c in counts.items() if c > cap}
    hd = {h: s - hot for h, s in hd.items()}
    model = {}
    hosts = sorted(hd)
    for i, a in enumerate(hosts):
        for b in hosts[i + 1:]:
            if len(hd[a]) < min_d or len(hd[b]) < min_d:
                continue
            inter = len(hd[a] & hd[b])
            if inter == 0:
                continue
            cm = inter / min(len(hd[a]), len(hd[b]))
            if cm >= thr:
                model[(a, b)] = (inter, len(hd[a]), len(hd[b]), round(cm, 10),
                                 round(inter / len(hd[a] | hd[b]), 10))
    assert got == model
    assert model, "fixture must produce at least one mirror pair"


# =====================================================================
# content_seen vs pandas first-capture model
# =====================================================================

def test_content_seen_matches_model_with_ties(spark):
    rng = random.Random(17)
    from datetime import datetime, timedelta

    ts = datetime(2026, 1, 1)
    rows = []
    for i in range(200):
        body = f"body-{rng.randrange(40)}"  # heavy digest collisions
        rows.append((f"https://h{i%7}.com/p{i}",
                     ts + timedelta(seconds=rng.randrange(50)), body))
    # exact tie on (ts): url breaks it
    rows.append(("https://a.com/x", ts, "tied"))
    rows.append(("https://b.com/x", ts, "tied"))
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, html string")
    got = {(r["url"], r["warc_ts"]): (r["digest"], r["is_first_seen"],
                                      r["dup_of_url"], r["dup_of_ts"])
           for r in webindex.content_seen(df).collect()}

    pdf = pd.DataFrame(rows, columns=["url", "warc_ts", "html"])
    pdf["digest"] = pdf["html"].map(lambda s: hashlib.sha256(s.encode()).hexdigest())
    model = {}
    for dg, grp in pdf.groupby("digest"):
        grp = grp.sort_values(["warc_ts", "url"]).reset_index(drop=True)
        first_url, first_ts = grp.loc[0, "url"], grp.loc[0, "warc_ts"]
        for i, row in grp.iterrows():
            first = i == 0
            model[(row["url"], row["warc_ts"].to_pydatetime())] = (
                dg, first,
                None if first else first_url,
                None if first else first_ts.to_pydatetime(),
            )
    assert got == model


# =====================================================================
# anchor_profile vs pandas agg (hot target + null anchors)
# =====================================================================

def test_anchor_profile_matches_pandas_agg(spark):
    rng = random.Random(19)
    rows = []
    for i in range(3000):
        target = "https://hot.example.com/" if rng.random() < 0.3 else \
            f"https://t{rng.randrange(40)}.example.com/"
        anchor = None if rng.random() < 0.05 else f"anchor {rng.randrange(300)}"
        rows.append((target, rng.randrange(500), anchor))
    df = spark.createDataFrame(rows, "target string, doc_id long, anchor string")
    got = {r["target"]: (r["n_links"], r["n_src_docs"], tuple(r["anchor_texts"]))
           for r in webindex.anchor_profile(df, n_anchors=25).collect()}

    pdf = pd.DataFrame(rows, columns=["target", "doc_id", "anchor"])
    model = {}
    for t, grp in pdf.groupby("target"):
        anchors = sorted(set(grp["anchor"].dropna()))[:25]
        model[t] = (len(grp), grp["doc_id"].nunique(), tuple(anchors))
    assert got == model


# =====================================================================
# conditional_refetch vs pandas latest-capture model
# =====================================================================

def test_conditional_refetch_matches_model(spark):
    rng = random.Random(23)
    from datetime import datetime, timedelta

    t0 = datetime(2026, 2, 1)
    hist, live = [], []
    for i in range(80):
        url = f"https://s.com/p{i}"
        for c in range(rng.randrange(0, 4)):  # 0 captures → first_fetch
            hist.append((url, t0 + timedelta(hours=c), f"dg-{i}-{c}"))
        live.append((url, f"dg-{i}-{rng.randrange(4)}", 1000 + i))
    # tie: two captures same ts, validator desc breaks it
    hist.append(("https://s.com/tie", t0, "dg-a"))
    hist.append(("https://s.com/tie", t0, "dg-b"))
    live.append(("https://s.com/tie", "dg-b", 777))
    h = spark.createDataFrame(hist, "url string, warc_ts timestamp, digest string")
    lv = spark.createDataFrame(live, "url string, digest string, n_bytes long")
    got = {r["url"]: (r["outcome"], r["last_ts"], r["bytes_saved"], r["bytes_fetched"])
           for r in webindex.conditional_refetch(h, lv).collect()}

    hp = pd.DataFrame(hist, columns=["url", "ts", "digest"])
    model = {}
    for url, dg, nb in live:
        grp = hp[hp["url"] == url]
        if grp.empty:
            model[url] = ("first_fetch", None, 0, nb)
            continue
        top = grp.sort_values(["ts", "digest"], ascending=False).iloc[0]
        if top["digest"] == dg:
            model[url] = ("not_modified", top["ts"].to_pydatetime(), nb, 0)
        else:
            model[url] = ("modified", top["ts"].to_pydatetime(), 0, nb)
    assert got == model
    assert got["https://s.com/tie"][0] == "not_modified"


# =====================================================================
# politeness_schedule vs pandas slot model
# =====================================================================

def test_politeness_schedule_matches_model(spark):
    rng = random.Random(29)
    rows = [(f"https://h{i%5}.com/p{i}", f"h{i%5}.com", float(rng.randrange(4)))
            for i in range(60)]
    pol = [("h0.com", 5.0), ("h1.com", 0.5), ("h2.com", 2.0)]  # h3/h4 default 1.0
    b = spark.createDataFrame(rows, "url string, host string, priority double")
    p = spark.createDataFrame(pol, "host string, crawl_delay double")
    got = {r["url"]: (r["slot"], r["fetch_offset_s"])
           for r in webindex.politeness_schedule(b, p, "2026-03-01 00:00:00").collect()}

    pdf = pd.DataFrame(rows, columns=["url", "host", "priority"])
    delays = dict(pol)
    model = {}
    for host, grp in pdf.groupby("host"):
        grp = grp.sort_values(["priority", "url"]).reset_index(drop=True)
        for slot, row in grp.iterrows():
            model[row["url"]] = (slot, slot * delays.get(host, 1.0))
    assert got == model


# =====================================================================
# url_templates vs pandas regex model
# =====================================================================

def test_url_templates_match_pandas_model(spark):
    rng = random.Random(31)
    rows = []
    for i in range(400):
        h = f"h{i % 6}.example.com"
        kind = rng.randrange(3)
        if kind == 0:
            rows.append(f"https://{h}/product/{rng.randrange(10_000)}/view")
        elif kind == 1:
            rows.append(f"https://{h}/cat/{rng.randrange(30)}/page/{rng.randrange(99)}")
        else:
            rows.append(f"https://{h}/about")
    df = spark.createDataFrame([(u,) for u in rows], "url string")
    got = {(r["host"], r["template"]): (r["n_urls"], r["example_url"])
           for r in webindex.url_templates(df).collect()}

    import re
    pdf = pd.DataFrame({"url": rows})
    pdf["host"] = pdf["url"].str.split("/").str[2]
    pdf["path"] = pdf["url"].map(lambda u: "/" + u.split("/", 3)[3] if len(u.split("/", 3)) > 3 else "/")
    pdf["template"] = pdf["path"].map(lambda p: re.sub(r"[0-9]+", "{d}", p))
    model = {}
    for (h, t), grp in pdf.groupby(["host", "template"]):
        model[(h, t)] = (len(grp), grp["url"].min())
    assert got == model
