"""Zipf-skew stress bench for the graph/agg tier (VERDICT r02 item 5).

PLANS.md asserts "partial-agg absorbs hot-dst skew; AQE splits the
residue" for pagerank/hits/anchor aggregation. This bench converts that
assertion into numbers: it plants a power-law link graph (log-uniform
dst ⇒ Zipf(≈1) in-degree; the hottest node receives a few percent of ALL
edges) next to a uniform graph of identical size, runs the three
operator shapes on both with AQE on and off, and reports the skew
penalty — the ratio skewed/uniform wall time. A penalty near 1.0 means
the map-side partial aggregation really does absorb the hot key; a large
penalty would mean a straggler task and a salting TODO.

Deterministic: all randomness is xxhash64 of the row id — same graph
every run, no RNG. Usage:

    python bench_skew.py [n_edges] [n_nodes]   # defaults 2_000_000 / 100_000

Prints one JSON line (machine) and a markdown table (for PLANS.md).
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

import pyspark.sql.functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from spider_spark.graph import triangle_counts  # noqa: E402
from spider_spark.pagerank import hits, pagerank  # noqa: E402
from spider_spark.session import get_spark  # noqa: E402
from spider_spark.webindex import anchor_profile  # noqa: E402


def make_edges(spark, n_edges: int, n_nodes: int, skewed: bool):
    ids = spark.range(n_edges)
    src_i = F.pmod(F.xxhash64("id", F.lit(13)), F.lit(n_nodes))
    if skewed:
        # log-uniform over [1, n_nodes]: in-degree ~ Zipf(1); node 1 takes
        # ~ln(2)/ln(n_nodes) of all edges (~6% at 1e5 nodes)
        u = F.pmod(F.xxhash64("id", F.lit(7)), F.lit(1_000_000)) / 1_000_000.0
        dst_i = F.floor(F.exp(u * F.lit(math.log(n_nodes)))).cast("long")
    else:
        dst_i = F.pmod(F.xxhash64("id", F.lit(11)), F.lit(n_nodes))
    url = lambda c: F.concat(F.lit("https://n"), c.cast("string"), F.lit(".example.com/"))  # noqa: E731
    return ids.select(url(src_i).alias("src"), url(dst_i).alias("dst"))


def anchor_agg_shape(edges):
    """anchor_text_agg's plan shape: ONE Exchange(dst) with bounded
    (top-50 slice) collect_set state — the skew-hazard aggregation."""
    return (
        edges.groupBy("dst")
        .agg(
            F.count(F.lit(1)).alias("n_links"),
            F.countDistinct("src").alias("n_src"),
            F.slice(F.array_sort(F.collect_set(F.substring("src", 1, 24))), 1, 50)
            .alias("anchors"),
        )
    )


def anchor_salted_shape(edges):
    """The skew-proof variant: webindex.anchor_profile's salted two-stage
    aggregation (exactly equal output, bounded per-reducer state)."""
    return anchor_profile(
        edges.select("dst", F.col("src").alias("doc_id"),
                     F.substring("src", 1, 24).alias("anchor")),
        target_col="dst", doc_col="doc_id", anchor_col="anchor",
    )


def run_once(spark, edges, which: str, reps: int = 2) -> float:
    """Best-of-reps: the one-box scheduler adds multi-second noise to any
    single run; the min is the least-contended estimate of the plan cost."""
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        if which == "pagerank":
            pagerank(edges, alpha=0.9, iters=5).count()
        elif which == "hits":
            hits(edges, iters=5).count()
        elif which == "anchor_salted":
            anchor_salted_shape(edges).count()
        elif which == "triangles":
            # degree orientation claim under test: the Zipf hub's edges all
            # point INTO it, so it emits no wedges and the self-join stays
            # arboricity-bounded even when one node holds ~6% of all edges
            triangle_counts(edges).count()
        else:
            anchor_agg_shape(edges).count()
        best = min(best, time.time() - t0)
    return best


def main() -> None:
    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_nodes = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=int(cpus))

    # measured hot share so the table documents HOW skewed the plant is
    sk = make_edges(spark, n_edges, n_nodes, skewed=True).persist()
    un = make_edges(spark, n_edges, n_nodes, skewed=False).persist()
    hot = (
        sk.groupBy("dst").count().orderBy(F.desc("count")).limit(1).collect()[0]
    )
    hot_share = hot["count"] / n_edges
    sk.count(), un.count()

    # warmup: pay codegen/JIT/broadcast init OUTSIDE the measured window —
    # the first measured op otherwise absorbs several seconds of one-time
    # cost and poisons whichever (operator, variant) happens to run first
    pagerank(un, alpha=0.9, iters=1).count()
    hits(un, iters=1).count()
    anchor_agg_shape(un).count()
    anchor_salted_shape(un).count()
    triangle_counts(un.limit(50_000)).count()

    results: dict[str, dict[str, float]] = {}
    for aqe in (True, False):
        spark.conf.set("spark.sql.adaptive.enabled", str(aqe).lower())
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(aqe).lower())
        for which in ("pagerank", "hits", "anchor_agg", "anchor_salted", "triangles"):
            for label, edges in (("skew", sk), ("unif", un)):
                key = f"{which}_{label}_aqe{'on' if aqe else 'off'}"
                results.setdefault(which, {})[f"{label}_aqe{'on' if aqe else 'off'}"] = round(
                    run_once(spark, edges, which), 2
                )
    spark.conf.set("spark.sql.adaptive.enabled", "true")

    print(json.dumps({
        "metric": "zipf_skew_penalty",
        "n_edges": n_edges, "n_nodes": n_nodes,
        "hot_dst_share": round(hot_share, 4),
        "results": results,
        "penalty": {
            w: {
                "aqe_on": round(r["skew_aqeon"] / r["unif_aqeon"], 3),
                "aqe_off": round(r["skew_aqeoff"] / r["unif_aqeoff"], 3),
            }
            for w, r in results.items()
        },
    }))

    print("\n| operator | unif AQE-on | skew AQE-on | penalty | unif AQE-off | skew AQE-off | penalty |")
    print("|---|---|---|---|---|---|---|")
    for w, r in results.items():
        print(
            f"| {w} | {r['unif_aqeon']}s | {r['skew_aqeon']}s | "
            f"{r['skew_aqeon'] / r['unif_aqeon']:.2f}× | {r['unif_aqeoff']}s | "
            f"{r['skew_aqeoff']}s | {r['skew_aqeoff'] / r['unif_aqeoff']:.2f}× |"
        )


def tfidf_main() -> None:
    """Boilerplate hot-shingle stress for the inverted-index similarity
    join (PLANS.md "tfidf_sim_join" claim → numbers): every 5th doc
    carries a shared 9-token boilerplate sentence, so its 7 three-gram
    shingles each hit df = n_docs/5 and the uncapped term self-join pays
    7·(n/5)²/2 partial rows from boilerplate alone; max_df drops those
    shingles from the vector space and the join collapses to the
    discriminative-shingle volume. Usage:

        python bench_skew.py tfidf [n_docs]     # default 20_000
    """
    from spider_spark.dedup import tfidf_cosine_pairs

    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=int(cpus))

    BOILER = " the quick brown fox jumps over the lazy dog"
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat(
            # 12 per-doc-unique tokens: u<i>a0 u<i>a1 ... (no cross-doc shingles)
            F.concat_ws(
                " ",
                *[F.concat(F.lit("u"), F.col("id").cast("string"), F.lit(f"a{k}"))
                  for k in range(12)],
            ),
            F.when(F.col("id") % 5 == 0, F.lit(BOILER)).otherwise(F.lit("")),
        ).alias("text"),
    ).persist()
    docs.count()

    out: dict[str, dict[str, float]] = {}
    for label, cap in (("capped_64", 64), ("uncapped", None)):
        t0 = time.time()
        n_pairs = tfidf_cosine_pairs(docs, threshold=0.3, max_df=cap, n=3).count()
        wall = time.time() - t0
        # candidate volume = inverted-index join rows BEFORE the pair agg
        from spider_spark import textops as _t
        toks = docs.select("doc_id", _t.tokens_col(F.col("text")).alias("w"))
        g = toks.select("doc_id", F.explode(_t.grams_all_col(F.col("w"), 3)).alias("term"))
        dfx = g.groupBy("term").agg(F.count_distinct("doc_id").alias("df"))
        if cap is not None:
            dfx = dfx.where(F.col("df") <= cap)
        idx = g.join(dfx.select("term"), "term")
        cand = (
            idx.select(F.col("doc_id").alias("a_id"), "term")
            .join(idx.select(F.col("doc_id").alias("b_id"), "term"), "term")
            .where(F.col("a_id") < F.col("b_id"))
            .count()
        )
        out[label] = {"wall_s": round(wall, 2), "pairs": n_pairs,
                      "index_join_rows": cand}

    print(json.dumps({
        "metric": "tfidf_boilerplate_cap",
        "n_docs": n_docs,
        "boiler_df": n_docs // 5,
        "results": out,
    }))
    print("\n| variant | index-join rows | output pairs | wall |")
    print("|---|---|---|---|")
    for label, r in out.items():
        print(f"| {label} | {r['index_join_rows']:,} | {r['pairs']} | {r['wall_s']}s |")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "tfidf":
        tfidf_main()
    else:
        main()
