"""Metadata-scale frontier demonstration (SURVEY.md §7.8).

The 10^10-URL target can't be materialized in this sandbox, but the
frontier MACHINERY — snapshot write/read, policy broadcast, budgeted pop,
fetch join, link discovery, Bloom-prefiltered dedup, frontier MERGE — can
run at 10^8 rows (1% of design point, ~4 GB parquet frontier) on one box:

    python bench_frontier.py [n_frontier] [n_claim]

Generates a frontier of n_frontier rows (n_claim of them 'new', the rest
'done' — the steady-state mid-crawl shape), a same-size corpus with tiny
html payloads, and measures ONE full round including the snapshot commit.
Prints one JSON line with phase timings; partition math per PLANS.md.

    python bench_frontier.py [n_frontier] [n_claim] [cow|mor]

"mor" runs the same round in merge-on-read mode: the round writes only
delta tables (updates/children/inlinks) instead of rewriting all
n_frontier rows, and the scheduling read prunes to the status=new hive
partition — the write volume drops from O(n_frontier) to O(n_claim +
children), which is the 10^10 design-point fix for the COW merge cost
this script previously measured (BASELINE.md: 10^8 rows ⇒ 300-500 s
rounds, dominated by the full rewrite).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import functions as F  # noqa: E402

from spider_spark import tables  # noqa: E402
from spider_spark.canon import host_col, url_hash_col, url_md5_col  # noqa: E402
from spider_spark.round import CrawlConfig, run_round  # noqa: E402
from spider_spark.seen import SeenSet  # noqa: E402
from spider_spark.session import get_spark  # noqa: E402

N_HOSTS = 10_000


def url_expr(doc):
    h = F.pmod(F.xxhash64(doc, F.lit(3)), F.lit(N_HOSTS))
    return F.concat(F.lit("https://h"), h.cast("string"),
                    F.lit(".f.example.com/p/"), doc.cast("string"))


def main() -> None:
    n_frontier = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000_000
    n_claim = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    mode = sys.argv[3] if len(sys.argv) > 3 else "cow"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    os.environ.setdefault("SPIDER_SPARK_DRIVER_MEM", "48g")
    spark = get_spark(
        app_name="frontier_scale", master=f"local[{cpus}]",
        shuffle_partitions=cpus * 3,
        extra_conf={"spark.sql.adaptive.enabled": "false",
                    "spark.local.dir": os.environ.get("SPARK_LOCAL_DIR", "/tmp")},
    )
    t: dict[str, float] = {}
    t0 = time.time()

    base = spark.range(n_frontier).select(F.col("id").alias("doc"))
    frontier0 = base.select(
        url_expr(F.col("doc")).alias("url"),
        url_md5_col(url_expr(F.col("doc"))).alias("url_md5"),
        url_hash_col(url_expr(F.col("doc"))).alias("url_hash"),
        host_col(url_expr(F.col("doc"))).alias("host"),
        F.lit(1).alias("depth"),
        F.when(F.col("doc") < n_claim, F.lit("new")).otherwise(F.lit("done")).alias("status"),
        F.lit(0).alias("discovered_round"),
        F.when(F.col("doc") >= n_claim, F.lit(1)).cast("int").alias("fetched_round"),
        F.col("doc").alias("discovered_seq"),
        F.lit(1).alias("inlink_count").cast("long"),
        F.lit(1.0).alias("priority"),
        F.lit(0).alias("attempt"),
    )
    wd = tempfile.mkdtemp(prefix="frontier_scale_")
    seen = SeenSet(n_buckets=256, fpp=0.01, capacity_per_bucket=1 << 20)
    tables.write_snapshot(
        wd, 0, {"frontier": frontier0, "seen_segments": seen.build(frontier0)},
        partition_by={"frontier": ["status"]} if mode == "mor" else None,
        frontier_base=0 if mode == "mor" else None,
    )
    t["setup_snapshot0_s"] = round(time.time() - t0, 1)

    # corpus: every url resolvable, 3 links to mixed neighbors, tiny html
    anchors = [
        F.concat(F.lit('<a href="'), url_expr((F.col("doc") * m + k) % n_frontier), F.lit('">l</a>'))
        for m, k in ((7, 1), (11, 3), (13, 7))
    ]
    html = F.concat(F.lit("<html><head><title>P</title></head><body><p>b</p>"), *anchors)
    pages = base.select(url_expr(F.col("doc")).alias("url"), F.encode(html, "UTF-8").alias("html"))
    policy = spark.createDataFrame(
        [(f"h{i}.f.example.com", 5.0, ["/"], [], -1) for i in range(N_HOSTS)],
        "host string, crawl_delay double, robots_allow array<string>, "
        "robots_deny array<string>, host_budget int",
    )

    t1 = time.time()
    loaded = SeenSet.load(spark, wd, 0, n_buckets=256, fpp=0.01,
                          capacity_per_bucket=1 << 20)
    cfg = CrawlConfig(max_rounds=1, use_bloom=True, bloom_buckets=256,
                      n_salt=8, seq_mode="hash", frontier_mode=mode)
    if mode == "mor":
        frontier = tables.read_frontier_new(spark, wd, 0)
        frontier_urls = tables.read_frontier_urls(spark, wd, 0)
        res = run_round(spark, frontier, pages, policy, 1, cfg,
                        seen_mark=loaded.mark, frontier_urls=frontier_urls)
        tbls = {"frontier_updates": res.updates,
                "frontier_children": res.children,
                "frontier_inlinks": res.inlink_deltas,
                "links": res.links, "items": res.items,
                "fetch_log": res.fetch_log,
                "seen_segments": loaded.merged(res.children)}
        tables.write_snapshot(wd, 1, tbls, frontier_base=0)
        t["round_s"] = round(time.time() - t1, 1)
        n_upd = tables.read_table(spark, wd, 1, "frontier_updates").count()
        n_chl = tables.read_table(spark, wd, 1, "frontier_children").count()
        by = {"delta_updates": n_upd, "delta_children": n_chl}
        t["frontier_rows_after"] = n_frontier + n_chl  # resolved size
        t["delta_rows_written"] = n_upd + n_chl
    else:
        frontier = tables.read_table(spark, wd, 0, "frontier")
        res = run_round(spark, frontier, pages, policy, 1, cfg,
                        seen_mark=loaded.mark)
        tbls = {"frontier": res.frontier, "links": res.links, "items": res.items,
                "fetch_log": res.fetch_log,
                "seen_segments": loaded.merged(
                    res.frontier.where(F.col("discovered_round") == 1))}
        tables.write_snapshot(wd, 1, tbls)
        t["round_s"] = round(time.time() - t1, 1)
        f1 = tables.read_table(spark, wd, 1, "frontier")
        by = dict(f1.groupBy("status").count().collect())
        t["frontier_rows_after"] = f1.count()
    out = {
        "n_frontier": n_frontier, "n_claimed": n_claim, "cpus": cpus,
        "mode": mode,
        **t, "status_counts": by,
        "claimed_urls_per_sec": round(n_claim / t["round_s"], 1),
        "frontier_rows_merged_per_sec": round(t["frontier_rows_after"] / t["round_s"], 1),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
