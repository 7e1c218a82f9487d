"""Temporal joins (as-of / range) — registry tier split out of the former
monolithic queries.py (round 4). Conventions live in
spider_spark/registry/__init__.py; enumeration order is preserved by
the import order there."""

from __future__ import annotations

from pyspark.sql import functions as F
from spider_spark.registry._base import T, q


# =====================================================================
# Temporal joins (as-of / range) — spider_spark.joins
# =====================================================================

@q(
    "robots_asof_policy",
    """
    WITH snaps AS (
      SELECT 'h' || (doc_id % 20)::VARCHAR AS host,
             make_timestamp(2024, 3, 1, 0, 0, 0.0) + INTERVAL (doc_id) MINUTE AS snap_ts,
             CASE doc_id % 3 WHEN 0 THEN 'allow_all'
                             WHEN 1 THEN 'deny_cgi' ELSE 'deny_all' END AS policy
      FROM documents WHERE doc_id % 25 = 0),
    caps AS (
      SELECT 'https://h' || (doc_id % 20)::VARCHAR || '.example.com/d/' || doc_id::VARCHAR AS url,
             'h' || (doc_id % 20)::VARCHAR AS host,
             make_timestamp(2024, 3, 1, 0, 0, 0.0) + INTERVAL (doc_id % 3000) MINUTE AS warc_ts
      FROM documents)
    SELECT c.url, c.host,
           epoch(c.warc_ts)::BIGINT AS warc_epoch,
           epoch(s.snap_ts)::BIGINT AS snap_epoch,
           s.policy
    FROM caps c ASOF LEFT JOIN snaps s
      ON c.host = s.host AND c.warc_ts >= s.snap_ts
    """,
)
def robots_asof_policy(spark, sf_dir):
    """Backward as-of join (joins.asof_join): each capture picks the robots
    snapshot in effect at its capture time — the batch-replay form of the
    reference's fetch-time robots poll (分布式京东商品详情页/client_crawler.py
    re-reads policy per request). NO pair blowup: tag + union + ONE shuffle
    on host + a single window's last(ignorenulls) carry-forward, vs the
    per-host cross product a range-condition join would build over 10^10
    captures. Captures before a host's first snapshot survive with NULL
    policy (left-outer). Oracle is DuckDB's native ASOF LEFT JOIN — a
    fully independent implementation of the same semantics."""
    from spider_spark import joins

    d = T(spark, sf_dir, "documents").select("doc_id")
    did = F.col("doc_id")
    base_ts = F.make_timestamp(
        F.lit(2024), F.lit(3), F.lit(1), F.lit(0), F.lit(0), F.lit(0)
    )
    snaps = d.where(did % 25 == 0).select(
        F.concat(F.lit("h"), (did % 20).cast("string")).alias("host"),
        (base_ts + F.make_interval(mins=did.cast("int"))).alias("snap_ts"),
        F.when(did % 3 == 0, F.lit("allow_all"))
        .when(did % 3 == 1, F.lit("deny_cgi"))
        .otherwise(F.lit("deny_all"))
        .alias("policy"),
    )
    caps = d.select(
        F.concat(
            F.lit("https://h"), (did % 20).cast("string"),
            F.lit(".example.com/d/"), did.cast("string"),
        ).alias("url"),
        F.concat(F.lit("h"), (did % 20).cast("string")).alias("host"),
        (base_ts + F.make_interval(mins=(did % 3000).cast("int"))).alias("warc_ts"),
    )
    out = joins.asof_join(caps, snaps, on="host", left_ts="warc_ts", right_ts="snap_ts")
    return out.select(
        "url",
        "host",
        F.unix_timestamp("warc_ts").alias("warc_epoch"),
        F.unix_timestamp("snap_ts").alias("snap_epoch"),
        "policy",
    )


@q(
    "range_join_events",
    """
    WITH iv AS (
      SELECT event_id AS window_id,
             user_id % 50 AS k,
             ts AS w_start,
             ts + INTERVAL (20 + (event_id % 5) * 10) MINUTE AS w_end
      FROM events WHERE event_id % 97 = 0),
    pts AS (
      SELECT event_id, user_id % 50 AS k, ts, value
      FROM events WHERE event_id % 97 != 0)
    SELECT p.event_id, p.k,
           floor(epoch(p.ts))::BIGINT AS pt_epoch,
           iv.window_id,
           floor(epoch(iv.w_start))::BIGINT AS start_epoch,
           round(p.value, 6) AS value
    FROM pts p JOIN iv ON p.k = iv.k
     AND p.ts >= iv.w_start AND p.ts < iv.w_end
    """,
)
def range_join_events(spark, sf_dir):
    """Point-in-interval range join (joins.range_join_binned): events fall
    into the maintenance windows of their user cohort. The interval side
    explodes onto the 10-minute grid buckets it overlaps (≤7 buckets per
    ≤70-minute window) and the join becomes a plain (key, bucket) equi
    join — shuffle-partitioned, AQE-splittable — instead of the per-key
    cross product Catalyst falls back to for an equi+range condition on a
    50-value key. Exact containment re-filters inside the bucket. Oracle
    is the naive inequality join, which DuckDB's IEJoin executes exactly."""
    from spider_spark import joins

    ev = T(spark, sf_dir, "events")
    iv = ev.where(F.col("event_id") % 97 == 0).select(
        F.col("event_id").alias("window_id"),
        (F.col("user_id") % 50).alias("k"),
        F.col("ts").alias("w_start"),
        (
            F.col("ts")
            + F.make_interval(
                mins=(F.lit(20) + (F.col("event_id") % 5) * 10).cast("int")
            )
        ).alias("w_end"),
    )
    pts = ev.where(F.col("event_id") % 97 != 0).select(
        "event_id", (F.col("user_id") % 50).alias("k"), "ts", "value"
    )
    out = joins.range_join_binned(
        pts, iv, on="k", point_col="ts", start_col="w_start", end_col="w_end",
        bin_seconds=600,
    )
    return out.select(
        "event_id",
        "k",
        F.unix_timestamp("ts").alias("pt_epoch"),
        "window_id",
        F.unix_timestamp("w_start").alias("start_epoch"),
        F.round("value", 6).alias("value"),
    )


