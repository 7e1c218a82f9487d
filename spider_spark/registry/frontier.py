"""Frontier / scheduling semantics (§2.A) on the events table — registry tier split out of the former
monolithic queries.py (round 4). Conventions live in
spider_spark/registry/__init__.py; enumeration order is preserved by
the import order there."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window
from spider_spark.registry._base import T, q


# =====================================================================
# Frontier / scheduling semantics (§2.A) on the events table
# =====================================================================

@q(
    "per_host_topk",
    """
    SELECT user_id, event_id, rn FROM (
      SELECT user_id, event_id,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)::INT AS rn
      FROM events)
    WHERE rn <= 3
    """,
)
def per_host_topk(spark, sf_dir):
    """A2/A12's per-host budgeted pop as a pure window query (round.pop_batch
    is this exact shape with salting; user_id stands in for host)."""
    ev = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("user_id", "event_id", "rn")
    )


@q(
    "first_wins_dedup",
    """
    SELECT user_id, event_id AS first_event_id, event_type AS first_type
    FROM events
    QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) = 1
    """,
)
def first_wins_dedup(spark, sf_dir):
    """A1 first-wins semantics (mongo_redis_mgr.py:43-47: the first discovery
    of a URL fixes its depth/status; later discoveries only bump a counter)."""
    ev = T(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(
        F.min(F.struct("ts", "event_id", "event_type")).alias("f")
    )
    return first.select(
        "user_id",
        F.col("f.event_id").alias("first_event_id"),
        F.col("f.event_type").alias("first_type"),
    )


@q(
    "inlink_counts",
    """
    SELECT event_type, count(*) AS n_events, count(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type
    """,
)
def inlink_counts(spark, sf_dir):
    """A1's Redis in-link counter as groupBy().count()."""
    return (
        T(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.countDistinct("user_id").alias("n_users"))
    )


@q(
    "set_merge_addtoset",
    """
    SELECT user_id, string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS types
    FROM events GROUP BY user_id
    """,
)
def set_merge_addtoset(spark, sf_dir):
    """D3: Mongo $addToSet accumulate (weibo/pipelines.py:74-82) →
    collect_set + array_sort, rendered as a canonical string."""
    return (
        T(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.concat_ws(",", F.array_sort(F.collect_set("event_type"))).alias("types"))
    )


