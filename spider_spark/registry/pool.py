"""Scored resource pool (§2.E) over supplier — registry tier split out of the former
monolithic queries.py (round 4). Conventions live in
spider_spark/registry/__init__.py; enumeration order is preserved by
the import order there."""

from __future__ import annotations

from pyspark.sql import functions as F
from spider_spark import pool, textops
from spider_spark.registry._base import T, q


# =====================================================================
# Scored resource pool (§2.E) over supplier
# =====================================================================

def _pool_df(spark, sf_dir):
    """Deterministic pool from supplier: score = |floor(acctbal)| % 101."""
    return T(spark, sf_dir, "supplier").select(
        F.col("s_name").alias("proxy"),
        (F.abs(F.floor(F.col("s_acctbal"))) % 101).cast("int").alias("score"),
        "s_nationkey",
    )

_POOL_SQL = "(SELECT s_name AS proxy, (abs(floor(s_acctbal))::BIGINT % 101)::INT AS score, s_nationkey FROM supplier)"


@q(
    "pool_top_batch",
    f"""
    SELECT proxy, score, rank FROM (
      SELECT proxy, score, row_number() OVER (ORDER BY score DESC, proxy DESC)::INT AS rank
      FROM {_POOL_SQL} p)
    WHERE rank <= 20
    """,
)
def pool_top_batch(spark, sf_dir):
    """E5 ranked range scan (ProxyPool db.py:78-86 zrevrange)."""
    return pool.top_batch(_pool_df(spark, sf_dir).drop("s_nationkey"), 0, 20)


@q(
    "pool_decrease_evict",
    f"""
    SELECT proxy, (score - CASE WHEN s_nationkey IN (1,2,3) THEN 1 ELSE 0 END) AS score
    FROM {_POOL_SQL} p
    WHERE (score - CASE WHEN s_nationkey IN (1,2,3) THEN 1 ELSE 0 END) >= 0
    """,
)
def pool_decrease_evict(spark, sf_dir):
    """E3 score decay + eviction below MIN_SCORE (db.py:47-59: a failure
    at score 1 keeps the proxy AT 0; removal happens on the next failure)."""
    p = _pool_df(spark, sf_dir)
    failed = p.where(F.col("s_nationkey").isin(1, 2, 3)).select("proxy")
    return pool.decrease(p.drop("s_nationkey"), failed)


@q(
    "pool_pick_hash",
    f"""
    SELECT proxy, score FROM (
      SELECT proxy, score,
             row_number() OVER (
               ORDER BY {textops.hash60_sql("proxy || 'probe'")} DESC) AS rn
      FROM {_POOL_SQL} p
      WHERE score = (SELECT max(score) FROM {_POOL_SQL} q)
    ) WHERE rn = 1
    """,
)
def pool_pick_hash(spark, sf_dir):
    """E2 random-pick-preferring-max (ProxyPool db.py:32-38 RANDOMKEY among
    MAX_SCORE members) in its deterministic, oracle-able form: argmax of
    hash60(proxy||salt) within the max-score tier — uniform over that tier
    as the salt varies, identical in both engines for a fixed salt."""
    return pool.pick_hash(_pool_df(spark, sf_dir).drop("s_nationkey"), "probe")


@q(
    "pool_probe_cycle",
    f"""
    WITH p AS (SELECT proxy, score, s_nationkey FROM {_POOL_SQL} q),
    r AS (
      SELECT proxy, score, s_nationkey % 3 = 0 AS ok,
             row_number() OVER (ORDER BY score DESC, proxy DESC) AS rn
      FROM p)
    SELECT proxy,
           ((rn - 1) // 10)::INT AS batch_no,
           score::INT AS score_before,
           ok,
           CASE WHEN ok THEN 100
                WHEN score - 1 >= 0 THEN score - 1 END::INT AS score_after,
           (NOT ok AND score - 1 < 0) AS evicted
    FROM r
    """,
)
def pool_probe_cycle(spark, sf_dir):
    """E6 probe cycle (ProxyPool tester.py:17-61): deterministic probe
    outcomes (success iff 3 | s_nationkey) drive one full tester cycle —
    batch-of-10 zrevrange walk, promote(100) on success, decrease(−1) with
    evict-at-MIN on failure — as a single distributed pass
    (pool.probe_cycle). The oracle replays the cycle in closed form from
    the same supplier plant: ranked batching, both score transitions, and
    both eviction edges (score 1 failing → kept AT 0, the reference's
    keep-at-MIN; score 0 failing → evicted) are all value-checked."""
    p = _pool_df(spark, sf_dir)
    outcomes = p.select("proxy", (F.col("s_nationkey") % 3 == 0).alias("ok"))
    return pool.probe_cycle(p.drop("s_nationkey"), outcomes, batch_size=10)


