"""Driver-contract query registry: every operator claimed in SURVEY.md §2
(plus the training-data-pipeline tier) as a (Spark callable, DuckDB oracle
SQL) pair over the driver's parquet tables.

Contract (README / __spark_entry__.py): each Spark query and its oracle
produce identical row counts, schemas (column names), and order-insensitive
value hashes at sf0.01. Conventions that make cross-engine hashes match:

- every computed column aliased identically on both sides;
- money aggregates summed as DECIMAL (exact, order-independent) and cast to
  DOUBLE at the end;
- doubles from windowed float sums rounded to 6-9 places (segment-tree vs
  sequential summation differ in the last ulp);
- ratios derived only from exact integers (bit-identical division);
- all hashing via the shared md5-prefix hash60 (textops.hash60 /
  textops.hash60_sql);
- timestamps rendered with date_format/strftime to sidestep type gaps.

Queries whose semantics SQL cannot express (the iterative crawl, approximate
LSH ANN) return None oracles → the driver records rows-only checks — except
crawl_docs, whose BFS fixpoint IS expressible as a recursive CTE, giving the
crawl engine itself a full value-level oracle.
"""

from __future__ import annotations

import tempfile
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from spider_spark import dedup, graph, kline, media, parse, pool, textops, vectorops, webindex
from spider_spark.canon import canonical_col, host_col
from spider_spark.crawl import crawl
from spider_spark.pagerank import hits, pagerank, trustrank
from spider_spark.round import CrawlConfig
from spider_spark import tables as tbl


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def q(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn
    return deco


# =====================================================================
# Relational core (SURVEY.md §2.G) — scan/filter/project/join/agg/sort
# =====================================================================

@q(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           sum(CAST(l_quantity AS DECIMAL(18,2)))::DOUBLE AS sum_qty,
           sum(CAST(l_extendedprice AS DECIMAL(18,2)))::DOUBLE AS sum_base_price,
           sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,4)))::DOUBLE AS sum_disc_price,
           count(*) AS count_order
    FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: the partial+final agg Catalyst plans for free
    (reference's only aggregates are crash_callback.py:143-161 sums)."""
    li = T(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("sum_base_price"),
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1) - F.col("l_discount")).cast("decimal(18,4)")
            ).cast("double").alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@q(
    "q3_shipping_topk",
    """
    SELECT o_orderkey,
           sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,4)))::DOUBLE AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1997-01-01' AND l_shipdate > TIMESTAMP '1997-01-01'
    GROUP BY o_orderkey, o_orderdate
    ORDER BY sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,4))) DESC, o_orderkey
    LIMIT 10
    """,
)
def q3_shipping_topk(spark, sf_dir):
    """Join + agg + exact-decimal top-k. customer side is broadcast-small."""
    c = T(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = T(spark, sf_dir, "orders").where(F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    li = T(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > F.lit("1997-01-01").cast("timestamp"))
    rev = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1) - F.col("l_discount")).cast("decimal(18,4)")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.sum(rev).alias("_rev"))
        .orderBy(F.desc("_rev"), F.asc("o_orderkey"))
        .limit(10)
        .select(
            "o_orderkey",
            F.col("_rev").cast("double").alias("revenue"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
    )


@q(
    "q5_nation_revenue",
    """
    SELECT n_name,
           sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,4)))::DOUBLE AS revenue
    FROM customer JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON l_orderkey = o_orderkey
         JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
)
def q5_nation_revenue(spark, sf_dir):
    """TPC-H Q5 shape: multi-way join; dims broadcast, facts shuffle once."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = T(spark, sf_dir, "lineitem")
    s = T(spark, sf_dir, "supplier")
    n = T(spark, sf_dir, "nation")
    r = T(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    rev = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1) - F.col("l_discount")).cast("decimal(18,4)")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


@q(
    "rollup_order_priority",
    """
    SELECT coalesce(o_orderstatus, 'ALL') AS orderstatus,
           coalesce(o_orderpriority, 'ALL') AS orderpriority,
           count(*) AS n_orders,
           sum(CAST(o_totalprice AS DECIMAL(18,2)))::DOUBLE AS total
    FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def rollup_order_priority(spark, sf_dir):
    """Hierarchical totals (grouping-sets family — absent in the reference,
    listed in §2.G as a gap we fill)."""
    o = T(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total"),
        )
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("orderstatus"),
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("orderpriority"),
            "n_orders",
            "total",
        )
    )


@q(
    "anti_join_never_ordered",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    """,
)
def anti_join_never_ordered(spark, sf_dir):
    """LEFT ANTI JOIN — the exact shape of the frontier seen-set escape
    (SURVEY.md §2 A1: Redis-hit ⇒ drop; here: urgent-ordered ⇒ drop)."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders").where(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@q(
    "semi_join_active",
    """
    SELECT c_custkey, c_acctbal FROM customer
    WHERE c_acctbal > 5000
      AND EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def semi_join_active(spark, sf_dir):
    c = T(spark, sf_dir, "customer").where(F.col("c_acctbal") > 5000)
    o = T(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_acctbal")


@q(
    "except_segment",
    """
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_totalprice > 400000
    """,
)
def except_segment(spark, sf_dir):
    """Set difference (§2.G set ops — the reference only has $addToSet)."""
    a = T(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey")
    )
    b = T(spark, sf_dir, "orders").where(F.col("o_totalprice") > 400000).select(
        F.col("o_custkey").alias("c_custkey")
    )
    return a.subtract(b)


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
      SELECT proxy, score, row_number() OVER (ORDER BY score DESC, proxy)::INT AS rank
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
             row_number() OVER (ORDER BY score DESC, proxy) AS rn
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


# =====================================================================
# Rolling-window time series (§2.F) over events
# =====================================================================

@q(
    "rolling_mean_ma5",
    """
    SELECT event_id, user_id,
           CASE WHEN count(*) OVER w >= 5 THEN round(avg(value) OVER w, 6) END AS ma5
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
    """,
)
def rolling_mean_ma5(spark, sf_dir):
    """F1: MA5 (Kline_analyze.py:134), pandas NaN-until-full reproduced."""
    ev = T(spark, sf_dir, "events")
    w = kline.series_window()
    return ev.select(
        "event_id", "user_id", F.round(kline.rolling_mean(F.col("value"), w, 5), 6).alias("ma5")
    )


@q(
    "rolling_minmax",
    """
    SELECT event_id, user_id,
           CASE WHEN count(*) OVER w >= 10 THEN max(value) OVER w END AS hh,
           CASE WHEN count(*) OVER w >= 10 THEN min(value) OVER w END AS ll
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
    """,
)
def rolling_minmax(spark, sf_dir):
    """F4: HH/LL rolling extrema (Kline_analyze.py:155-158) — exact picks,
    bit-identical with no rounding."""
    ev = T(spark, sf_dir, "events")
    w = kline.series_window()
    return ev.select(
        "event_id", "user_id",
        kline.rolling_max(F.col("value"), w, 10).alias("hh"),
        kline.rolling_min(F.col("value"), w, 10).alias("ll"),
    )


@q(
    "crossover_signals",
    """
    WITH ma AS (
      SELECT event_id, user_id, ts,
             CASE WHEN count(*) OVER w3 >= 3 THEN avg(value) OVER w3 END AS f,
             CASE WHEN count(*) OVER w7 >= 7 THEN avg(value) OVER w7 END AS s
      FROM events
      WINDOW w3 AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
             w7 AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    ),
    lagged AS (
      SELECT event_id, user_id,
             CASE WHEN f > s THEN 1 ELSE 0 END AS above,
             lag(CASE WHEN f > s THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM ma)
    SELECT event_id, user_id,
           CASE WHEN prev IS NOT NULL AND above = 1 AND prev = 0 THEN 1
                WHEN prev IS NOT NULL AND above = 0 AND prev = 1 THEN 2
                ELSE 0 END AS signal
    FROM lagged
    """,
)
def crossover_signals(spark, sf_dir):
    """F2: gold/dead cross (Kline_analyze.py:136-139) over MA3/MA7."""
    ev = T(spark, sf_dir, "events")
    w = kline.series_window()
    fast = kline.rolling_mean(F.col("value"), w, 3)
    slow = kline.rolling_mean(F.col("value"), w, 7)
    return ev.select(
        "event_id", "user_id", kline.crossover(fast, slow, w).alias("signal")
    )


@q(
    "gold_cross_volume",
    """
    WITH k AS (SELECT event_id, user_id, ts, value AS close,
                      value - (event_id % 5) AS low,
                      1 + event_id % 97 AS volume
               FROM events),
    ma AS (SELECT *,
             CASE WHEN count(*) OVER w3 >= 3 THEN avg(close) OVER w3 END AS f,
             CASE WHEN count(*) OVER w7 >= 7 THEN avg(close) OVER w7 END AS s
           FROM k
           WINDOW w3 AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
                  w7 AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)),
    sg AS (SELECT *, CASE WHEN f > s THEN 1 ELSE 0 END AS above,
                  lag(CASE WHEN f > s THEN 1 ELSE 0 END)
                    OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
           FROM ma),
    s2 AS (SELECT user_id, low, volume,
                  CASE WHEN prev IS NOT NULL AND above = 1 AND prev = 0 THEN 1
                       WHEN prev IS NOT NULL AND above = 0 AND prev = 1 THEN 2
                       ELSE 0 END AS sign,
                  row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rnd
           FROM sg),
    s3 AS (SELECT *, min(CASE WHEN sign = 2 THEN rnd END) OVER (PARTITION BY user_id) AS drn,
                  max(CASE WHEN rnd = 1 THEN sign END) OVER (PARTITION BY user_id) AS last_sign
           FROM s2),
    s4 AS (SELECT *, (rnd <= drn) AS inwin FROM s3),
    s5 AS (SELECT *, min(CASE WHEN inwin THEN low END) OVER (PARTITION BY user_id) AS minlow FROM s4),
    s6 AS (SELECT *, max(CASE WHEN inwin AND low = minlow THEN rnd END) OVER (PARTITION BY user_id) AS mrn FROM s5),
    agg AS (SELECT user_id,
                   max(last_sign)::INT AS last_sign,
                   max(drn)::INT AS dead_rn,
                   sum(CASE WHEN inwin AND rnd > mrn THEN volume END)::BIGINT AS pre_sum,
                   count(CASE WHEN inwin AND rnd > mrn THEN 1 END)::BIGINT AS pre_cnt,
                   max(CASE WHEN rnd = mrn THEN volume END)::BIGINT AS vol_at
            FROM s6 GROUP BY user_id)
    SELECT user_id, last_sign, dead_rn,
           round(CASE WHEN dead_rn IS NOT NULL AND pre_cnt > 0
                      THEN (vol_at * pre_cnt)::DOUBLE / pre_sum::DOUBLE END, 6) AS ratio,
           CASE WHEN last_sign = 1 AND dead_rn IS NOT NULL AND pre_cnt > 0
                     AND (vol_at * pre_cnt)::DOUBLE / pre_sum::DOUBLE >= 2.5
                THEN 1 ELSE 0 END AS flag
    FROM agg
    """,
)
def gold_cross_volume(spark, sf_dir):
    """F2-composed (crash_callback.py:164-185): gold cross at the last bar +
    volume ≥ 2.5× the running mean since the latest dead cross, at the
    first minimum-low bar — the reference's only non-trivial window
    composition, VERDICT r01 item 6. Synthetic kline from events: close =
    value, low = value - (event_id % 5), volume = 1 + event_id % 97 (the
    ratio stays exact-integer-derived, bit-identical cross-engine)."""
    ev = T(spark, sf_dir, "events")
    k = ev.select(
        "event_id", "user_id", "ts",
        F.col("value").alias("close"),
        (F.col("value") - F.col("event_id") % 5).alias("low"),
        (F.lit(1) + F.col("event_id") % 97).alias("volume"),
    )
    return kline.gold_cross_volume(k, fast_n=3, slow_n=7, spike=2.5)


@q(
    "atr_true_range",
    """
    WITH k AS (SELECT event_id, user_id, ts, value + 1 AS high, value - 1 AS low, value AS close FROM events),
    tr AS (
      SELECT event_id, user_id, ts,
             greatest(close - low,
                      coalesce(abs(high - lag(close) OVER w), close - low),
                      coalesce(abs(low - lag(close) OVER w), close - low)) AS tr
      FROM k WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    SELECT event_id, user_id, round(tr, 6) AS tr,
           CASE WHEN count(*) OVER wr >= 5 THEN round(avg(tr) OVER wr, 6) END AS atr
    FROM tr
    WINDOW wr AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
    """,
)
def atr_true_range(spark, sf_dir):
    """F3: TR/ATR (Kline_analyze.py:150-154); synthetic high/low = value±1."""
    ev = T(spark, sf_dir, "events")
    w = kline.series_window()
    high, low, close = F.col("value") + 1, F.col("value") - 1, F.col("value")
    tr = kline.true_range(high, low, close, w)
    d = ev.select("event_id", "user_id", "ts", tr.alias("tr"))
    w2 = kline.series_window()
    return d.select(
        "event_id", "user_id",
        F.round(F.col("tr"), 6).alias("tr"),
        F.round(kline.rolling_mean(F.col("tr"), w2, 5), 6).alias("atr"),
    )


@q(
    "sessionize",
    """
    SELECT event_id, user_id,
           sum(CASE WHEN delta IS NULL OR delta > 1800 THEN 1 ELSE 0 END)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS session_no
    FROM (SELECT event_id, user_id, ts,
                 floor(epoch(ts))::BIGINT - lag(floor(epoch(ts))::BIGINT)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta
          FROM events)
    """,
)
def sessionize(spark, sf_dir):
    """Gap-based sessionization (30 min) — lag + conditional cumsum."""
    return kline.sessionize(T(spark, sf_dir, "events"), 1800).select(
        "event_id", "user_id", "session_no"
    )


# =====================================================================
# Scalar / parse operators (§2.C) over documents + events
# =====================================================================

@q(
    "ts_convert",
    """
    SELECT event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
           floor(epoch(ts))::BIGINT AS epoch_s,
           strftime(ts + 8 * INTERVAL 1 HOUR, '%Y-%m-%d %H:%M') AS ts_cn
    FROM events
    """,
)
def ts_convert(spark, sf_dir):
    """C9: epoch/ISO → formatted strings, +8h shift (抖音.py:37-40,
    Kline_analyze.py:40-43)."""
    ev = T(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
        F.unix_timestamp("ts").alias("epoch_s"),
        F.date_format(F.col("ts") + F.expr("INTERVAL 8 HOURS"), "yyyy-MM-dd HH:mm").alias("ts_cn"),
    )


_NOW = "2026-06-01 10:00:00"

@q(
    "relative_date_norm",
    f"""
    WITH r AS (
      SELECT event_id,
             CASE event_id % 4
               WHEN 0 THEN '刚刚'
               WHEN 1 THEN ((event_id % 59) + 1)::VARCHAR || '分钟前'
               WHEN 2 THEN '昨天'
               ELSE lpad(((event_id % 12) + 1)::VARCHAR, 2, '0') || '-' ||
                    lpad(((event_id % 28) + 1)::VARCHAR, 2, '0')
             END AS rel
      FROM events)
    SELECT event_id, rel,
           CASE
             WHEN rel = '刚刚' THEN strftime(TIMESTAMP '{_NOW}', '%Y-%m-%d %H:%M')
             WHEN rel LIKE '%分钟前' THEN strftime(
                TIMESTAMP '{_NOW}' - CAST(regexp_extract(rel, '(\\d+)', 1) AS BIGINT) * INTERVAL 1 MINUTE,
                '%Y-%m-%d %H:%M')
             WHEN rel = '昨天' THEN strftime(TIMESTAMP '{_NOW}' - INTERVAL 1 DAY, '%Y-%m-%d') || ' 00:00'
             ELSE '2026-' || rel || ' 00:00'
           END AS norm
    FROM r
    """,
)
def relative_date_norm(spark, sf_dir):
    """C8: '刚刚/N分钟前/昨天/MM-DD' → absolute '%Y-%m-%d %H:%M' strings
    (weibo/pipelines.py:24-38, with §2.H.6's 昨天 TypeError fixed), against
    a frozen now for determinism."""
    ev = T(spark, sf_dir, "events")
    rel = (
        F.when(F.col("event_id") % 4 == 0, F.lit("刚刚"))
        .when(F.col("event_id") % 4 == 1, F.concat(((F.col("event_id") % 59) + 1).cast("string"), F.lit("分钟前")))
        .when(F.col("event_id") % 4 == 2, F.lit("昨天"))
        .otherwise(
            F.concat(
                F.lpad(((F.col("event_id") % 12) + 1).cast("string"), 2, "0"),
                F.lit("-"),
                F.lpad(((F.col("event_id") % 28) + 1).cast("string"), 2, "0"),
            )
        )
    )
    d = ev.select("event_id", rel.alias("rel"))
    now = F.lit(_NOW).cast("timestamp")
    mins = F.regexp_extract(F.col("rel"), r"(\d+)", 1).cast("long")
    norm = (
        F.when(F.col("rel") == "刚刚", F.date_format(now, "yyyy-MM-dd HH:mm"))
        .when(
            F.col("rel").endswith("分钟前"),
            F.date_format(F.timestamp_seconds(F.unix_timestamp(now) - mins * 60), "yyyy-MM-dd HH:mm"),
        )
        .when(F.col("rel") == "昨天", F.concat(F.date_format(F.date_sub(now, 1), "yyyy-MM-dd"), F.lit(" 00:00")))
        .otherwise(F.concat(F.lit("2026-"), F.col("rel"), F.lit(" 00:00")))
    )
    return d.select("event_id", "rel", norm.alias("norm"))


@q(
    "json_projection",
    """
    SELECT event_id, CAST(props->>'k' AS BIGINT) AS k,
           CASE WHEN CAST(props->>'k' AS BIGINT) >= 50 THEN 'hi' ELSE 'lo' END AS bucket
    FROM events
    """,
)
def json_projection(spark, sf_dir):
    """C7: json.loads + field-map projection (weibo/spiders/weibocn.py:31-43)
    → from_json + select."""
    ev = T(spark, sf_dir, "events")
    parsed = ev.select(
        "event_id", F.from_json("props", "k long").alias("p")
    )
    return parsed.select(
        "event_id",
        F.col("p.k").alias("k"),
        F.when(F.col("p.k") >= 50, F.lit("hi")).otherwise(F.lit("lo")).alias("bucket"),
    )


@q(
    "weibo_field_map",
    """
    WITH j AS (
      SELECT event_id,
             '{"id": ' || user_id || ', "screen_name": "u' || user_id
               || '", "verified": ' || CASE WHEN user_id % 2 = 0 THEN 'true' ELSE 'false' END
               || ', "followers_count": ' || (event_id % 1000)
               || ', "statuses_count": ' || (event_id % 500) || '}' AS payload
      FROM events)
    SELECT event_id,
           CAST(payload->>'id' AS BIGINT) AS uid,
           payload->>'screen_name' AS nickname,
           CAST(payload->>'verified' AS BOOLEAN) AS verified,
           CAST(payload->>'followers_count' AS BIGINT) AS fans,
           CAST(payload->>'statuses_count' AS BIGINT) AS weibos
    FROM j
    """,
)
def weibo_field_map(spark, sf_dir):
    """C7 at full depth: the weibo user field_map projection
    (weibo/spiders/weibocn.py:31-43) — from_json + rename-select over JSON
    synthesized identically on both engines."""
    ev = T(spark, sf_dir, "events")
    payload = F.concat(
        F.lit('{"id": '), F.col("user_id").cast("string"),
        F.lit(', "screen_name": "u'), F.col("user_id").cast("string"),
        F.lit('", "verified": '),
        F.when(F.col("user_id") % 2 == 0, F.lit("true")).otherwise(F.lit("false")),
        F.lit(', "followers_count": '), (F.col("event_id") % 1000).cast("string"),
        F.lit(', "statuses_count": '), (F.col("event_id") % 500).cast("string"),
        F.lit("}"),
    )
    j = ev.select("event_id", payload.alias("payload"))
    projected = j.select("event_id", *parse.project_weibo_user(F.col("payload")))
    return projected.select("event_id", "uid", "nickname", "verified", "fans", "weibos")


_CITIES = ["北京", "上海", "广州", "深圳", "成都", "武汉", "杭州", "南京", "天津", "苏州"]
_PINYIN = ["beijing", "shanghai", "guangzhou", "shenzhen", "chengdu",
           "wuhan", "hangzhou", "nanjing", "tianjin", "suzhou"]


@q(
    "pinyin_city_urls",
    "SELECT doc_id, CASE doc_id % 10 "
    + " ".join(
        f"WHEN {i} THEN '{c}'" for i, c in enumerate(_CITIES)
    )
    + " END AS city, 'https://hotel.meituan.com/' || CASE doc_id % 10 "
    + " ".join(
        f"WHEN {i} THEN '{p}'" for i, p in enumerate(_PINYIN)
    )
    + " END || '/' AS url FROM documents",
)
def pinyin_city_urls(spark, sf_dir):
    """C12: the reference's pinyin city-URL synthesis
    (Meituan/spiders/meituan.py:42 ``'https://hotel.meituan.com/' +
    ''.join(lazy_pinyin(city)) + '/'``) — transliteration via the built-in
    city table (pypinyin takes over when installed; readings here are
    single-valued so both paths agree). Oracle maps city → pinyin
    explicitly."""
    from spider_spark import textops

    d = T(spark, sf_dir, "documents")
    city = F.element_at(
        F.array(*[F.lit(c) for c in _CITIES]), (F.col("doc_id") % 10 + 1).cast("int")
    )
    py = textops.transliterate_udf()(city)
    return d.select(
        "doc_id", city.alias("city"),
        F.concat(F.lit("https://hotel.meituan.com/"), py, F.lit("/")).alias("url"),
    )


@q(
    "sql_ddl_roundtrip",
    """
    SELECT doc_id, upper(source) AS src_up, n_chars
    FROM documents WHERE doc_id < 100
    """,
)
def sql_ddl_roundtrip(spark, sf_dir):
    """D6: SQL DDL + INSERT + read-back through the session catalog — the
    reference's MySQL table-create/insert sinks (拉钩 position tables;
    Meituan pipelines) as Spark SQL DDL over a parquet-backed catalog
    table. Exercises the pure-SQL API surface end-to-end: CREATE TEMP VIEW
    → CREATE TABLE USING parquet → INSERT OVERWRITE → SELECT."""
    spark.sql(
        "CREATE OR REPLACE TEMP VIEW _docs_v AS "
        f"SELECT * FROM parquet.`{sf_dir}/documents.parquet`"
    )
    loc = tempfile.mkdtemp(prefix="ddl_roundtrip_")
    spark.sql("DROP TABLE IF EXISTS lagou_positions")
    spark.sql(
        "CREATE TABLE lagou_positions (doc_id BIGINT, src_up STRING, n_chars BIGINT) "
        f"USING parquet LOCATION '{loc}/lagou_positions'"
    )
    spark.sql(
        "INSERT OVERWRITE TABLE lagou_positions "
        "SELECT doc_id, upper(source), n_chars FROM _docs_v WHERE doc_id < 100"
    )
    return spark.sql("SELECT doc_id, src_up, n_chars FROM lagou_positions")


_ZHIHU_ORACLE = """
    SELECT 'u' || doc_id::VARCHAR AS url_token,
           source || '-n' AS name,
           CASE WHEN doc_id % 2 = 0 THEN n_chars + 7 ELSE n_chars END AS answer_count,
           2::INT AS n_educations,
           'S' || (doc_id % 7)::VARCHAR AS first_school,
           '城市' || (doc_id % 13)::VARCHAR AS location0,
           'C' || (doc_id % 17)::VARCHAR AS company0,
           CASE WHEN doc_id % 2 = 0
                THEN (doc_id + 1)::VARCHAR || ',' || (doc_id + 2)::VARCHAR || ',' || (doc_id + 3)::VARCHAR
                ELSE (doc_id + 1)::VARCHAR || ',' || (doc_id + 2)::VARCHAR END AS follows
    FROM documents
"""


@q("zhihu_user_items", _ZHIHU_ORACLE)
def zhihu_user_items(spark, sf_dir):
    """The nested-array item family end-to-end (VERDICT r01 item 7):
    zhihuuser items.py:86-91 carries locations/educations/employments as
    raw JSON arrays-of-objects and zhihu.py:51-65 copy-projects every
    matching field; weibo/pipelines.py:74-82 merges relation arrays with
    $addToSet/$each and upserts scalars by id.

    Spark shape: synthesize two observation rounds of the user JSON per
    doc, parse ONCE with from_json into ArrayType(StructType) columns (C7,
    fully JVM-side), then D2 latest-wins window for scalars + D3 addToSet
    (flatten → array_distinct → array_sort) for the follows relation. The
    oracle reconstructs every planted value straight from documents."""
    did = F.col("doc_id")
    answer = F.when(F.col("round") == 2, F.col("n_chars") + 7).otherwise(F.col("n_chars"))
    follows = F.when(
        F.col("round") == 2,
        F.concat((did + 2).cast("string"), F.lit(","), (did + 3).cast("string")),
    ).otherwise(F.concat((did + 1).cast("string"), F.lit(","), (did + 2).cast("string")))
    js = F.concat(
        F.lit('{"url_token":"u'), did.cast("string"),
        F.lit('","name":"'), F.col("source"), F.lit('-n"'),
        F.lit(',"answer_count":'), answer.cast("string"),
        F.lit(',"gender":'), (did % 3).cast("string"),
        F.lit(',"locations":[{"name":"城市'), (did % 13).cast("string"), F.lit('"}]'),
        F.lit(',"educations":[{"school":"S'), (did % 7).cast("string"),
        F.lit('","major":"M'), (did % 5).cast("string"),
        F.lit('"},{"school":"S'), (did % 11).cast("string"),
        F.lit('","major":"M'), (did % 3).cast("string"), F.lit('"}]'),
        F.lit(',"employments":[{"company":"C'), (did % 17).cast("string"),
        F.lit('","job":"J'), (did % 5).cast("string"), F.lit('"}]'),
        F.lit(',"follows":['), follows, F.lit("]}"),
    )
    obs = (
        T(spark, sf_dir, "documents")
        .select("doc_id", "source", "n_chars", F.explode(F.array(F.lit(1), F.lit(2))).alias("round"))
        # round 2 re-observes only even users — odd users keep round-1 state
        .where((F.col("round") == 1) | (did % 2 == 0))
        .withColumn("js", js)
    )
    schema = (
        "url_token string, name string, answer_count long, gender long, "
        "locations array<struct<name:string>>, "
        "educations array<struct<school:string,major:string>>, "
        "employments array<struct<company:string,job:string>>, "
        "follows array<long>"
    )
    p = obs.select("round", F.from_json("js", schema).alias("u")).select("round", "u.*")
    w = Window.partitionBy("url_token").orderBy(F.desc("round"))
    latest = (
        p.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            "url_token", "name", "answer_count",
            F.size("educations").alias("n_educations"),
            F.col("educations")[0]["school"].alias("first_school"),
            F.col("locations")[0]["name"].alias("location0"),
            F.col("employments")[0]["company"].alias("company0"),
        )
    )
    add_to_set = p.groupBy("url_token").agg(
        F.array_join(
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("follows")))), ","
        ).alias("follows")
    )
    return latest.join(add_to_set, "url_token")


@q(
    "md5_ids",
    f"""
    SELECT doc_id, md5(text) AS text_md5, {textops.hash60_sql('text')} AS h60
    FROM documents
    """,
)
def md5_ids(spark, sf_dir):
    """C14: _id = md5(content) (mongo_redis_mgr.py:49) + the shared 60-bit
    integer hash used by the seen-set/minhash family."""
    d = T(spark, sf_dir, "documents")
    return d.select("doc_id", F.md5("text").alias("text_md5"), textops.hash60(F.col("text")).alias("h60"))


@q(
    "regex_extract_scan",
    """
    SELECT doc_id,
           len(regexp_extract_all(text, '[a-z]*an[a-z]*'))::INT AS n_matches,
           coalesce(regexp_extract_all(text, '[a-z]*an[a-z]*')[1], '') AS first_match
    FROM documents
    """,
)
def regex_extract_scan(spark, sf_dir):
    """C4/C5: regex findall link/field discovery (client_crawler.py:139,
    lagou.py:29-36) as builtin regexp_extract_all."""
    d = T(spark, sf_dir, "documents")
    m = F.regexp_extract_all(F.col("text"), F.lit("[a-z]*an[a-z]*"), 0)
    return d.select(
        "doc_id",
        F.size(m).alias("n_matches"),
        F.coalesce(F.try_element_at(m, F.lit(1)), F.lit("")).alias("first_match"),
    )


def _html_escape(col):
    """&/</> escaping for planted HTML text (order matters: & first)."""
    c = F.replace(col, F.lit("&"), F.lit("&amp;"))
    c = F.replace(c, F.lit("<"), F.lit("&lt;"))
    return F.replace(c, F.lit(">"), F.lit("&gt;"))


def _qcc_expected_cols():
    """The planted qcc field values, as Spark exprs over documents columns.
    The oracle SQL reproduces these verbatim — the query output itself comes
    ONLY from DOM extraction, so a green hash proves extraction == planted."""
    did = F.col("doc_id")
    return {
        "company_name": F.concat(
            F.lit("公司"), did.cast("string"), F.lit(" & <"), F.col("source"), F.lit(">")
        ),
        "registered_capital": F.concat(F.col("n_chars").cast("string"), F.lit("万元")),
        "contributed_capital": F.concat(
            (F.col("n_chars") * 2).cast("string"), F.lit("万元")
        ),
        "management_forms": F.when(F.col("lang") == "en", F.lit("存续")).otherwise(
            F.lit("注销")
        ),
        "established_data": F.concat(
            (F.lit(1990) + did % 30).cast("string"),
            F.lit("-0"), (F.lit(1) + did % 9).cast("string"), F.lit("-11"),
        ),
        "credit_code": F.concat(
            F.lit("91"), F.lpad(did.cast("string"), 12, "0"), F.lit("XG")
        ),
        "address": F.concat(F.col("source"), F.lit("市"), F.substring("text", 1, 12)),
        "business_scope": F.concat(
            F.substring("text", 1, 20), F.lit(" & <"), F.col("source"), F.lit(">")
        ),
    }


_QCC_ORACLE = """
    SELECT doc_id,
           '公司' || doc_id::VARCHAR || ' & <' || source || '>' AS company_name,
           n_chars::VARCHAR || '万元' AS registered_capital,
           (n_chars * 2)::VARCHAR || '万元' AS contributed_capital,
           CASE WHEN lang = 'en' THEN '存续' ELSE '注销' END AS management_forms,
           (1990 + doc_id % 30)::VARCHAR || '-0' || (1 + doc_id % 9)::VARCHAR || '-11' AS established_data,
           '91' || lpad(doc_id::VARCHAR, 12, '0') || 'XG' AS credit_code,
           source || '市' || substr(text, 1, 12) AS address,
           substr(text, 1, 20) || ' & <' || source || '>' AS business_scope
    FROM documents
"""


@q("qcc_xpath_fields", _QCC_ORACLE)
def qcc_xpath_fields(spark, sf_dir):
    """C1/C2 structural parity: the reference's exact lxml XPath family
    (qcc.py:52-59 — ``//div[@class="row title"]/h1`` + 7×
    ``//table[@class="ntable"]//tr/td[contains(text(),"<label>")]/
    following-sibling::td[1]``) evaluated by the from-scratch DOM engine
    (dom.py) over deliberately MESSY html built from documents columns:
    mixed-case tags, attribute noise on the label cells, unclosed <tr>/<td>,
    entity-encoded values (& < >), a trailing <span> after the value text,
    and a decoy non-ntable table carrying the same labels with wrong values
    — every one of which defeats the round-1 regex surface. Output columns
    come ONLY from extraction; the oracle reconstructs the planted values
    from the raw columns."""
    exp = _qcc_expected_cols()
    esc = {k: _html_escape(v) for k, v in exp.items()}
    html = F.concat(
        F.lit('<HTML><Head><meta charset="utf-8"></head><BODY>'
              '<div class="decoy"><table class="other" width="50%">'
              "<tr><td>注册资本：</td><td>DECOY</td></tr></table></div>"
              '<div class="row title"><h1>'),
        esc["company_name"],
        F.lit('</h1><span class="tag">core</span></div>'
              '<div id="info"><TABLE width="100%" class="ntable">'
              '<tr><td width="20%">注册资本：</td><td>'),
        esc["registered_capital"],
        F.lit('<span class="tip">?</span><td class="lb">实缴资本：</td><td>'),
        esc["contributed_capital"],
        F.lit("<tr><td>经营状态：</td><td>"),
        esc["management_forms"],
        F.lit("</td><td>成立日期：</td><td>"),
        esc["established_data"],
        F.lit("</td></tr><tr><td>统一社会信用代码：</td><td>"),
        esc["credit_code"],
        F.lit("<tr><td>企业地址：</td><td>"),
        esc["address"],
        F.lit("<tr><td>经营范围：</td><td>"),
        esc["business_scope"],
        F.lit("</TABLE></div></BODY></html>"),
    )
    d = T(spark, sf_dir, "documents").select(
        "doc_id", F.encode(html, "UTF-8").alias("html")
    )
    fields = [(n, x) for n, x in parse.QCC_XPATH_FIELDS]
    p = parse.xpath_fields_udf(fields)(F.col("html"))
    return d.select("doc_id", p.alias("p")).select(
        "doc_id", *[F.col(f"p.{n}").alias(n) for n, _ in fields]
    )


_CSS_ORACLE = """
    SELECT doc_id,
           (doc_id % 223)::VARCHAR || '.' || ((doc_id * 7) % 256)::VARCHAR || '.' ||
           ((doc_id * 13) % 256)::VARCHAR || '.' || (1 + doc_id % 254)::VARCHAR AS ip,
           (1024 + doc_id % 48000)::VARCHAR AS port,
           lang AS proto
    FROM documents
"""


@q("css_select_fields", _CSS_ORACLE)
def css_select_fields(spark, sf_dir):
    """C3 pyquery parity: ProxyPool/proxypool/crawler.py:50-67,81 —
    ``td:nth-child(1)`` / ``td:nth-child(2)`` over an #ip_list table with a
    header row, ``.tbBottomLine:nth-child(1)``, and the ``find('p').remove()
    `` pre-strip (the ip cell carries a decoy <p> the way kuaidaili pages
    do). CSS evaluated by the from-scratch engine; oracle reconstructs the
    planted values."""
    did = F.col("doc_id")
    ip = F.concat(
        (did % 223).cast("string"), F.lit("."), ((did * 7) % 256).cast("string"),
        F.lit("."), ((did * 13) % 256).cast("string"), F.lit("."),
        (F.lit(1) + did % 254).cast("string"),
    )
    port = (F.lit(1024) + did % 48000).cast("string")
    html = F.concat(
        F.lit('<html><body><table id="ip_list" class="table">'
              "<tr><th>IP</th><th>PORT</th></tr><tr><td>"),
        ip,
        F.lit('<p class="tip">辅助</p></td><td>'),
        port,
        F.lit('</td></tr></table><div class="row"><span class="tbBottomLine">'),
        F.col("lang"),
        F.lit('</span><span class="tbBottomLine">x</span></div></body></html>'),
    )
    d = T(spark, sf_dir, "documents").select(
        "doc_id", F.encode(html, "UTF-8").alias("html")
    )
    p = parse.css_fields_udf(
        [
            ("ip", "#ip_list tr:nth-child(2) td:nth-child(1)"),
            ("port", "#ip_list tr:nth-child(2) td:nth-child(2)"),
            ("proto", "div.row .tbBottomLine:nth-child(1)"),
        ],
        strip="p",
    )(F.col("html"))
    return d.select("doc_id", p.alias("p")).select(
        "doc_id", F.col("p.ip").alias("ip"), F.col("p.port").alias("port"),
        F.col("p.proto").alias("proto"),
    )


_ANCHOR_ORACLE = """
    WITH links AS (
      SELECT doc_id,
             'https://h' || ((doc_id * 3 + j) % 20)::VARCHAR ||
             '.example.com/p/' || ((doc_id * 7 + j) % 97)::VARCHAR AS target,
             substr(text, 1 + 5 * j, 6) AS anchor
      FROM documents, (SELECT unnest([0, 1, 2]) AS j)
    )
    SELECT target,
           count(*)::BIGINT AS n_links,
           count(DISTINCT doc_id)::BIGINT AS n_src_docs,
           array_to_string((list_sort(list(DISTINCT anchor)))[1:50], '|') AS anchor_texts
    FROM links GROUP BY target
"""


@q("anchor_text_agg", _ANCHOR_ORACLE)
def anchor_text_agg(spark, sf_dir):
    """Anchor-text corpus op: extract every (href, anchor-text) pair from
    the DOM and aggregate the per-target link-context profile — inlink
    count, distinct linking docs, and the (capped, sorted) distinct anchor
    texts. The standard web-corpus signal built from crawl link structure
    (anchor text describes the TARGET page; used for ranking features and
    query-doc training pairs).

    Each doc plants three anchors whose text is an escaped slice of the
    doc's own text (entities round-trip through the DOM), plus a decoy
    href-less ``<a name=...>`` and an empty-href anchor that extraction
    must drop; output is built ONLY from extraction, the oracle replants
    from raw columns.

    Scale shape: extraction is an Arrow-batched map (no shuffle); the
    profile is webindex.anchor_profile's salted TWO-stage aggregation —
    bench_skew measured the naive one-shuffle groupBy at 1.8-2.2× wall
    under a 6%-hot-dst Zipf graph (collect_set state is unbounded before
    the shuffle; countDistinct expands), while the salted plan bounds
    per-reducer state at ≤50 anchors × n_salt at ANY in-degree and stays
    exactly equal to the naive result (see anchor_profile's proof)."""
    did = F.col("doc_id")

    def target(j):
        return F.concat(
            F.lit("https://h"), ((did * 3 + j) % 20).cast("string"),
            F.lit(".example.com/p/"), ((did * 7 + j) % 97).cast("string"),
        )

    def anchor(j):
        return _html_escape(F.substring("text", 1 + 5 * j, 6))

    html = F.concat(
        F.lit('<html><body><nav><a name="top">skip me</a><a href="">empty</a></nav>'),
        F.lit('<p><a href="'), target(0), F.lit('">'), anchor(0), F.lit("</a> "),
        F.lit('<a href="'), target(1), F.lit('">'), anchor(1), F.lit("</a></p>"),
        F.lit('<div><a href="'), target(2), F.lit('"><b>'), anchor(2),
        F.lit("</b></a></div></body></html>"),
    )
    d = T(spark, sf_dir, "documents").select(
        "doc_id", F.encode(html, "UTF-8").alias("html")
    )
    pair = F.explode(parse.anchor_pairs_udf()(F.col("html"))).alias("pair")
    pairs = d.select("doc_id", pair).select(
        "doc_id", F.col("pair.href").alias("target"),
        F.col("pair.anchor").alias("anchor"),
    )
    prof = webindex.anchor_profile(pairs, n_anchors=50)
    return prof.select(
        "target", "n_links", "n_src_docs",
        # Serialized (not ARRAY) because the driver's pandas-based
        # canonicalizer cannot hash list cells (CORRECTNESS_r02 err);
        # the array form stays exercised in tests/test_webindex.
        F.concat_ws("|", "anchor_texts").alias("anchor_texts"),
    )


@q(
    "string_cleanup",
    """
    SELECT doc_id,
           list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '')[1] AS first_word,
           length(replace(' ' || text || ' ', ' the ', ' '))::INT AS len_nothe,
           trim(upper(substr(text, 1, 10))) AS head_up
    FROM documents
    """,
)
def string_cleanup(spark, sf_dir):
    """C11: strip/split/replace chains (client_crawler.py:97, meituan.py:74)."""
    d = T(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.element_at(textops.tokens_col(F.col("text")), 1).alias("first_word"),
        F.length(F.replace(F.concat(F.lit(" "), F.col("text"), F.lit(" ")), F.lit(" the "), F.lit(" "))).alias("len_nothe"),
        F.trim(F.upper(F.substring(F.col("text"), 1, 10))).alias("head_up"),
    )


@q(
    "url_normalize",
    """
    SELECT doc_id,
           'https://' || lower(source) || '.example.com/Doc/' || doc_id || '?q=1' AS url_canon,
           lower(source) || '.example.com' AS host
    FROM documents
    """,
)
def url_normalize(spark, sf_dir):
    """C6: URL canonicalization (canon.py): lowercase scheme+host, drop
    default :443, strip #fragment, keep path case + query. The oracle states
    the expected output directly; the Spark side derives it through
    parse_url — a real parity check of the canonicalizer."""
    d = T(spark, sf_dir, "documents")
    raw = F.concat(
        F.lit("HTTPS://"), F.upper("source"), F.lit(".Example.COM:443/Doc/"),
        F.col("doc_id").cast("string"), F.lit("?q=1#frag"),
    )
    return d.select(
        "doc_id",
        canonical_col(raw).alias("url_canon"),
        host_col(raw).alias("host"),
    )


@q(
    "robots_filter",
    """
    WITH u AS (
      SELECT doc_id,
             '/' || (CASE WHEN doc_id % 3 = 0 THEN 'private' ELSE 'p' END)
                 || '/' || doc_id AS path
      FROM documents)
    SELECT doc_id, path,
           CASE WHEN path LIKE '/private%' THEN 'denied' ELSE 'allowed' END AS verdict
    FROM u
    """,
)
def robots_filter(spark, sf_dir):
    """A13: robots deny filter — the engine's RFC 9309 longest-match
    verdict (robots.denied_col over compiled rules, the exact expression
    run_round applies against the broadcast host_policy) on synthetic
    paths. With a single prefix deny rule and no allow rules, longest-match
    reduces to the prefix test the oracle states."""
    from spider_spark import robots as R

    d = T(spark, sf_dir, "documents")
    path = F.concat(
        F.lit("/"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("private")).otherwise(F.lit("p")),
        F.lit("/"), F.col("doc_id").cast("string"),
    )
    rules = [R.compile_rule("/private")]
    deny_rules = F.array(*[
        F.struct(F.lit(c["prefix"]).alias("prefix"),
                 F.lit(c["re"]).cast("string").alias("re"),
                 F.lit(c["ln"]).alias("ln"))
        for c in rules
    ])
    allow_rules = F.array().cast(R.RULES_TYPE)
    u = d.select("doc_id", path.alias("path"))
    denied = R.denied_col(F.col("path"), allow_rules, deny_rules)
    return u.select(
        "doc_id", "path",
        F.when(denied, F.lit("denied")).otherwise(F.lit("allowed")).alias("verdict"),
    )


@q(
    "robots_wildcard_match",
    """
    WITH u AS (
      SELECT doc_id,
             CASE doc_id % 4
                  WHEN 0 THEN '/cgi/' || doc_id::VARCHAR || '.php'
                  WHEN 1 THEN '/pub/' || doc_id::VARCHAR || '.php'
                  WHEN 2 THEN '/pub/files/' || doc_id::VARCHAR
                  ELSE '/open/' || doc_id::VARCHAR END AS path
      FROM documents),
    m AS (
      SELECT doc_id, path,
             greatest(
               CASE WHEN regexp_matches(path, '^/.*\\.php$') THEN 7 ELSE 0 END,
               CASE WHEN path LIKE '/pub/files%' THEN 10 ELSE 0 END) AS deny_len,
             greatest(
               CASE WHEN regexp_matches(path, '^/pub/.*\\.php$') THEN 11 ELSE 0 END,
               CASE WHEN path LIKE '/open%' THEN 5 ELSE 0 END) AS allow_len
      FROM u)
    SELECT doc_id, path,
           CASE WHEN deny_len > allow_len THEN 'denied' ELSE 'allowed' END AS verdict
    FROM m
    """,
)
def robots_wildcard_match(spark, sf_dir):
    """A13, RFC 9309 §2.2.2-2.2.3 wildcard + longest-match verdicts through
    the REAL engine path: raw Allow/Disallow patterns → compile_policy
    (pandas-compiled prefix/regex/length structs) → denied_col (the JVM
    expression run_round uses). Rules: deny ['/*.php$', '/pub/files'],
    allow ['/pub/*.php$', '/open'] — exercising wildcard deny beaten by a
    longer wildcard allow, literal-prefix deny, and no-match default. The
    oracle independently hand-compiles each rule to DuckDB regex/LIKE with
    its octet length and replays the longest-match comparison."""
    from spider_spark import robots as R

    d = T(spark, sf_dir, "documents")
    did = F.col("doc_id")
    path = (
        F.when(did % 4 == 0, F.concat(F.lit("/cgi/"), did.cast("string"), F.lit(".php")))
        .when(did % 4 == 1, F.concat(F.lit("/pub/"), did.cast("string"), F.lit(".php")))
        .when(did % 4 == 2, F.concat(F.lit("/pub/files/"), did.cast("string")))
        .otherwise(F.concat(F.lit("/open/"), did.cast("string")))
    )
    pol = spark.createDataFrame(
        [("h", 1.0, ["/pub/*.php$", "/open"], ["/*.php$", "/pub/files"], -1)],
        "host string, crawl_delay double, robots_allow array<string>, "
        "robots_deny array<string>, host_budget int",
    )
    u = d.select("doc_id", path.alias("path"), F.lit("h").alias("host"))
    j = u.join(F.broadcast(R.compile_policy(pol)), "host")
    denied = R.denied_col(F.col("path"), F.col("allow_rules"), F.col("deny_rules"))
    return j.select(
        "doc_id", "path",
        F.when(denied, F.lit("denied")).otherwise(F.lit("allowed")).alias("verdict"),
    )


_ROBOTS_ORACLE = """
    SELECT doc_id,
           CASE doc_id % 4 WHEN 0 THEN 10.0 WHEN 1 THEN 2.5 ELSE 5.0 END AS crawl_delay,
           CASE doc_id % 4
                WHEN 1 THEN '/a' || doc_id::VARCHAR
                WHEN 2 THEN '/ok'
                ELSE '' END AS allow,
           CASE doc_id % 4
                WHEN 0 THEN '/private/'
                WHEN 1 THEN '/d' || doc_id::VARCHAR
                ELSE '' END AS deny
    FROM documents
"""


@q("robots_policy_parse", _ROBOTS_ORACLE)
def robots_policy_parse(spark, sf_dir):
    """A13 bootstrap: parse robots.txt BODIES into the host-policy table
    (robots.py — RFC 9309 subset: group selection with agent-over-*
    precedence, Allow/Disallow prefixes, Crawl-delay, comments, case
    mixing, empty-Disallow). Four planted body shapes: star-only group,
    specific-beats-star, messy casing/comments, empty file ⇒ defaults.
    Oracle reconstructs the expected policy per shape."""
    from spider_spark import robots as R

    did = F.col("doc_id")
    body = (
        F.when(did % 4 == 0, F.lit(
            "# generic\nUser-agent: *\nDisallow: /private/\nCrawl-delay: 10\n"))
        .when(did % 4 == 1, F.concat(
            F.lit("User-agent: *\nDisallow: /all/\n\nUser-agent: spider\nAllow: /a"),
            did.cast("string"),
            F.lit("\nDisallow: /d"), did.cast("string"),
            F.lit("\nCrawl-delay: 2.5\n")))
        .when(did % 4 == 2, F.lit(
            "# messy\nUSER-AGENT: SPIDER\nDisallow:\nAllow: /ok  # inline\n"))
        .otherwise(F.lit(""))
    )
    d = T(spark, sf_dir, "documents").select(
        "doc_id", F.concat(F.lit("h"), did.cast("string")).alias("host"),
        body.alias("robots_txt"),
    )
    pol = R.policy_from_robots(d, agent="spider")
    return d.select("doc_id", "host").join(pol, "host").select(
        "doc_id", "crawl_delay",
        F.array_join("robots_allow", ",").alias("allow"),
        F.array_join("robots_deny", ",").alias("deny"),
    )


_SITEMAP_ORACLE = """
    SELECT doc_id,
           'https://s' || (doc_id % 7)::VARCHAR || '.example.com/p/' || doc_id::VARCHAR AS url,
           (1990 + doc_id % 30)::VARCHAR || '-06-15' AS lastmod
    FROM documents
    UNION ALL
    SELECT doc_id,
           'https://s' || (doc_id % 7)::VARCHAR || '.example.com/q?a=' || doc_id::VARCHAR
             || '&b=' || (doc_id % 9)::VARCHAR AS url,
           NULL AS lastmod
    FROM documents
"""


@q("sitemap_seeds", _SITEMAP_ORACLE)
def sitemap_seeds(spark, sf_dir):
    """Sitemap ingestion (sitemaps.org urlset) → seed rows: two <url>
    entries per doc — one with <lastmod>, one with an entity-escaped query
    URL (&amp; must come back decoded) plus whitespace padding inside
    <loc>. Parsed by the DOM engine via sitemap.sitemap_entries_udf; the
    oracle reconstructs the planted values."""
    from spider_spark import sitemap as S

    did = F.col("doc_id")
    u1 = F.concat(F.lit("https://s"), (did % 7).cast("string"),
                  F.lit(".example.com/p/"), did.cast("string"))
    lastmod = F.concat((F.lit(1990) + did % 30).cast("string"), F.lit("-06-15"))
    u2_esc = F.concat(F.lit("https://s"), (did % 7).cast("string"),
                      F.lit(".example.com/q?a="), did.cast("string"),
                      F.lit("&amp;b="), (did % 9).cast("string"))
    xml = F.concat(
        F.lit('<?xml version="1.0"?><urlset><url><loc>'), u1,
        F.lit("</loc><lastmod>"), lastmod, F.lit("</lastmod></url>"),
        F.lit("<url><loc> "), u2_esc, F.lit(" </loc></url></urlset>"),
    )
    d = T(spark, sf_dir, "documents").select(
        "doc_id", F.encode(xml, "UTF-8").alias("sitemap_xml")
    )
    e = F.explode(S.sitemap_entries_udf()(F.col("sitemap_xml"))).alias("e")
    return d.select("doc_id", e).select(
        "doc_id", F.col("e.loc").alias("url"), F.col("e.lastmod").alias("lastmod")
    )


@q(
    "pagination_explode",
    """
    SELECT doc_id,
           'https://' || lower(source) || '.example.com/list?page=' || p AS page_url
    FROM documents, LATERAL unnest(generate_series(1, (doc_id % 5) + 1)) t(p)
    """,
)
def pagination_explode(spark, sf_dir):
    """B5: page-number pagination = URL synthesis via sequence + explode
    (scrapyseleniumtest taobao.py:13-17's page loop, declaratively)."""
    d = T(spark, sf_dir, "documents")
    pages = F.explode(F.sequence(F.lit(1), (F.col("doc_id") % 5 + 1).cast("int")))
    return d.select("doc_id", "source", pages.alias("p")).select(
        "doc_id",
        F.concat(
            F.lit("https://"), F.lower("source"), F.lit(".example.com/list?page="),
            F.col("p").cast("string"),
        ).alias("page_url"),
    )


@q(
    "retry_budget",
    """
    SELECT event_id,
           CASE WHEN event_type != 'error' THEN 'done'
                WHEN (event_id % 3) + 1 >= 2 THEN 'failed'
                ELSE 'new' END AS status,
           CASE WHEN event_type = 'error' THEN (event_id % 3) + 1 ELSE 0 END AS attempt
    FROM events
    """,
)
def retry_budget(spark, sf_dir):
    """B6: retry-then-fail routing (MAX_PAGE_TRIED=2, client_crawler.py:362)
    — the same when-chain run_round uses for status updates."""
    ev = T(spark, sf_dir, "events")
    attempt = (F.col("event_id") % 3) + 1
    is_err = F.col("event_type") == "error"
    return ev.select(
        "event_id",
        F.when(~is_err, F.lit("done"))
        .when(attempt >= 2, F.lit("failed"))
        .otherwise(F.lit("new"))
        .alias("status"),
        F.when(is_err, attempt).otherwise(F.lit(0)).cast("long").alias("attempt"),
    )


@q(
    "coalesce_best_of",
    """
    SELECT user_id,
           round(coalesce(
             max(value) FILTER (WHERE event_type = 'purchase'),
             max(value) FILTER (WHERE event_type = 'click'),
             max(value) FILTER (WHERE event_type = 'view'),
             0.0), 6) AS best_value
    FROM events GROUP BY user_id
    """,
)
def coalesce_best_of(spark, sf_dir):
    """F6: best-of-N source coalesce (Kline_analyze.py:88-110 okex→binance→
    huobi fallback) as conditional aggregates + coalesce."""
    ev = T(spark, sf_dir, "events")
    pick = lambda t: F.max(F.when(F.col("event_type") == t, F.col("value")))  # noqa: E731
    return ev.groupBy("user_id").agg(
        F.round(
            F.coalesce(pick("purchase"), pick("click"), pick("view"), F.lit(0.0)), 6
        ).alias("best_value")
    )


@q(
    "orderbook_pick",
    """
    WITH t AS (SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '') AS w
               FROM documents)
    SELECT doc_id, w[1] AS best_bid, w[-1] AS best_ask, len(w)::INT AS depth
    FROM t
    """,
)
def orderbook_pick(spark, sf_dir):
    """F7: order-book head/tail pick (get_market_info.py:38-44: bids[0],
    asks[-1]) — element_at ±1 over an array column."""
    d = T(spark, sf_dir, "documents")
    toks = d.select("doc_id", textops.tokens_col(F.col("text")).alias("w"))
    return toks.select(
        "doc_id",
        F.try_element_at(F.col("w"), F.lit(1)).alias("best_bid"),
        F.try_element_at(F.col("w"), F.lit(-1)).alias("best_ask"),
        F.size("w").alias("depth"),
    )


@q(
    "list_projection",
    """
    WITH t AS (SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '') AS w
               FROM documents)
    SELECT doc_id,
           array_to_string(list_transform(w[1:5], x -> upper(x)), ',') AS head_upper,
           len(list_filter(w, x -> length(x) > 4))::INT AS n_long
    FROM t
    """,
)
def list_projection(spark, sf_dir):
    """C13: list comprehension projections (weibo/pipelines.py:46
    ``[pic['url'] for pic in pictures]``) as higher-order array functions."""
    d = T(spark, sf_dir, "documents")
    toks = d.select("doc_id", textops.tokens_col(F.col("text")).alias("w"))
    return toks.select(
        "doc_id",
        F.concat_ws(",", F.transform(F.slice("w", 1, 5), lambda x: F.upper(x))).alias("head_upper"),
        F.size(F.filter("w", lambda x: F.length(x) > 4)).alias("n_long"),
    )


# =====================================================================
# Text analysis (training-data tier) over documents
# =====================================================================

_SQL_TOKENS = "list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '')"


def _sql_shingles(n: int) -> str:
    gram = " || ' ' || ".join(f"w[i+{k}]" for k in range(n))
    return (
        f"list_distinct(list_transform(generate_series(1, greatest(len(w) - {n - 1}, 0)), i -> {gram}))"
    )


@q(
    "token_counts",
    f"""
    SELECT doc_id,
           len({_SQL_TOKENS})::INT AS n_ws_tokens,
           len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\s]'))::INT AS n_bpe_pieces
    FROM documents
    """,
)
def token_counts(spark, sf_dir):
    """Token counting: whitespace + BPE-ish piece regex."""
    d = T(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(textops.tokens_col(F.col("text"))).alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), 0)).alias("n_bpe_pieces"),
    )


_BM25_TERMS = ("spark", "hash", "merge")
_BM25_K1, _BM25_B = 1.2, 0.75


def _bm25_sql() -> str:
    tf_cols = ", ".join(
        f"len(list_filter(w, x -> x = '{t}'))::DOUBLE AS tf{i}"
        for i, t in enumerate(_BM25_TERMS)
    )
    df_cols = ", ".join(
        f"sum((tf{i} > 0)::INT)::DOUBLE AS df{i}" for i in range(len(_BM25_TERMS))
    )
    contribs = " + ".join(
        f"ln((n_docs - df{i} + 0.5) / (df{i} + 0.5) + 1.0)"
        f" * (tf{i} * {_BM25_K1 + 1}) / (tf{i} + {_BM25_K1} * (1 - {_BM25_B} + {_BM25_B} * dl / avgdl))"
        for i in range(len(_BM25_TERMS))
    )
    return f"""
    WITH toks AS (SELECT doc_id, {_SQL_TOKENS} AS w FROM documents),
    base AS (SELECT doc_id, len(w)::DOUBLE AS dl, {tf_cols} FROM toks),
    g AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl, {df_cols} FROM base)
    SELECT doc_id, round({contribs}, 6) AS bm25
    FROM base, g
    ORDER BY bm25 DESC, doc_id LIMIT 20
    """


@q("bm25_topk", _bm25_sql())
def bm25_topk(spark, sf_dir):
    """BM25 top-k keyword retrieval over the documents table — the ranked
    lookup a training-data pipeline runs for targeted corpus slices.

    Whole plan is JVM builtins: one tokenize pass computes dl + per-term
    tf, one single-row agg yields N/avgdl/df (broadcast back — no second
    scan shuffle), scoring is arithmetic, and the top-k is a TakeOrdered
    (never a global sort). Operand order matches the oracle SQL exactly
    so IEEE doubles agree bit-for-bit everywhere except ln(), which both
    engines compute correctly-rounded-in-practice; round(...,6) absorbs
    any last-ulp drift. Scales as one map + one tiny broadcast at 100 TB."""
    d = T(spark, sf_dir, "documents")
    toks = d.select("doc_id", textops.tokens_col(F.col("text")).alias("toks"))
    def eq(term):
        # single-parameter closure: a `lambda t, term=term` would be handed
        # (element, index) by pyspark's higher-order-function binding
        return lambda t: t == F.lit(term)

    base = toks.select(
        "doc_id",
        F.size("toks").cast("double").alias("dl"),
        *[
            F.size(F.filter("toks", eq(term))).cast("double").alias(f"tf{i}")
            for i, term in enumerate(_BM25_TERMS)
        ],
    )
    g = base.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("int")).cast("double").alias(f"df{i}")
            for i in range(len(_BM25_TERMS))
        ],
    )
    j = base.crossJoin(F.broadcast(g))
    score = None
    for i in range(len(_BM25_TERMS)):
        tf, df = F.col(f"tf{i}"), F.col(f"df{i}")
        idf = F.log((F.col("n_docs") - df + 0.5) / (df + 0.5) + 1.0)
        contrib = idf * (tf * (_BM25_K1 + 1)) / (
            tf + _BM25_K1 * (1 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
        )
        score = contrib if score is None else score + contrib
    return (
        j.select("doc_id", F.round(score, 6).alias("bm25"))
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(20)
    )


@q(
    "tfidf_top_terms",
    f"""
    WITH tok AS (SELECT doc_id, unnest({_SQL_TOKENS}) AS term FROM documents),
    tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY doc_id, term),
    df AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM tok GROUP BY term),
    n AS (SELECT count(*)::BIGINT AS n FROM documents),
    s AS (SELECT doc_id, term, tf,
                 round(tf * ln((n + 1.0) / (df + 1.0)), 6) AS tfidf
          FROM tf JOIN df USING (term) CROSS JOIN n),
    r AS (SELECT *, row_number() OVER
            (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rnk FROM s)
    SELECT doc_id, rnk::INT AS rnk, term, tf, tfidf FROM r WHERE rnk <= 3
    """,
)
def tfidf_top_terms(spark, sf_dir):
    """Per-doc TF-IDF keyword extraction (top-3 terms): the classic
    corpus-characterization / doc-tagging signal. Smoothed idf
    ln((N+1)/(df+1)); ranking is over the ROUNDED score (ties broken by
    term) so rank order is engine-independent.

    Scale shape: one tokenize pass feeds both tf (groupBy doc,term — one
    shuffle) and df (groupBy term — the vocabulary agg); scoring joins tf
    against the vocabulary on term (AQE broadcasts when the vocab is
    small; plain shuffle join otherwise — never a driver collect). The
    per-doc top-3 is a window PARTITIONED BY doc_id — no global sort, no
    skew (partition = one doc)."""
    d = T(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(textops.tokens_col(F.col("text"))).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).cast("long").alias("tf"))
    df = tok.groupBy("term").agg(F.countDistinct("doc_id").cast("long").alias("df"))
    n = d.agg(F.count(F.lit(1)).cast("long").alias("n"))
    s = (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id", "term", "tf",
            F.round(
                F.col("tf") * F.log((F.col("n") + 1.0) / (F.col("df") + 1.0)), 6
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), "term")
    return (
        s.withColumn("rnk", F.row_number().over(w).cast("int"))
        .where(F.col("rnk") <= 3)
        .select("doc_id", "rnk", "term", "tf", "tfidf")
    )


_CMS_DEPTH = 4
_CMS_WIDTH = 64        # deliberately tight: 150 keys in 64 buckets forces
                       # collisions so the min-over-rows estimator is
                       # actually exercised (overestimate > 0 on the fixture)


@q(
    "cms_heavy_hitters",
    f"""
    WITH ev AS (SELECT 'h' || user_id::VARCHAR AS k FROM events),
    d AS (SELECT unnest([{", ".join(str(i) for i in range(_CMS_DEPTH))}]) AS i),
    hb AS (SELECT k, i, ({textops.hash60_sql("i::VARCHAR || ':' || k")}) % {_CMS_WIDTH} AS b
           FROM ev, d),
    counters AS (SELECT i, b, count(*) AS c FROM hb GROUP BY i, b),
    truth AS (SELECT k, count(*) AS true_count FROM ev GROUP BY k),
    kb AS (SELECT t.k, t.true_count, d.i,
                  ({textops.hash60_sql("d.i::VARCHAR || ':' || t.k")}) % {_CMS_WIDTH} AS b
           FROM truth t, d)
    SELECT kb.k AS host,
           kb.true_count::BIGINT AS true_count,
           min(c.c)::BIGINT AS cms_estimate,
           (min(c.c) - kb.true_count)::BIGINT AS overestimate
    FROM kb JOIN counters c ON c.i = kb.i AND c.b = kb.b
    GROUP BY kb.k, kb.true_count
    """,
)
def cms_heavy_hitters(spark, sf_dir):
    """Count-min sketch (Cormode-Muthukrishnan, J.Alg 2005) frequency
    estimation — the hot-host / heavy-hitter telemetry a frontier needs at
    10^10 URLs, where an exact per-host count is a full shuffle but the
    sketch is ONE map pass partially aggregated into depth×width = 256
    counter cells (map-side combine reduces every partition to ≤256 rows
    before the exchange; the counter table then BROADCASTS to estimate any
    key set). Deterministic row hashes via the shared md5 hash60, so DuckDB
    reproduces every counter cell and every min-estimate exactly; width is
    sized below the fixture's key count so collisions (and the CMS
    one-sided overestimate) are real in the output. The exact count rides
    along to make the query self-auditing — overestimate ≥ 0 is the CMS
    guarantee, asserted in pytest."""
    ev = T(spark, sf_dir, "events").select(
        F.concat(F.lit("h"), F.col("user_id").cast("string")).alias("k")
    )
    depth_lits = F.array(*[F.lit(i) for i in range(_CMS_DEPTH)])

    def bucket(i_col, k_col):
        return textops.hash60(
            F.concat(i_col.cast("string"), F.lit(":"), k_col)
        ) % _CMS_WIDTH

    hb = ev.select("k", F.explode(depth_lits).alias("i")).select(
        "k", "i", bucket(F.col("i"), F.col("k")).alias("b")
    )
    counters = hb.groupBy("i", "b").agg(F.count(F.lit(1)).alias("c"))
    truth = ev.groupBy("k").agg(F.count(F.lit(1)).alias("true_count"))
    kb = truth.select("k", "true_count", F.explode(depth_lits).alias("i")).select(
        "k", "true_count", "i", bucket(F.col("i"), F.col("k")).alias("b")
    )
    est = (
        kb.join(F.broadcast(counters), ["i", "b"])
        .groupBy("k", "true_count")
        .agg(F.min("c").alias("cms_estimate"))
    )
    return est.select(
        F.col("k").alias("host"),
        F.col("true_count").cast("long").alias("true_count"),
        F.col("cms_estimate").cast("long").alias("cms_estimate"),
        (F.col("cms_estimate") - F.col("true_count")).cast("long").alias("overestimate"),
    )


_HLL_M = 1024          # 2^10 registers
_HLL_ALPHA = 0.7205407583220416   # 0.7213 / (1 + 1.079/1024), inlined both sides
_HLL_POW51 = 2251799813685248     # 2^51


@q(
    "hll_distinct_tokens",
    f"""
    WITH tok AS (SELECT doc_id, unnest({_SQL_TOKENS}) AS tok FROM documents),
    keys AS (SELECT 'vocab' AS scope, tok AS k FROM tok
             UNION ALL
             SELECT 'doc_terms' AS scope, doc_id::VARCHAR || ':' || tok AS k FROM tok),
    h AS (SELECT scope, {textops.hash60_sql('k')} AS h FROM keys),
    reg AS (SELECT scope, h % {_HLL_M} AS b,
                   max(CASE WHEN h // {_HLL_M} = 0 THEN 51
                            ELSE 51 - length(bin(h // {_HLL_M})) END) AS m
            FROM h GROUP BY scope, b),
    s AS (SELECT scope, count(*)::BIGINT AS present,
                 sum(1::BIGINT << (51 - m))::BIGINT AS s_present
          FROM reg GROUP BY scope),
    e AS (SELECT scope, present,
                 {_HLL_M} - present AS v,
                 {_HLL_ALPHA}::DOUBLE * {_HLL_M} * {_HLL_M} * {_HLL_POW51}
                   / (s_present + ({_HLL_M} - present) * {_HLL_POW51}) AS e_raw
          FROM s),
    x AS (SELECT scope, count(DISTINCT k)::BIGINT AS exact_distinct
          FROM keys GROUP BY scope)
    SELECT scope, {_HLL_M} AS m, v::BIGINT AS n_empty,
           round(CASE WHEN v > 0 AND e_raw <= 2560.0
                      THEN {_HLL_M} * ln({_HLL_M} / v::DOUBLE) ELSE e_raw END,
                 3) AS est_distinct,
           exact_distinct
    FROM e JOIN x USING (scope)
    """,
)
def hll_distinct_tokens(spark, sf_dir):
    """HyperLogLog distinct-count sketch over the corpus vocabulary,
    value-level reproducible: registers are exact integers (shared
    md5-prefix hash60, bucket = h mod 1024, rho = leading zeros of the
    remaining 50 bits + 1), the harmonic sum is computed in the INTEGER
    domain (sum of 2^(51-M_j) as BIGINT — no float-summation-order drift),
    and only the final division/ln is floating point (round(,3) absorbs
    ulp). Flajolet et al.'s small-range correction applied below 2.5m.

    This is the sketch a 100 TB pipeline uses for distinct-URL / distinct
    -token telemetry: one map pass + a (scope × 1024)-row agg — versus the
    full shuffle of count(DISTINCT). Two scopes so BOTH estimator branches
    are exercised on the fixture: 'vocab' (tiny — linear counting) and
    'doc_terms' (thousands — the raw harmonic-mean branch). The exact
    count rides along purely to make the query self-auditing (relative
    error visible in the output)."""
    d = T(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(textops.tokens_col(F.col("text"))).alias("tok"))
    keys = tok.select(F.lit("vocab").alias("scope"), F.col("tok").alias("k")).unionAll(
        tok.select(
            F.lit("doc_terms").alias("scope"),
            F.concat(F.col("doc_id").cast("string"), F.lit(":"), "tok").alias("k"),
        )
    )
    h = keys.select("scope", textops.hash60(F.col("k")).alias("h"))
    # integer `div`, NOT `/`: h is up to 60 bits, and double division would
    # round away the low bits that decide the bucket remainder
    rem = F.expr(f"h div {_HLL_M}")
    rho = F.when(rem == 0, F.lit(51)).otherwise(
        F.lit(51) - F.length(F.conv(rem.cast("string"), 10, 2))
    )
    reg = (
        h.select("scope", (F.col("h") % _HLL_M).alias("b"), rho.alias("rho"))
        .groupBy("scope", "b")
        .agg(F.max("rho").alias("m"))
    )
    s = reg.groupBy("scope").agg(
        F.count(F.lit(1)).cast("long").alias("present"),
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(51 - m AS INT))"))
        .cast("long")
        .alias("s_present"),
    )
    e = s.select(
        "scope",
        (F.lit(_HLL_M) - F.col("present")).alias("v"),
        (
            F.lit(_HLL_ALPHA * _HLL_M * _HLL_M * _HLL_POW51)
            / (F.col("s_present") + (F.lit(_HLL_M) - F.col("present")) * F.lit(_HLL_POW51))
        ).alias("e_raw"),
    )
    x = keys.groupBy("scope").agg(
        F.countDistinct("k").cast("long").alias("exact_distinct")
    )
    return e.join(x, "scope").select(
        "scope",
        F.lit(_HLL_M).alias("m"),
        F.col("v").cast("long").alias("n_empty"),
        F.round(
            F.when(
                (F.col("v") > 0) & (F.col("e_raw") <= 2560.0),
                F.lit(float(_HLL_M)) * F.log(F.lit(_HLL_M) / F.col("v").cast("double")),
            ).otherwise(F.col("e_raw")),
            3,
        ).alias("est_distinct"),
        "exact_distinct",
    )


_MIX_QUOTA = 1500  # tokens per lang stratum
_MIX_HASH = textops.hash60_sql("'mix:' || doc_id::VARCHAR")


@q(
    "token_budget_mix",
    f"""
    WITH t AS (SELECT lang, doc_id, len({_SQL_TOKENS})::BIGINT AS n_tokens,
                      {_MIX_HASH} AS hk
               FROM documents),
    c AS (SELECT *, sum(n_tokens) OVER
            (PARTITION BY lang ORDER BY hk, doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM t)
    SELECT lang, doc_id, n_tokens, cum::BIGINT AS cum_tokens
    FROM c WHERE cum - n_tokens < {_MIX_QUOTA}
    """,
)
def token_budget_mix(spark, sf_dir):
    """Data-mixture construction under a per-stratum TOKEN budget (public
    method: pretraining mixtures are specified in tokens per source/lang,
    not document counts — a count quota over-samples short docs). Docs are
    admitted in deterministic hash order (unbiased, reproducible at any
    cluster size) until the stratum's running token total passes the
    budget; the straddling doc is kept, so every stratum reaches ≥ quota
    when it has the supply.

    Scale shape: one cumulative-sum window PARTITIONED BY the stratum —
    never a global sort; a stratum's rows co-locate on one partition,
    which is exactly the right skew story when strata are
    (source, lang) slices of bounded size. Composes upstream of
    sampling.split_col."""
    d = T(spark, sf_dir, "documents")
    t = d.select(
        "lang",
        "doc_id",
        F.size(textops.tokens_col(F.col("text"))).cast("long").alias("n_tokens"),
        textops.hash60(
            F.concat(F.lit("mix:"), F.col("doc_id").cast("string"))
        ).alias("hk"),
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("hk", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        t.withColumn("cum", F.sum("n_tokens").over(w))
        .where(F.col("cum") - F.col("n_tokens") < _MIX_QUOTA)
        .select("lang", "doc_id", "n_tokens", F.col("cum").cast("long").alias("cum_tokens"))
    )


_PASSAGE_L = 8


def _dup_passage_sql() -> str:
    gram = " || ' ' || ".join(f"w[i+{k}]" for k in range(_PASSAGE_L))
    return f"""
    WITH toks AS (SELECT doc_id, {_SQL_TOKENS} AS w FROM documents),
    g AS (SELECT doc_id, i AS pos, {textops.hash60_sql(f"({gram})")} AS h
          FROM toks, unnest(generate_series(1, greatest(len(w) - {_PASSAGE_L - 1}, 0))) AS t(i)),
    dup AS (SELECT h FROM g GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
    p AS (SELECT doc_id, pos FROM g WHERE h IN (SELECT h FROM dup)),
    isl AS (SELECT doc_id, pos,
                   pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
            FROM p)
    SELECT doc_id, min(pos)::INT AS span_start,
           (max(pos) + {_PASSAGE_L - 1})::INT AS span_end,
           (max(pos) + {_PASSAGE_L} - min(pos))::INT AS span_len
    FROM isl GROUP BY doc_id, grp
    """


def _dup_passage_removed_sql() -> str:
    spans = _dup_passage_sql().strip()
    return f"""
    WITH spans AS ({spans}),
    cover AS (SELECT DISTINCT doc_id, unnest(generate_series(span_start, span_end)) AS pos
              FROM spans),
    tok AS (SELECT doc_id, i AS pos, ws[i] AS w
            FROM (SELECT doc_id, {_SQL_TOKENS} AS ws FROM documents),
                 unnest(generate_series(1, len(ws))) AS t(i)),
    kept AS (SELECT tok.doc_id, tok.pos, tok.w
             FROM tok LEFT JOIN cover
               ON tok.doc_id = cover.doc_id AND tok.pos = cover.pos
             WHERE cover.pos IS NULL)
    SELECT doc_id,
           coalesce(string_agg(w, ' ' ORDER BY pos), '') AS clean_text,
           count(w)::BIGINT AS n_kept
    FROM documents LEFT JOIN kept USING (doc_id)
    GROUP BY doc_id
    """


@q("dup_passage_removed", _dup_passage_removed_sql())
def dup_passage_removed(spark, sf_dir):
    """The removal half of passage-level dedup: apply the duplicated-span
    mask from ``dup_passage_spans`` and reassemble each doc's surviving
    tokens in order (Lee et al. cut the repeated sequence from EVERY
    occurrence; dropped-token counts make the cut auditable).

    Scale shape: spans explode into covered positions (bounded by span
    length — never by doc length), the mask is an anti-join on
    (doc_id, pos), and reassembly is a partition-local sorted
    string-agg per doc — the same in-expression reassembly discipline as
    line_dedup_boilerplate. No windows beyond the span detection it
    composes."""
    d = T(spark, sf_dir, "documents")
    spans = dup_passage_spans(spark, sf_dir)
    cover = spans.select(
        "doc_id",
        F.explode(F.sequence("span_start", "span_end")).alias("pos"),
    ).distinct()
    tok = d.select(
        "doc_id",
        F.posexplode(textops.tokens_col(F.col("text"))).alias("pos0", "w"),
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "w")
    kept = tok.join(cover, ["doc_id", "pos"], "left_anti")
    agg = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "w"))), lambda s: s["w"]
            ),
            " ",
        ).alias("clean_text"),
        F.count(F.lit(1)).cast("long").alias("n_kept"),
    )
    return d.select("doc_id").join(agg, "doc_id", "left").select(
        "doc_id",
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
    )


@q("dup_passage_spans", _dup_passage_sql())
def dup_passage_spans(spark, sf_dir):
    """Passage-level exact-duplicate span detection — the substring-dedup
    step of modern pretraining pipelines (public method: Lee et al.,
    "Deduplicating Training Data Makes Language Models Better": remove any
    ≥L-token sequence that repeats across the corpus; doc-level dedup
    misses these). Suffix arrays don't distribute; the Spark-shaped
    equivalent is positional L-gram hashing: every L-gram position, keep
    grams seen in ≥2 DISTINCT docs, then merge adjacent duplicated
    positions into maximal spans (gap-and-islands: pos − row_number).

    Returns (doc_id, span_start, span_end, span_len) in 1-based token
    coordinates — the mask a removal pass applies.

    Scale shape: grams travel as their 60-bit hash, never as strings —
    the dup-gram shuffle is 8 bytes/gram (collision behavior identical in
    the oracle, which joins on the same hash); the ≥2-docs filter is one
    map-side-combinable agg; span merge is a window PARTITIONED BY doc
    (no skew: partition = one doc's duplicated positions)."""
    d = T(spark, sf_dir, "documents")
    toks = d.select("doc_id", textops.tokens_col(F.col("text")).alias("w"))
    g = toks.select(
        "doc_id",
        F.posexplode(textops.grams_all_col(F.col("w"), _PASSAGE_L)).alias(
            "pos0", "gram"
        ),
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), textops.hash60(F.col("gram")).alias("h"))
    dup = (
        g.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .where(F.col("nd") >= 2)
        .select("h")
    )
    p = g.join(dup, "h", "left_semi").select("doc_id", "pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    isl = p.withColumn("grp", F.col("pos") - F.row_number().over(w))
    return (
        isl.groupBy("doc_id", "grp")
        .agg(
            F.min("pos").cast("int").alias("span_start"),
            (F.max("pos") + (_PASSAGE_L - 1)).cast("int").alias("span_end"),
            (F.max("pos") + _PASSAGE_L - F.min("pos")).cast("int").alias("span_len"),
        )
        .select("doc_id", "span_start", "span_end", "span_len")
    )


def _lang_score_sql(lang: str) -> str:
    pats = textops.LANG_MARKERS[lang]
    terms = [
        f"((length(p) - length(replace(p, '{p_}', ''))) / {len(p_)})" for p_ in pats
    ]
    return "(" + " + ".join(terms) + ")::DOUBLE"


_LANGS_DESC = sorted(textops.LANG_MARKERS, reverse=True)
_LANG_CASE = "CASE " + " ".join(
    f"WHEN s_{l} = m THEN '{l}'" for l in _LANGS_DESC[:-1]
) + f" ELSE '{_LANGS_DESC[-1]}' END"

@q(
    "lang_id",
    f"""
    WITH scored AS (
      SELECT doc_id,
             {" , ".join(f"{_lang_score_sql(l)} AS s_{l}" for l in sorted(textops.LANG_MARKERS))}
      FROM (SELECT doc_id, ' ' || text || ' ' AS p FROM documents)),
    m AS (SELECT *, greatest({', '.join('s_' + l for l in sorted(textops.LANG_MARKERS))}) AS m FROM scored)
    SELECT doc_id, {_LANG_CASE} AS lang_pred, s_en AS score_en FROM m
    """,
)
def lang_id(spark, sf_dir):
    """Language-ID n-gram/stopword heuristic; argmax with deterministic
    lexicographically-last tiebreak (matched CASE chain in the oracle)."""
    d = T(spark, sf_dir, "documents")
    scores = textops.lang_scores_col(F.col("text"))
    return d.select(
        "doc_id",
        textops.lang_id_col(F.col("text")).alias("lang_pred"),
        scores["en"].alias("score_en"),
    )


@q(
    "quality_scores",
    f"""
    WITH t AS (SELECT doc_id, text, {_SQL_TOKENS} AS toks FROM documents)
    SELECT doc_id,
           len(toks)::BIGINT AS n_tokens,
           length(text)::BIGINT AS n_chars,
           len(list_filter(toks, x -> x IN ('the','a','and','of','to')))::BIGINT AS n_stopwords,
           (length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))::BIGINT AS n_punct,
           CASE WHEN len(toks) > 0
                THEN len(list_filter(toks, x -> x IN ('the','a','and','of','to')))::DOUBLE / len(toks)::DOUBLE
                ELSE 0.0 END AS stopword_ratio
    FROM t
    """,
)
def quality_scores(spark, sf_dir):
    """Quality scoring: integer features + exact-ratio stopword share."""
    d = T(spark, sf_dir, "documents")
    cols = textops.quality_cols(F.col("text"))
    return d.select("doc_id", *[c.alias(k) for k, c in cols.items()])


@q(
    "corpus_keep_filter",
    f"""
    WITH t AS (SELECT doc_id, text, {_SQL_TOKENS} AS toks, ' ' || text || ' ' AS p FROM documents),
    q AS (SELECT doc_id,
            len(toks)::BIGINT AS n_tokens,
            length(text)::BIGINT AS n_chars,
            (length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))::BIGINT AS n_punct,
            CASE WHEN len(toks) > 0
                 THEN len(list_filter(toks, x -> x IN ('the','a','and','of','to')))::DOUBLE / len(toks)::DOUBLE
                 ELSE 0.0 END AS stopword_ratio,
            {" , ".join(f"{_lang_score_sql(l)} AS s_{l}" for l in sorted(textops.LANG_MARKERS))}
          FROM t),
    m AS (SELECT *, greatest({', '.join('s_' + l for l in sorted(textops.LANG_MARKERS))}) AS m FROM q)
    SELECT doc_id,
           CASE WHEN n_tokens < 12 THEN 'drop:too_short'
                WHEN n_punct * 5 > n_chars THEN 'drop:punct_heavy'
                WHEN ({_LANG_CASE}) NOT IN ('en', 'zh') THEN 'drop:lang'
                WHEN stopword_ratio * 100 < 2 THEN 'drop:stopword_low'
                ELSE 'keep' END AS verdict,
           n_tokens, round(stopword_ratio, 6) AS stopword_ratio
    FROM m
    """,
)
def corpus_keep_filter(spark, sf_dir):
    """The training-data gate that composes the text-analysis operators
    into an actual keep/drop decision with a reason code — length floor,
    punctuation-density cap, language allowlist (en/zh), stopword-ratio
    floor — first-failing-rule-wins, the standard web-corpus filter
    cascade (C4-200/Gopher-style rules re-expressed over this engine's
    deterministic features). Every branch is exact-integer-derived, so the
    verdict is bit-identical cross-engine."""
    d = T(spark, sf_dir, "documents")
    qc = textops.quality_cols(F.col("text"))
    lang = textops.lang_id_col(F.col("text"))
    verdict = (
        F.when(qc["n_tokens"] < 12, F.lit("drop:too_short"))
        .when(qc["n_punct"] * 5 > qc["n_chars"], F.lit("drop:punct_heavy"))
        .when(~lang.isin("en", "zh"), F.lit("drop:lang"))
        .when(qc["stopword_ratio"] * 100 < 2, F.lit("drop:stopword_low"))
        .otherwise(F.lit("keep"))
    )
    return d.select(
        "doc_id", verdict.alias("verdict"),
        qc["n_tokens"].alias("n_tokens"),
        F.round(qc["stopword_ratio"], 6).alias("stopword_ratio"),
    )


@q(
    "doc_fingerprints",
    f"""
    WITH t AS (SELECT doc_id, {_SQL_TOKENS} AS w FROM documents),
    g AS (SELECT doc_id, {_sql_shingles(5)} AS grams FROM t)
    SELECT doc_id,
           len(grams)::BIGINT AS n_shingles,
           coalesce(list_min(list_transform(grams, s -> {textops.hash60_sql('s')})), 0)::BIGINT AS fp_min,
           (coalesce(list_sum(list_transform(grams, s -> {textops.hash60_sql('s')} % 1000003)), 0) % 1000000007)::BIGINT AS fp_sum_mod
    FROM g
    """,
)
def doc_fingerprints(spark, sf_dir):
    """Document fingerprinting: rolling-hash digest over word 5-grams
    (tokens and grams materialized stepwise — see textops.grams_col)."""
    d = T(spark, sf_dir, "documents")
    toks = d.select("doc_id", textops.tokens_col(F.col("text")).alias("toks"))
    grams = toks.select("doc_id", textops.grams_col(F.col("toks"), 5).alias("grams"))
    cols = textops.fingerprint_cols(F.col("grams"))
    return grams.select("doc_id", *[c.alias(k) for k, c in cols.items()])


@q(
    "bpe_token_counts",
    f"""
    WITH t AS (SELECT doc_id, coalesce(text, '') AS text FROM documents),
    b AS (SELECT doc_id,
                 regexp_extract_all(text, '{textops.BPE_SPLIT_PATTERN.replace("'", "''")}') AS pieces,
                 {_SQL_TOKENS} AS toks
          FROM t)
    SELECT doc_id,
           len(pieces)::BIGINT AS n_bpe_tokens,
           len(list_filter(pieces, p -> regexp_matches(p, '\\p{{L}}')))::BIGINT AS n_word_pieces,
           len(toks)::BIGINT AS n_ws_tokens,
           CASE WHEN len(toks) > 0
                THEN round(len(pieces)::DOUBLE / len(toks)::DOUBLE, 6)
                ELSE 0.0 END AS pieces_per_word
    FROM b
    """,
)
def bpe_token_counts(spark, sf_dir):
    """LLM token budgeting: BPE-style pre-tokenizer counts (GPT-2 split
    pattern, textops.BPE_SPLIT_PATTERN) next to plain whitespace counts —
    the pieces_per_word ratio is the standard chars-free fertility proxy
    for budget planning. Entirely JVM-side regexp_extract_all (no Python
    in the hot path); the oracle runs the IDENTICAL pattern through
    DuckDB's RE2 — the pattern is written to the common Java-regex/RE2
    dialect (no lookahead, explicit whitespace class) so both engines
    tokenize bit-identically. Builder-brief text-analysis tier (token
    counting: whitespace + a BPE-ish regex); reference has no tokenizer
    (its text handling stops at regex field extraction, qcc.py)."""
    d = T(spark, sf_dir, "documents")
    pieces = textops.bpe_tokens_col(F.col("text"))
    toks = textops.tokens_col(F.coalesce(F.col("text"), F.lit("")))
    b = d.select(
        "doc_id", pieces.alias("pieces"), toks.alias("toks")
    )
    n_p, n_t = F.size("pieces").cast("long"), F.size("toks").cast("long")
    word = F.filter(F.col("pieces"), lambda p: p.rlike(r"\p{L}"))
    return b.select(
        "doc_id",
        n_p.alias("n_bpe_tokens"),
        F.size(word).cast("long").alias("n_word_pieces"),
        n_t.alias("n_ws_tokens"),
        F.when(n_t > 0, F.round(n_p.cast("double") / n_t.cast("double"), 6))
        .otherwise(F.lit(0.0))
        .alias("pieces_per_word"),
    )


# =====================================================================
# Deduplication suite (training-data tier) over documents/embeddings
# =====================================================================

_DOCS_DOUBLED = """
  (SELECT doc_id, text FROM documents
   UNION ALL SELECT doc_id + 100000, text FROM documents)
"""

@q(
    "dedup_exact",
    f"""
    WITH d AS (SELECT doc_id, md5(text) AS text_md5 FROM {_DOCS_DOUBLED} dd),
    g AS (SELECT text_md5, min(doc_id) AS survivor_id, count(*) AS n FROM d GROUP BY text_md5)
    SELECT d.doc_id, g.survivor_id, d.text_md5
    FROM d JOIN g USING (text_md5) WHERE g.n > 1
    """,
)
def dedup_exact(spark, sf_dir):
    """Exact dedup via hash-groupBy; input doubled so dup groups exist at
    every sf (sf0.01 documents are all distinct)."""
    d = T(spark, sf_dir, "documents").select("doc_id", "text")
    doubled = d.unionByName(d.select((F.col("doc_id") + 100000).alias("doc_id"), "text"))
    return dedup.exact_dupes(doubled)


_SQL_JACCARD = f"""
    WITH t AS (SELECT doc_id, {_SQL_TOKENS} AS w FROM documents),
    g AS (SELECT doc_id, unnest({_sql_shingles(3)}) AS shingle FROM t),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM g GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter
      FROM g a JOIN g b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT a_id, b_id,
           inter::DOUBLE / (sa.n_sh + sb.n_sh - inter)::DOUBLE AS jaccard
    FROM inter JOIN sizes sa ON sa.doc_id = a_id JOIN sizes sb ON sb.doc_id = b_id
    WHERE inter::DOUBLE / (sa.n_sh + sb.n_sh - inter)::DOUBLE >= {{thr}}
"""

@q("dedup_ngram_jaccard", _SQL_JACCARD.format(thr=0.8))
def dedup_ngram_jaccard(spark, sf_dir):
    """Exact word-3-gram Jaccard ≥ 0.8 pairs (shingle self-join — only docs
    sharing a shingle ever pair up). max_df=256 bounds per-shingle join
    fan-out at 256² on boilerplate-heavy web text; it never binds on the
    fixture (max shingle df is 25 at sf0.1), so the uncapped SQL oracle is
    unchanged — the capped-vs-uncapped divergence on a planted hot shingle
    is pinned by test_pipeline_ops."""
    return dedup.jaccard_pairs(T(spark, sf_dir, "documents"), 0.8, 3,
                               max_df=256)


@q("dedup_minhash_lsh", _SQL_JACCARD.format(thr=0.9))
def dedup_minhash_lsh(spark, sf_dir):
    """MinHash(128) → 32-band LSH → candidate join → exact-Jaccard verify at
    0.9. Verified output ≡ exact answer (band-miss probability ≈ 1.5e-15 at
    the threshold), so the oracle is the exact-Jaccard query."""
    return dedup.minhash_lsh_pairs(T(spark, sf_dir, "documents"), threshold=0.9)


_SIMHASH_BITS_SQL = ", ".join(
    f"sum(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS s{i}"
    for i in range(textops.SIMHASH_BITS)
)
_SIMHASH_FOLD_SQL = " + ".join(
    f"CASE WHEN s{i} >= 0 THEN {1 << i}::BIGINT ELSE 0 END" for i in range(textops.SIMHASH_BITS)
)

@q(
    "dedup_simhash",
    f"""
    WITH toks AS (
      SELECT DISTINCT doc_id, unnest({_SQL_TOKENS}) AS tok
      FROM documents),
    th AS (SELECT doc_id, {textops.hash60_sql('tok')} AS h FROM toks),
    sums AS (SELECT doc_id, {_SIMHASH_BITS_SQL} FROM th GROUP BY doc_id),
    sh AS (SELECT doc_id, ({_SIMHASH_FOLD_SQL}) AS simhash FROM sums)
    SELECT a.doc_id AS a_id, b.doc_id AS b_id,
           bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
)
def dedup_simhash(spark, sf_dir):
    """60-bit SimHash near-dup pairs (hamming ≤ 3) with pigeonhole chunk
    blocking; oracle recomputes the identical sketch quadratically."""
    return dedup.simhash_pairs(T(spark, sf_dir, "documents"), max_hamming=3)


@q(
    "dedup_embedding_cosine",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT a.vec_id AS a_id, b.vec_id AS b_id
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.v, b.v) >= 0.47
    """,
)
def dedup_embedding_cosine(spark, sf_dir):
    """Embedding-cosine near-dup pairs; threshold 0.47 sits in a measured gap
    of the corpus (0.467 / 0.472 neighbors) so float noise can't flip rows."""
    return dedup.embedding_dup_pairs(T(spark, sf_dir, "embeddings"), 0.47)


@q(
    "dedup_clusters",
    """
    SELECT doc_id, doc_id - doc_id % 5 AS survivor_id FROM documents
    """,
)
def dedup_clusters(spark, sf_dir):
    """Cluster resolution over dup pairs: connected components with
    min-id survivors (dedup.connected_survivors — distributed label
    propagation with early fixpoint stop). The pair fixture is a chain
    topology that FORCES transitivity (a~b, b~c, never (a,c)): consecutive
    ids chained within quintets plus a skip link at each decade, so the
    propagation needs diameter-many rounds, not one. The oracle is the
    independent closed form of that topology (survivor = id - id%5)."""
    did = F.col("doc_id")
    d = T(spark, sf_dir, "documents").select("doc_id")
    n = d.count()
    e1 = d.where((did % 5 != 4) & (did + 1 < n)).select(
        did.alias("a_id"), (did + 1).alias("b_id")
    )
    e2 = d.where((did % 10 == 0) & (did + 2 < n)).select(
        did.alias("a_id"), (did + 2).alias("b_id")
    )
    return dedup.connected_survivors(e1.unionByName(e2))


@q(
    "cc_star_contraction",
    """
    SELECT doc_id AS node, doc_id - doc_id % 100 AS rep FROM documents
    """,
)
def cc_star_contraction(spark, sf_dir):
    """Diameter-independent connected components (graph.connected_components,
    alternating large-star/small-star — Kiveris et al. SoCC'14). The fixture
    is 5 chains of 100 consecutive ids (diameter 99): label propagation
    needs 99 rounds to converge here, star contraction gets max_iters=10
    and must still land the closed-form answer (rep = id - id%100) — the
    query proves the O(log²) round bound, not just the labels."""
    did = F.col("doc_id")
    d = T(spark, sf_dir, "documents").select("doc_id")
    n = d.count()
    edges = d.where((did % 100 != 99) & (did + 1 < n)).select(
        did.alias("src"), (did + 1).alias("dst")
    )
    cc = graph.connected_components(edges, max_iters=10)
    # total over documents: a doc count of 1 mod 100 isolates the last doc
    # (no in- or out-edge) — it must still get rep = itself, exactly the
    # isolated-node coalesce dedup_cluster_reps applies
    return d.join(cc, d.doc_id == cc.node, "left").select(
        F.col("doc_id").alias("node"),
        F.coalesce(F.col("rep"), F.col("doc_id")).alias("rep"),
    )


@q(
    "dedup_survivor_flags",
    f"""
    WITH RECURSIVE t AS (SELECT doc_id, {_SQL_TOKENS} AS w FROM documents),
    g AS (SELECT doc_id, unnest({_sql_shingles(3)}) AS shingle FROM t),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM g GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter
      FROM g a JOIN g b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    pairs AS (
      SELECT a_id, b_id
      FROM inter JOIN sizes sa ON sa.doc_id = a_id JOIN sizes sb ON sb.doc_id = b_id
      WHERE inter::DOUBLE / (sa.n_sh + sb.n_sh - inter)::DOUBLE >= 0.8),
    edges AS (
      SELECT a_id AS u, b_id AS v FROM pairs
      UNION SELECT b_id, a_id FROM pairs),
    reach(node, r) AS (
      SELECT u, u FROM edges
      UNION
      SELECT e.v, r.r FROM reach r JOIN edges e ON e.u = r.node),
    lab AS (SELECT node, min(r) AS rep FROM reach GROUP BY node)
    SELECT d.doc_id, coalesce(l.rep, d.doc_id) AS rep,
           coalesce(l.rep, d.doc_id) = d.doc_id AS is_survivor
    FROM documents d LEFT JOIN lab l ON l.node = d.doc_id
    """,
)
def dedup_survivor_flags(spark, sf_dir):
    """The full pairs→clusters→keep-one pipeline: exact 3-gram Jaccard ≥0.8
    pairs feed star-contraction CC, and every document gets (rep,
    is_survivor) — the keep-one-copy filter a curation run applies. Oracle
    is a genuine transitive closure (recursive CTE) over the same pairs, so
    transitivity (a~b, b~c ⇒ same rep, (a,c) never emitted) is value-checked
    end-to-end."""
    docs = T(spark, sf_dir, "documents")
    pairs = dedup.jaccard_pairs(docs, 0.8, 3).select("a_id", "b_id")
    return graph.dedup_cluster_reps(docs, pairs)


@q(
    "dedup_embedding_bucketed",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT a.vec_id AS a_id, b.vec_id AS b_id
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.v, b.v) >= 0.47
    """,
)
def dedup_embedding_bucketed(spark, sf_dir):
    """Same exact semantics as dedup_embedding_cosine but via the fully
    distributed block-pair GEMM (no driver collect anywhere — VERDICT r01
    item 2): rows replicate into block-pair groups, one numpy GEMM per
    group. Identical oracle ⇒ the distributed path must reproduce the
    broadcast path bit-for-bit."""
    return dedup.embedding_dup_pairs_blocked(
        T(spark, sf_dir, "embeddings"), 0.47, n_blocks=8
    )


@q(
    "decontaminate_overlap",
    f"""
    WITH tok AS (SELECT doc_id, {_SQL_TOKENS} AS w FROM documents),
    g AS (SELECT doc_id, unnest({_sql_shingles(5)}) AS shingle FROM tok),
    bench AS (SELECT DISTINCT shingle FROM g WHERE doc_id % 7 = 0)
    SELECT g.doc_id, count(*)::BIGINT AS n_overlap
    FROM g JOIN bench USING(shingle)
    WHERE g.doc_id % 7 != 0
    GROUP BY g.doc_id
    """,
)
def decontaminate_overlap(spark, sf_dir):
    """Train/eval decontamination (standard webtext-pipeline step): corpus
    docs sharing any word 5-gram with the benchmark split (doc_id % 7 == 0
    plays the eval set). Benchmark shingles broadcast; corpus streams —
    no corpus shuffle, no pairwise blowup."""
    d = T(spark, sf_dir, "documents")
    return dedup.contamination_overlap(
        d.where(F.col("doc_id") % 7 != 0), d.where(F.col("doc_id") % 7 == 0), n=5
    )


@q(
    "repetition_scores",
    f"""
    WITH tok AS (SELECT doc_id, {_SQL_TOKENS} AS w FROM documents),
    g AS (SELECT doc_id, w,
                 list_transform(generate_series(1, greatest(len(w) - 1, 0)),
                                i -> w[i] || ' ' || w[i+1]) AS grams
          FROM tok),
    base AS (SELECT doc_id, len(grams)::INT AS n_2grams,
                    len(list_distinct(grams))::INT AS n_distinct_2grams, w
             FROM g),
    u AS (SELECT doc_id, unnest(w) AS tokn FROM tok),
    cnt AS (SELECT doc_id, tokn, count(*) AS c FROM u GROUP BY 1, 2),
    topf AS (SELECT doc_id, max(c)::DOUBLE / sum(c) AS tf FROM cnt GROUP BY 1)
    SELECT b.doc_id, n_2grams, n_distinct_2grams,
           round(CASE WHEN n_2grams = 0 THEN 0
                      ELSE 1 - n_distinct_2grams::DOUBLE / n_2grams END, 6)
             AS dup_2gram_frac,
           round(coalesce(tf, 0), 6) AS top_unigram_frac
    FROM base b LEFT JOIN topf USING(doc_id)
    """,
)
def repetition_scores(spark, sf_dir):
    """Gopher-style within-doc repetition signals (quality filtering for
    training data): duplicate-2-gram fraction (within-row HOFs, map-only)
    and top-unigram frequency fraction (explode → two-level agg, map-side
    combine). Both quality gates the standard webtext pipelines cut on."""
    d = T(spark, sf_dir, "documents")
    toks = d.select("doc_id", textops.tokens_col(F.col("text")).alias("w"))
    grams = toks.select(
        "doc_id", "w", textops.grams_all_col(F.col("w"), 2).alias("grams")
    )
    base = grams.select(
        "doc_id",
        "w",
        F.size("grams").alias("n_2grams"),
        F.size(F.array_distinct("grams")).alias("n_distinct_2grams"),
    )
    cnt = (
        toks.select("doc_id", F.explode("w").alias("tokn"))
        .groupBy("doc_id", "tokn")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    topf = cnt.groupBy("doc_id").agg(
        (F.max("c").cast("double") / F.sum("c")).alias("tf")
    )
    return (
        base.join(topf, "doc_id", "left")
        .select(
            "doc_id",
            "n_2grams",
            "n_distinct_2grams",
            F.round(
                F.when(F.col("n_2grams") == 0, F.lit(0.0)).otherwise(
                    1 - F.col("n_distinct_2grams").cast("double") / F.col("n_2grams")
                ),
                6,
            ).alias("dup_2gram_frac"),
            F.round(F.coalesce(F.col("tf"), F.lit(0.0)), 6).alias("top_unigram_frac"),
        )
    )


_SAMPLE_HASH_SQL = textops.hash60_sql("'sample:' || doc_id::VARCHAR")


@q(
    "sample_hash_10pct",
    f"""
    SELECT doc_id, lang FROM documents
    WHERE ({_SAMPLE_HASH_SQL}) % 1000000 < 100000
    """,
)
def sample_hash_10pct(spark, sf_dir):
    """Deterministic 10% Bernoulli sample (shared-md5 threshold): a
    map-only pushdown-able filter whose membership is identical on every
    run, engine, and cluster size — what DataFrame.sample cannot promise."""
    from spider_spark import sampling

    return sampling.hash_sample(
        T(spark, sf_dir, "documents"), 0.10, "doc_id"
    ).select("doc_id", "lang")


@q(
    "sample_stratified_lang",
    f"""
    SELECT doc_id, lang FROM (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang
                                ORDER BY ({_SAMPLE_HASH_SQL}), doc_id) AS rn
      FROM documents)
    WHERE rn <= 25
    """,
)
def sample_stratified_lang(spark, sf_dir):
    """Exact 25-per-language stratified sample by hash rank — balanced
    curation quotas over a skewed language mix; each stratum ranks inside
    its own window partition."""
    from spider_spark import sampling

    return sampling.stratified_sample(
        T(spark, sf_dir, "documents"), "lang", 25, "doc_id"
    ).select("doc_id", "lang")


@q(
    "pii_redact",
    """
    WITH s AS (
      SELECT doc_id,
             substr(text, 1, 40) || ' contact user' || doc_id::VARCHAR
               || '@mail.example.com or 10.0.' || (doc_id % 256)::VARCHAR
               || '.7 tel 555-867-' || lpad((doc_id % 10000)::VARCHAR, 4, '0')
               AS raw
      FROM documents)
    SELECT doc_id,
           len(regexp_extract_all(raw, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))::BIGINT AS n_email,
           len(regexp_extract_all(raw, '\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b'))::BIGINT AS n_ip,
           len(regexp_extract_all(raw, '\\b\\d{3}-\\d{3}-\\d{4}\\b'))::BIGINT AS n_phone,
           regexp_replace(regexp_replace(regexp_replace(raw,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               '\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b', '<IP>', 'g'),
               '\\b\\d{3}-\\d{3}-\\d{4}\\b', '<PHONE>', 'g') AS clean_text
    FROM s
    """,
)
def pii_redact(spark, sf_dir):
    """PII scrub (standard webtext-pipeline privacy pass): per-row
    synthesized email/IP/phone (the corpus is PII-free by construction, so
    the fixture plants one of each, keyed to doc_id) → typed placeholders,
    with pre-redaction hit counts. Whole pass is chained JVM regex — one
    codegen'd map, no shuffle."""
    d = T(spark, sf_dir, "documents")
    raw = F.concat_ws(
        "",
        F.substring("text", 1, 40),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example.com or 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".7 tel 555-867-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    s = d.select("doc_id", raw.alias("raw"))
    counts = textops.pii_count_cols(F.col("raw"))
    return s.select(
        "doc_id",
        *[c.alias(n) for n, c in counts.items()],
        textops.redact_pii_col(F.col("raw")).alias("clean_text"),
    )


_SQL_LINES = """
    tok AS (SELECT doc_id, source, {toks} AS w FROM documents),
    chunked AS (SELECT doc_id, source,
        list_transform(generate_series(1, cast(ceil(len(w) / 6.0) AS INT)),
                       i -> array_to_string(w[(i-1)*6+1 : (i-1)*6+6], ' ')) AS chunks
      FROM tok),
    l AS (SELECT doc_id,
        list_concat(list_concat(['accept cookies to continue'], chunks),
                    ['copyright ' || source]) AS ls
      FROM chunked),
    lines AS (SELECT doc_id, unnest(generate_series(1, len(ls))) - 1 AS pos,
                     unnest(ls) AS line FROM l)
"""


def _doc_lines(spark, sf_dir):
    """The line-dedup fixture: token chunks of 6 as 'lines', plus planted
    boilerplate (a global cookie banner + a per-source copyright footer) —
    exactly what cross-doc line dedup exists to strip."""
    d = T(spark, sf_dir, "documents")
    toks = d.select("doc_id", "source", textops.tokens_col(F.col("text")).alias("w"))
    chunks = F.transform(
        F.sequence(F.lit(1), F.ceil(F.size("w") / F.lit(6)).cast("int")),
        lambda i: F.concat_ws(" ", F.slice(F.col("w"), (i - 1) * 6 + 1, F.lit(6))),
    )
    ls = F.concat(
        F.array(F.lit("accept cookies to continue")),
        chunks,
        F.array(F.concat(F.lit("copyright "), F.col("source"))),
    )
    return toks.select("doc_id", F.posexplode(ls).alias("pos", "line"))


@q(
    "line_dedup_boilerplate",
    f"""
    WITH {_SQL_LINES.format(toks=_SQL_TOKENS)},
    bad AS (SELECT line FROM lines GROUP BY line HAVING count(DISTINCT doc_id) >= 2),
    kept AS (SELECT lines.* FROM lines ANTI JOIN bad USING (line)),
    rebuilt AS (SELECT doc_id, string_agg(line, ' | ' ORDER BY pos) AS text,
                       count(*) AS n_kept FROM kept GROUP BY doc_id),
    n_all AS (SELECT doc_id, count(*) AS n_lines FROM lines GROUP BY doc_id)
    SELECT doc_id, coalesce(text, '') AS text,
           coalesce(n_kept, 0)::BIGINT AS n_kept,
           (n_lines - coalesce(n_kept, 0))::BIGINT AS n_dropped
    FROM n_all LEFT JOIN rebuilt USING (doc_id)
    """,
)
def line_dedup_boilerplate(spark, sf_dir):
    """RefinedWeb/C4-style cross-doc line dedup: lines occurring in ≥2
    distinct docs (the planted cookie banner + per-source footers, and any
    natural 6-gram chunk collisions) are stripped; each doc reassembles in
    position order. One count-distinct shuffle on the line text + one
    anti-join + one per-doc agg — linear, no pairwise step."""
    return dedup.dedup_lines(_doc_lines(spark, sf_dir), min_docs=2)


_SPLIT_HASH_SQL = textops.hash60_sql("'split:' || doc_id::VARCHAR")


@q(
    "split_assign",
    f"""
    SELECT doc_id, lang,
           CASE WHEN ({_SPLIT_HASH_SQL}) % 1000000 < 900000 THEN 'train'
                WHEN ({_SPLIT_HASH_SQL}) % 1000000 < 950000 THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
)
def split_assign(spark, sf_dir):
    """Deterministic train/val/test assignment by hash bucket: map-only,
    stable under corpus growth (membership is a pure function of the row
    key), identical at any cluster size — the property DataFrame.sample /
    randomSplit cannot give a reproducible data pipeline."""
    from spider_spark import sampling

    d = T(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        "lang",
        sampling.split_col(
            F.col("doc_id"), {"train": 0.90, "val": 0.05, "test": 0.05}
        ).alias("split"),
    )


@q(
    "nfc_normalize",
    """
    WITH s AS (SELECT doc_id, substr(text, 1, 30) || ' café naïve' AS raw
               FROM documents)
    SELECT doc_id, length(raw)::BIGINT AS n_cp_raw,
           nfc_normalize(raw) AS norm_text,
           length(nfc_normalize(raw))::BIGINT AS n_cp_norm
    FROM s
    """,
)
def nfc_normalize(spark, sf_dir):
    """Unicode NFC normalization (crawled text mixes composed/decomposed
    graphemes; dedup hashes disagree until this runs): Arrow-batched pandas
    UDF (Series.str.normalize) — the fixture plants decomposed 'cafe'+U+0301
    / 'nai'+U+0308've', which NFC folds to single codepoints (codepoint
    counts drop by 2)."""
    d = T(spark, sf_dir, "documents")
    nfc = textops.nfc_normalize_udf()
    s = d.select(
        "doc_id",
        F.concat(F.substring("text", 1, 30), F.lit(" café naïve")).alias("raw"),
    )
    return s.select(
        "doc_id",
        F.length("raw").cast("long").alias("n_cp_raw"),
        nfc(F.col("raw")).alias("norm_text"),
        F.length(nfc(F.col("raw"))).cast("long").alias("n_cp_norm"),
    )


@q(
    "domain_mix",
    """
    WITH agg AS (SELECT source, count(*)::BIGINT AS n_docs,
                        sum(n_chars)::BIGINT AS n_chars
                 FROM documents GROUP BY source),
    sh AS (SELECT *, n_docs::DOUBLE / sum(n_docs) OVER () AS share,
                  sum(n_docs) OVER (ORDER BY n_docs DESC, source
                                    ROWS UNBOUNDED PRECEDING)::DOUBLE
                    / sum(n_docs) OVER () AS cum
           FROM agg)
    SELECT source, n_docs, n_chars, round(share, 6) AS share,
           round(cum, 6) AS cum_share,
           CASE WHEN cum <= 0.5 THEN 'head' WHEN cum <= 0.9 THEN 'mid'
                ELSE 'tail' END AS bucket
    FROM sh
    """,
)
def domain_mix(spark, sf_dir):
    """Domain-mix report (Dolma/CC-style curation planning): per-source doc
    and char volume, corpus share, cumulative share in descending-volume
    order, head/mid/tail bucket. The groupBy reduces before any window —
    the windows run over the tiny per-domain aggregate, not the corpus."""
    d = T(spark, sf_dir, "documents")
    agg = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("n_chars"),
    )
    w_all = Window.partitionBy()
    share = F.col("n_docs").cast("double") / F.sum("n_docs").over(w_all)
    w_cum = (
        Window.partitionBy()
        .orderBy(F.col("n_docs").desc(), "source")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sh = agg.select(
        "source", "n_docs", "n_chars", share.alias("share"),
        (F.sum("n_docs").over(w_cum).cast("double") / F.sum("n_docs").over(w_all)).alias("cum"),
    )
    return sh.select(
        "source",
        "n_docs",
        "n_chars",
        F.round("share", 6).alias("share"),
        F.round("cum", 6).alias("cum_share"),
        F.when(F.col("cum") <= 0.5, "head")
        .when(F.col("cum") <= 0.9, "mid")
        .otherwise("tail")
        .alias("bucket"),
    )


@q(
    "curate_corpus",
    f"""
    WITH t AS (SELECT doc_id, text, {_SQL_TOKENS} AS w, ' ' || text || ' ' AS p
               FROM documents WHERE doc_id % 7 != 0),
    q0 AS (SELECT doc_id, text, w,
             len(w)::BIGINT AS n_tokens,
             length(text)::BIGINT AS n_chars,
             (length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))::BIGINT AS n_punct,
             CASE WHEN len(w) > 0
                  THEN len(list_filter(w, x -> x IN ('the','a','and','of','to')))::DOUBLE / len(w)::DOUBLE
                  ELSE 0.0 END AS stopword_ratio,
             {" , ".join(f"{_lang_score_sql(l)} AS s_{l}" for l in sorted(textops.LANG_MARKERS))}
           FROM t),
    m AS (SELECT *, greatest({', '.join('s_' + l for l in sorted(textops.LANG_MARKERS))}) AS m FROM q0),
    gate AS (SELECT doc_id, text, w, n_tokens, ({_LANG_CASE}) AS lang FROM m
             WHERE n_tokens >= 12 AND n_punct * 5 <= n_chars
               AND ({_LANG_CASE}) IN ('en', 'zh') AND stopword_ratio * 100 >= 2),
    rep AS (SELECT *, list_transform(generate_series(1, greatest(len(w) - 1, 0)),
                                     i -> w[i] || ' ' || w[i+1]) AS g2 FROM gate),
    repok AS (SELECT doc_id, text, w, n_tokens, lang FROM rep
              WHERE CASE WHEN len(g2) = 0 THEN 0
                         ELSE 1 - len(list_distinct(g2))::DOUBLE / len(g2) END <= 0.5),
    surv AS (SELECT * FROM (
               SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
               FROM repok) WHERE rn = 1),
    bw AS (SELECT {_SQL_TOKENS} AS w FROM documents WHERE doc_id % 7 = 0),
    bg AS (SELECT DISTINCT unnest({_sql_shingles(5)}) AS shingle FROM bw),
    sg AS (SELECT doc_id, unnest({_sql_shingles(5)}) AS shingle FROM surv),
    cont AS (SELECT DISTINCT sg.doc_id FROM sg JOIN bg USING (shingle)),
    clean AS (SELECT surv.* FROM surv ANTI JOIN cont USING (doc_id))
    SELECT doc_id, lang, n_tokens,
           CASE WHEN ({_SPLIT_HASH_SQL}) % 1000000 < 900000 THEN 'train'
                WHEN ({_SPLIT_HASH_SQL}) % 1000000 < 950000 THEN 'val'
                ELSE 'test' END AS split
    FROM clean
    """,
)
def curate_corpus(spark, sf_dir):
    """THE composed webtext pipeline (quality gate → repetition gate →
    exact dedup → decontamination → split), one declarative chain through
    spider_spark.curation.curate — two shuffles total at any scale; the
    eval set is the doc_id%7==0 slice. Proves the pipeline operators
    compose, value-identically to the single-CTE relational spec."""
    from spider_spark import curation

    d = T(spark, sf_dir, "documents")
    return curation.curate(
        d.where(F.col("doc_id") % 7 != 0), d.where(F.col("doc_id") % 7 == 0)
    )


@q(
    "warc_roundtrip",
    """
    SELECT 'https://corpus.example/doc/' || doc_id::VARCHAR AS url,
           '2026-02-01 00:00:00' AS warc_ts,
           strlen(text)::BIGINT AS n_payload_bytes,
           md5(text) AS payload_md5
    FROM documents
    """,
)
def warc_roundtrip(spark, sf_dir):
    """WARC sink→source roundtrip (the Common-Crawl ingest format): docs
    serialize to per-record-gzip-member .warc.gz files (one per partition,
    written ON the executors), read back through the binaryFile +
    mapInPandas source, and must reproduce every byte — the oracle derives
    the same rows straight from the documents table, so any drift in
    serializer, record framing, or parser shows up as a value mismatch."""
    from spider_spark import warc as warcmod

    d = T(spark, sf_dir, "documents")
    src = d.select(
        F.concat(F.lit("https://corpus.example/doc/"), F.col("doc_id").cast("string")).alias("url"),
        F.lit("2026-02-01 00:00:00").cast("timestamp").alias("warc_ts"),
        F.col("text").alias("payload"),
    ).repartition(8, "url")
    out_dir = tempfile.mkdtemp(prefix="warc_rt_")
    warcmod.write_warc(src, out_dir)
    back = warcmod.read_warc(spark, f"{out_dir}/*.warc.gz")
    return back.select(
        "url",
        F.date_format("warc_ts", "yyyy-MM-dd HH:mm:ss").alias("warc_ts"),
        "n_payload_bytes",
        F.md5(F.encode("payload", "UTF-8")).alias("payload_md5"),
    )


@q(
    "main_content_extract",
    """
    SELECT doc_id,
           text || ' Published under the corpus license.' AS main_text,
           (length(text) + 36)::BIGINT AS n_main_chars
    FROM documents
    """,
)
def main_content_extract(spark, sf_dir):
    """Boilerplate removal (readability-lite over the from-scratch DOM):
    pages synthesized with real chrome — nav + link-farm menu div + aside
    + entity-laden footer — around an article div holding the document
    text; the extractor must return exactly the article (link-density
    scoring kills the menu, NOISE tags kill the rest). The oracle
    reconstructs the planted article from the raw column, so any
    over/under-extraction is a value mismatch."""
    d = T(spark, sf_dir, "documents")
    html = F.concat(
        F.lit(
            '<Html><head><title>Doc</title></head><BODY>'
            '<NAV><a href="/">Home</a> <a href="/x">More &amp; More</a></nav>'
            '<div class="menu"><a href="/1">one two three</a> '
            '<a href="/2">four five six seven</a></div>'
            '<DIV id="main" class="content"><p>'
        ),
        F.col("text"),
        F.lit(
            "</p>\n<p>Published under the corpus license.</p></div>"
            '<aside><a href="/r">related</a> sidebar words that must not leak</aside>'
            "<footer>&copy; 2026 corpus &amp; co</footer></body></html>"
        ),
    )
    ex = parse.main_text_udf()
    s = d.select("doc_id", html.alias("_html"))
    return s.select(
        "doc_id",
        ex(F.col("_html")).alias("main_text"),
        F.length(ex(F.col("_html"))).cast("long").alias("n_main_chars"),
    )


@q(
    "lm_perplexity_scores",
    f"""
    WITH ref AS (SELECT unnest({_SQL_TOKENS}) AS w FROM documents WHERE doc_id % 7 = 0),
    cnt AS (SELECT w, count(*)::BIGINT AS c FROM ref GROUP BY w),
    tot AS (SELECT sum(c)::BIGINT AS t, count(*)::BIGINT AS v FROM cnt),
    tok AS (SELECT doc_id, unnest({_SQL_TOKENS}) AS w FROM documents WHERE doc_id % 7 != 0),
    sc AS (SELECT doc_id, -log2((coalesce(c, 0) + 1)::DOUBLE / (t + v)::DOUBLE) AS b
           FROM tok LEFT JOIN cnt USING (w) CROSS JOIN tot)
    SELECT doc_id, count(*)::BIGINT AS n_tokens, round(avg(b), 6) AS bits_per_token
    FROM sc GROUP BY doc_id
    """,
)
def lm_perplexity_scores(spark, sf_dir):
    """CCNet-style perplexity filtering signal: add-one unigram LM fit on
    the reference slice (doc_id%7==0 plays the trusted corpus), every
    other doc scored as mean -log2 P(w). Vocabulary broadcast; one
    per-doc shuffle. round(6) absorbs double-summation order across
    engines and partitionings."""
    from spider_spark import curation

    d = T(spark, sf_dir, "documents")
    return curation.unigram_lm_scores(
        d.where(F.col("doc_id") % 7 != 0), d.where(F.col("doc_id") % 7 == 0)
    )


# =====================================================================
# Similarity search over embeddings
# =====================================================================

@q(
    "ann_topk",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
    s AS (SELECT q.query_id, e.vec_id AS neighbor_id, list_cosine_similarity(q.qv, e.v) AS c
          FROM q JOIN e ON e.vec_id != q.query_id)
    SELECT query_id, neighbor_id, rank FROM (
      SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id)::INT AS rank
      FROM s)
    WHERE rank <= 5
    """,
)
def ann_topk(spark, sf_dir):
    """Brute-force cosine top-5 (correctness baseline for ANN): query side
    broadcast, corpus streamed, per-query window top-k."""
    e = T(spark, sf_dir, "embeddings")
    out = vectorops.brute_force_topk(e, e.where(F.col("vec_id") < 10), k=5)
    # rank-only output: the oracle compares ranks, not the cos doubles
    # (list_cosine_similarity's fold order differs from dot_col's)
    return out.select("query_id", "neighbor_id", "rank")


@q(
    "ann_lsh_topk",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
    s AS (SELECT q.query_id, e.vec_id AS neighbor_id, list_cosine_similarity(q.qv, e.v) AS c
          FROM q JOIN e ON e.vec_id != q.query_id)
    SELECT query_id, neighbor_id, rank FROM (
      SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id)::INT AS rank
      FROM s)
    WHERE rank <= 5
    """,
)
def ann_lsh_topk(spark, sf_dir):
    """Random-hyperplane multi-probe LSH top-k — the 10^9-vector scale path
    (bucket joins instead of a cross join). The oracle is the EXACT top-5
    SQL: at (n_bits=2, n_tables=12) the union of probes deterministically
    captures every true neighbor on this corpus (measured full recall;
    hyperplanes are seeded, so the outcome is stable), making the
    approximate path value-checkable — the strongest statement an ANN can
    carry. Recall floors for weaker configs are asserted in
    tests/test_pipeline_ops.py (VERDICT r01 item 3)."""
    e = T(spark, sf_dir, "embeddings")
    return vectorops.lsh_topk(
        e, e.where(F.col("vec_id") < 10), k=5, n_bits=2, dim=64, n_tables=12
    )


@q(
    "ann_ivf_topk",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
    s AS (SELECT q.query_id, e.vec_id AS neighbor_id, list_cosine_similarity(q.qv, e.v) AS c
          FROM q JOIN e ON e.vec_id != q.query_id)
    SELECT query_id, neighbor_id, rank FROM (
      SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id)::INT AS rank
      FROM s)
    WHERE rank <= 5
    """,
)
def ann_ivf_topk(spark, sf_dir):
    """IVF-ANN (builder brief: "an IVF or LSH-bucketed variant as the scale
    path") — deterministic k-means coarse quantizer, map-only cluster
    assignment, per-query nprobe centroid-list probing, exact cosine
    rescore. At nprobe = n_list every inverted list is probed, so the
    result EQUALS the brute-force top-5 and the oracle is the exact SQL —
    the same value-checkability contract as ann_lsh_topk. Partial-probe
    recall floors (nprobe < n_list) are asserted in
    tests/test_pipeline_ops.py."""
    e = T(spark, sf_dir, "embeddings")
    return vectorops.ivf_topk(
        e, e.where(F.col("vec_id") < 10), k=5, n_list=8, nprobe=8, iters=2
    )


# =====================================================================
# Multimodal plumbing
# =====================================================================

@q(
    "media_meta",
    """
    SELECT doc_id AS media_id,
           octet_length(encode(text))::BIGINT AS n_bytes,
           substr(sha256(text), 1, 16) AS sha256_prefix
    FROM documents
    """,
)
def media_meta(spark, sf_dir):
    """Opaque-binary metadata extraction through Arrow-batched mapInPandas
    (media.extract_media_meta); payload synthesized as utf-8 bytes of text.
    Decode columns (width/height) use the deterministic fake decoder and are
    asserted in pytest; the oracle checks the codec-free stat columns."""
    d = T(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"), F.encode("text", "UTF-8").alias("payload")
    )
    meta = media.extract_media_meta(d, decoder=media.fake_decoder)
    return meta.select("media_id", "n_bytes", "sha256_prefix")


@q(
    "media_resize",
    """
    WITH m AS (
      SELECT doc_id AS media_id,
             64 + ('0x' || substr(sha256(text), 1, 4))::INT % 512 AS w,
             64 + ('0x' || substr(sha256(text), 5, 4))::INT % 512 AS h
      FROM documents),
    s AS (SELECT media_id, w, h,
                 least(320.0 / w, 240.0 / h, 1.0) AS scale FROM m)
    SELECT media_id,
           w AS src_width, h AS src_height,
           greatest(1, floor(w * scale))::INT AS out_width,
           greatest(1, floor(h * scale))::INT AS out_height,
           greatest(1, floor(w * scale))::BIGINT
             * greatest(1, floor(h * scale))::BIGINT * 3 AS n_out_bytes
    FROM s
    """,
)
def media_resize(spark, sf_dir):
    """Fit-within image resize through Arrow-batched mapInPandas
    (media.resize_media — decode → scale → fake re-encode in one map-only
    task, no shuffle). Unlike media_meta, the DECODE output itself is
    oracle-checked: sha_dims_decoder derives dims from sha256(payload) so
    DuckDB reproduces decode + scale math value-level (the crc32-based
    fake_decoder has no DuckDB builtin); n_out_bytes pins the re-encode
    contract (3 bytes/px). Reference has no resize analog (media bytes go
    straight to disk, 钓鱼视频.py:25-28); this is builder-brief multimodal
    pipeline surface."""
    d = T(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"), F.encode("text", "UTF-8").alias("payload")
    )
    out = media.resize_media(d, 320, 240, decoder=media.sha_dims_decoder)
    return out.select("media_id", "src_width", "src_height",
                      "out_width", "out_height", "n_out_bytes")


@q(
    "media_frame_sample",
    """
    WITH m AS (SELECT doc_id AS media_id,
                      octet_length(encode(text)) // 16 + 1 AS n_frames
               FROM documents)
    SELECT media_id,
           unnest(generate_series(0, n_frames - 1, 3))::BIGINT AS frame_no
    FROM m
    """,
)
def media_frame_sample(spark, sf_dir):
    """Video frame-sampling plumbing (media.frame_sample_plan): each opaque
    media payload expands to every-3rd-frame decode tasks — the explode
    side of a mapInPandas decode (codec absent in this container; frame
    count derives deterministically from payload length, so the EXPANSION
    itself is oracle-checked). The explode is map-only (no shuffle): at
    100 TB the frame tasks inherit the media scan's partitioning and flow
    straight into the decode stage. Builder-brief multimodal surface
    (frame-sample); reference downloads video bytes wholesale
    (钓鱼视频.py:25-28) with no sampling tier."""
    d = T(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"), F.encode("text", "UTF-8").alias("payload")
    )
    plan = media.frame_sample_plan(d, every_n=3)
    return plan.select("media_id", F.col("frame_no").cast("long").alias("frame_no"))


def _plant_png_batches(it):
    """Deterministic real-PNG payloads from doc_id alone: solid gray
    (color = doc_id % 256) at w = 8 + doc_id % 24, h = 8 + 7*doc_id % 24 —
    dims/color an ANSI-SQL oracle can restate, bytes a real codec must
    actually decode."""
    import numpy as np
    import pandas as pd

    from spider_spark import imagecodec

    for pdf in it:
        payloads = []
        for did in pdf["doc_id"]:
            w = 8 + int(did) % 24
            h = 8 + (int(did) * 7) % 24
            c = int(did) % 256
            payloads.append(imagecodec.png_encode(np.full((h, w), c, dtype=np.uint8)))
        yield pd.DataFrame(
            {"media_id": pdf["doc_id"].astype("int64"), "payload": payloads}
        )


def _planted_media(spark, sf_dir) -> DataFrame:
    d = T(spark, sf_dir, "documents").select("doc_id")
    return d.mapInPandas(_plant_png_batches, schema="media_id long, payload binary")


@q(
    "media_real_decode",
    """
    SELECT doc_id AS media_id,
           (8 + doc_id % 24)::INT AS width,
           (8 + (doc_id * 7) % 24)::INT AS height,
           'png' AS format
    FROM documents
    """,
)
def media_real_decode(spark, sf_dir):
    """REAL image decode through the default media pipeline (VERDICT r3
    item 5): payloads are actual PNG bytes written by the vendored codec
    (imagecodec.png_encode) and re-parsed by media.extract_media_meta's
    default decoder (imagecodec.sniff_dims — no fake injected). The oracle
    restates the planted dims from doc_id, so a decode that misreads IHDR
    hash-mismatches. Map-only both stages (plant + decode share the scan's
    partitioning; no shuffle)."""
    meta = media.extract_media_meta(_planted_media(spark, sf_dir))
    return meta.select("media_id", "width", "height", "format")


@q(
    "media_real_resize",
    """
    WITH m AS (
      SELECT doc_id AS media_id,
             8 + doc_id % 24 AS w,
             8 + (doc_id * 7) % 24 AS h
      FROM documents),
    s AS (SELECT media_id, w, h,
                 least(12.0 / w, 12.0 / h, 1.0) AS scale FROM m)
    SELECT media_id,
           greatest(1, floor(w * scale))::INT AS out_width,
           greatest(1, floor(h * scale))::INT AS out_height,
           (media_id % 256)::INT AS solid_color
    FROM s
    """,
)
def media_real_resize(spark, sf_dir):
    """Pixel-true decode → nearest-neighbor resize → PNG re-encode →
    re-decode, all with the vendored codec inside one Arrow-batched
    mapInPandas (no shuffle; per-row working set is one thumbnail). The
    re-decoded output must still be the planted solid color at the
    fit-within dims — pinning filter reversal, resize indexing, and the
    encoder, value-level, against SQL that never touches image bytes."""

    def batches(it):
        import pandas as pd

        from spider_spark import imagecodec

        for pdf in it:
            rows = {"media_id": [], "out_width": [], "out_height": [], "solid_color": []}
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                img = imagecodec.png_decode(bytes(b))
                h, w = img.shape[:2]
                scale = min(12 / w, 12 / h, 1.0)
                ow, oh = max(1, int(w * scale)), max(1, int(h * scale))
                out = imagecodec.png_decode(imagecodec.real_resizer(bytes(b), ow, oh))
                assert out.shape[:2] == (oh, ow)
                colors = set(out.reshape(-1).tolist())
                rows["media_id"].append(int(mid))
                rows["out_width"].append(ow)
                rows["out_height"].append(oh)
                rows["solid_color"].append(colors.pop() if len(colors) == 1 else -1)
            yield pd.DataFrame(rows)

    return _planted_media(spark, sf_dir).mapInPandas(
        batches, schema="media_id long, out_width int, out_height int, solid_color int"
    )


# =====================================================================
# PageRank (§2.A A6) + the crawl itself
# =====================================================================

_LINEITEM_EDGES_SQL = (
    "SELECT DISTINCT l_suppkey::VARCHAR AS src, (l_partkey % 100)::VARCHAR AS dst FROM lineitem"
)


def _pagerank_oracle(iters: int = 5, alpha: float = 0.9,
                     edges_sql: str = _LINEITEM_EDGES_SQL) -> str:
    pre = f"""
    WITH edges AS ({edges_sql}),
    nodes AS (SELECT src AS url FROM edges UNION SELECT dst FROM edges),
    outdeg AS (SELECT src, count(*) AS od FROM edges GROUP BY src),
    nn AS (SELECT count(*)::DOUBLE AS n FROM nodes),
    r0 AS (SELECT url, 1.0 / (SELECT n FROM nn) AS rank FROM nodes)"""
    parts = [pre]
    for i in range(1, iters + 1):
        p = i - 1
        parts.append(f"""
    c{i} AS (SELECT e.dst AS url, sum(r.rank / o.od) AS received
             FROM edges e JOIN r{p} r ON r.url = e.src JOIN outdeg o ON o.src = e.src
             GROUP BY e.dst),
    d{i} AS (SELECT coalesce(sum(r.rank), 0) AS d FROM r{p} r
             WHERE NOT EXISTS (SELECT 1 FROM outdeg o WHERE o.src = r.url)),
    r{i} AS (SELECT n.url,
                    (1 - {alpha}) / (SELECT n FROM nn)
                    + {alpha} * (SELECT d FROM d{i}) / (SELECT n FROM nn)
                    + {alpha} * coalesce(c.received, 0) AS rank
             FROM nodes n LEFT JOIN c{i} c ON c.url = n.url)""")
    return (
        ",".join(parts)
        + f"\n    SELECT url AS node, round(rank, 8) AS rank FROM r{iters}"
    )


def _trustrank_oracle(iters: int = 5, alpha: float = 0.85,
                      edges_sql: str = _LINEITEM_EDGES_SQL) -> str:
    """Unrolled TrustRank CTE chain: teleport vector restricted to the
    trusted set (single-character node labels — deterministic on both
    sides), dangling mass teleported through the same vector. MATERIALIZED
    per level like _hits_oracle (each level is referenced 3×/iteration)."""
    pre = f"""
    WITH edges AS MATERIALIZED ({edges_sql}),
    nodes AS MATERIALIZED (SELECT src AS url FROM edges UNION SELECT dst FROM edges),
    outdeg AS MATERIALIZED (SELECT src, count(*) AS od FROM edges GROUP BY src),
    dd AS MATERIALIZED (SELECT url,
        (CASE WHEN length(url) = 1 THEN 1.0 ELSE 0.0 END)
        / (SELECT count(*) FROM nodes WHERE length(url) = 1)::DOUBLE AS d
        FROM nodes),
    t0 AS MATERIALIZED (SELECT url, d AS rank FROM dd)"""
    parts = [pre]
    for i in range(1, iters + 1):
        p = i - 1
        parts.append(f"""
    c{i} AS MATERIALIZED (SELECT e.dst AS url, sum(t.rank / o.od) AS received
             FROM edges e JOIN t{p} t ON t.url = e.src JOIN outdeg o ON o.src = e.src
             GROUP BY e.dst),
    g{i} AS MATERIALIZED (SELECT coalesce(sum(t.rank), 0) AS g FROM t{p} t
             WHERE NOT EXISTS (SELECT 1 FROM outdeg o WHERE o.src = t.url)),
    t{i} AS MATERIALIZED (SELECT dd.url,
                    (1 - {alpha}) * dd.d
                    + {alpha} * (coalesce(c.received, 0) + (SELECT g FROM g{i}) * dd.d)
                      AS rank
             FROM dd LEFT JOIN c{i} c ON c.url = dd.url)""")
    return (
        ",".join(parts)
        + f"\n    SELECT url AS node, round(rank, 8) AS rank FROM t{iters}"
    )


@q("trustrank_scores", _trustrank_oracle())
def trustrank_scores(spark, sf_dir):
    """TrustRank (Gyöngyi et al., VLDB 2004) over the same supplier→part
    graph as pagerank_ranks, trusted seed set = single-character node
    labels: rank mass enters ONLY through the seeds and decays with link
    distance, so link farms unreachable from trusted hosts score ~0 —
    the spam-demotion complement to the reference's single PageRank
    reprioritization signal (master.py:125-149). Oracle = unrolled
    materialized CTE chain."""
    li = T(spark, sf_dir, "lineitem")
    edges = li.select(
        F.col("l_suppkey").cast("string").alias("src"),
        (F.col("l_partkey") % 100).cast("string").alias("dst"),
    ).distinct()
    nodes = edges.select(F.col("src").alias("url")).union(
        edges.select(F.col("dst").alias("url"))).distinct()
    trusted = nodes.where(F.length("url") == 1)
    ranks = trustrank(edges, trusted, alpha=0.85, iters=5)
    return ranks.select(F.col("url").alias("node"), F.round("rank", 8).alias("rank"))


@q("pagerank_ranks", _pagerank_oracle())
def pagerank_ranks(spark, sf_dir):
    """A6 done right (master.py:125-149 semantics, working implementation):
    5 damped iterations with uniform dangling redistribution over the
    supplier→part bipartite graph; oracle = unrolled CTE chain."""
    li = T(spark, sf_dir, "lineitem")
    edges = li.select(
        F.col("l_suppkey").cast("string").alias("src"),
        (F.col("l_partkey") % 100).cast("string").alias("dst"),
    ).distinct()
    ranks = pagerank(edges, alpha=0.9, iters=5)
    return ranks.select(F.col("url").alias("node"), F.round("rank", 8).alias("rank"))


def _hits_oracle(iters: int = 5, edges_sql: str = _LINEITEM_EDGES_SQL) -> str:
    """Unrolled HITS CTE chain (same device as _pagerank_oracle): per
    iteration auth-sum → L1-normalize → hub-sum → L1-normalize.

    Every per-iteration CTE is AS MATERIALIZED: each level is referenced
    several times (the L1-norm scalar subqueries re-read their own level),
    so inlining would expand to ~8^iters parquet scans — DuckDB literally
    runs out of file descriptors at iters=5. Materialization keeps the
    oracle linear in iters, mirroring the engine's per-iteration
    localCheckpoint."""
    pre = f"""
    WITH edges AS MATERIALIZED ({edges_sql}),
    nodes AS MATERIALIZED (SELECT src AS url FROM edges UNION SELECT dst FROM edges),
    nn AS (SELECT count(*)::DOUBLE AS n FROM nodes),
    s0 AS MATERIALIZED (SELECT url, 1.0 / (SELECT n FROM nn) AS hub,
                       1.0 / (SELECT n FROM nn) AS auth FROM nodes)"""
    parts = [pre]
    for i in range(1, iters + 1):
        p = i - 1
        parts.append(f"""
    ar{i} AS MATERIALIZED (SELECT e.dst AS url, sum(s.hub) AS a
              FROM edges e JOIN s{p} s ON s.url = e.src GROUP BY e.dst),
    a{i} AS MATERIALIZED (SELECT n.url, coalesce(ar.a, 0) AS a
             FROM nodes n LEFT JOIN ar{i} ar ON ar.url = n.url),
    aa{i} AS MATERIALIZED (SELECT url, a / (SELECT sum(a) FROM a{i}) AS auth FROM a{i}),
    hr{i} AS MATERIALIZED (SELECT e.src AS url, sum(aa.auth) AS h
              FROM edges e JOIN aa{i} aa ON aa.url = e.dst GROUP BY e.src),
    h{i} AS MATERIALIZED (SELECT n.url, coalesce(hr.h, 0) AS h
             FROM nodes n LEFT JOIN hr{i} hr ON hr.url = n.url),
    s{i} AS MATERIALIZED (SELECT h.url, h.h / (SELECT sum(h) FROM h{i}) AS hub, aa.auth
             FROM h{i} h JOIN aa{i} aa ON aa.url = h.url)""")
    return (
        ",".join(parts)
        + f"\n    SELECT url AS node, round(hub, 8) AS hub, round(auth, 8) AS auth FROM s{iters}"
    )


@q("hits_scores", _hits_oracle())
def hits_scores(spark, sf_dir):
    """Kleinberg HITS over the same supplier→part graph as pagerank_ranks:
    hub scores steer the frontier toward link-rich pages (where new URLs
    surface), auth scores steer recrawl toward link-endorsed pages —
    the hub/auth complement to the reference's single-score
    reprioritization (master.py:125-149). Oracle = unrolled CTE chain."""
    li = T(spark, sf_dir, "lineitem")
    edges = li.select(
        F.col("l_suppkey").cast("string").alias("src"),
        (F.col("l_partkey") % 100).cast("string").alias("dst"),
    ).distinct()
    scores = hits(edges, iters=5)
    return scores.select(
        F.col("url").alias("node"),
        F.round("hub", 8).alias("hub"),
        F.round("auth", 8).alias("auth"),
    )


# ---------------------------------------------------------------- the crawl
_CRAWL_ORACLE = """
    WITH RECURSIVE nn AS (SELECT count(*)::BIGINT AS c FROM documents),
    reach(doc, d) AS (
      SELECT doc, d FROM (VALUES (0::BIGINT, 0), (1::BIGINT, 0), (2::BIGINT, 0)) t(doc, d)
      UNION
      SELECT (7 * r.doc + k.k) % (SELECT c FROM nn), r.d + 1
      FROM reach r, (VALUES (1), (2), (3)) k(k)
      WHERE r.d < 40)
    SELECT doc AS doc_id, min(d) AS depth, min(d) + 1 AS fetched_round
    FROM reach GROUP BY doc
"""


def _doc_pages(spark: SparkSession, sf_dir: str, limit: int | None = None,
               rep: bool = False):
    """Deterministic corpus from the documents table: doc i links to
    (7i+k) % N for k∈{1,2,3}; 13 hosts. Returns (pages, seeds, policy, n).

    rep=True plants in-page REP directives with closed-form residues so a
    directive-honoring crawl stays SQL-oracle-able: 5|id pages declare
    noindex, 11|id+4 pages declare page-level nofollow (their three links
    must not enter the frontier), and the k=2 anchor carries
    rel="nofollow" on 7|id+3 pages (that one edge must be dropped)."""
    docs = T(spark, sf_dir, "documents").select("doc_id", "text")
    if limit is not None:
        docs = docs.where(F.col("doc_id") < limit)
    n = docs.count()
    did = F.col("doc_id")

    def url_expr(doc):
        return F.concat(
            F.lit("https://h"), (doc % 13).cast("string"),
            F.lit(".docs.example.com/d/"), doc.cast("string"),
        )

    def rel_expr(k):
        if rep and k == 2:
            return F.when(did % 7 == 3, F.lit(' rel="nofollow"')).otherwise(F.lit(""))
        return F.lit("")

    anchors = [
        F.concat(F.lit("<a"), rel_expr(k), F.lit(' href="'),
                 url_expr((F.col("doc_id") * 7 + k) % n), F.lit('">l</a>'))
        for k in (1, 2, 3)
    ]
    meta = F.lit("")
    if rep:
        meta = (
            F.when((did % 5 == 0) & (did % 11 == 4),
                   F.lit('<meta name="robots" content="noindex, nofollow">'))
            .when(did % 5 == 0, F.lit('<meta name="robots" content="noindex">'))
            .when(did % 11 == 4, F.lit('<meta name="robots" content="nofollow">'))
            .otherwise(F.lit(""))
        )
    html = F.concat(
        F.lit("<html><head><title>D"), F.col("doc_id").cast("string"),
        F.lit("</title>"), meta, F.lit("</head><body><p>"), F.col("text"),
        F.lit("</p>"), *anchors, F.lit("</body></html>"),
    )
    pages = docs.select(
        url_expr(F.col("doc_id")).alias("url"), F.encode(html, "UTF-8").alias("html")
    )
    seeds = [(f"https://h{i % 13}.docs.example.com/d/{i}", 0) for i in range(min(3, n))]
    policy = spark.createDataFrame(
        [(f"h{i}.docs.example.com", 5.0, ["/"], [], -1) for i in range(13)],
        "host string, crawl_delay double, robots_allow array<string>, robots_deny array<string>, host_budget int",
    )
    return pages, seeds, policy, n


@q("crawl_docs", _CRAWL_ORACLE)
def crawl_docs(spark, sf_dir):
    """THE flagship: full crawl engine (frontier ⋈ pages rounds, politeness,
    first-wins dedup, snapshot per round) over a deterministic link graph
    derived from the documents table. The BFS fixpoint is SQL-expressible,
    so even the iterative crawl gets a value-level oracle: depth = BFS
    min-depth, fetched_round = depth + 1."""
    pages, seeds, policy, n = _doc_pages(spark, sf_dir)
    pages = pages.persist()  # joined every round — don't rebuild the corpus
    workdir = tempfile.mkdtemp(prefix="crawl_docs_")
    summary = crawl(
        spark, workdir, pages, seeds, policy,
        CrawlConfig(max_rounds=45, use_bloom=False, n_salt=4, write_coalesce=4,
                    seq_mode="hash"),
    )
    pages.unpersist()
    frontier = tbl.read_table(spark, workdir, summary.last_round, "frontier")
    return frontier.where(F.col("status") == "done").select(
        F.regexp_extract("url", r"/d/(\d+)$", 1).cast("long").alias("doc_id"),
        F.col("depth").cast("int").alias("depth"),
        F.col("fetched_round").cast("int").alias("fetched_round"),
    )


def flagship_entry(spark: SparkSession) -> DataFrame:
    """Driver smoke: the crawl flagship at sf0.001, capped to 120 docs."""
    sf_dir = "/root/testdata/sf0.001"
    pages, seeds, policy, n = _doc_pages(spark, sf_dir, limit=120)
    pages = pages.persist()
    workdir = tempfile.mkdtemp(prefix="entry_crawl_")
    summary = crawl(
        spark, workdir, pages, seeds, policy,
        CrawlConfig(max_rounds=30, use_bloom=True, bloom_buckets=8, n_salt=4,
                    write_coalesce=4, seq_mode="hash"),
    )
    frontier = tbl.read_table(spark, workdir, summary.last_round, "frontier")
    return frontier.select("url", "depth", "status", "discovered_round", "fetched_round")


# =====================================================================
# Web-archive indexing + crawl scheduling (webindex.py): SURT, CDX,
# trap-shape detection, change-rate recrawl tiers, containment dedup
# =====================================================================

def _messy_url_col():
    """Deterministic messy-URL synthesis from doc_id: mixed case, www
    prefixes, explicit ports, out-of-order query params, calendar paths —
    the four families a canonicalizer/SURT keyer must normalize."""
    d = F.col("doc_id")
    m = d % 4
    sub = (d % 7).cast("string")
    ds = d.cast("string")
    return (
        F.when(m == 0, F.concat(
            F.lit("HTTPS://WWW.Site"), sub, F.lit(".Example.COM/Articles/"),
            ds, F.lit("?utm_source=x&id="), (d % 5).cast("string")))
        .when(m == 1, F.concat(
            F.lit("http://site"), sub, F.lit(".example.com:8080/a/b/"), ds))
        .when(m == 2, F.concat(
            F.lit("https://site"), sub, F.lit(".example.com/?b=2&a=1")))
        .otherwise(F.concat(
            F.lit("https://news.site"), sub, F.lit(".example.com/2024/01/"),
            ds, F.lit("/index.html")))
    )


_MESSY_URL_SQL = """
      CASE doc_id % 4
        WHEN 0 THEN 'HTTPS://WWW.Site' || (doc_id % 7)::VARCHAR || '.Example.COM/Articles/'
                    || doc_id::VARCHAR || '?utm_source=x&id=' || (doc_id % 5)::VARCHAR
        WHEN 1 THEN 'http://site' || (doc_id % 7)::VARCHAR || '.example.com:8080/a/b/' || doc_id::VARCHAR
        WHEN 2 THEN 'https://site' || (doc_id % 7)::VARCHAR || '.example.com/?b=2&a=1'
        ELSE 'https://news.site' || (doc_id % 7)::VARCHAR || '.example.com/2024/01/'
             || doc_id::VARCHAR || '/index.html'
      END
"""


@q(
    "surt_keys",
    f"""
    WITH u AS (SELECT doc_id, {_MESSY_URL_SQL} AS url FROM documents),
    p AS (
      SELECT doc_id, url,
        regexp_replace(lower(regexp_extract(url, '^[A-Za-z]+://([^/?#:]+)', 1)), '^www\\.', '') AS host,
        lower(regexp_extract(url, '^[A-Za-z]+://[^/?#]+(/[^?#]*)', 1)) AS rawpath,
        lower(regexp_extract(url, '\\?([^#]*)', 1)) AS rawq
      FROM u)
    SELECT doc_id, url,
      array_to_string(list_reverse(string_split(host, '.')), ',') || ')'
      || (CASE WHEN rawpath = '' THEN '/' ELSE rawpath END)
      || (CASE WHEN rawq = '' THEN ''
               ELSE '?' || array_to_string(list_sort(string_split(rawq, '&')), '&') END) AS urlkey
    FROM p
    """,
)
def surt_keys(spark, sf_dir):
    """SURT url keys (webindex.surt_col) over the messy-URL families: the
    sort-friendly key a CDX archive index range-partitions on. The oracle
    parses the same URLs with an independent regex decomposition, so the
    try_parse_url-based Spark path is value-checked component by
    component (case folding, www/port stripping, host reversal, empty-path
    normalization, query-param sorting)."""
    d = T(spark, sf_dir, "documents").select("doc_id")
    u = d.select("doc_id", _messy_url_col().alias("url"))
    return u.select("doc_id", "url", webindex.surt_col(F.col("url")).alias("urlkey"))


@q(
    "cdx_index",
    """
    WITH caps AS (
      SELECT doc_id, k,
        'com,example,docs,h' || (doc_id % 13)::VARCHAR || ')/d/' || doc_id::VARCHAR AS urlkey,
        strftime(make_timestamp(2024, 3 + k, 1 + doc_id % 28, doc_id % 24, doc_id % 60, 0.0),
                 '%Y%m%d%H%M%S') AS cdx_ts,
        '<html><body>' || text ||
          (CASE WHEN doc_id % 3 = 0 THEN 'v' || k::VARCHAR ELSE '' END) || '</body></html>' AS page
      FROM documents CROSS JOIN (SELECT unnest(generate_series(0, 1)) AS k) g)
    SELECT urlkey, cdx_ts,
           substr(sha256(page), 1, 16) AS digest,
           octet_length(encode(page))::BIGINT AS n_bytes,
           row_number() OVER (PARTITION BY urlkey ORDER BY cdx_ts,
                              substr(sha256(page), 1, 16))::INT AS seq
    FROM caps
    """,
)
def cdx_index(spark, sf_dir):
    """CDX-style capture index (webindex.cdx_index) over a two-capture
    history per document: SURT urlkey, 14-digit timestamp, content digest,
    byte length, per-urlkey capture sequence. seq is windowed WITHIN
    urlkey (never a global row_number — that is a single-partition
    bottleneck at 10^10 captures; the per-key shuffle is the same one the
    range-partitioned CDX sink needs anyway)."""
    d = T(spark, sf_dir, "documents").select("doc_id", "text")
    caps = d.select(
        "doc_id", "text",
        F.explode(F.sequence(F.lit(0), F.lit(1))).alias("k"),
    )
    dd = F.col("doc_id")
    url = F.concat(
        F.lit("https://h"), (dd % 13).cast("string"),
        F.lit(".docs.example.com/d/"), dd.cast("string"),
    )
    ts = F.make_timestamp(
        F.lit(2024), F.lit(3) + F.col("k"), (dd % 28 + 1).cast("int"),
        (dd % 24).cast("int"), (dd % 60).cast("int"), F.lit(0),
    )
    page = F.concat(
        F.lit("<html><body>"), F.col("text"),
        F.when(dd % 3 == 0, F.concat(F.lit("v"), F.col("k").cast("string"))).otherwise(F.lit("")),
        F.lit("</body></html>"),
    )
    captures = caps.select(
        url.alias("url"), ts.alias("warc_ts"), F.encode(page, "UTF-8").alias("html")
    )
    return webindex.cdx_index(captures)


@q(
    "url_trap_scores",
    """
    WITH u AS (
      SELECT doc_id,
        'https://site' || (doc_id % 7)::VARCHAR || '.example.com/' ||
        (CASE doc_id % 5
           WHEN 0 THEN repeat('loop/', (2 + doc_id % 6)::INT) || 'p'
           WHEN 1 THEN 'a/b/c/d/e/f/g/h/i/' || doc_id::VARCHAR
           WHEN 2 THEN 'cal/2024/01/' || (1 + doc_id % 28)::VARCHAR
           ELSE 'page/' || doc_id::VARCHAR END) ||
        (CASE WHEN doc_id % 3 = 0
              THEN '?s=' || repeat('p&', (doc_id % 12)::INT) || 'e=1' ELSE '' END) AS url
      FROM documents),
    p AS (
      SELECT doc_id, url,
        list_filter(string_split(lower(regexp_extract(url, '^[A-Za-z]+://[^/?#]+(/[^?#]*)', 1)), '/'),
                    x -> x != '') AS segs,
        lower(regexp_extract(url, '^[A-Za-z]+://[^/?#]+(/[^?#]*)', 1)) AS path,
        regexp_extract(url, '\\?([^#]*)', 1) AS rawq
      FROM u),
    f AS (
      SELECT doc_id, url,
        len(segs)::INT AS path_depth,
        coalesce(list_max(list_transform(list_distinct(segs),
                 s -> len(list_filter(segs, x -> x = s)))), 0)::INT AS max_seg_repeat,
        (CASE WHEN rawq = '' THEN 0 ELSE len(string_split(rawq, '&')) END)::INT AS n_params,
        length(url)::INT AS url_len,
        (CASE WHEN regexp_matches(path, '/[0-9]{4}/[0-9]{2}/') THEN 1 ELSE 0 END)::INT AS has_calendar
      FROM p)
    SELECT doc_id, url, path_depth, max_seg_repeat, n_params, url_len, has_calendar,
           (CASE WHEN max_seg_repeat >= 3 OR path_depth > 8 OR n_params > 8
                      OR url_len > 200 THEN 1 ELSE 0 END)::INT AS is_trap
    FROM f
    """,
)
def url_trap_scores(spark, sf_dir):
    """URL-shape crawler-trap scoring (webindex.trap_feature_cols) over a
    synthetic frontier containing calendar loops, repeated-segment mirror
    traps, deep paths, and query-param explosions. Complements the engine's
    volumetric max_urls_per_host guard (round.py): shape scoring rejects a
    trap BEFORE spending fetches on it; map-only, runs inside the frontier
    admission stage."""
    d = T(spark, sf_dir, "documents").select("doc_id")
    dd = F.col("doc_id")
    path_mid = (
        F.when(dd % 5 == 0, F.concat(
            F.repeat(F.lit("loop/"), (dd % 6 + 2).cast("int")), F.lit("p")))
        .when(dd % 5 == 1, F.concat(F.lit("a/b/c/d/e/f/g/h/i/"), dd.cast("string")))
        .when(dd % 5 == 2, F.concat(F.lit("cal/2024/01/"), (dd % 28 + 1).cast("string")))
        .otherwise(F.concat(F.lit("page/"), dd.cast("string")))
    )
    qpart = F.when(
        dd % 3 == 0,
        F.concat(F.lit("?s="), F.repeat(F.lit("p&"), (dd % 12).cast("int")), F.lit("e=1")),
    ).otherwise(F.lit(""))
    url = F.concat(
        F.lit("https://site"), (dd % 7).cast("string"), F.lit(".example.com/"),
        path_mid, qpart,
    )
    u = d.select("doc_id", url.alias("url"))
    cols = webindex.trap_feature_cols(F.col("url"))
    return u.select("doc_id", "url", *[c.alias(k) for k, c in cols.items()])


_HOST_EDGES_SQL = """
    SELECT DISTINCT 'h' || (doc_id % 13)::VARCHAR AS src,
           'h' || (((7 * doc_id + k) % (SELECT count(*) FROM documents)) % 13)::VARCHAR AS dst
    FROM documents CROSS JOIN (SELECT unnest([1, 2, 3]) AS k) t
"""


@q("host_graph_rank", _pagerank_oracle(iters=5, alpha=0.9, edges_sql=_HOST_EDGES_SQL))
def host_graph_rank(spark, sf_dir):
    """Host-level PageRank: the page graph of the crawl corpus (doc i →
    (7i+k) mod N, host = id mod 13) aggregated to its host graph, then the
    same damped-PageRank engine (pagerank.py). This is the crawl-ordering
    signal a frontier actually uses at 10^10 URLs — ranking 10^7 hosts
    instead of 10^10 pages makes the reprioritization join broadcast-able
    (master.py:125-149 reorders per-URL; host aggregation is the scale
    fix). Oracle: the unrolled-CTE chain parameterized on the host edge
    set."""
    docs = T(spark, sf_dir, "documents").select("doc_id")
    n = docs.count()
    dd = F.col("doc_id")
    edges = (
        docs.select(dd, F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("k"))
        .select(
            F.concat(F.lit("h"), (dd % 13).cast("string")).alias("src"),
            F.concat(
                F.lit("h"), (((dd * 7 + F.col("k")) % n) % 13).cast("string")
            ).alias("dst"),
        )
        .distinct()
    )
    ranks = pagerank(edges, alpha=0.9, iters=5)
    return ranks.select(F.col("url").alias("node"), F.round("rank", 8).alias("rank"))


_TRIANGLE_EDGES_SQL = """
      SELECT 'u' || doc_id::VARCHAR AS s,
             'u' || ((doc_id + 1) % (SELECT count(*) FROM documents))::VARCHAR AS d
      FROM documents
      UNION ALL
      SELECT 'u' || doc_id::VARCHAR,
             'u' || ((doc_id + 2) % (SELECT count(*) FROM documents))::VARCHAR
      FROM documents
      UNION ALL
      SELECT 'u' || doc_id::VARCHAR,
             'u' || ((doc_id * 7 + 1) % (SELECT count(*) FROM documents))::VARCHAR
      FROM documents
"""


@q(
    "host_triangles",
    f"""
    WITH e0 AS ({_TRIANGLE_EDGES_SQL}),
    base AS (SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b
             FROM e0 WHERE s <> d),
    deg AS (SELECT node, count(*) AS degree FROM
              (SELECT a AS node FROM base UNION ALL SELECT b FROM base)
            GROUP BY node),
    tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
            FROM base e1
            JOIN base e2 ON e2.a = e1.b
            JOIN base e3 ON e3.a = e1.a AND e3.b = e2.b),
    cnt AS (SELECT node, count(*) AS t FROM
              (SELECT x AS node FROM tri
               UNION ALL SELECT y FROM tri
               UNION ALL SELECT z FROM tri)
            GROUP BY node)
    SELECT d.node AS host, d.degree,
           coalesce(c.t, 0)::BIGINT AS n_triangles,
           round(CASE WHEN d.degree > 1
                 THEN 2.0 * coalesce(c.t, 0) / (d.degree * (d.degree - 1.0))
                 ELSE 0.0 END, 8) AS clustering
    FROM deg d LEFT JOIN cnt c ON c.node = d.node
    """,
)
def host_triangles(spark, sf_dir):
    """Per-host triangle counts + local clustering coefficient
    (graph.triangle_counts — degree-ordered compact-forward, the
    arboricity-bounded wedge enumeration that survives Zipf hub skew at
    web scale; see the graph.py docstring for the shuffle budget). Link
    farms and mirror rings show up as dense-triangle host neighbourhoods —
    the policy signal TrustRank/url_trap_scores don't capture. The input
    graph is the same deterministic doc-derived construction family as
    host_graph_rank, extended with ring edges (i→i+1, i→i+2) so every node
    sits in at least one triangle and the clustering column is non-trivial;
    the DuckDB oracle enumerates triangles by lexicographic a<b<c 3-way
    join — a DIFFERENT enumeration order than the engine's degree
    orientation, so agreement checks the algorithm, not the
    implementation."""
    docs = T(spark, sf_dir, "documents").select("doc_id")
    n = docs.count()
    i = F.col("doc_id")

    def lbl(c):
        return F.concat(F.lit("u"), c.cast("string"))

    e = (
        docs.select(lbl(i).alias("src"), lbl((i + 1) % n).alias("dst"))
        .unionByName(docs.select(lbl(i).alias("src"), lbl((i + 2) % n).alias("dst")))
        .unionByName(docs.select(lbl(i).alias("src"), lbl((i * 7 + 1) % n).alias("dst")))
    )
    t = graph.triangle_counts(e)
    return t.select(
        F.col("node").alias("host"),
        "degree",
        "n_triangles",
        F.round("clustering", 8).alias("clustering"),
    )


def _kcore_oracle(k: int = 3, rounds: int = 20) -> str:
    """Unrolled synchronous k-core peel: round i keeps nodes whose degree
    in e_{i-1} is ≥ k and restricts the edge set to them. Extra rounds
    past the fixed point are no-ops, so a static unroll depth of 20
    (covers tree height up to 2^19 docs) reproduces the engine's
    peel-until-converged loop exactly. MATERIALIZED per level — each
    e_i is referenced three times by level i+1."""
    pre = """
    WITH e0 AS MATERIALIZED (
      SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b FROM (
        SELECT 'u' || doc_id::VARCHAR AS s,
               'u' || ((doc_id - 1) // 2)::VARCHAR AS d
        FROM documents WHERE doc_id >= 1
        UNION ALL
        SELECT 'u' || x.doc_id::VARCHAR, 'u' || y.doc_id::VARCHAR
        FROM documents x JOIN documents y
          ON x.doc_id < y.doc_id AND x.doc_id < 10 AND y.doc_id < 10
      ) WHERE s <> d),
    nodes AS MATERIALIZED (SELECT a AS node FROM e0 UNION SELECT b FROM e0)"""
    parts = [pre]
    for i in range(1, rounds + 1):
        p = i - 1
        parts.append(f"""
    k{i} AS MATERIALIZED (
      SELECT node FROM (SELECT a AS node FROM e{p} UNION ALL SELECT b FROM e{p})
      GROUP BY node HAVING count(*) >= {k}),
    e{i} AS MATERIALIZED (
      SELECT a, b FROM e{p}
      WHERE a IN (SELECT node FROM k{i}) AND b IN (SELECT node FROM k{i}))""")
    return (
        ",".join(parts)
        + f""",
    cd AS (SELECT node, count(*) AS core_degree FROM
             (SELECT a AS node FROM e{rounds} UNION ALL SELECT b FROM e{rounds})
           GROUP BY node)
    SELECT n.node, cd.node IS NOT NULL AS in_core,
           coalesce(cd.core_degree, 0)::BIGINT AS core_degree
    FROM nodes n LEFT JOIN cd ON cd.node = n.node"""
    )


@q("host_kcore", _kcore_oracle(k=3, rounds=20))
def host_kcore(spark, sf_dir):
    """k-core decomposition (graph.kcore, synchronous peel) on a graph
    built to exercise real peel DEPTH: a binary tree over all docs
    (i — (i-1)//2) whose leaves cascade away layer by layer (~log2 n peel
    rounds — 8 at sf0.01, 12 at sf0.1), plus a K10 clique on docs 0-9
    that is exactly the surviving 3-core (core_degree 9 each). Dense
    cores are where link farms and mirror rings live; the honest
    tree-ish web peels out. Oracle: the unrolled 20-level peel — deeper
    than any fixture's fixed point, and no-op levels past convergence
    keep it exact."""
    docs = T(spark, sf_dir, "documents").select("doc_id")
    i = F.col("doc_id")

    def lbl(c):
        return F.concat(F.lit("u"), c.cast("string"))

    tree = docs.where(i >= 1).select(
        lbl(i).alias("src"),
        lbl(F.floor((i - 1) / 2).cast("long")).alias("dst"),
    )
    left = docs.where(i < 10).select(i.alias("x"))
    right = docs.where(i < 10).select(i.alias("y"))
    clique = left.join(right, F.col("x") < F.col("y")).select(
        lbl(F.col("x")).alias("src"), lbl(F.col("y")).alias("dst")
    )
    out = graph.kcore(tree.unionByName(clique), k=3)
    return out.select("node", "in_core", "core_degree")


_CONTAIN_CORPUS_SQL = f"""
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 100000 AS doc_id,
             array_to_string(list_slice(w, 1, (3 * len(w)) // 5), ' ') AS text
      FROM (SELECT doc_id, {_SQL_TOKENS} AS w FROM documents) t0
"""


@q(
    "shingle_containment",
    f"""
    WITH corpus AS ({_CONTAIN_CORPUS_SQL}),
    t AS (SELECT doc_id, {_SQL_TOKENS} AS w FROM corpus),
    g AS (SELECT doc_id, unnest({_sql_shingles(3)}) AS shingle FROM t),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM g GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter
      FROM g a JOIN g b ON a.shingle = b.shingle AND a.doc_id != b.doc_id
      GROUP BY 1, 2)
    SELECT a_id, b_id, inter::DOUBLE / sa.n_sh::DOUBLE AS containment
    FROM inter JOIN sizes sa ON sa.doc_id = a_id
    WHERE inter::DOUBLE / sa.n_sh::DOUBLE >= 0.9
    """,
)
def shingle_containment(spark, sf_dir):
    """Asymmetric n-gram containment ≥ 0.9 (dedup.containment_pairs) over
    the corpus plus 60%-prefix variants of every document — the
    subsumed-page case (template embeddings, paginated supersets, quoted
    articles) that symmetric Jaccard structurally misses: a prefix doc is
    100% contained in its original while their Jaccard is only ~0.6.
    max_df=256 bounds the self-join on boilerplate-hot shingles without
    binding on the fixture (see dedup_ngram_jaccard)."""
    corpus = _containment_corpus(spark, sf_dir)
    return dedup.containment_pairs(corpus, 0.9, 3, max_df=256)


def _containment_corpus(spark, sf_dir):
    d = T(spark, sf_dir, "documents").select("doc_id", "text")
    toks = d.select("doc_id", textops.tokens_col(F.col("text")).alias("toks"))
    k = F.expr("(3 * size(toks)) div 5").cast("int")
    prefixes = toks.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.array_join(F.slice(F.col("toks"), F.lit(1), k), " ").alias("text"),
    )
    return d.unionByName(prefixes)


@q(
    "containment_lsh",
    f"""
    WITH corpus AS ({_CONTAIN_CORPUS_SQL}),
    t AS (SELECT doc_id, {_SQL_TOKENS} AS w FROM corpus),
    g AS (SELECT doc_id, unnest({_sql_shingles(3)}) AS shingle FROM t),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM g GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter
      FROM g a JOIN g b ON a.shingle = b.shingle AND a.doc_id != b.doc_id
      GROUP BY 1, 2)
    SELECT a_id, b_id, inter::DOUBLE / sa.n_sh::DOUBLE AS containment
    FROM inter JOIN sizes sa ON sa.doc_id = a_id
    WHERE inter::DOUBLE / sa.n_sh::DOUBLE >= 0.9
    """,
)
def containment_lsh(spark, sf_dir):
    """The 100 TB containment path (dedup.containment_pairs_lsh): MinHash
    banding at the lower Jaccard threshold t/(1+r−t) implied by
    containment ≥ 0.9 under size ratio ≤ 4 generates candidates; exact
    containment verifies only those — never a full shingle self-join. On
    the prefix fixture every true pair sits at ratio 5/3 and Jaccard ≈ 0.6,
    where the auto-picked banding's miss probability is < 1e-50, so the
    verified output equals the exact answer and the oracle is the same
    exact-containment SQL as shingle_containment."""
    corpus = _containment_corpus(spark, sf_dir)
    return dedup.containment_pairs_lsh(corpus, 0.9, 3, max_size_ratio=4.0,
                                       max_df=256)


@q(
    "recrawl_priority",
    """
    WITH h AS (
      SELECT 'https://h' || (doc_id % 13)::VARCHAR || '.docs.example.com/d/'
               || doc_id::VARCHAR AS url,
             i,
             md5(doc_id::VARCHAR || ':' || (i // (1 + doc_id % 6))::VARCHAR) AS digest
      FROM documents CROSS JOIN (SELECT unnest(generate_series(1, 6)) AS i) g),
    c AS (
      SELECT url, i,
             CASE WHEN lag(digest) OVER (PARTITION BY url ORDER BY i) IS NULL THEN 0
                  WHEN digest != lag(digest) OVER (PARTITION BY url ORDER BY i) THEN 1
                  ELSE 0 END AS changed
      FROM h),
    a AS (SELECT url, count(*)::INT AS n_obs, sum(changed)::INT AS n_changes
          FROM c GROUP BY url)
    SELECT url, n_obs, n_changes,
           CASE WHEN n_obs > 1 THEN n_changes::DOUBLE / (n_obs - 1)::DOUBLE
                ELSE 0.0 END AS change_rate,
           CASE WHEN (CASE WHEN n_obs > 1 THEN n_changes::DOUBLE / (n_obs - 1)::DOUBLE ELSE 0.0 END) >= 0.8 THEN 'hot'
                WHEN (CASE WHEN n_obs > 1 THEN n_changes::DOUBLE / (n_obs - 1)::DOUBLE ELSE 0.0 END) >= 0.3 THEN 'warm'
                ELSE 'cold' END AS tier
    FROM a
    """,
)
def recrawl_priority(spark, sf_dir):
    """Change-rate recrawl scheduling (webindex.recrawl_priority): six
    captures per URL whose digest rolls over every (1 + doc_id % 6)
    captures — change rates 0.2 through 1.0 — classified into
    hot/warm/cold recrawl tiers from digest transitions. The incremental-
    crawl budget allocator: politeness budget flows to hot hosts first."""
    d = T(spark, sf_dir, "documents").select("doc_id")
    dd = F.col("doc_id")
    hist = d.select(
        dd, F.explode(F.sequence(F.lit(1), F.lit(6))).alias("i_raw")
    ).select(
        dd, F.col("i_raw").cast("long").alias("i")
    ).select(
        F.concat(
            F.lit("https://h"), (dd % 13).cast("string"),
            F.lit(".docs.example.com/d/"), dd.cast("string"),
        ).alias("url"),
        F.col("i").alias("obs_ts"),
        F.md5(
            F.concat(
                dd.cast("string"), F.lit(":"),
                F.expr("i div (1 + doc_id % 6)").cast("string"),
            )
        ).alias("digest"),
    )
    return webindex.recrawl_priority(hist, id_col="url", ts_col="obs_ts",
                                     digest_col="digest")


_CDX_CAPS_SQL = """
      SELECT doc_id, k,
        'com,example,docs,h' || (doc_id % 13)::VARCHAR || ')/d/' || doc_id::VARCHAR AS urlkey,
        strftime(make_timestamp(2024, 3 + k, 1 + doc_id % 28, doc_id % 24, doc_id % 60, 0.0),
                 '%Y%m%d%H%M%S') AS cdx_ts,
        '<html><body>' || text ||
          (CASE WHEN doc_id % 3 = 0 THEN 'v' || k::VARCHAR ELSE '' END) || '</body></html>' AS page
      FROM documents CROSS JOIN (SELECT unnest(generate_series(0, 1)) AS k) g
"""


def _cdx_captures_df(spark, sf_dir):
    d = T(spark, sf_dir, "documents").select("doc_id", "text")
    caps = d.select(
        "doc_id", "text",
        F.explode(F.sequence(F.lit(0), F.lit(1))).alias("k"),
    )
    dd = F.col("doc_id")
    url = F.concat(
        F.lit("https://h"), (dd % 13).cast("string"),
        F.lit(".docs.example.com/d/"), dd.cast("string"),
    )
    ts = F.make_timestamp(
        F.lit(2024), F.lit(3) + F.col("k"), (dd % 28 + 1).cast("int"),
        (dd % 24).cast("int"), (dd % 60).cast("int"), F.lit(0),
    )
    page = F.concat(
        F.lit("<html><body>"), F.col("text"),
        F.when(dd % 3 == 0, F.concat(F.lit("v"), F.col("k").cast("string"))).otherwise(F.lit("")),
        F.lit("</body></html>"),
    )
    return caps.select(
        url.alias("url"), ts.alias("warc_ts"), F.encode(page, "UTF-8").alias("html")
    )


@q(
    "cdx_lookup",
    f"""
    WITH caps AS ({_CDX_CAPS_SQL}),
    idx AS (
      SELECT urlkey, cdx_ts,
             substr(sha256(page), 1, 16) AS digest,
             octet_length(encode(page))::BIGINT AS n_bytes,
             row_number() OVER (PARTITION BY urlkey ORDER BY cdx_ts,
                                substr(sha256(page), 1, 16))::INT AS seq
      FROM caps)
    SELECT urlkey, cdx_ts, digest, n_bytes, seq FROM idx
    WHERE urlkey = 'com,example,docs,h1)/d/1'
    """,
)
def cdx_lookup(spark, sf_dir):
    """CDX sink + partition-pruned lookup end-to-end: build the capture
    index, persist it hash-partitioned on urlkey bucket (webindex.write_cdx,
    Hive layout), then answer "all captures of this resource" reading ONE
    bucket directory (webindex.lookup_captures — the kb equality is a
    PartitionFilter, asserted on the plan in test_webindex). This is the D5
    partition-pruning story exercised through a real sink, not just a
    PLANS.md explain."""
    idx = webindex.cdx_index(_cdx_captures_df(spark, sf_dir))
    workdir = tempfile.mkdtemp(prefix="cdx_idx_")
    webindex.write_cdx(idx, f"{workdir}/cdx", n_buckets=16)
    out = webindex.lookup_captures(
        spark, f"{workdir}/cdx", "com,example,docs,h1)/d/1", n_buckets=16
    )
    return out.select("urlkey", "cdx_ts", "digest", "n_bytes", "seq")


@q(
    "dsir_weights",
    f"""
    WITH tgt AS (SELECT unnest({_SQL_TOKENS}) AS w FROM documents WHERE doc_id % 7 = 0),
    tc AS (SELECT w, count(*) AS ct FROM tgt GROUP BY w),
    ttot AS (SELECT sum(ct)::BIGINT AS t_t, count(*)::BIGINT AS t_v FROM tc),
    pool AS (SELECT doc_id, text FROM documents WHERE doc_id % 7 != 0),
    pl AS (SELECT unnest({_SQL_TOKENS}) AS w FROM pool),
    pc AS (SELECT w, count(*) AS cp FROM pl GROUP BY w),
    ptot AS (SELECT sum(cp)::BIGINT AS p_t, count(*)::BIGINT AS p_v FROM pc),
    toks AS (SELECT doc_id, unnest({_SQL_TOKENS}) AS w FROM pool),
    s AS (
      SELECT doc_id,
             log2((coalesce(tc.ct, 0) + 1)::DOUBLE
                  / ((SELECT t_t FROM ttot) + (SELECT t_v FROM ttot))::DOUBLE)
           - log2((coalesce(pc.cp, 0) + 1)::DOUBLE
                  / ((SELECT p_t FROM ptot) + (SELECT p_v FROM ptot))::DOUBLE) AS lr
      FROM toks LEFT JOIN tc USING (w) LEFT JOIN pc USING (w))
    SELECT doc_id, count(*)::BIGINT AS n_tokens, round(avg(lr), 6) AS dsir_weight
    FROM s GROUP BY doc_id
    """,
)
def dsir_weights(spark, sf_dir):
    """DSIR importance weights (curation.dsir_weights): every pool doc
    (doc_id%7!=0) scored by mean per-token log-likelihood ratio between a
    target-domain unigram LM (fit on the doc_id%7==0 slice) and the pool's
    own LM. The data-selection counterpart of lm_perplexity_scores: rank by
    dsir_weight, keep the top; two broadcast vocab joins, one pool
    shuffle."""
    from spider_spark import curation

    d = T(spark, sf_dir, "documents")
    return curation.dsir_weights(
        d.where(F.col("doc_id") % 7 != 0), d.where(F.col("doc_id") % 7 == 0)
    )


_ALIAS_EDGES_SQL = """
    SELECT 'n' || l_orderkey AS src, 'n' || (l_orderkey + 1) AS dst
    FROM lineitem WHERE l_orderkey % 5 <> 0
    UNION ALL
    SELECT 'c' || r_regionkey, 'c' || ((r_regionkey + 1) % 5) FROM region"""


@q(
    "redirect_resolve",
    f"""
    WITH RECURSIVE am AS MATERIALIZED (
      SELECT src, min(dst) AS dst FROM ({_ALIAS_EDGES_SQL}) GROUP BY src),
    walk AS (
      SELECT src AS url, dst AS cur, 1 AS hops FROM am
      UNION ALL
      SELECT w.url, a.dst, w.hops + 1 FROM walk w JOIN am a ON a.src = w.cur
      WHERE w.hops < 32),
    last AS (
      SELECT url, cur, hops FROM (
        SELECT *, row_number() OVER (PARTITION BY url ORDER BY hops DESC) AS rn
        FROM walk) WHERE rn = 1)
    SELECT l.url,
           CASE WHEN a.src IS NULL THEN l.cur END AS target,
           (CASE WHEN a.src IS NULL THEN l.hops END)::BIGINT AS hops,
           a.src IS NULL AS resolved
    FROM last l LEFT JOIN am a ON a.src = l.cur
    """,
)
def redirect_resolve(spark, sf_dir):
    """Redirect / rel=canonical chain collapse (webindex.resolve_aliases):
    alias edges n<k>→n<k+1> over sparse orderkeys form short chains with
    natural terminals; the region table plants a 5-cycle c0→…→c4→c0 that
    must come back resolved=false. Engine = 5 pointer-doubling self-joins
    (⌈log₂ 32⌉); oracle = recursive CTE walking one hop at a time with the
    same 32-hop cap — the log-vs-linear contrast IS the scale argument."""
    li = T(spark, sf_dir, "lineitem")
    rg = T(spark, sf_dir, "region")
    edges = (
        li.where(F.col("l_orderkey") % 5 != 0)
        .select(
            F.concat(F.lit("n"), F.col("l_orderkey")).alias("src"),
            F.concat(F.lit("n"), F.col("l_orderkey") + 1).alias("dst"),
        )
        .unionAll(
            rg.select(
                F.concat(F.lit("c"), F.col("r_regionkey")).alias("src"),
                F.concat(F.lit("c"), (F.col("r_regionkey") + 1) % 5).alias("dst"),
            )
        )
    )
    return webindex.resolve_aliases(edges, max_hops=32)


_SQL_LTOKENS = "list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x != '')"


@q(
    "blocklist_gate",
    f"""
    WITH d AS (SELECT doc_id, text,
            'w' || (doc_id % 5) || '.d' || (doc_id % 23) || '.com' AS host
            FROM documents),
    bl(domain) AS (VALUES ('d3.com'), ('d7.com'), ('w1.d11.com')),
    t AS (SELECT doc_id, host, {_SQL_LTOKENS} AS toks,
                 EXISTS (SELECT 1 FROM bl
                         WHERE d.host = bl.domain
                            OR d.host LIKE '%.' || bl.domain) AS domain_blocked
          FROM d),
    s AS (SELECT doc_id, host, domain_blocked,
                 len(list_filter(toks, x -> x IN ('slow', 'hash')))::BIGINT AS n_bad_terms,
                 CASE WHEN len(toks) > 0
                      THEN len(list_filter(toks, x -> x IN ('slow', 'hash'))) / len(toks)
                      ELSE 0.0 END AS raw_ratio
          FROM t)
    SELECT doc_id, host, domain_blocked, n_bad_terms,
           round(raw_ratio, 6) AS bad_ratio,
           (NOT domain_blocked AND raw_ratio <= 0.02::DOUBLE) AS keep
    FROM s
    """,
)
def blocklist_gate(spark, sf_dir):
    """UT1-style domain+term blocklist gate (curation.blocklist_filter):
    hosts synthesized from doc_id get suffix-matched against a 3-domain
    blocklist via the suffix-explode equi-join (LIKE-free — the only join
    shape that survives a 10^6-domain list at 10^10 docs), bad-term
    occurrences counted by an InSet array filter inside codegen (no
    shuffle, no UDF). keep = unblocked domain AND bad ratio ≤ 2%."""
    from spider_spark import curation

    d = T(spark, sf_dir, "documents").select(
        "doc_id", "text",
        F.concat(F.lit("w"), F.col("doc_id") % 5, F.lit(".d"),
                 F.col("doc_id") % 23, F.lit(".com")).alias("host"),
    )
    bl = spark.createDataFrame(
        [("d3.com",), ("d7.com",), ("w1.d11.com",)], "domain string")
    out = curation.blocklist_filter(
        d, bl, ["slow", "hash"], max_bad_ratio=0.02)
    return out.select(
        "doc_id", "host", "domain_blocked", "n_bad_terms",
        F.round("bad_ratio", 6).alias("bad_ratio"), "keep")


_SNIFF_PLANTS = [
    # (prefix_hex, declared_header_noisy, mime_truth, charset_truth, sniffed_truth, mismatch)
    ("255044462D", "application/pdf", "application/pdf", None, "pdf", False),
    ("89504E470D0A1A0A", "Image/JPEG", "image/jpeg", None, "png", True),
    ("FFD8FFE0", " image/jpeg ", "image/jpeg", None, "jpeg", False),
    ("1F8B08", "application/octet-stream", "application/octet-stream", None, "gzip", True),
    ("3C21646F63747970", ' Text/HTML ; charset="GB18030"', "text/html", "gb18030", "html", False),
    ("52494646AABBCCDD57454250", "image/webp", "image/webp", None, "webp", False),
    ("0000001866747970", "video/mp4", "video/mp4", None, "mp4", False),
    ("00112233", "application/octet-stream", "application/octet-stream", None, "unknown", False),
]

_SNIFF_ORACLE = (
    "SELECT doc_id,\n"
    + "  CASE doc_id % 8 "
    + " ".join(f"WHEN {i} THEN '{p[4]}'" for i, p in enumerate(_SNIFF_PLANTS))
    + " END AS sniffed,\n"
    + "  CASE doc_id % 8 "
    + " ".join(f"WHEN {i} THEN '{p[2]}'" for i, p in enumerate(_SNIFF_PLANTS))
    + " END AS mime,\n"
    + "  CASE doc_id % 8 "
    + " ".join(
        f"WHEN {i} THEN " + (f"'{p[3]}'" if p[3] else "NULL")
        for i, p in enumerate(_SNIFF_PLANTS))
    + " END AS charset,\n"
    + "  CASE doc_id % 8 "
    + " ".join(f"WHEN {i} THEN {str(p[5]).lower()}" for i, p in enumerate(_SNIFF_PLANTS))
    + " END AS mismatch\n"
    + "FROM documents"
)


@q("content_sniff", _SNIFF_ORACLE)
def content_sniff(spark, sf_dir):
    """Magic-byte sniffing vs declared Content-Type (media.sniff_type_col /
    declared_*_col / type_mismatch_col): payloads are built by prepending 8
    planted file signatures (pdf/png/jpeg/gzip/html/webp/mp4/garbage) to the
    document bytes; headers carry case/whitespace/quoting noise and two
    deliberate lies (png served as image/jpeg, gzip as octet-stream). The
    oracle states the PLANTED truth — the engine must recover it from raw
    bytes and the noisy header, entirely in codegen (no UDF, no string cast
    of the payload)."""
    d = T(spark, sf_dir, "documents")
    m = F.col("doc_id") % 8
    px, ct = F.lit(None).cast("string"), F.lit(None).cast("string")
    for i, p in enumerate(_SNIFF_PLANTS):
        px = F.when(m == i, p[0]).otherwise(px)
        ct = F.when(m == i, p[1]).otherwise(ct)
    payload = F.concat(F.unhex(px), F.encode(F.col("text"), "UTF-8"))
    sniffed = media.sniff_type_col(payload)
    mime = media.declared_mime_col(ct)
    return d.select(
        "doc_id",
        sniffed.alias("sniffed"),
        mime.alias("mime"),
        media.declared_charset_col(ct).alias("charset"),
        media.type_mismatch_col(sniffed, mime).alias("mismatch"),
    )


def _psl_oracle() -> str:
    from spider_spark.canon import DEFAULT_PSL

    psl = ", ".join(f"'{s}'" for s in DEFAULT_PSL)
    return f"""
    WITH d AS (SELECT doc_id,
        CASE doc_id % 7
          WHEN 0 THEN 'www.s' || (doc_id % 50) || '.co.uk'
          WHEN 1 THEN 's' || (doc_id % 50) || '.com'
          WHEN 2 THEN 'co.uk'
          WHEN 3 THEN 'u' || (doc_id % 50) || '.github.io'
          WHEN 4 THEN 'localhost'
          WHEN 5 THEN 'a.b.s' || (doc_id % 50) || '.blogspot.com'
          ELSE 's' || (doc_id % 50) || '.weird' || (doc_id % 9)
        END AS host FROM documents),
    l AS (SELECT doc_id, host, string_split(host, '.') AS labs FROM d),
    s AS (SELECT doc_id, i, array_to_string(labs[i:len(labs)], '.') AS sfx
          FROM l, unnest(generate_series(1, len(labs))) AS t(i)),
    m AS (SELECT doc_id, min(i) AS mi FROM s WHERE sfx IN ({psl}) GROUP BY doc_id)
    SELECT l.doc_id, l.host,
      CASE WHEN m.mi IS NULL AND len(labs) >= 2
               THEN array_to_string(labs[len(labs)-1:len(labs)], '.')
           WHEN m.mi > 1 THEN array_to_string(labs[m.mi-1:len(labs)], '.')
           ELSE NULL END AS rdomain
    FROM l LEFT JOIN m USING (doc_id)
    """


@q("registrable_domains", _psl_oracle())
def registrable_domains(spark, sf_dir):
    """eTLD+1 extraction (canon.registrable_domain_col): politeness, trap
    caps, and per-operator dedup scope by REGISTRABLE domain — every
    *.blogspot.com subdomain is one operator (PSL private section), while
    `co.uk` itself registers nothing. Engine = InSet longest-suffix match
    in codegen (no join); oracle = independent min-index suffix join over
    the same embedded PSL subset. Hosts cover all five PSL edge rules."""
    from spider_spark.canon import registrable_domain_col

    d = T(spark, sf_dir, "documents")
    m = F.col("doc_id") % 7
    k = F.col("doc_id") % 50
    host = (
        F.when(m == 0, F.concat(F.lit("www.s"), k, F.lit(".co.uk")))
        .when(m == 1, F.concat(F.lit("s"), k, F.lit(".com")))
        .when(m == 2, F.lit("co.uk"))
        .when(m == 3, F.concat(F.lit("u"), k, F.lit(".github.io")))
        .when(m == 4, F.lit("localhost"))
        .when(m == 5, F.concat(F.lit("a.b.s"), k, F.lit(".blogspot.com")))
        .otherwise(F.concat(F.lit("s"), k, F.lit(".weird"), F.col("doc_id") % 9))
    )
    return d.select(
        "doc_id", host.alias("host"),
        registrable_domain_col(host).alias("rdomain"),
    )


_FAIR_W = 1000

_FAIR_ORACLE = f"""
    WITH dem AS (SELECT 'h' || (l_suppkey % 37) AS host, count(*)::BIGINT AS demand
                 FROM lineitem GROUP BY 1),
    lv AS (SELECT demand, count(*)::BIGINT AS cnt FROM dem GROUP BY 1),
    tot AS (SELECT count(*)::BIGINT AS n, sum(demand)::BIGINT AS dd FROM dem),
    br AS (SELECT demand,
            sum(demand * cnt) OVER (ORDER BY demand)
              + demand * ((SELECT n FROM tot) - sum(cnt) OVER (ORDER BY demand)) AS served,
            (SELECT n FROM tot) - sum(cnt) OVER (ORDER BY demand) AS n_above
           FROM lv),
    seg AS (SELECT demand AS d0, served AS srv0, n_above AS above0
            FROM br WHERE served <= {_FAIR_W} ORDER BY demand DESC LIMIT 1),
    lvl AS (SELECT CASE
              WHEN NOT EXISTS (SELECT 1 FROM seg) THEN {_FAIR_W} // (SELECT n FROM tot)
              WHEN (SELECT above0 FROM seg) = 0 THEN (SELECT d0 FROM seg)
              ELSE (SELECT d0 FROM seg)
                   + ({_FAIR_W} - (SELECT srv0 FROM seg)) // (SELECT above0 FROM seg)
            END AS L),
    a0 AS (SELECT host, demand,
            CASE WHEN (SELECT dd FROM tot) <= {_FAIR_W} THEN demand
                 ELSE least(demand, (SELECT L FROM lvl)) END AS alloc
           FROM dem),
    rr AS (SELECT greatest(0, {_FAIR_W} - (SELECT sum(alloc) FROM a0))
           * (CASE WHEN (SELECT dd FROM tot) > {_FAIR_W} THEN 1 ELSE 0 END) AS r),
    fin AS (SELECT host, demand, alloc,
            row_number() OVER (PARTITION BY demand > (SELECT L FROM lvl)
                               ORDER BY md5(host), host) AS rn
            FROM a0)
    SELECT host, demand,
           (CASE WHEN demand > (SELECT L FROM lvl) AND rn <= (SELECT r FROM rr)
                 THEN alloc + 1 ELSE alloc END)::BIGINT AS alloc
    FROM fin
    """


@q("fair_share_budgets", _FAIR_ORACLE)
def fair_share_budgets(spark, sf_dir):
    """Max-min fair (water-filling) round-budget allocation
    (webindex.fair_share_alloc): W={_FAIR_W} fetch slots across 37 hosts'
    demands; level search on the compressed demand histogram, deterministic
    md5-ranked remainder. Complements per-host politeness caps — those
    bound hosts from above, this divides the cluster's global budget."""
    li = T(spark, sf_dir, "lineitem")
    dem = li.groupBy(
        F.concat(F.lit("h"), F.col("l_suppkey") % 37).alias("host")
    ).agg(F.count(F.lit(1)).alias("demand"))
    return webindex.fair_share_alloc(dem, _FAIR_W)


# ---------------------------------------------------------------------------
# Mirror-host detection + Mercator content-seen (webindex digest family)
# ---------------------------------------------------------------------------

_MIRROR_CAPS_SQL = """
      SELECT 'https://h' || (doc_id % 20)::VARCHAR || '.example.com/d/' || doc_id::VARCHAR AS url,
             '<html>' || text || '</html>' AS page
      FROM documents
      UNION ALL
      SELECT 'https://m0.example.com/d/' || doc_id::VARCHAR,
             '<html>' || text || '</html>'
      FROM documents WHERE doc_id % 20 = 3
      UNION ALL
      SELECT 'https://m1.example.com/d/' || doc_id::VARCHAR,
             '<html>' || text || '</html>'
      FROM documents WHERE doc_id % 40 = 7
"""


def _mirror_caps(spark, sf_dir):
    d = T(spark, sf_dir, "documents").select("doc_id", "text")
    page = F.concat(F.lit("<html>"), F.col("text"), F.lit("</html>"))
    did = F.col("doc_id")
    base = d.select(
        F.concat(F.lit("https://h"), (did % 20).cast("string"),
                 F.lit(".example.com/d/"), did.cast("string")).alias("url"),
        page.alias("html"),
    )
    m0 = d.where(did % 20 == 3).select(
        F.concat(F.lit("https://m0.example.com/d/"), did.cast("string")).alias("url"),
        page.alias("html"),
    )
    m1 = d.where(did % 40 == 7).select(
        F.concat(F.lit("https://m1.example.com/d/"), did.cast("string")).alias("url"),
        page.alias("html"),
    )
    return base.unionByName(m0).unionByName(m1)


@q(
    "mirror_hosts",
    f"""
    WITH caps AS ({_MIRROR_CAPS_SQL}),
    hd AS (
      SELECT DISTINCT
        lower(regexp_extract(url, '^https://([^/]+)/', 1)) AS host,
        substr(sha256(page), 1, 16) AS digest
      FROM caps),
    sizes AS (SELECT host, count(*) AS n_dg FROM hd GROUP BY host HAVING count(*) >= 2),
    inter AS (
      SELECT a.host AS a_host, b.host AS b_host, count(*) AS inter
      FROM hd a JOIN hd b ON a.digest = b.digest AND a.host < b.host
      GROUP BY 1, 2)
    SELECT a_host, b_host, inter, sa.n_dg AS na, sb.n_dg AS nb,
           inter::DOUBLE / least(sa.n_dg, sb.n_dg)::DOUBLE AS containment_min,
           inter::DOUBLE / (sa.n_dg + sb.n_dg - inter)::DOUBLE AS jaccard
    FROM inter JOIN sizes sa ON sa.host = a_host JOIN sizes sb ON sb.host = b_host
    WHERE inter::DOUBLE / least(sa.n_dg, sb.n_dg)::DOUBLE >= 0.5
    """,
)
def mirror_hosts(spark, sf_dir):
    """Bharat-Broder mirror-host candidates (webindex.mirror_host_pairs)
    over a planted-mirror capture set: m0 fully mirrors host h3's pages,
    m1 holds half of h7's. Expected survivors: (h3, m0) containment 1.0
    jaccard 1.0 and (h7, m1) containment 1.0 jaccard 0.52 — min-side
    containment flags the partial mirror Jaccard under-scores. The oracle
    recomputes digest-set overlap from scratch (regex host extraction vs
    the engine's try_parse_url; independent similarity arithmetic)."""
    return webindex.mirror_host_pairs(_mirror_caps(spark, sf_dir), threshold=0.5)


@q(
    "content_seen_first",
    """
    WITH caps AS (
      SELECT 'https://h' || (d.doc_id % 20)::VARCHAR || '.example.com/d/' || d.doc_id::VARCHAR AS url,
             make_timestamp(2024, 3, 1, 12, 0, 0.0) + INTERVAL (d.doc_id) MINUTE AS warc_ts,
             '<html>' || l.text || '</html>' AS page
      FROM documents d JOIN documents l ON l.doc_id = d.doc_id - d.doc_id % 5),
    seen AS (
      SELECT url, sha256(page) AS digest,
             row_number() OVER (PARTITION BY sha256(page)
                                ORDER BY warc_ts, url) AS rn,
             first_value(url) OVER (PARTITION BY sha256(page)
                                    ORDER BY warc_ts, url) AS first_url
      FROM caps)
    SELECT url, digest, rn = 1 AS is_first_seen,
           CASE WHEN rn = 1 THEN NULL ELSE first_url END AS dup_of_url
    FROM seen
    """,
)
def content_seen_first(spark, sf_dir):
    """Mercator content-seen test (webindex.content_seen) on a quintet-
    mirror fixture: five urls share each quintet leader's bytes, capture
    times increase with doc_id, so exactly the leader's capture is
    is_first_seen and the other four point at it. Oracle reruns the
    first-capture-per-digest window independently in DuckDB."""
    d = T(spark, sf_dir, "documents").select("doc_id")
    lead = T(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("lead_id"), "text"
    )
    did = F.col("doc_id")
    caps = (
        d.join(lead, (did - did % 5) == F.col("lead_id"))
        .select(
            F.concat(F.lit("https://h"), (did % 20).cast("string"),
                     F.lit(".example.com/d/"), did.cast("string")).alias("url"),
            (F.make_timestamp(F.lit(2024), F.lit(3), F.lit(1), F.lit(12),
                              F.lit(0), F.lit(0))
             + F.make_interval(mins=did.cast("int"))).alias("warc_ts"),
            F.concat(F.lit("<html>"), F.col("text"), F.lit("</html>")).alias("html"),
        )
    )
    return webindex.content_seen(caps).select(
        "url", "digest", "is_first_seen", "dup_of_url"
    )


# ---------------------------------------------------------------------------
# rel=canonical collapse + URL template mining (webindex)
# ---------------------------------------------------------------------------

@q(
    "canonical_collapse",
    """
    WITH q AS (
      SELECT doc_id, doc_id - doc_id % 4 AS lead,
             (doc_id - doc_id % 4) % 20 AS h
      FROM documents WHERE doc_id % 4 != 0)
    SELECT 'https://h' || h::VARCHAR || '.example.com/d/' || doc_id::VARCHAR AS url,
           'https://h' || h::VARCHAR || '.example.com/d/' || lead::VARCHAR AS target,
           (doc_id % 4)::BIGINT AS hops, true AS resolved
    FROM q
    """,
)
def canonical_collapse(spark, sf_dir):
    """End-to-end rel=canonical collapse: pages carry a planted
    ``<link rel=canonical>`` in a DIFFERENT syntactic form per chain
    position (root-relative, absolute, scheme-relative — all three
    absolutize branches execute), quartets chain 3→2→1→0, and quartet
    leaders declare self-canonical (must be dropped, not looped). DOM
    extraction → JVM absolutization → pointer-doubling resolve; the oracle
    is the closed form of the planted topology (target = quartet leader,
    hops = position)."""
    d = T(spark, sf_dir, "documents").select("doc_id")
    did = F.col("doc_id")
    lead = did - did % 4
    host = F.concat(F.lit("h"), (lead % 20).cast("string"), F.lit(".example.com"))
    url = F.concat(F.lit("https://"), host, F.lit("/d/"), did.cast("string"))
    prev = (did - 1).cast("string")
    href = (
        F.when(did % 4 == 1, F.concat(F.lit("/d/"), prev))
        .when(did % 4 == 2, F.concat(F.lit("https://"), host, F.lit("/d/"), prev))
        .when(did % 4 == 3, F.concat(F.lit("//"), host, F.lit("/d/"), prev))
        .otherwise(url)  # leader: self-canonical, must drop
    )
    caps = d.select(
        url.alias("url"),
        F.concat(F.lit('<html><head><link rel="canonical" href="'), href,
                 F.lit('"></head><body>.</body></html>')).alias("html"),
    )
    return webindex.resolve_aliases(webindex.canonical_alias_edges(caps))


@q(
    "url_template_mining",
    """
    WITH u AS (
      SELECT doc_id,
        'https://h' || (doc_id % 7)::VARCHAR || '.example.com' ||
        CASE doc_id % 3
          WHEN 0 THEN '/product/' || doc_id::VARCHAR || '/review/' || (doc_id % 5)::VARCHAR
          WHEN 1 THEN '/archive/2024/' || (doc_id % 12 + 1)::VARCHAR || '/' || (doc_id % 28 + 1)::VARCHAR
          ELSE '/about/team' END AS url
      FROM documents),
    t AS (
      SELECT lower(regexp_extract(url, '^https://([^/]+)', 1)) AS host,
             regexp_replace(regexp_extract(url, '^https://[^/]+(/.*)$', 1),
                            '[0-9]+', '{d}', 'g') AS template,
             url
      FROM u)
    SELECT host, template, count(*) AS n_urls, min(url) AS example_url
    FROM t GROUP BY host, template
    """,
)
def url_template_mining(spark, sf_dir):
    """Per-host URL path-template mining (webindex.url_templates): digit
    runs collapse to {d}, (host, template) groups counted with a
    deterministic example url — the shape signal behind template-level
    trap detection and crawl planning. Three planted families (product
    pages, calendar archive, static page) across 7 hosts; the oracle
    recomputes host+template with an independent regex decomposition."""
    d = T(spark, sf_dir, "documents").select("doc_id")
    did = F.col("doc_id")
    url = F.concat(
        F.lit("https://h"), (did % 7).cast("string"), F.lit(".example.com"),
        F.when(did % 3 == 0,
               F.concat(F.lit("/product/"), did.cast("string"),
                        F.lit("/review/"), (did % 5).cast("string")))
        .when(did % 3 == 1,
              F.concat(F.lit("/archive/2024/"), (did % 12 + 1).cast("string"),
                       F.lit("/"), (did % 28 + 1).cast("string")))
        .otherwise(F.lit("/about/team")),
    )
    return webindex.url_templates(d.select(url.alias("url")))


@q(
    "meta_robots_gate",
    """
    SELECT 'https://h' || (doc_id % 20)::VARCHAR || '.example.com/d/' || doc_id::VARCHAR AS url,
           doc_id % 5 = 0 AS noindex,
           doc_id % 7 = 0 AS nofollow,
           CASE WHEN doc_id % 7 = 0 THEN 0 ELSE 2 END AS n_follow,
           CASE WHEN doc_id % 7 = 0 THEN ''
                ELSE '/l/' || doc_id::VARCHAR || '/1,/l/' || doc_id::VARCHAR || '/3'
           END AS follow_csv
    FROM documents
    """,
)
def meta_robots_gate(spark, sf_dir):
    """In-page robots directives (parse.robots_directives_udf): pages carry
    planted ``<meta name=robots>`` tokens (noindex at 5|id, nofollow at
    7|id — both at 35|id via a combined content attr) plus a per-link
    rel="nofollow" anchor at 3|id that must be dropped from the follow set
    regardless of the meta. The oracle is the closed form of the plants;
    the engine must recover it from raw HTML through the DOM."""
    from spider_spark.parse import robots_directives_udf

    d = T(spark, sf_dir, "documents").select("doc_id")
    did = F.col("doc_id")
    i = did.cast("string")
    meta = (
        F.when((did % 5 == 0) & (did % 7 == 0),
               F.lit('<meta name="robots" content="noindex, nofollow">'))
        .when(did % 5 == 0, F.lit('<meta name="robots" content="NOINDEX">'))
        .when(did % 7 == 0, F.lit('<meta name="robots" content="index,nofollow">'))
        .otherwise(F.lit(""))
    )
    link2 = F.when(
        did % 3 == 0,
        F.concat(F.lit('<a rel="external nofollow" href="/l/'), i,
                 F.lit('/2">sponsored</a>')),
    ).otherwise(F.lit(""))
    html = F.concat(
        F.lit("<html><head>"), meta, F.lit("</head><body>"),
        F.lit('<a href="/l/'), i, F.lit('/1">one</a>'), link2,
        F.lit('<a href="/l/'), i, F.lit('/3">three</a>'),
        F.lit("</body></html>"),
    )
    caps = d.select(
        F.concat(F.lit("https://h"), (did % 20).cast("string"),
                 F.lit(".example.com/d/"), i).alias("url"),
        html.alias("html"),
    )
    directives = robots_directives_udf()(F.col("html")).alias("d")
    return caps.select("url", directives).select(
        "url",
        F.col("d.noindex").alias("noindex"),
        F.col("d.nofollow").alias("nofollow"),
        F.size("d.follow_hrefs").alias("n_follow"),
        F.array_join("d.follow_hrefs", ",").alias("follow_csv"),
    )


@q(
    "warc_dedup_roundtrip",
    """
    WITH caps AS (
      SELECT d.doc_id,
             'https://h' || (d.doc_id % 20)::VARCHAR || '.example.com/d/' || d.doc_id::VARCHAR AS url,
             d.doc_id - d.doc_id % 5 AS lead, l.text AS payload
      FROM documents d JOIN documents l ON l.doc_id = d.doc_id - d.doc_id % 5)
    SELECT url,
           CASE WHEN doc_id = lead THEN 'response' ELSE 'revisit' END AS record_type,
           CASE WHEN doc_id = lead THEN NULL
                ELSE 'https://h' || (lead % 20)::VARCHAR || '.example.com/d/' || lead::VARCHAR
           END AS refers_to_url,
           CASE WHEN doc_id = lead THEN octet_length(encode(payload))::BIGINT
                ELSE 0::BIGINT END AS n_payload_bytes,
           CASE WHEN doc_id = lead THEN md5(payload) ELSE NULL END AS payload_md5
    FROM caps
    """,
)
def warc_dedup_roundtrip(spark, sf_dir):
    """Dedup-aware WARC sink→source roundtrip (warc.write_warc_deduped):
    quintet-mirror captures (five urls share each leader's bytes, capture
    time grows with doc_id) must land as ONE response record per distinct
    payload plus four payload-free revisit pointers at the leader — the
    ISO 28500 identical-payload-digest profile. The oracle is the closed
    form of the plants; every header the engine writes (refers-to, zero
    content-length) must survive serialization, gzip member framing, and
    the defensive distributed parse to match it."""
    import tempfile

    from spider_spark import warc as warcmod

    d = T(spark, sf_dir, "documents").select("doc_id")
    lead = T(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("lead_id"), "text"
    )
    did = F.col("doc_id")
    caps = (
        d.join(lead, (did - did % 5) == F.col("lead_id"))
        .select(
            F.concat(F.lit("https://h"), (did % 20).cast("string"),
                     F.lit(".example.com/d/"), did.cast("string")).alias("url"),
            (F.lit("2026-02-01 00:00:00").cast("timestamp")
             + F.make_interval(mins=did.cast("int"))).alias("warc_ts"),
            F.col("text").alias("payload"),
        )
    )
    out_dir = tempfile.mkdtemp(prefix="warc_dd_")
    warcmod.write_warc_deduped(caps.repartition(8, "url"), out_dir)
    back = warcmod.read_warc(spark, f"{out_dir}/*.warc.gz")
    return back.select(
        "url", "record_type", "refers_to_url", "n_payload_bytes",
        F.when(F.col("record_type") == "response",
               F.md5(F.encode("payload", "UTF-8"))).alias("payload_md5"),
    )


@q(
    "phrase_search",
    f"""
    WITH t AS (SELECT doc_id, {_SQL_TOKENS} AS w FROM documents),
    s AS (SELECT doc_id, unnest(generate_series(1, greatest(len(w) - 1, 0))) AS i, w FROM t),
    m AS (SELECT doc_id, i FROM s WHERE lower(w[i]) = 'table' AND lower(w[i+1]) = 'value')
    SELECT doc_id, count(*) AS n_hits, (min(i) - 1)::INT AS first_pos
    FROM m GROUP BY doc_id
    """,
)
def phrase_search(spark, sf_dir):
    """Exact phrase search ("table value") over the positional inverted
    index (textops.phrase_hits): postings of term i vote for start pos-i,
    k distinct votes = a match — two shuffles for any phrase length. The
    oracle slides a window over the token array independently (the
    generate_series + 1-based ws[i] walk), so positions, counts, and the
    0- vs 1-based offset are all value-checked."""
    return textops.phrase_hits(T(spark, sf_dir, "documents"), "table value")


def _opic_oracle(iters: int = 5, edges_sql: str = _LINEITEM_EDGES_SQL) -> str:
    """Unrolled synchronous-OPIC CTE chain: per step, cash flows along
    out-edges (dangling cash spread uniformly via the virtual node) and
    history banks the distributed amount. MATERIALIZED per level (each
    state is referenced by the contribution join, the dangling sum, and
    the next state)."""
    pre = f"""
    WITH edges AS MATERIALIZED ({edges_sql}),
    nodes AS MATERIALIZED (SELECT src AS url FROM edges UNION SELECT dst FROM edges),
    outdeg AS MATERIALIZED (SELECT src, count(*) AS od FROM edges GROUP BY src),
    nn AS (SELECT count(*)::DOUBLE AS n FROM nodes),
    s0 AS MATERIALIZED (SELECT url, 1.0 / (SELECT n FROM nn) AS cash, 0.0 AS hist FROM nodes)"""
    parts = [pre]
    for i in range(1, iters + 1):
        p = i - 1
        parts.append(f"""
    c{i} AS MATERIALIZED (SELECT e.dst AS url, sum(s.cash / o.od) AS received
             FROM edges e JOIN s{p} s ON s.url = e.src JOIN outdeg o ON o.src = e.src
             GROUP BY e.dst),
    d{i} AS (SELECT coalesce(sum(s.cash), 0) AS d FROM s{p} s
             WHERE NOT EXISTS (SELECT 1 FROM outdeg o WHERE o.src = s.url)),
    s{i} AS MATERIALIZED (SELECT n.url,
                    coalesce(c.received, 0) + (SELECT d FROM d{i}) / (SELECT n FROM nn) AS cash,
                    s.hist + s.cash AS hist
             FROM nodes n LEFT JOIN c{i} c ON c.url = n.url
             JOIN s{p} s ON s.url = n.url)""")
    return (
        ",".join(parts)
        + f"\n    SELECT url AS node, round(hist + cash, 8) AS rank FROM s{iters}"
    )


@q("opic_scores", _opic_oracle())
def opic_scores(spark, sf_dir):
    """Synchronous OPIC cash propagation (pagerank.opic_cash — Abiteboul
    et al. WWW'03): 5 steps over the supplier→part graph, importance =
    history + cash. The damping-free, converges-while-you-crawl priority
    signal Heritrix-style schedulers use; pluggable into apply_priority
    like pagerank/trustrank. Oracle = unrolled materialized CTE chain."""
    from spider_spark.pagerank import opic_cash

    li = T(spark, sf_dir, "lineitem")
    edges = li.select(
        F.col("l_suppkey").cast("string").alias("src"),
        (F.col("l_partkey") % 100).cast("string").alias("dst"),
    ).distinct()
    return opic_cash(edges, iters=5).select(
        F.col("url").alias("node"), F.round("rank", 8).alias("rank")
    )


@q(
    "sitemap_staleness",
    """
    WITH sm AS (
      SELECT 'https://h' || (doc_id % 20)::VARCHAR || '.example.com/d/' || doc_id::VARCHAR AS url,
             doc_id,
             CASE doc_id % 3
               WHEN 0 THEN make_timestamp(2024, 3, (doc_id % 28 + 1)::BIGINT, 0, 0, 0.0)
               WHEN 1 THEN make_timestamp(2024, 3, (doc_id % 28 + 1)::BIGINT, 12, 0, 0.0)
               ELSE NULL END AS lastmod_ts
      FROM documents),
    j AS (
      SELECT url, lastmod_ts,
             CASE WHEN doc_id % 2 = 0
                  THEN make_timestamp(2024, 3, 15, 0, 0, 0.0) END AS cap_ts
      FROM sm)
    SELECT url,
           CASE WHEN cap_ts IS NULL THEN 'never_captured'
                WHEN lastmod_ts IS NOT NULL AND lastmod_ts > cap_ts THEN 'modified'
                ELSE 'fresh' END AS reason,
           CASE WHEN cap_ts IS NULL THEN true
                WHEN lastmod_ts IS NOT NULL AND lastmod_ts > cap_ts THEN true
                ELSE false END AS is_stale,
           coalesce(strftime(lastmod_ts, '%Y-%m-%d %H:%M:%S'), '') AS lastmod_s,
           coalesce(strftime(cap_ts, '%Y-%m-%d %H:%M:%S'), '') AS last_capture_s
    FROM j
    """,
)
def sitemap_staleness_q(spark, sf_dir):
    """Sitemap-lastmod-driven conditional recrawl (webindex.sitemap_
    staleness): urlset entries carry W3C-datetime lastmod claims in two
    formats (date-only at 3|id, full ISO-with-Z at 3|id+1, none at
    3|id+2); the archive holds a 2024-03-15 capture for even ids only.
    The engine must parse both formats, join the latest capture, and
    route each url to never_captured / modified / fresh — the oracle is
    the closed form of the plants (UTC session, so the Z-suffix parse is
    exact)."""
    did = F.col("doc_id")
    d = T(spark, sf_dir, "documents").select("doc_id")
    url = F.concat(F.lit("https://h"), (did % 20).cast("string"),
                   F.lit(".example.com/d/"), did.cast("string"))
    day = F.lpad((did % 28 + 1).cast("string"), 2, "0")
    lastmod = (
        F.when(did % 3 == 0, F.concat(F.lit("2024-03-"), day))
        .when(did % 3 == 1, F.concat(F.lit("2024-03-"), day, F.lit("T12:00:00Z")))
        .otherwise(F.lit(None).cast("string"))
    )
    seeds = d.select(url.alias("url"), lastmod.alias("lastmod"))
    caps = d.where(did % 2 == 0).select(
        url.alias("url"),
        F.lit("2024-03-15 00:00:00").cast("timestamp").alias("warc_ts"),
    )
    out = webindex.sitemap_staleness(seeds, caps)
    return out.select(
        "url", "reason", "is_stale",
        F.coalesce(F.date_format("lastmod_ts", "yyyy-MM-dd HH:mm:ss"), F.lit("")).alias("lastmod_s"),
        F.coalesce(F.date_format("last_capture_ts", "yyyy-MM-dd HH:mm:ss"), F.lit("")).alias("last_capture_s"),
    )


_CRAWL_REP_ORACLE = """
    WITH RECURSIVE d240 AS (SELECT doc_id FROM documents WHERE doc_id < 240),
    nn AS (SELECT count(*)::BIGINT AS c FROM d240),
    reach(doc, d) AS (
      SELECT doc, d FROM (VALUES (0::BIGINT, 0), (1::BIGINT, 0), (2::BIGINT, 0)) t(doc, d)
      UNION
      SELECT (7 * r.doc + k.k) % (SELECT c FROM nn), r.d + 1
      FROM reach r, (VALUES (1), (2), (3)) k(k)
      WHERE r.d < 40
        AND r.doc % 11 != 4                    -- page-level nofollow: no edges out
        AND NOT (k.k = 2 AND r.doc % 7 = 3))   -- per-link rel=nofollow
    SELECT doc AS doc_id, min(d) AS depth, min(d) + 1 AS fetched_round,
           (doc % 5 != 0) AS indexed
    FROM reach GROUP BY doc
"""


@q("crawl_docs_rep", _CRAWL_REP_ORACLE)
def crawl_docs_rep(spark, sf_dir):
    """The flagship crawl with honor_meta_robots=True over a corpus with
    planted REP directives (see _doc_pages rep=True): the BFS fixpoint
    stays SQL-expressible because the directives prune edges by closed-form
    residue — page-level nofollow removes a page's three out-edges,
    rel=nofollow removes the k=2 edge on 7|id+3 pages, and noindex keeps a
    FETCHED page out of the items sink (the ``indexed`` column joins the
    items table back against the frontier). The strongest kind of evidence
    that the in-loop REP gates compose with first-wins dedup, depth
    assignment, and round scheduling — not just with a unit fixture."""
    pages, seeds, policy, n = _doc_pages(spark, sf_dir, limit=240, rep=True)
    pages = pages.persist()
    workdir = tempfile.mkdtemp(prefix="crawl_rep_")
    summary = crawl(
        spark, workdir, pages, seeds, policy,
        CrawlConfig(max_rounds=45, use_bloom=False, n_salt=4, write_coalesce=4,
                    seq_mode="hash", honor_meta_robots=True),
    )
    pages.unpersist()
    frontier = tbl.read_table(spark, workdir, summary.last_round, "frontier")
    items = tbl.read_appended(spark, workdir, "items").select(
        "url", F.lit(True).alias("_indexed")
    )
    return (
        frontier.where(F.col("status") == "done")
        .join(items, "url", "left")
        .select(
            F.regexp_extract("url", r"/d/(\d+)$", 1).cast("long").alias("doc_id"),
            F.col("depth").cast("int").alias("depth"),
            F.col("fetched_round").cast("int").alias("fetched_round"),
            F.coalesce(F.col("_indexed"), F.lit(False)).alias("indexed"),
        )
    )


# =====================================================================
# Round-3 session-3: semantic dedup, similarity self-join, weighted
# sampling, vocabulary coverage
# =====================================================================

@q(
    "semdedup_flags",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    l AS (
      SELECT vec_id AS lid, v AS lv,
             row_number() OVER (ORDER BY md5(vec_id::VARCHAR), vec_id) - 1 AS cid
      FROM e QUALIFY cid < 8),
    asg AS (
      SELECT vec_id, cid FROM (
        SELECT e.vec_id, l.cid,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY list_cosine_similarity(e.v, l.lv) DESC, l.cid) AS rn
        FROM e CROSS JOIN l)
      WHERE rn = 1),
    dropped AS (
      SELECT DISTINCT xb.vec_id
      FROM asg xa JOIN asg xb ON xa.cid = xb.cid AND xa.vec_id < xb.vec_id
      JOIN e ea ON ea.vec_id = xa.vec_id
      JOIN e eb ON eb.vec_id = xb.vec_id
      WHERE list_cosine_similarity(ea.v, eb.v) >= 0.47)
    SELECT a.vec_id, a.cid::INT AS cluster_id, d.vec_id IS NULL AS is_kept
    FROM asg a LEFT JOIN dropped d ON d.vec_id = a.vec_id
    """,
)
def semdedup_flags(spark, sf_dir):
    """SemDeDup (Abbas et al. 2023): cluster the embedding space, compare
    cosine pairs only WITHIN a cluster, keep the lowest id per dup group —
    the semantic tier above exact/minhash dedup. Deterministic leader
    clustering (smallest-md5 rows are the leaders; argmax-cosine assignment
    ties by leader index) so the oracle reproduces the clusters exactly.
    Threshold 0.47 sits in the corpus' measured cosine gap. Every row is
    output with its cluster and keep flag, so the clustering itself is
    value-checked, not just the dup verdicts."""
    return dedup.semdedup_flags(
        T(spark, sf_dir, "embeddings"), n_clusters=8, threshold=0.47
    )


@q(
    "tfidf_sim_join",
    f"""
    WITH tok AS (SELECT doc_id, {_SQL_TOKENS} AS w FROM documents),
    g AS (SELECT doc_id,
                 unnest(list_transform(generate_series(1, greatest(len(w) - 2, 0)),
                                       i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS term
          FROM tok),
    tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM g GROUP BY 1, 2),
    dfx AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM g GROUP BY 1
            HAVING count(DISTINCT doc_id) <= 64),
    n AS (SELECT count(*)::BIGINT AS n FROM documents),
    w AS (SELECT doc_id, term, tf * ln((n + 1.0) / (df + 1.0)) AS w
          FROM tf JOIN dfx USING (term) CROSS JOIN n),
    nm AS (SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM w GROUP BY doc_id),
    d AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, sum(a.w * b.w) AS dot
          FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
    SELECT a_id, b_id, round(dot / (na.nrm * nb.nrm), 6) AS cos
    FROM d JOIN nm na ON na.doc_id = a_id JOIN nm nb ON nb.doc_id = b_id
    WHERE dot / (na.nrm * nb.nrm) >= 0.3
    """,
)
def tfidf_sim_join(spark, sf_dir):
    """All-pairs document similarity by TF-IDF cosine over 3-gram shingle
    terms via the inverted-index self-join (Lin SIGIR'09) — a pair is
    scored only if it shares an indexed shingle, and the df-cap (64)
    bounds the join at O(vocab · max_df²) regardless of corpus size.
    Threshold 0.3 sits in a measured void: the fixture corpus has NO pair
    with shingle-space cosine in [0.15, 0.45] (dup families score ≥0.5,
    background noise <0.15), so float last-ulp can't flip membership."""
    return dedup.tfidf_cosine_pairs(
        T(spark, sf_dir, "documents"), threshold=0.3, max_df=64, n=3
    )


_WSAMPLE_HASH_SQL = textops.hash60_sql("'wsample:' || doc_id::VARCHAR")

@q(
    "sample_weighted_length",
    f"""
    WITH h AS (
      SELECT doc_id, lang,
             ((({_WSAMPLE_HASH_SQL}) % 1000000) + 1.0) / 1000001.0 AS u,
             (n_chars + 1)::DOUBLE AS w
      FROM documents),
    k AS (SELECT doc_id, lang, -ln(u) / w AS wkey FROM h),
    r AS (SELECT doc_id, lang, wkey,
                 row_number() OVER (PARTITION BY lang ORDER BY wkey, doc_id)::INT AS srank
          FROM k)
    SELECT doc_id, lang, round(wkey, 9) AS wkey, srank FROM r WHERE srank <= 25
    """,
)
def sample_weighted_length(spark, sf_dir):
    """Deterministic weighted sampling without replacement (Efraimidis-
    Spirakis A-ES keys over the cross-engine hash), 25 docs per language
    weighted by document length — the temperature-sampling primitive a
    domain-mix pipeline uses. Selection probability ∝ n_chars+1 within
    each stratum; the pick is identical at any cluster size and stable
    under corpus growth (a row's key depends only on the row)."""
    from spider_spark import sampling

    d = T(spark, sf_dir, "documents").withColumn(
        "_w", (F.col("n_chars") + 1).cast("double")
    )
    return sampling.weighted_sample(d, "lang", 25, "doc_id", "_w").select(
        "doc_id", "lang", "wkey", "srank"
    )


@q(
    "vocab_oov_rate",
    f"""
    WITH tok AS (SELECT doc_id, unnest({_SQL_TOKENS}) AS term FROM documents),
    vocab AS (
      SELECT term FROM (
        SELECT term, count(*) AS cnt FROM tok GROUP BY term
        ORDER BY cnt DESC, term LIMIT 20)),
    per AS (
      SELECT t.doc_id,
             count(*)::INT AS n_tokens,
             count(*) FILTER (v.term IS NULL)::INT AS n_oov
      FROM tok t LEFT JOIN vocab v ON v.term = t.term
      GROUP BY t.doc_id)
    SELECT d.doc_id,
           coalesce(per.n_tokens, 0) AS n_tokens,
           coalesce(per.n_oov, 0) AS n_oov,
           round(CASE WHEN per.n_tokens IS NULL THEN 0
                      ELSE per.n_oov::DOUBLE / per.n_tokens END, 6) AS oov_rate
    FROM documents d LEFT JOIN per ON per.doc_id = d.doc_id
    """,
)
def vocab_oov_rate(spark, sf_dir):
    """Tokenizer-vocabulary coverage: build the top-V corpus vocabulary by
    term frequency (ties by term — exact integer ranking, engine-stable)
    and score every document's out-of-vocabulary token rate — the signal
    that decides whether a tokenizer/vocab fits a corpus before training.
    Scale shape: one tokenize pass feeds the vocab agg (vocab-sized) and
    the per-doc agg; membership is a broadcast left join against the V-row
    vocabulary; the rate divides exact integers (bit-identical anywhere)."""
    d = T(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(textops.tokens_col(F.col("text"))).alias("term"))
    vocab = (
        tok.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "term")
        .limit(20)
        .select("term", F.lit(True).alias("_in"))
    )
    per = (
        tok.join(F.broadcast(vocab), "term", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_tokens"),
            F.sum(F.when(F.col("_in").isNull(), 1).otherwise(0)).cast("int").alias("n_oov"),
        )
    )
    return (
        d.select("doc_id").join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_tokens"), F.lit(0)).alias("n_tokens"),
            F.coalesce(F.col("n_oov"), F.lit(0)).alias("n_oov"),
            F.round(
                F.when(F.col("n_tokens").isNull(), F.lit(0.0)).otherwise(
                    F.col("n_oov").cast("double") / F.col("n_tokens")
                ),
                6,
            ).alias("oov_rate"),
        )
    )


_PACK_HASH_SQL = textops.hash60_sql("'pack:' || doc_id::VARCHAR")

@q(
    "pack_sequences",
    f"""
    WITH base AS (
      SELECT doc_id,
             (({_PACK_HASH_SQL}) % 8)::INT AS bucket,
             ({_PACK_HASH_SQL}) AS h,
             len({_SQL_TOKENS})::BIGINT AS n_tokens
      FROM documents),
    s AS (
      SELECT doc_id, bucket, n_tokens,
             coalesce(sum(n_tokens) OVER (
               PARTITION BY bucket ORDER BY h, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS strt
      FROM base)
    SELECT doc_id, bucket, (strt // 256)::BIGINT AS bin_id,
           (strt % 256)::INT AS bin_offset, n_tokens
    FROM s
    """,
)
def pack_sequences(spark, sf_dir):
    """GPT-style concat-and-chunk sequence packing into 256-token training
    bins, bucketed 8 ways so the running-offset window parallelizes (one
    independent token stream per bucket — training shards map 1:1). Every
    quantity is an exact integer, so the layout is bit-identical on any
    engine and stable under corpus growth (a new doc perturbs only its own
    bucket)."""
    from spider_spark import curation

    return curation.pack_sequences(
        T(spark, sf_dir, "documents"), seq_len=256, n_buckets=8
    )


@q(
    "dedup_incremental",
    f"""
    WITH t AS (SELECT doc_id, {_SQL_TOKENS} AS w FROM documents),
    g AS (SELECT doc_id, unnest({_sql_shingles(3)}) AS shingle FROM t),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM g GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter
      FROM g a JOIN g b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    pairs AS (
      SELECT a_id, b_id
      FROM inter JOIN sizes sa ON sa.doc_id = a_id JOIN sizes sb ON sb.doc_id = b_id
      WHERE inter::DOUBLE / (sa.n_sh + sb.n_sh - inter)::DOUBLE >= 0.8),
    -- old = doc_id < 400 (ids ascend), so in any qualifying a<b pair the
    -- dying side is b: either a is old, or both are new and b is larger
    dropped AS (SELECT DISTINCT b_id AS doc_id FROM pairs WHERE b_id >= 400)
    SELECT d.doc_id, dr.doc_id IS NULL AS is_kept
    FROM documents d LEFT JOIN dropped dr ON dr.doc_id = d.doc_id
    WHERE d.doc_id >= 400
    """,
)
def dedup_incremental(spark, sf_dir):
    """Incremental near-dup admission: the last 100 docs arrive as a new
    batch and are gated against the 400-doc existing corpus (exact 3-gram
    Jaccard ≥ 0.8 against any old doc or a smaller-id batch-mate ⇒ drop).
    The LSH candidate join generates only pairs touching the new batch —
    the old×old quadrant, the 10^10-row bulk in production, never exists —
    and the oracle is the full exact-Jaccard answer, so the band
    configuration's completeness is value-checked end-to-end."""
    d = T(spark, sf_dir, "documents")
    return dedup.incremental_dup_flags(
        d.where(F.col("doc_id") < 400), d.where(F.col("doc_id") >= 400),
        threshold=0.8, n=3,
    )


@q(
    "stream_window_rates",
    """
    WITH w AS (
      -- exact integer microseconds: epoch(ts)::BIGINT would ROUND the
      -- fractional second and misplace boundary-adjacent events
      SELECT make_timestamp((epoch_us(ts) // 300000000) * 300000000) AS ws,
             event_type,
             count(*)::BIGINT AS n_events,
             sum(CAST(value AS DECIMAL(18,2)))::DOUBLE AS sum_value
      FROM events GROUP BY 1, 2)
    SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type, n_events, sum_value
    FROM w
    """,
)
def stream_window_rates(spark, sf_dir):
    """Structured Streaming, value-checked end-to-end: the events table is
    REPLAYED through readStream (AvailableNow trigger), aggregated into
    5-minute event-time tumbling windows per event_type under a 10-minute
    watermark, sunk to memory in complete mode, and the materialized sink
    is returned — so the driver's DuckDB gate checks the STREAMING engine's
    output (trigger batching, state store, window assignment) against
    batch SQL, not a batch re-statement of it. Money-style exact-decimal
    sums keep the values order-independent across trigger batches; window
    starts render as strings (house timestamp convention). At production
    scale this is the per-host fetch-rate monitor (streaming.host_fetch_
    rates) shape: state is bounded by windows-in-horizon × group keys,
    and the watermark frees closed windows."""
    import os
    import shutil
    import uuid

    src = f"{sf_dir}/events.parquet"
    schema = spark.read.parquet(src).schema
    if not os.path.isdir(src):
        # the file stream source ingests DIRECTORIES (files arrive over
        # time); a single-file fixture is staged as a one-file ingest dir
        ingest = tempfile.mkdtemp(suffix="_ingest")
        shutil.copy(src, os.path.join(ingest, "part-0.parquet"))
        src = ingest
    name = f"swr_{uuid.uuid4().hex[:8]}"
    ck = tempfile.mkdtemp()
    agg = (
        spark.readStream.schema(schema).parquet(src)
        # parquet stores TIMESTAMP_NTZ; event-time watermarks require an
        # instant. The container session tz is UTC, so the cast is a pure
        # type change (oracle reads the same NTZ values as UTC instants).
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
    )
    sq = (
        agg.writeStream.format("memory").queryName(name)
        .outputMode("complete").trigger(availableNow=True)
        .option("checkpointLocation", ck).start()
    )
    sq.awaitTermination()
    return spark.table(name).select(
        F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type", "n_events", "sum_value",
    )


@q(
    "decontaminate_bloom_gate",
    f"""
    WITH tok AS (SELECT doc_id, {_SQL_TOKENS} AS w FROM documents),
    g AS (SELECT doc_id, unnest({_sql_shingles(5)}) AS shingle FROM tok),
    bench AS (SELECT DISTINCT shingle FROM g WHERE doc_id % 7 = 0),
    bad AS (SELECT DISTINCT g.doc_id FROM g JOIN bench USING(shingle)
            WHERE g.doc_id % 7 != 0)
    SELECT d.doc_id FROM documents d
    LEFT JOIN bad ON bad.doc_id = d.doc_id
    WHERE d.doc_id % 7 != 0 AND bad.doc_id IS NULL
    """,
)
def decontaminate_bloom_gate(spark, sf_dir):
    """Bloom-gated decontamination — decontaminate() at the scale where the
    benchmark outgrows a broadcast set: benchmark 5-gram hashes become one
    broadcast Bloom filter probed map-side (Arrow kernel, zero shuffle for
    the gate); only maybe-hit docs reach the exact verify, so the output
    EQUALS exact decontamination — the same Bloom-prefilter + exact-resolve
    contract as the crawl URL-seen set (seen.SeenSet.split → anti-join),
    value-checked here against the exact SQL answer. Same eval-split
    fixture as decontaminate_overlap (doc_id % 7 == 0 plays the benchmark)."""
    d = T(spark, sf_dir, "documents")
    kept = dedup.decontaminate_bloom(
        d.where(F.col("doc_id") % 7 != 0), d.where(F.col("doc_id") % 7 == 0), n=5
    )
    return kept.select("doc_id")


@q(
    "quality_model_scores",
    f"""
    WITH t AS (SELECT doc_id, text, {_SQL_TOKENS} AS toks FROM documents),
    f AS (SELECT doc_id,
            len(toks)::BIGINT AS n_tokens,
            length(text)::BIGINT AS n_chars,
            len(list_filter(toks, x -> x IN ('the','a','and','of','to')))::BIGINT AS n_stop,
            (length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))::BIGINT AS n_punct
          FROM t)
    SELECT doc_id,
           round(
             1.0
             + 9.0 * (CASE WHEN n_tokens > 0 THEN n_stop::DOUBLE / n_tokens::DOUBLE ELSE 0.0 END)
             + -7.0 * (CASE WHEN n_chars > 0 THEN n_punct::DOUBLE / n_chars::DOUBLE ELSE 0.0 END)
             + -0.22 * (CASE WHEN n_tokens > 0 THEN n_chars::DOUBLE / n_tokens::DOUBLE ELSE 0.0 END)
             + -48.0 * (1.0 / (1.0 + n_tokens::DOUBLE)),
           9) AS quality_logit,
           (  1.0
             + 9.0 * (CASE WHEN n_tokens > 0 THEN n_stop::DOUBLE / n_tokens::DOUBLE ELSE 0.0 END)
             + -7.0 * (CASE WHEN n_chars > 0 THEN n_punct::DOUBLE / n_chars::DOUBLE ELSE 0.0 END)
             + -0.22 * (CASE WHEN n_tokens > 0 THEN n_chars::DOUBLE / n_tokens::DOUBLE ELSE 0.0 END)
             + -48.0 * (1.0 / (1.0 + n_tokens::DOUBLE))
           ) >= 0.0 AS keep
    FROM f
    """,
)
def quality_model_scores(spark, sf_dir):
    """Model-based quality filtering (curation.quality_lr_score): linear
    classifier over exact-integer-derived features, folded into the scan
    as one codegen map pass. The oracle recomputes the logit with the
    IDENTICAL evaluation order — all features are ratios of exact ints and
    IEEE arithmetic is exactly rounded, so the doubles match bit-for-bit
    (the registry's no-transcendentals discipline)."""
    from spider_spark import curation

    return curation.quality_lr_score(T(spark, sf_dir, "documents"))


@q(
    "corpus_export_manifest",
    f"""
    WITH s AS (SELECT doc_id, text,
                      ({textops.hash60_sql("'shard:' || doc_id::VARCHAR")}) % 8 AS shard
               FROM documents)
    SELECT shard::INT AS shard,
           count(*) AS n_docs,
           sum(len({_SQL_TOKENS})::BIGINT) AS n_tokens,
           sum(strlen(text)::BIGINT) AS n_bytes,
           min(doc_id) AS min_id,
           max(doc_id) AS max_id
    FROM s GROUP BY shard
    """,
)
def corpus_export_manifest(spark, sf_dir):
    """Deterministic sharded corpus export (tables.export_shards): the
    write actually happens — one repartition(shard) shuffle routes every
    document to its writer task, hash order fixes within-shard layout —
    and the returned manifest is computed from the files READ BACK, so
    green here certifies the sink roundtrip, not just the plan. The
    oracle recomputes shard assignment + stats from the raw table (hash60
    is 60-bit positive, so DuckDB's % equals Spark's pmod)."""
    import shutil

    d = T(spark, sf_dir, "documents").select("doc_id", "text")
    out = tempfile.mkdtemp(prefix="export_shards_")
    try:
        return tbl.export_shards(d, out, n_shards=8).localCheckpoint()
    finally:
        shutil.rmtree(out, ignore_errors=True)


# =====================================================================
# Exact percentile aggregation — corpus length statistics
# =====================================================================

@q(
    "doc_length_quantiles",
    """
    SELECT lang,
           count(*) AS n_docs,
           round(quantile_cont(n_chars, 0.5), 6) AS p50,
           round(quantile_cont(n_chars, 0.9), 6) AS p90,
           round(quantile_cont(n_chars, 0.99), 6) AS p99
    FROM documents GROUP BY lang
    """,
)
def doc_length_quantiles(spark, sf_dir):
    """Exact linear-interpolated percentiles of document length per
    language — the length-distribution audit every curation run starts
    from (sequence-packing bin sizing, truncation-loss estimates). Spark's
    exact ``percentile`` and DuckDB's ``quantile_cont`` share the
    index = p·(n−1) + linear-interpolation definition, so the doubles
    match bit-for-bit. At 100 TB you'd swap in approx_percentile
    (t-digest, mergeable partial aggs) — the exact form here IS the
    oracle-checkable baseline that would validate it."""
    d = T(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.percentile("n_chars", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("n_chars", F.lit(0.9)), 6).alias("p90"),
        F.round(F.percentile("n_chars", F.lit(0.99)), 6).alias("p99"),
    )


# =====================================================================
# Distributed BPE tokenizer training — spider_spark.tokenize
# =====================================================================

@q(
    "bpe_learn_merges",
    """
    WITH wc AS (
      SELECT chr((97 + (doc_id % 8) * 2)::INT) || chr((98 + (doc_id % 8) * 2)::INT) AS w,
             (8 - doc_id % 8)::BIGINT AS reps
      FROM documents),
    counts AS (
      SELECT substr(w, 1, 1) AS lhs, substr(w, 2, 1) AS rhs,
             sum(reps)::BIGINT AS "count"
      FROM wc GROUP BY w)
    SELECT row_number() OVER (ORDER BY "count" DESC, lhs, rhs)::INT AS rank,
           lhs, rhs, "count"
    FROM counts
    """,
)
def bpe_learn_merges(spark, sf_dir):
    """Distributed BPE merge learning (tokenize.bpe_train_from_words,
    Sennrich ACL'16): 8 planted two-character words with frequency-
    hierarchy counts — each word dies into one symbol when merged, so the
    learned merge ORDER must equal the global (count DESC, lhs, rhs) sort
    the oracle computes in closed form. This pins the whole iterative
    loop value-level: weighted pair counting over duplicate word rows,
    the deterministic argmax tiebreak, and merge application per round.
    Overlap/multi-symbol merge semantics are pinned separately by
    pytest parity against a pure-Python reference trainer
    (tests/test_tokenize.py). Scale: ONE corpus shuffle total (word
    count); iterations run on the Zipf-small word table."""
    from spider_spark import tokenize as tok

    d = T(spark, sf_dir, "documents").select("doc_id")
    did = F.col("doc_id")
    words = d.select(
        F.concat(
            F.char(F.lit(97) + (did % 8) * 2), F.char(F.lit(98) + (did % 8) * 2)
        ).alias("word"),
        (F.lit(8) - did % 8).cast("long").alias("count"),
    )
    return tok.bpe_train_from_words(words, n_merges=8)


# =====================================================================
# PQ / ADC approximate nearest neighbor — spider_spark.vectorops
# =====================================================================

def _pq_plant_codebooks() -> list[list[list[float]]]:
    """Deterministic planted codebooks: cb[j][c][d] = ((j·8+c)·4+d) % 11 − 5.
    Mod 11 keeps all 8 entries of a subspace distinct (4·Δc ≡ 0 mod 11 has
    no solution for 0 < Δc < 8), so L2-argmin encoding is unambiguous."""
    return [
        [[float(((j * 8 + c) * 4 + d) % 11 - 5) for d in range(4)] for c in range(8)]
        for j in range(4)
    ]


@q(
    "ann_pq_adc_topk",
    """
    WITH ids AS (SELECT vec_id AS i FROM embeddings),
    qs AS (SELECT vec_id AS q FROM embeddings WHERE vec_id % 97 = 0),
    dims AS (SELECT j, d FROM generate_series(0, 3) t1(j)
             CROSS JOIN generate_series(0, 3) t2(d)),
    scores AS (
      SELECT q, i,
             sum( (((q * 3 + (j * 4 + d)) % 9) - 4)::DOUBLE
                * ((((j * 8 + ((i + j) % 8)) * 4 + d) % 11) - 5)::DOUBLE ) AS score
      FROM ids CROSS JOIN qs CROSS JOIN dims
      GROUP BY q, i),
    ranked AS (
      SELECT q AS query_id, i AS neighbor_id,
             row_number() OVER (PARTITION BY q ORDER BY score DESC, i) AS rank,
             score
      FROM scores)
    SELECT query_id, neighbor_id, rank::INT AS rank, score
    FROM ranked WHERE rank <= 5
    """,
)
def ann_pq_adc_topk(spark, sf_dir):
    """Product-quantization ANN (vectorops.pq_encode/pq_topk_encoded —
    Jégou et al. TPAMI'11): the corpus is compressed to m=4 codes/vector
    and top-k runs on ADC lookup sums, never rereading raw floats — the
    32-64× scan-size cut that makes vector search viable at 100 TB (and
    composes with IVF list-probing). The fixture plants zero-quantization-
    error vectors (exact codebook concatenations), so the REAL encoder
    (L2 argmin, codegen) must recover every planted code and the ADC
    ranking is exactly the true inner-product ranking the oracle computes
    from the closed-form plants. Trained-codebook recall is contract-
    tested in pytest (pq_recall_at_k ≥ floor); this query certifies the
    distributed encode+score path value-level."""
    cbs = _pq_plant_codebooks()
    e = T(spark, sf_dir, "embeddings").select("vec_id")
    vid = F.col("vec_id")
    corpus_vec = F.concat(
        *[
            F.element_at(
                F.array(*[
                    F.array(*[F.lit(x) for x in cbs[j][c]]).cast("array<double>")
                    for c in range(8)
                ]),
                ((vid + j) % 8 + 1).cast("int"),
            )
            for j in range(4)
        ]
    )
    corpus = e.select(vid, corpus_vec.alias("embedding"))
    codes = vectorops.pq_encode(corpus, cbs)
    qvec = F.transform(
        F.sequence(F.lit(0), F.lit(15)),
        lambda d: ((vid * 3 + d) % 9 - 4).cast("double"),
    )
    queries_df = e.where(vid % 97 == 0).select(vid, qvec.alias("embedding"))
    return vectorops.pq_topk_encoded(codes, queries_df, cbs, k=5)


@q(
    "ann_pq_refined_topk",
    """
    WITH ids AS (SELECT vec_id AS i FROM embeddings),
    qs AS (SELECT vec_id AS q FROM embeddings WHERE vec_id % 97 = 0),
    dims AS (SELECT j, d FROM generate_series(0, 3) t1(j)
             CROSS JOIN generate_series(0, 3) t2(d)),
    terms AS (
      SELECT q, i,
             (((q * 3 + (j * 4 + d)) % 9) - 4)::DOUBLE AS qx,
             ((((j * 8 + ((i + j) % 8)) * 4 + d) % 11) - 5)::DOUBLE AS vx
      FROM ids CROSS JOIN qs CROSS JOIN dims),
    scores AS (
      SELECT q, i, sum(qx * vx) AS ip,
             sum(qx * vx) / (sqrt(sum(qx * qx)) * sqrt(sum(vx * vx))) AS cos
      FROM terms GROUP BY q, i),
    short AS (
      SELECT q, i, cos,
             row_number() OVER (PARTITION BY q ORDER BY ip DESC, i) AS adc_rank
      FROM scores),
    reranked AS (
      SELECT q AS query_id, i AS neighbor_id,
             row_number() OVER (PARTITION BY q ORDER BY cos DESC, i) AS rank,
             cos AS score
      FROM short WHERE adc_rank <= 100)
    SELECT query_id, neighbor_id, rank::INT AS rank, score
    FROM reranked WHERE rank <= 5
    """,
)
def ann_pq_refined_topk(spark, sf_dir):
    """PQ refine (vectorops.pq_topk_refined — the FAISS IVFPQ+refine
    pattern): ADC shortlists the top-100 per query over the compressed
    codes, then ONLY those rows fetch raw vectors for an exact cosine
    re-rank. Same zero-quantization-error plants as ann_pq_adc_topk, so
    the oracle replays the exact two-stage ranking in closed form:
    IP-ordered shortlist membership, then cosine re-rank inside it — the
    shortlist join, the vector refetch join, and both windows are all
    value-checked (every sum is integer-exact in doubles, and the cosine
    division/sqrt tree is written identically on both engines)."""
    cbs = _pq_plant_codebooks()
    e = T(spark, sf_dir, "embeddings").select("vec_id")
    vid = F.col("vec_id")
    corpus_vec = F.concat(
        *[
            F.element_at(
                F.array(*[
                    F.array(*[F.lit(x) for x in cbs[j][c]]).cast("array<double>")
                    for c in range(8)
                ]),
                ((vid + j) % 8 + 1).cast("int"),
            )
            for j in range(4)
        ]
    )
    corpus = e.select(vid, corpus_vec.alias("embedding"))
    codes = vectorops.pq_encode(corpus, cbs)
    qvec = F.transform(
        F.sequence(F.lit(0), F.lit(15)),
        lambda d: ((vid * 3 + d) % 9 - 4).cast("double"),
    )
    queries_df = e.where(vid % 97 == 0).select(vid, qvec.alias("embedding"))
    return vectorops.pq_topk_refined(
        corpus, codes, queries_df, cbs, k=5, shortlist=100
    )


# =====================================================================
# RSS/Atom feed seed discovery — spider_spark.sitemap
# =====================================================================

@q(
    "feed_seeds",
    """
    SELECT 'https://h' || (doc_id % 10)::VARCHAR || '.example.com/d/' || doc_id::VARCHAR AS url,
           0 AS depth,
           'Doc ' || doc_id::VARCHAR AS title,
           CASE WHEN doc_id % 10 < 5
                THEN '2024-03-0' || (1 + doc_id % 5)::VARCHAR
                ELSE '2024-03-0' || (1 + doc_id % 5)::VARCHAR || 'T00:00:00Z'
           END AS published
    FROM documents WHERE doc_id % 3 = 0
    """,
)
def feed_seeds(spark, sf_dir):
    """RSS 2.0 + Atom feed discovery (sitemap.seeds_from_feeds): hosts
    h0-h4 publish RSS (<item><link>text</link><pubDate>), h5-h9 publish
    Atom (<entry><link href=.../><updated>) — the two public feed dialects
    including the html.parser void-<link> hazard (RSS link text parses as
    a SIBLING of the empty link node; the extractor handles it). Feeds
    are synthesized per host from the documents table, pushed through the
    REAL Arrow-batched DOM parse, and the oracle states the planted truth
    directly — green means the parser recovered every link/title/date
    from raw XML. Plan: one host groupBy to build feeds, then the
    explode; at 10^10 scale feeds are per-host rows, so the parse is
    embarrassingly parallel with no further shuffle."""
    from spider_spark.sitemap import seeds_from_feeds

    d = T(spark, sf_dir, "documents").where(F.col("doc_id") % 3 == 0)
    did = F.col("doc_id")
    h = (did % 10).cast("string")
    url = F.concat(F.lit("https://h"), h, F.lit(".example.com/d/"), did.cast("string"))
    day = (F.lit(1) + did % 5).cast("string")
    is_rss = (did % 10) < 5
    item = F.when(
        is_rss,
        F.concat(
            F.lit("<item><title>Doc "), did.cast("string"), F.lit("</title><link>"),
            url, F.lit("</link><pubDate>2024-03-0"), day, F.lit("</pubDate></item>"),
        ),
    ).otherwise(
        F.concat(
            F.lit("<entry><title>Doc "), did.cast("string"),
            F.lit('</title><link href="'), url,
            F.lit('"/><updated>2024-03-0'), day,
            F.lit("T00:00:00Z</updated></entry>"),
        )
    )
    feeds = (
        d.select(h.alias("h"), F.struct(did.alias("doc_id"), item.alias("item")).alias("s"))
        .groupBy("h")
        .agg(F.array_sort(F.collect_list("s")).alias("items"))
        .select(
            F.concat(
                F.when(F.col("h").cast("int") < 5, F.lit("<rss version=\"2.0\"><channel>"))
                .otherwise(F.lit('<feed xmlns="http://www.w3.org/2005/Atom">')),
                F.array_join(F.transform(F.col("items"), lambda s: s.item), ""),
                F.when(F.col("h").cast("int") < 5, F.lit("</channel></rss>"))
                .otherwise(F.lit("</feed>")),
            ).alias("feed_xml")
        )
    )
    return seeds_from_feeds(feeds)


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


# =====================================================================
# Conditional refetch / focused priority / politeness schedule /
# epoch shuffle — session-7 crawl-scheduling + trainer-layout additions
# =====================================================================

@q(
    "revisit_plan",
    """
    WITH h AS (
      SELECT doc_id,
             'https://h' || (doc_id % 13)::VARCHAR || '.docs.example.com/d/'
               || doc_id::VARCHAR AS url,
             i,
             md5(doc_id::VARCHAR || ':' || (i // (1 + doc_id % 6))::VARCHAR) AS digest
      FROM documents CROSS JOIN (SELECT unnest(generate_series(1, 6)) AS i) g
      WHERE i <= 4 + doc_id % 3),
    c AS (
      SELECT url, i,
             CASE WHEN lag(digest) OVER (PARTITION BY url ORDER BY i) IS NULL THEN 0
                  WHEN digest != lag(digest) OVER (PARTITION BY url ORDER BY i) THEN 1
                  ELSE 0 END AS changed
      FROM h),
    a AS (SELECT url, count(*)::INT AS n_obs, sum(changed)::INT AS n_changes,
                 max(i)::BIGINT AS last_obs
          FROM c GROUP BY url),
    r AS (
      SELECT url,
             CASE WHEN n_obs > 1 THEN n_changes::DOUBLE / (n_obs - 1)::DOUBLE
                  ELSE 0.0 END AS change_rate,
             last_obs
      FROM a),
    t AS (
      SELECT url, change_rate, last_obs,
             CASE WHEN change_rate >= 0.8 THEN 'hot'
                  WHEN change_rate >= 0.3 THEN 'warm' ELSE 'cold' END AS tier
      FROM r),
    p AS (
      SELECT url, tier, change_rate, last_obs,
             (CASE tier WHEN 'hot' THEN 1 WHEN 'warm' THEN 4 ELSE 12 END)::INT AS interval
      FROM t)
    SELECT url, tier, change_rate, last_obs, interval,
           (last_obs + interval)::BIGINT AS due,
           (last_obs + interval) <= 8 AS overdue
    FROM p
    """,
)
def revisit_plan_q(spark, sf_dir):
    """Revisit schedule composition (webindex.revisit_plan): change-rate
    tiers (Cho & Garcia-Molina estimator) mapped to concrete revisit
    intervals (hot 1 / warm 4 / cold 12) and a due capture index, with
    overdue flagged at now=8 — the row set an incremental crawl round
    feeds its frontier from. The plant varies BOTH axes per url: capture
    counts 4-6 (last_obs differs) and digest rollover periods 1-6 (tier
    differs), so due/overdue are value-checked across the full grid. Same
    one-Exchange shape as recrawl_priority (the lag window and the
    summary agg share the url shuffle)."""
    d = T(spark, sf_dir, "documents").select("doc_id")
    dd = F.col("doc_id")
    hist = (
        d.select(
            dd,
            F.explode(
                F.sequence(F.lit(1), (F.lit(4) + dd % 3).cast("int"))
            ).alias("i_raw"),
        )
        .select(dd, F.col("i_raw").cast("long").alias("i"))
        .select(
            F.concat(
                F.lit("https://h"), (dd % 13).cast("string"),
                F.lit(".docs.example.com/d/"), dd.cast("string"),
            ).alias("url"),
            F.col("i").alias("obs_ts"),
            F.md5(
                F.concat(
                    dd.cast("string"), F.lit(":"),
                    F.expr("i div (1 + doc_id % 6)").cast("string"),
                )
            ).alias("digest"),
        )
    )
    return webindex.revisit_plan(hist, now=8)


@q(
    "temperature_mix",
    """
    WITH agg AS (SELECT lang AS source, count(*)::BIGINT AS n_docs
                 FROM documents GROUP BY lang),
    w AS (SELECT source, n_docs, sqrt(n_docs::DOUBLE) AS wt FROM agg),
    p AS (SELECT source, n_docs, wt / sum(wt) OVER () AS p FROM w),
    s AS (SELECT source, n_docs, p,
                 floor(round(p * 100, 9))::BIGINT AS base,
                 round(round(p * 100, 9) - floor(round(p * 100, 9)), 9) AS frac
          FROM p),
    r AS (SELECT *, 100 - sum(base) OVER () AS leftover,
                 row_number() OVER (ORDER BY frac DESC, source) AS rn
          FROM s)
    SELECT source, n_docs, round(p, 9) AS p,
           (base + CASE WHEN rn <= leftover THEN 1 ELSE 0 END)::BIGINT AS quota
    FROM r
    """,
)
def temperature_mix(spark, sf_dir):
    """Temperature-reweighted sampling quotas (curation.temperature_quotas
    — the XLM-R / LLaMA corpus rule, p_d ∝ n_d^α): per-language quotas at
    α=0.5 over the naturally skewed lang column (en dominates ~3.4×), so
    the flattening is value-visible — en's share drops, tail languages
    gain. Largest-remainder apportionment makes Σ quota == budget exactly,
    deterministically (floor + fractional-rank seats, ties by source).
    α=0.5 is the oracle-exact configuration (sqrt is correctly rounded;
    pow is not — see the operator docstring). One count shuffle; every
    window runs over the |domains|-row aggregate."""
    from spider_spark.curation import temperature_quotas

    d = T(spark, sf_dir, "documents").select("lang")
    out = temperature_quotas(d, "lang", budget=100, alpha=0.5)
    return out.select("source", "n_docs", F.round("p", 9).alias("p"), "quota")

_REFETCH_URL_SQL = (
    "'https://h' || (doc_id % 13)::VARCHAR || '.docs.example.com/d/' || doc_id::VARCHAR"
)


@q(
    "conditional_refetch",
    f"""
    WITH h AS (
      SELECT {_REFETCH_URL_SQL} AS url, i::BIGINT AS ts,
             CASE WHEN i = 3 AND doc_id % 7 = 0 THEN md5(doc_id::VARCHAR || ':live')
                  ELSE md5(doc_id::VARCHAR || ':' || i::VARCHAR) END AS digest
      FROM documents CROSS JOIN (SELECT unnest([1, 2, 3]) AS i) g
      WHERE doc_id % 5 != 0),
    last AS (
      SELECT url, ts AS last_ts, digest AS validator FROM (
        SELECT url, ts, digest,
               row_number() OVER (PARTITION BY url ORDER BY ts DESC, digest DESC) AS rn
        FROM h) WHERE rn = 1),
    lv AS (
      SELECT {_REFETCH_URL_SQL} AS url,
             md5(doc_id::VARCHAR || ':live') AS live_digest,
             n_chars::BIGINT AS n_bytes
      FROM documents)
    SELECT lv.url,
           CASE WHEN validator IS NULL THEN 'first_fetch'
                WHEN live_digest = validator THEN 'not_modified'
                ELSE 'modified' END AS outcome,
           last_ts,
           (CASE WHEN validator IS NOT NULL AND live_digest = validator
                 THEN n_bytes ELSE 0 END)::BIGINT AS bytes_saved,
           (CASE WHEN validator IS NOT NULL AND live_digest = validator
                 THEN 0 ELSE n_bytes END)::BIGINT AS bytes_fetched
    FROM lv LEFT JOIN last ON lv.url = last.url
    """,
)
def conditional_refetch(spark, sf_dir):
    """HTTP revalidation planning (webindex.conditional_refetch, RFC 9110
    §13): the archive's latest capture per URL is the validator; the live
    payload classifies each refetch as first_fetch / not_modified (304,
    body never transferred) / modified. The plant gives every archived URL
    three captures whose digests all differ EXCEPT the last capture of
    doc_id % 7 == 0 (which equals the live digest) — so only a
    latest-capture window gets the 304 set right, and doc_id % 5 == 0 has
    no history at all (first_fetch). bytes_saved prices the politeness
    budget's effective page rate."""
    d = T(spark, sf_dir, "documents").select("doc_id", "n_chars")
    dd = F.col("doc_id")
    url = F.concat(
        F.lit("https://h"), (dd % 13).cast("string"),
        F.lit(".docs.example.com/d/"), dd.cast("string"),
    )
    live_digest = F.md5(F.concat(dd.cast("string"), F.lit(":live")))
    hist = (
        d.where(dd % 5 != 0)
        .select(dd, F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("i"))
        .select(
            url.alias("url"),
            F.col("i").cast("long").alias("warc_ts"),
            F.when((F.col("i") == 3) & (dd % 7 == 0), live_digest)
            .otherwise(
                F.md5(F.concat(dd.cast("string"), F.lit(":"),
                               F.col("i").cast("string")))
            ).alias("digest"),
        )
    )
    live = d.select(
        url.alias("url"), live_digest.alias("digest"),
        F.col("n_chars").alias("n_bytes"),
    )
    return webindex.conditional_refetch(hist, live)


@q(
    "politeness_schedule",
    f"""
    WITH batch AS (
      SELECT {_REFETCH_URL_SQL} AS url,
             'h' || (doc_id % 13)::VARCHAR || '.docs.example.com' AS host,
             (doc_id % 100)::DOUBLE / 10.0 AS priority
      FROM documents),
    pol AS (
      SELECT DISTINCT 'h' || (doc_id % 13)::VARCHAR || '.docs.example.com' AS host,
             (1 + (doc_id % 13) % 5)::DOUBLE AS crawl_delay
      FROM documents),
    slotted AS (
      SELECT url, host, priority,
             (row_number() OVER (PARTITION BY host ORDER BY priority ASC, url) - 1)::INT AS slot
      FROM batch)
    SELECT s.url, s.host, s.slot,
           s.slot * p.crawl_delay AS fetch_offset_s,
           make_timestamp(((epoch('2024-06-01 00:00:00'::TIMESTAMP)
                            + s.slot * p.crawl_delay) * 1000000)::BIGINT) AS fetch_at
    FROM slotted s JOIN pol p ON s.host = p.host
    """,
)
def politeness_schedule(spark, sf_dir):
    """Politeness schedule materialization (webindex.politeness_schedule):
    the popped batch becomes per-host wall-clock fetch slots — best
    priority first, one slot every Crawl-delay seconds from the round
    start — so a 1000-executor fleet stays polite with NO cross-executor
    rate limiter (the host Exchange is the assignment, timestamps are
    preassigned data). Reference: the sleep-per-request loop in qcc.py /
    client_crawler.py, RFC 9309 Crawl-delay. Hosts carry distinct delays
    (1-5 s) so slot arithmetic is value-checked per host."""
    d = T(spark, sf_dir, "documents").select("doc_id")
    dd = F.col("doc_id")
    host = F.concat(
        F.lit("h"), (dd % 13).cast("string"), F.lit(".docs.example.com")
    )
    url = F.concat(
        F.lit("https://h"), (dd % 13).cast("string"),
        F.lit(".docs.example.com/d/"), dd.cast("string"),
    )
    batch = d.select(
        url.alias("url"), host.alias("host"),
        ((dd % 100).cast("double") / 10.0).alias("priority"),
    )
    policy = d.select(
        host.alias("host"),
        (1 + (dd % 13) % 5).cast("double").alias("crawl_delay"),
    ).distinct()
    return webindex.politeness_schedule(batch, policy, "2024-06-01 00:00:00")


@q(
    "focused_priority",
    f"""
    WITH n AS (SELECT count(*) AS cnt FROM documents),
    l AS (
      SELECT 'https://h' || (doc_id % 13)::VARCHAR || '.example.com/d/' || doc_id::VARCHAR AS src,
             'https://h' || (((7 * doc_id + k) % cnt) % 13)::VARCHAR || '.example.com/d/'
               || ((7 * doc_id + k) % cnt)::VARCHAR AS dst
      FROM documents CROSS JOIN n CROSS JOIN (SELECT unnest([1, 2, 3]) AS k) g),
    s AS (
      SELECT 'https://h' || (doc_id % 13)::VARCHAR || '.example.com/d/' || doc_id::VARCHAR AS src,
             ((doc_id * 37) % 101)::DOUBLE / 100.0 AS sc
      FROM documents)
    SELECT dst AS url,
           max(sc) * 0.85 AS rank,
           max(sc) AS best_parent_score,
           count(DISTINCT l.src) AS n_parents
    FROM l JOIN s ON l.src = s.src
    GROUP BY dst
    """,
)
def focused_priority_q(spark, sf_dir):
    """Focused-crawl priority (pagerank.focused_priority — Chakrabarti et
    al. WWW 1999): an undiscovered URL inherits the best linking page's
    relevance score damped one hop, steering the frontier toward on-topic
    regions instead of BFS. One links⋈scores join + one Exchange(dst)
    max/count agg — max is algebraic, so partial aggregation absorbs
    hot-target fan-in (no collect_set state). The doc-graph plant (i →
    7i+k mod N) gives every target 1-3 scored parents with distinct
    deterministic scores, value-checking the argmax-inherit rule."""
    from spider_spark.pagerank import focused_priority

    docs = T(spark, sf_dir, "documents").select("doc_id")
    n = docs.count()
    dd = F.col("doc_id")

    def _u(c):
        return F.concat(
            F.lit("https://h"), (c % 13).cast("string"),
            F.lit(".example.com/d/"), c.cast("string"),
        )

    links = docs.select(
        dd, F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("k")
    ).select(
        _u(dd).alias("src"), _u((dd * 7 + F.col("k")) % n).alias("dst")
    )
    scores = docs.select(
        _u(dd).alias("url"),
        (((dd * 37) % 101).cast("double") / 100.0).alias("score"),
    )
    return focused_priority(links, scores, decay=0.85)


@q(
    "epoch_shuffle",
    f"""
    SELECT doc_id,
           (row_number() OVER (
              ORDER BY {textops.hash60_sql("'epoch:42:' || doc_id::VARCHAR")},
                       doc_id) - 1)::BIGINT AS shuffle_idx
    FROM documents
    """,
)
def epoch_shuffle_q(spark, sf_dir):
    """Deterministic epoch shuffle (sampling.epoch_shuffle): a dense
    per-epoch permutation index with NO global-order window — the
    range-partitioned histogram-offset ranking pattern (per-bucket counts
    → running offsets over the B-row histogram → per-bucket row_number +
    offset). The oracle IS the naive global row_number over the hash
    order, so driver-green certifies the decomposition exact: bucket
    boundaries compose ranks correctly (integer `div`, never float), ties
    resolve identically, and the index is dense 0..n-1. A trainer draws
    epoch t by changing the seed; reproducible on any engine, cluster
    size, or partition layout."""
    from spider_spark.sampling import epoch_shuffle

    d = T(spark, sf_dir, "documents").select("doc_id")
    return epoch_shuffle(d, "doc_id", "42", n_buckets=64).select(
        "doc_id", "shuffle_idx"
    )


# =====================================================================
# Driver-verification window rotation
# =====================================================================
# The correctness driver verifies the FIRST 50 registry entries per round.
# Registration above follows the module's topical layout; the driver-facing
# order is rotated here so queries with no green driver record yet come
# first. Round-4 window: the 26 entries never checked in any
# CORRECTNESS_r0{1,2,3}.json, plus ann_lsh_topk (its only driver record is
# r01 `no_oracle`, before the value-level oracle existed), plus this
# round's additions (media_real_decode / media_real_resize — the vendored
# real image codec). Names listed but not registered are skipped;
# everything else keeps its original relative order, so slots 30-50 fall
# to the r01-verified topical head (q1/q3/q5, crawl_docs, dedup tier, …) —
# refreshing the OLDEST green records rather than r03's fresh ones.
_VERIFY_FIRST: list[str] = [
    # --- only driver record is a pre-oracle failure (r01 no_oracle) ---
    "ann_lsh_topk",
    # --- never driver-verified (r01 ∪ r02 ∪ r03 miss), relative order ---
    "cms_heavy_hitters", "media_frame_sample", "host_kcore", "semdedup_flags",
    "tfidf_sim_join", "sample_weighted_length", "vocab_oov_rate",
    "pack_sequences", "dedup_incremental", "stream_window_rates",
    "decontaminate_bloom_gate", "quality_model_scores",
    "corpus_export_manifest", "doc_length_quantiles", "bpe_learn_merges",
    "ann_pq_adc_topk", "ann_pq_refined_topk", "feed_seeds",
    "robots_asof_policy", "range_join_events", "revisit_plan",
    "temperature_mix", "conditional_refetch", "politeness_schedule",
    "focused_priority", "epoch_shuffle",
    # --- round-4 additions: real image codec, no driver record yet ---
    "media_real_decode", "media_real_resize",
]


def _rotate_registry() -> None:
    front = [n for n in _VERIFY_FIRST if n in QUERIES]
    rest = [n for n in QUERIES if n not in set(front)]
    order = front + rest
    for d in (QUERIES, ORACLES):
        snap = {k: d[k] for k in order if k in d}
        d.clear()
        d.update(snap)


_rotate_registry()
