"""Rolling-window time series (§2.F) over events — registry tier split out of the former
monolithic queries.py (round 4). Conventions live in
spider_spark/registry/__init__.py; enumeration order is preserved by
the import order there."""

from __future__ import annotations

from pyspark.sql import functions as F
from spider_spark import kline
from spider_spark.registry._base import T, q


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


