"""Rolling-window time-series operators (SURVEY.md §2.F — the reference's
crypto periphery, Kline_analyze.py).

The reference computes these with pandas rolling on a single-symbol frame;
here they are Spark window functions partitioned by series key — distributed
across symbols, linear per symbol, no UDF.

All frames ordered by (ts, id) for a total order (the reference's pandas
index is implicitly unique; Spark needs the tiebreak made explicit).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window, WindowSpec


def series_window(key: str = "user_id", ts: str = "ts", id_col: str = "event_id") -> WindowSpec:
    return Window.partitionBy(key).orderBy(ts, id_col)


def rolling_mean(value: Column, w: WindowSpec, n: int) -> Column:
    """F1: MA(n) — Kline_analyze.py:134-135 ``close.rolling(n).mean()``.
    pandas emits NaN until the window is full; reproduced via count guard."""
    frame = w.rowsBetween(-(n - 1), 0)
    full = F.count(value).over(frame) >= n
    return F.when(full, F.avg(value).over(frame))


def rolling_max(value: Column, w: WindowSpec, n: int) -> Column:
    """F4: HH(n) — Kline_analyze.py:155 ``high.rolling(n).max()``."""
    frame = w.rowsBetween(-(n - 1), 0)
    return F.when(F.count(value).over(frame) >= n, F.max(value).over(frame))


def rolling_min(value: Column, w: WindowSpec, n: int) -> Column:
    frame = w.rowsBetween(-(n - 1), 0)
    return F.when(F.count(value).over(frame) >= n, F.min(value).over(frame))


def crossover(fast: Column, slow: Column, w: WindowSpec) -> Column:
    """F2 (Kline_analyze.py:136-141): 1 where fast>slow flips False→True
    (gold cross), 2 on the True→False flip (dead cross), else 0.

    Warmup parity: the reference compares MA series with NaN warmups —
    ``data['MA5'] > data['MA30']`` is **False** wherever either side is
    NaN — so a gold cross legitimately fires at the first bar where the
    slow MA becomes valid. Null comparisons therefore coalesce to 0
    (round-4 review fix: the prior null-propagating form silently
    swallowed that first-valid-bar flip)."""
    above = F.coalesce((fast > slow).cast("int"), F.lit(0))
    prev = F.lag(above).over(w)
    return (
        F.when(prev.isNotNull() & (above == 1) & (prev == 0), F.lit(1))
        .when(prev.isNotNull() & (above == 0) & (prev == 1), F.lit(2))
        .otherwise(F.lit(0))
    )


def true_range(high: Column, low: Column, close: Column, w: WindowSpec) -> Column:
    """F3 (Kline_analyze.py:150-154): TR = max(**close**-low,
    |high-prev_close|, |low-prev_close|) — the reference's exact formula,
    which deviates from the textbook high-low first term
    (``max((df['close'][i] - df['low'][i]), ...)``). First row: pandas
    shift() yields NaN and Python ``max(x, nan, nan)`` keeps x, so TR
    falls back to close-low (round-4 review fix: this engine previously
    shipped the textbook high-low variant, a silent parity break)."""
    prev_close = F.lag(close).over(w)
    return F.greatest(
        close - low,
        F.coalesce(F.abs(high - prev_close), close - low),
        F.coalesce(F.abs(low - prev_close), close - low),
    )


def atr(high: Column, low: Column, close: Column, w: WindowSpec, n: int = 14) -> Column:
    """F3: ATR(n) = rolling mean of TR."""
    return rolling_mean(true_range(high, low, close, w), w, n)


def gold_cross_volume(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    id_col: str = "event_id",
    close: str = "close",
    low: str = "low",
    volume: str = "volume",
    fast_n: int = 3,
    slow_n: int = 7,
    spike: float = 2.5,
) -> DataFrame:
    """F2-composed: the reference's gold_cross volume-spike screen
    (crash_callback.py:164-185) — its only non-trivial window composition.

    Per symbol: flag = 1 iff the LAST bar is a gold cross (MA_sign==1) and,
    within the window from the most recent dead cross (inclusive) to the
    end, the volume at the FIRST minimum-low bar is ≥ ``spike`` × the mean
    volume of the bars before it (empty slice ⇒ no flag) — exactly the
    list-index arithmetic of the reference, restated as conditional window
    aggregates over a reverse row_number (no per-symbol collect; all
    symbols in parallel).

    Returns one row per key: (key, last_sign, dead_rn, ratio, flag) where
    dead_rn is the from-the-end position of the latest dead cross (NULL if
    none), ratio = volume_at_min·n_pre/Σ volume_pre (NULL when undefined;
    exact-integer division so it is bit-identical cross-engine)."""
    w = series_window(key, ts, id_col)
    wdesc = Window.partitionBy(key).orderBy(F.desc(ts), F.desc(id_col))
    part = Window.partitionBy(key)
    sign = crossover(
        rolling_mean(F.col(close), w, fast_n), rolling_mean(F.col(close), w, slow_n), w
    )
    d = df.select(
        key, F.col(low).alias("_low"), F.col(volume).alias("_vol"),
        sign.alias("_sign"), F.row_number().over(wdesc).alias("_rnd"),
    )
    d = d.select(
        key, "_low", "_vol", "_sign", "_rnd",
        F.min(F.when(F.col("_sign") == 2, F.col("_rnd"))).over(part).alias("_drn"),
        F.max(F.when(F.col("_rnd") == 1, F.col("_sign"))).over(part).alias("_last"),
    )
    d = d.withColumn("_inwin", F.col("_rnd") <= F.col("_drn"))
    d = d.withColumn(
        "_minlow", F.min(F.when(F.col("_inwin"), F.col("_low"))).over(part)
    )
    # first forward occurrence of the min = LARGEST reverse row number
    d = d.withColumn(
        "_mrn",
        F.max(
            F.when(F.col("_inwin") & (F.col("_low") == F.col("_minlow")), F.col("_rnd"))
        ).over(part),
    )
    pre = F.col("_inwin") & (F.col("_rnd") > F.col("_mrn"))
    agg = d.groupBy(key).agg(
        F.max("_last").alias("last_sign"),
        F.max("_drn").cast("int").alias("dead_rn"),
        F.sum(F.when(pre, F.col("_vol"))).alias("_pre_sum"),
        F.count(F.when(pre, F.lit(1))).alias("_pre_cnt"),
        F.max(F.when(F.col("_rnd") == F.col("_mrn"), F.col("_vol"))).alias("_vol_at"),
    )
    ratio = F.when(
        F.col("dead_rn").isNotNull() & (F.col("_pre_cnt") > 0),
        (F.col("_vol_at") * F.col("_pre_cnt")) / F.col("_pre_sum"),
    )
    return agg.select(
        key,
        "last_sign",
        "dead_rn",
        F.round(ratio, 6).alias("ratio"),
        F.when(
            (F.col("last_sign") == 1) & ratio.isNotNull() & (ratio >= spike), 1
        ).otherwise(0).alias("flag"),
    )


def sessionize(df: DataFrame, gap_seconds: int, key: str = "user_id",
               ts: str = "ts", id_col: str = "event_id") -> DataFrame:
    """Gap-based session assignment: a new session starts when the delta to
    the previous event exceeds the gap. Classic lag + conditional cumsum —
    one shuffle on the series key, linear within."""
    w = series_window(key, ts, id_col)
    epoch = F.unix_timestamp(F.col(ts))  # NTZ-safe (session tz = UTC)
    delta = epoch - F.lag(epoch).over(w)
    new_sess = F.when(delta.isNull() | (delta > gap_seconds), 1).otherwise(0)
    return df.withColumn(
        "session_no",
        F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
    )
