"""Differential: kline.py Spark operators vs a pandas model that follows
the reference's code paths line by line (Kline_analyze.py MA:128-141,
chandelier_stop:144-162; crash_callback.py gold_cross:162-184) — the same
engine-vs-independent-model pattern as tests/test_dom_fuzz.py.

Round-4 review found (and these tests now pin) two silent parity breaks:
- the reference's ``MA5 > MA30`` treats NaN warmups as False, so a gold
  cross fires at the first bar where the slow MA becomes valid;
- the reference's TR is ``max(close-low, |high-prev_close|,
  |low-prev_close|)`` (close-low, NOT the textbook high-low), and its
  first row is close-low because Python ``max(x, nan, nan)`` keeps x.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from spider_spark import kline


def _series(seed: int, n: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    close = 100 + np.cumsum(rng.normal(0, 1, n))
    return pd.DataFrame(
        {
            "user_id": 1,
            "event_id": np.arange(n),
            "ts": pd.date_range("2024-01-01", periods=n, freq="h"),
            "close": close,
            "high": close + rng.uniform(0, 2, n),
            "low": close - rng.uniform(0, 2, n),
            "volume": rng.integers(1, 100, n).astype(float),
        }
    )


def _ref_ma_sign(close: pd.Series, fast_n: int, slow_n: int) -> pd.Series:
    """Kline_analyze.py:134-141 verbatim semantics."""
    ma_f = close.rolling(fast_n).mean()
    ma_s = close.rolling(slow_n).mean()
    sign = pd.Series(0, index=close.index)
    pos = ma_f > ma_s  # NaN comparisons are False, as in the reference
    sign.loc[pos[(pos == True) & (pos.shift() == False)].index] = 1  # noqa: E712
    sign.loc[pos[(pos == False) & (pos.shift() == True)].index] = 2  # noqa: E712
    return sign


def _ref_tr(df: pd.DataFrame) -> pd.Series:
    """chandelier_stop:150-154: per-row Python max with NaN shift."""
    prev = df["close"].shift()
    out = []
    for i in range(len(df)):
        out.append(
            max(
                df["close"][i] - df["low"][i],
                abs(df["high"][i] - prev[i]),
                abs(df["low"][i] - prev[i]),
            )
        )
    return pd.Series(out, index=df.index)


def _ref_gold_cross(sign: list, low: list, volume: list, spike: float) -> int:
    """crash_callback.py:162-184 verbatim semantics (try/except → flag 0)."""
    try:
        if sign[-1] == 1 and volume:
            dead = sign[::-1].index(2)
            low_w = low[-(dead + 1):]
            vol_w = volume[-(dead + 1):]
            mpos = low_w.index(min(low_w))
            if vol_w[:mpos]:
                return int(vol_w[mpos] >= np.mean(vol_w[:mpos]) * spike)
    except ValueError:
        pass
    return 0


@pytest.mark.parametrize("seed,n", [(1, 40), (2, 60), (3, 35), (4, 120), (5, 31)])
def test_crossover_matches_reference_model(spark, seed, n):
    pdf = _series(seed, n)
    ref = _ref_ma_sign(pdf["close"], 5, 30).tolist()
    df = spark.createDataFrame(pdf)
    w = kline.series_window()
    sig = kline.crossover(
        kline.rolling_mean(F.col("close"), w, 5),
        kline.rolling_mean(F.col("close"), w, 30),
        w,
    )
    got = [
        r.s for r in df.select(sig.alias("s"), "event_id")
        .orderBy("event_id").collect()
    ]
    assert got == ref, f"diverges at {next(i for i,(a,b) in enumerate(zip(got,ref)) if a!=b)}"


def test_crossover_fires_on_first_valid_slow_ma(spark):
    """The warmup flip specifically: rising series ⇒ MA5>MA30 at bar 29,
    position False (NaN) at bar 28 ⇒ the reference marks a gold cross."""
    pdf = _series(9, 31)
    pdf["close"] = np.arange(31, dtype=float)  # strictly rising
    assert _ref_ma_sign(pdf["close"], 5, 30).tolist()[29] == 1
    df = spark.createDataFrame(pdf)
    w = kline.series_window()
    sig = kline.crossover(
        kline.rolling_mean(F.col("close"), w, 5),
        kline.rolling_mean(F.col("close"), w, 30),
        w,
    )
    got = [r.s for r in df.select(sig.alias("s"), "event_id")
           .orderBy("event_id").collect()]
    assert got[29] == 1 and sum(got) == 1


@pytest.mark.parametrize("seed,n", [(11, 30), (12, 50)])
def test_true_range_matches_reference_model(spark, seed, n):
    pdf = _series(seed, n)
    ref = _ref_tr(pdf).round(9).tolist()
    df = spark.createDataFrame(pdf)
    w = kline.series_window()
    tr = kline.true_range(F.col("high"), F.col("low"), F.col("close"), w)
    got = [r.tr for r in df.select(F.round(tr, 9).alias("tr"), "event_id")
           .orderBy("event_id").collect()]
    assert got == pytest.approx(ref)


@pytest.mark.parametrize("seed,n", [(21, 45), (22, 80), (23, 33), (24, 64)])
def test_gold_cross_volume_matches_reference_model(spark, seed, n):
    pdf = _series(seed, n)
    sign = _ref_ma_sign(pdf["close"], 3, 7).tolist()
    ref_flag = _ref_gold_cross(
        sign, pdf["low"].tolist(), pdf["volume"].tolist(), 2.5)
    df = spark.createDataFrame(pdf)
    out = kline.gold_cross_volume(
        df, close="close", low="low", volume="volume",
        fast_n=3, slow_n=7, spike=2.5).collect()
    assert len(out) == 1
    assert out[0].flag == ref_flag
    assert out[0].last_sign == sign[-1]
