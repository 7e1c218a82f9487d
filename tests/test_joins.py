"""Temporal join operators (spider_spark/joins.py): backward as-of join and
binned point-in-interval range join, checked against naive per-row models."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from spider_spark import joins

UTC = dt.timezone.utc


def _ts(minute: float) -> dt.datetime:
    whole = int(minute)
    micros = int(round((minute - whole) * 60 * 1_000_000))
    return dt.datetime(2024, 3, 1, 0, 0, 0, tzinfo=UTC) + dt.timedelta(
        minutes=whole, microseconds=micros
    )


def _asof_model(left, right, strict=False):
    """Per-row reference: most recent right row with right_ts <= (or <) ts."""
    out = []
    for k, lts, payload in left:
        best = None
        for rk, rts, v in right:
            if rk != k:
                continue
            if (rts < lts) if strict else (rts <= lts):
                if best is None or rts > best[0]:
                    best = (rts, v)
        out.append((k, lts, payload, None if best is None else best[1]))
    return sorted(out, key=lambda r: (r[0], r[1], r[2]))


def test_asof_join_matches_model_incl_ties_and_missing(spark):
    left = [
        ("a", _ts(5), "l1"),   # between snaps 0 and 10
        ("a", _ts(10), "l2"),  # exact tie with snap at 10 → inclusive picks it
        ("a", _ts(0), "l3"),   # tie with the very first snap
        ("b", _ts(3), "l4"),   # before b's first snap → NULL
        ("b", _ts(60), "l5"),
        ("c", _ts(9), "l6"),   # key with no right rows at all
    ]
    right = [
        ("a", _ts(0), "a0"),
        ("a", _ts(10), "a10"),
        ("a", _ts(20), "a20"),
        ("b", _ts(4), "b4"),
    ]
    ldf = spark.createDataFrame(left, "k string, ts timestamp, payload string")
    rdf = spark.createDataFrame(right, "k string, rts timestamp, v string")

    got = joins.asof_join(ldf, rdf, on="k", left_ts="ts", right_ts="rts")
    rows = sorted(
        [(r["k"], r["ts"].replace(tzinfo=UTC), r["payload"], r["v"]) for r in got.collect()],
        key=lambda r: (r[0], r[1], r[2]),
    )
    assert rows == _asof_model(left, right)
    # inclusive mode: the equal-ts snap is visible
    assert [r[3] for r in rows if r[2] == "l2"] == ["a10"]
    assert [r[3] for r in rows if r[2] == "l3"] == ["a0"]

    strict = joins.asof_join(ldf, rdf, on="k", left_ts="ts", right_ts="rts", strict=True)
    srows = sorted(
        [(r["k"], r["ts"].replace(tzinfo=UTC), r["payload"], r["v"]) for r in strict.collect()],
        key=lambda r: (r[0], r[1], r[2]),
    )
    assert srows == _asof_model(left, right, strict=True)
    # strict mode: the equal-ts snap is NOT visible — falls back to the prior one
    assert [r[3] for r in srows if r[2] == "l2"] == ["a0"]
    assert [r[3] for r in srows if r[2] == "l3"] == [None]


def test_asof_join_carries_all_right_columns_and_row_count(spark):
    ldf = spark.createDataFrame(
        [("a", _ts(i), i) for i in range(0, 50, 3)],
        "k string, ts timestamp, n int",
    )
    rdf = spark.createDataFrame(
        [("a", _ts(i), f"s{i}", i * 10) for i in range(0, 50, 7)],
        "k string, rts timestamp, name string, score int",
    )
    out = joins.asof_join(ldf, rdf, on="k", left_ts="ts", right_ts="rts")
    assert set(out.columns) == {"k", "ts", "n", "rts", "name", "score"}
    assert out.count() == ldf.count()  # left-outer: every left row survives
    got = {r["n"]: (r["name"], r["score"]) for r in out.collect()}
    for i in range(0, 50, 3):
        snap = (i // 7) * 7
        assert got[i] == (f"s{snap}", snap * 10)


def _range_model(points, intervals):
    out = []
    for pid, k, pts in points:
        for wid, ik, s, e in intervals:
            if k == ik and s <= pts < e:
                out.append((pid, wid))
    return sorted(out)


def test_range_join_binned_matches_naive_across_boundaries(spark):
    # intervals chosen to straddle 600 s (10 min) bucket boundaries and to
    # include sub-second endpoints — the case where trimming the end bucket
    # on truncated seconds drops valid matches.
    intervals = [
        (1, "a", _ts(0), _ts(25)),        # buckets 0,1,2
        (2, "a", _ts(9.5), _ts(10.5)),    # tiny window straddling a boundary
        (3, "b", _ts(30), _ts(30.0001)),  # sub-second window
        (4, "a", _ts(20), _ts(20)),       # empty (end == start) → dropped
        (5, "b", _ts(100), _ts(170)),     # long window, buckets 10..17
    ]
    points = [
        (10, "a", _ts(0)),        # inclusive start
        (11, "a", _ts(24.999)),   # just inside 1
        (12, "a", _ts(25)),       # half-open end: excluded from 1
        (13, "a", _ts(9.9)),      # inside 1 and 2
        (14, "a", _ts(10.2)),     # inside 1 and 2, next bucket
        (15, "b", _ts(30.00005)), # inside the sub-second window
        (16, "b", _ts(30.2)),     # outside it
        (17, "a", _ts(20)),       # empty window matches nothing; inside 1
        (18, "b", _ts(169.999)),
        (19, "c", _ts(5)),        # key with no windows
    ]
    pdf = spark.createDataFrame(points, "pid long, k string, ts timestamp")
    idf = spark.createDataFrame(
        intervals, "wid long, k string, s timestamp, e timestamp"
    )
    out = joins.range_join_binned(
        pdf, idf, on="k", point_col="ts", start_col="s", end_col="e",
        bin_seconds=600,
    )
    got = sorted((r["pid"], r["wid"]) for r in out.collect())
    assert got == _range_model(points, intervals)


def test_range_join_binned_left_outer_keeps_unmatched_points(spark):
    pdf = spark.createDataFrame(
        [(1, "a", _ts(5)), (2, "a", _ts(500))], "pid long, k string, ts timestamp"
    )
    idf = spark.createDataFrame(
        [(7, "a", _ts(0), _ts(10))], "wid long, k string, s timestamp, e timestamp"
    )
    out = joins.range_join_binned(
        pdf, idf, on="k", point_col="ts", start_col="s", end_col="e",
        bin_seconds=600, how="left",
    )
    got = {r["pid"]: r["wid"] for r in out.collect()}
    assert got == {1: 7, 2: None}


def test_range_join_binned_coarse_and_fine_bins_agree(spark):
    points = [(i, "k", _ts(i * 1.7)) for i in range(120)]
    intervals = [(100 + j, "k", _ts(j * 13), _ts(j * 13 + 11)) for j in range(16)]
    pdf = spark.createDataFrame(points, "pid long, k string, ts timestamp")
    idf = spark.createDataFrame(
        intervals, "wid long, k string, s timestamp, e timestamp"
    )
    expected = _range_model(points, intervals)
    for bin_s in (60, 600, 3600):
        out = joins.range_join_binned(
            pdf, idf, on="k", point_col="ts", start_col="s", end_col="e",
            bin_seconds=bin_s,
        )
        assert sorted((r["pid"], r["wid"]) for r in out.collect()) == expected


def test_asof_join_single_shuffle_no_pair_blowup(spark):
    """The plan must contain exactly ONE Exchange (the key shuffle feeding
    the window) and no join node at all — the anti-blowup contract."""
    ldf = spark.range(100).select(
        F.lit("k").alias("k"),
        F.timestamp_seconds(F.col("id") * 60).alias("ts"),
        F.col("id").alias("n"),
    )
    rdf = spark.range(10).select(
        F.lit("k").alias("k"),
        F.timestamp_seconds(F.col("id") * 600).alias("rts"),
        F.col("id").alias("v"),
    )
    out = joins.asof_join(ldf, rdf, on="k", left_ts="ts", right_ts="rts")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_asof_join_carries_whole_row_not_per_column(spark):
    """A genuine NULL in a newer right row must survive as NULL — the
    per-column carry resurrected the older row's value, fabricating a row
    that mixes columns from different right rows (review, probe-confirmed)."""
    from spider_spark.joins import asof_join

    right = spark.createDataFrame(
        [("h", 10, 1, None), ("h", 11, None, 2)],
        "host string, snap_ts long, a int, b int",
    )
    left = spark.createDataFrame([("h", 12)], "host string, ts long")
    [r] = asof_join(left, right, on="host", left_ts="ts",
                    right_ts="snap_ts").collect()
    assert (r.a, r.b) == (None, 2)  # the 11:00 row, exactly as stored
