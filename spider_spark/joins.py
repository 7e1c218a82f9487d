"""Temporal join operators Spark's optimizer has no native strategy for:
backward as-of join and point-in-interval range join.

Why a crawl/archive engine needs them (reference semantics, not reference
code — the reference serializes these lookups through Redis/Mongo point
reads, one URL at a time):

- *as-of*: "which robots policy / proxy score / host budget was in effect
  when this capture happened?" The reference re-reads the LATEST robots row
  at fetch time (分布式京东商品详情页/client_crawler.py polls per request), which
  is an as-of join against a snapshot history once the crawl is replayed or
  audited as a batch. Same shape as pandas ``merge_asof``.
- *range join*: "which maintenance/experiment window contains this event?"
  Naive SQL is a key-equi join plus inequality filter — Catalyst executes
  that as a join with a range condition and, keyed only on a low-cardinality
  key, degenerates toward per-key cross products at scale.

Scale design (the whole point of these helpers):

- ``asof_join`` NEVER builds candidate pairs. Both sides are tagged and
  unioned, then ONE shuffle on the join key + a single window sort orders
  each key's timeline; ``last(value, ignorenulls=True)`` carries the most
  recent right-side row forward onto every left row. Cost is the cost of
  sorting the union — O(n log n) per key, zero intermediate blowup — vs the
  O(left × right-per-key) candidate set a range-condition join materializes.
  Hot keys (one host with millions of captures) stay a single partition's
  sort, the same skew profile as any window; AQE's skew handling does not
  split windows, so the documented mitigation is pre-bucketing by a
  secondary range key if one host exceeds a partition budget.
- ``range_join_binned`` grids time into ``bin`` buckets: an interval is
  exploded onto the O(length/bin) buckets it overlaps, a point lands in
  exactly ONE bucket, and the join key becomes (key, bucket) — an equi join
  Catalyst shuffles normally (AQE skew-split applies, broadcast applies when
  the interval side is small). The exact containment predicate re-filters
  inside the matched bucket. Explosion factor is bounded and user-visible:
  pick ``bin`` near the median interval length so the blowup is ~2×.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    *,
    strict: bool = False,
) -> DataFrame:
    """Backward as-of join: each ``left`` row picks the single most recent
    ``right`` row with the same ``on`` key and ``right_ts <= left_ts``
    (``<`` when ``strict``). Left rows with no earlier right row survive
    with NULL right columns (left-outer semantics, like pandas
    ``merge_asof``).

    Output: all ``left`` columns, plus every non-key ``right`` column
    (``right_ts`` included) — callers rename collisions beforehand.

    Implementation: tag + union + one window. Right rows sort BEFORE left
    rows at an equal timestamp when ties match (inclusive mode), AFTER when
    ``strict``, so tie semantics fall out of the sort order instead of a
    second pass. ``last(col, ignorenulls=True)`` over
    ``rowsBetween(unboundedPreceding, currentRow)`` then carries each right
    value forward. One shuffle on ``on``; no pair blowup (see module doc).

    Ties *within* the right side (two right rows, same key, same ts) resolve
    to the later row in the deterministic tiebreak order ``_tie`` — pass a
    pre-deduped right side when that matters.
    """
    rcols = [c for c in right.columns if c != on]
    lcols = list(left.columns)
    # side tag orders equal timestamps: inclusive → right first (0 < 1),
    # strict → right after left so an equal-ts right row is NOT visible.
    r_side, l_side = (1, 0) if strict else (0, 1)
    # the right row is carried as ONE struct with a single
    # last(ignorenulls) — per-COLUMN carries conflated a genuine NULL in a
    # newer right row with the union placeholder and resurrected the
    # previous row's value for that column, fabricating rows that mix
    # columns from different right rows (review, probe-confirmed)
    r_tagged = right.select(
        F.col(on),
        F.col(right_ts).alias("_ts"),
        F.lit(r_side).alias("_side"),
        F.monotonically_increasing_id().alias("_tie"),
        F.struct(*[F.col(c).alias(c) for c in rcols]).alias("_r"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}") for c in lcols],
    )
    r_struct_type = r_tagged.schema["_r"].dataType
    l_tagged = left.select(
        F.col(on),
        F.col(left_ts).cast(right.schema[right_ts].dataType).alias("_ts"),
        F.lit(l_side).alias("_side"),
        F.lit(0).cast("long").alias("_tie"),
        F.lit(None).cast(r_struct_type).alias("_r"),
        *[F.col(c).alias(f"_l_{c}") for c in lcols],
    )
    w = (
        Window.partitionBy(on)
        .orderBy("_ts", "_side", "_tie")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = r_tagged.unionByName(l_tagged).select(
        "*", F.last("_r", ignorenulls=True).over(w).alias("_asof")
    )
    is_left = F.col("_side") == l_side
    return carried.where(is_left).select(
        *[F.col(f"_l_{c}").alias(c) for c in lcols if c != on],
        F.col(on),
        *[F.col("_asof")[c].alias(c) for c in rcols],
    )


def range_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    on: str,
    point_col: str,
    start_col: str,
    end_col: str,
    *,
    bin_seconds: int,
    how: str = "inner",
) -> DataFrame:
    """Point-in-interval join: pair each ``points`` row with every
    ``intervals`` row sharing the ``on`` key whose half-open window
    ``[start_col, end_col)`` contains ``point_col``. Timestamps throughout.

    The interval side is exploded onto the ``bin_seconds``-wide grid
    buckets it overlaps (``F.sequence`` over epoch-bucket indexes — JVM,
    no Python), the point side gets its single bucket, and the join runs
    as a plain equi join on (key, bucket) with the exact containment
    predicate applied inside the bucket match. Overlapping intervals
    produce one output row each (a point is in exactly one bucket, so no
    dedup pass is needed). ``how='left'`` keeps point rows with no
    containing interval, NULL interval columns.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    p_bucket = F.floor(F.unix_timestamp(F.col(point_col)) / bin_seconds)
    # bucket bounds are computed on FLOORED seconds (unix_timestamp) on both
    # sides, and the end bucket is kept inclusive: a sub-second end spills
    # points into the floor(end) bucket, and trimming it with arithmetic on
    # truncated seconds would MISS them. One possibly-empty extra bucket per
    # interval is free — the exact containment predicate re-filters.
    i_lo = F.floor(F.unix_timestamp(F.col(start_col)) / bin_seconds)
    i_hi = F.floor(F.unix_timestamp(F.col(end_col)) / bin_seconds)
    icols = [c for c in intervals.columns if c != on]
    iv = intervals.where(F.col(end_col) > F.col(start_col)).select(
        F.col(on).alias("_i_key"),
        F.explode(F.sequence(i_lo, F.greatest(i_lo, i_hi))).alias("_bucket"),
        *[F.col(c).alias(f"_i_{c}") for c in icols],
    )
    pt = points.withColumn("_bucket", p_bucket)
    cond = (
        (pt[on] == iv["_i_key"])
        & (pt["_bucket"] == iv["_bucket"])
        & (pt[point_col] >= iv[f"_i_{start_col}"])
        & (pt[point_col] < iv[f"_i_{end_col}"])
    )
    joined = pt.join(iv, cond, how)
    return joined.select(
        *[pt[c] for c in points.columns],
        *[iv[f"_i_{c}"].alias(c) for c in icols],
    )
