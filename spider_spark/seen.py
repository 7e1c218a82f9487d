"""Partitioned Bloom-filter URL-seen set (north_rule).

The reference's seen set is a Redis GET/SET per URL
(分布式京东商品详情页/mongo_redis_mgr.py:43-47) — an O(1) membership probe in
front of the expensive insert. At 10^10 URLs a central KV store is the
bottleneck, so the Spark-native shape is:

- key: ``xxhash64(canonical_url)`` (computed JVM-side, canon.py);
- state: N hash-partitioned Bloom segments, each a byte array, persisted as
  the ``seen_segments(bucket, filter, n_items)`` table in every snapshot
  (checkpointed + resumable like everything else);
- membership: candidates shuffle by ``bucket = pmod(hash, N)`` and cogroup
  with their one segment (``applyInPandas`` over numpy bitops — vectorized,
  no per-row Python);
- Bloom 'maybe' answers are escaped to exactness by a LEFT ANTI JOIN against
  the frontier — false positives cost one extra join of a ~fpp-sized slice,
  false negatives are impossible, so dedup stays EXACT while the anti-join
  shrinks by ~99%;
- merge: per-bucket OR of new-key bits — embarrassingly parallel.

Deletions (the cuckoo-filter case): Bloom can't delete, so the fallback is
counting buckets — see CuckooSeen below, same table contract with 4-bit
counters enabling remove(). The crawl itself never deletes; CuckooSeen
exists for frontier-eviction workflows (north_rule names it).

Sizing: bits/key ≈ -1.44·log2(fpp); at fpp=1% ≈ 9.6 bits ⇒ a 10^10-URL seen
set is ~12 GB *total*, i.e. ~12 MB per bucket at N=1024 — each segment fits
comfortably in one task. Every segment row carries its OWN geometry
(``m`` bits, ``k`` hashes), so buckets grow independently:
``maybe_rebuild`` inspects the (tiny, n_buckets-row) stats, and any bucket
whose ``n_items`` exceeds its capacity is rebuilt from the frontier with
``m`` doubled until capacity ≥ 2·n_items — FP rate degrades gracefully in
between and snaps back after the rebuild; correctness is never affected
thanks to the exact anti-join escape. The crawl loop runs the check each
round (cost: one n_buckets-row collect) and logs per-round probe counts
(n_candidates / n_maybe / n_definitely_new) to fetch_log under the
``_bloom`` sentinel host for FP-rate telemetry (SURVEY.md §7 step 4).
"""

from __future__ import annotations

import math
from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spider_spark import tables
from spider_spark.canon import url_hash_col

_MIX = np.uint64(0x9E3779B97F4A7C15)
# per-bucket geometry travels WITH the segment so buckets grow independently
SEG_SCHEMA = "bucket int, filter binary, n_items long, m long, k int"


def _positions(h: np.ndarray, k: int, m: int) -> Iterable[np.ndarray]:
    """k double-hashed bit positions per key (Kirsch-Mitzenmacher)."""
    h = h.astype(np.uint64)
    h2 = (h * _MIX) | np.uint64(1)
    for i in range(k):
        yield ((h + np.uint64(i) * h2) % np.uint64(m)).astype(np.int64)


def _set_bits(arr: np.ndarray, h: np.ndarray, k: int, m: int) -> None:
    for idx in _positions(h, k, m):
        np.bitwise_or.at(arr, idx >> 3, (1 << (idx & 7)).astype(np.uint8))


def _apply_counters(arr, h, delta: int, k: int, m: int) -> None:
    """Byte-wide counters saturating at 15 (4-bit semantics), fully
    vectorized: per hash position, duplicate-index-correct accumulation in
    a wide dtype (np.add.at), then one saturating clamp — identical to the
    element-wise sequential semantics (increment: min(15, c+cnt);
    decrement: counters AT 15 are frozen, others floor at 0 — saturated
    counters are never decremented, preserving no-false-negative under
    deletion). A per-element Python loop here cost k·n interpreter
    iterations in the applyInPandas hot path (~7M/round at 10^6 urls)."""
    for idx in _positions(h, k, m):
        wide = arr.astype(np.int16)
        if delta > 0:
            np.add.at(wide, idx, 1)
            np.minimum(wide, 15, out=wide)
            arr[:] = wide.astype(np.uint8)
        else:
            frozen = arr == 15
            np.subtract.at(wide, idx, 1)
            np.maximum(wide, 0, out=wide)
            out = wide.astype(np.uint8)
            out[frozen] = 15
            arr[:] = out


def _test_bits(arr: np.ndarray, h: np.ndarray, k: int, m: int) -> np.ndarray:
    out = np.ones(len(h), dtype=bool)
    for idx in _positions(h, k, m):
        out &= (arr[idx >> 3] >> (idx & 7)).astype(bool)
    return out


def _test_counters(arr: np.ndarray, h: np.ndarray, k: int, m: int) -> np.ndarray:
    """Counting-filter membership: all k counters non-zero."""
    out = np.ones(len(h), dtype=bool)
    for idx in _positions(h, k, m):
        out &= arr[idx] > 0
    return out


class SeenSet:
    def __init__(
        self,
        n_buckets: int = 32,
        fpp: float = 0.01,
        capacity_per_bucket: int = 1 << 17,
        segments: DataFrame | None = None,
    ):
        self.n_buckets = n_buckets
        self.fpp = fpp
        self.capacity = capacity_per_bucket
        # standard Bloom sizing
        self.m = int(math.ceil(-capacity_per_bucket * math.log(fpp) / (math.log(2) ** 2)))
        self.m += (-self.m) % 8  # byte-align
        self.k = max(1, round(self.m / capacity_per_bucket * math.log(2)))
        self.segments = segments

    def _capacity_of(self, m: int) -> int:
        """Inverse of the sizing formula: keys an m-bit segment holds at the
        configured fpp."""
        return int(m * (math.log(2) ** 2) / -math.log(self.fpp))

    # ------------------------------------------------------------------ io
    @classmethod
    def load(cls, spark: SparkSession, workdir, round_no: int, **kw) -> "SeenSet":
        """n_buckets and fpp must match build time — always pass the same
        CrawlConfig values used at build. Per-bucket (m, k) travel in the
        table itself; pre-geometry snapshots get the config defaults."""
        seg = tables.read_table(spark, workdir, round_no, "seen_segments")
        inst = cls(segments=None, **kw)
        if "m" not in seg.columns:
            seg = seg.withColumn("m", F.lit(inst.m).cast("long")).withColumn(
                "k", F.lit(inst.k).cast("int")
            )
        inst.segments = seg
        return inst

    def _bucketed(self, df: DataFrame) -> DataFrame:
        hash_col = F.col("url_hash") if "url_hash" in df.columns else url_hash_col(F.col("url"))
        return df.select(
            "url",
            hash_col.alias("url_hash"),
            F.pmod(hash_col, F.lit(self.n_buckets)).cast("int").alias("bucket"),
        )

    # --------------------------------------------------------------- build
    def build(self, frontier: DataFrame) -> DataFrame:
        """Build segments from scratch over all frontier URLs."""
        m, k = self.m, self.k

        def make(pdf):
            arr = np.zeros(m // 8, dtype=np.uint8)
            h = np.unique(pdf["url_hash"].to_numpy())
            _set_bits(arr, h, k, m)
            return pd.DataFrame(
                {"bucket": [int(pdf["bucket"].iloc[0])], "filter": [arr.tobytes()],
                 "n_items": [len(h)], "m": [m], "k": [k]}
            )

        seg = self._bucketed(frontier).groupBy("bucket").applyInPandas(
            make, schema=SEG_SCHEMA
        )
        self.segments = seg
        return seg

    def merged(self, new_rows: DataFrame) -> DataFrame:
        """OR the new URLs' bits into the existing segments (per-bucket,
        per-bucket geometry)."""
        assert self.segments is not None, "load/build first"
        m0, k0 = self.m, self.k

        def merge(key, new_pdf, seg_pdf):
            if len(seg_pdf):
                m, k = int(seg_pdf["m"].iloc[0]), int(seg_pdf["k"].iloc[0])
                arr = np.frombuffer(seg_pdf["filter"].iloc[0], dtype=np.uint8).copy()
                n = int(seg_pdf["n_items"].iloc[0])
            else:
                m, k = m0, k0
                arr = np.zeros(m // 8, dtype=np.uint8)
                n = 0
            n_new = 0
            if len(new_pdf):
                # n_items drives the overflow-rebuild heuristic, so count
                # only keys whose bits were not already all set (unique'd
                # within the batch) — blindly adding len(new_pdf) over-counts
                # re-merged keys and would trigger spurious rebuilds.
                h = np.unique(new_pdf["url_hash"].to_numpy())
                already = _test_bits(arr, h, k, m)
                _set_bits(arr, h, k, m)
                n_new = int((~already).sum())
            return pd.DataFrame(
                {"bucket": [int(key[0])], "filter": [arr.tobytes()],
                 "n_items": [n + n_new], "m": [m], "k": [k]}
            )

        seg = (
            self._bucketed(new_rows)
            .groupby("bucket")
            .cogroup(self.segments.groupby("bucket"))
            .applyInPandas(merge, schema=SEG_SCHEMA)
        )
        # buckets with no new rows must survive untouched
        untouched = self.segments.join(
            self._bucketed(new_rows).select("bucket").distinct(), "bucket", "left_anti"
        )
        out = seg.unionByName(untouched)
        self.segments = out
        return out

    def seg_stats(self) -> list[tuple[int, int, int]]:
        """(bucket, n_items, m) triples — the rebuild decision input. The
        crawl loop collects this once per round during the (cache-hot)
        snapshot write phase and carries it in the manifest, so the next
        round decides overflow without any Spark job."""
        assert self.segments is not None, "load/build first"
        return [
            (int(r["bucket"]), int(r["n_items"]), int(r["m"]))
            for r in self.segments.select("bucket", "n_items", "m").collect()
        ]

    def maybe_rebuild(
        self, frontier: DataFrame, stats: list[tuple[int, int, int]] | None = None
    ) -> DataFrame | None:
        """Rebuild any bucket whose n_items exceeds its capacity, from the
        frontier, with m doubled until capacity ≥ 2·n_items (k is m/capacity
        -scaled so it stays constant). ``stats`` may be supplied from a
        prior manifest (zero-job decision); otherwise one n_buckets-row
        collect. Returns the new segments or None if no bucket overflowed."""
        assert self.segments is not None, "load/build first"
        if stats is None:
            stats = self.seg_stats()
        grow: dict[int, int] = {}
        for bucket, n_items, m in stats:
            if n_items > self._capacity_of(m):
                new_m = m
                while self._capacity_of(new_m) < 2 * n_items:
                    new_m *= 2
                grow[int(bucket)] = new_m
        if not grow:
            return None
        k = self.k

        def make(pdf):
            b = int(pdf["bucket"].iloc[0])
            m2 = grow[b]
            arr = np.zeros(m2 // 8, dtype=np.uint8)
            h = np.unique(pdf["url_hash"].to_numpy())
            _set_bits(arr, h, k, m2)
            return pd.DataFrame(
                {"bucket": [b], "filter": [arr.tobytes()],
                 "n_items": [len(h)], "m": [m2], "k": [k]}  # n_items reset to truth
            )

        overflow = sorted(grow)
        rebuilt = (
            self._bucketed(frontier)
            .where(F.col("bucket").isin(overflow))
            .groupBy("bucket")
            .applyInPandas(make, schema=SEG_SCHEMA)
        )
        kept = self.segments.where(~F.col("bucket").isin(overflow))
        out = rebuilt.unionByName(kept)
        self.segments = out
        return out

    # ---------------------------------------------------------------- query
    def mark(self, candidates: DataFrame) -> DataFrame:
        """candidates (must have ``url``) + a ``maybe`` column: Bloom probe
        verdict per row (per-bucket geometry). The telemetry-friendly form —
        one persist of this frame yields both halves of split() AND the
        n_maybe/n_new counters without re-probing."""
        assert self.segments is not None, "load/build first"

        def probe(key, cand_pdf, seg_pdf):
            if not len(cand_pdf):
                return pd.DataFrame({"url": [], "maybe": []}).astype(
                    {"url": str, "maybe": bool}
                )
            if not len(seg_pdf):
                maybe = np.zeros(len(cand_pdf), dtype=bool)
            else:
                m, k = int(seg_pdf["m"].iloc[0]), int(seg_pdf["k"].iloc[0])
                arr = np.frombuffer(seg_pdf["filter"].iloc[0], dtype=np.uint8)
                maybe = _test_bits(arr, cand_pdf["url_hash"].to_numpy(), k, m)
            return pd.DataFrame({"url": cand_pdf["url"], "maybe": maybe})

        marks = (
            self._bucketed(candidates)
            .groupby("bucket")
            .cogroup(self.segments.groupby("bucket"))
            .applyInPandas(probe, schema="url string, maybe boolean")
        )
        joined = candidates.join(marks, "url", "left")
        return joined.withColumn(
            "maybe", F.coalesce(F.col("maybe"), F.lit(False))
        )

    def split(self, candidates: DataFrame) -> tuple[DataFrame, DataFrame]:
        """candidates (must have ``url``, UNIQUE per row — the mark() probe
        joins back on url, so a duplicated url fans out quadratically and
        over-counts the telemetry; run_round's child agg guarantees this
        upstream) → (maybe_seen, definitely_new).

        definitely_new rows can skip the exact anti-join entirely — that is
        the whole point of the filter at 10^10 scale."""
        marked = self.mark(candidates)
        maybe_seen = marked.where(F.col("maybe")).drop("maybe")
        definitely_new = marked.where(~F.col("maybe")).drop("maybe")
        return maybe_seen, definitely_new


class CuckooSeen(SeenSet):
    """Deletion-capable seen-set segments (north_rule's cuckoo fallback).

    Same table contract and double-hashed positions as the Bloom variant,
    but each position holds a saturating counter instead of a bit —
    i.e. a counting filter, the simplest of the cuckoo/counting family that
    supports ``remove()`` (frontier-eviction workflows: dropping a site,
    revoking robots consent). add = increment (saturate at 15; saturated
    counters are never decremented, preserving no-false-negative),
    remove = decrement of present-testing keys only, membership = all
    counters non-zero. Counters use 4-BIT semantics but are STORED one
    byte per slot (numpy-vectorizable layout) ⇒ segments are 8× the Bloom
    bytes for the same fpp (nibble-packing would make it 4× at the cost of
    shift/mask on every op) — the reason Bloom stays the default for the
    pure-crawl path that never deletes.

    Deletion contract (standard for counting filters): only remove keys
    you actually added. removed() guards with a membership test — an
    absent key is ignored instead of corrupting shared slots — but a false
    positive (~fpp) can still decrement a colliding key's counters; the
    exact anti-join downstream remains the correctness backstop.
    """

    def _segment_op(self, rows: DataFrame, delta: int) -> DataFrame:
        assert self.segments is not None, "load/build first"
        m0, k0 = self.m, self.k
        apply_fn = _apply_counters  # module fn: a bound method would drag
        # self (and its segments DataFrame → SparkContext) into the closure
        test_fn = _test_counters

        def op(key, new_pdf, seg_pdf):
            if len(seg_pdf):
                m, k = int(seg_pdf["m"].iloc[0]), int(seg_pdf["k"].iloc[0])
                arr = np.frombuffer(seg_pdf["filter"].iloc[0], dtype=np.uint8).copy()
                n = int(seg_pdf["n_items"].iloc[0])
            else:
                m, k = m0, k0
                arr = np.zeros(m, dtype=np.uint8)
                n = 0
            n_delta = 0
            if len(new_pdf):
                # batch-unique, mirroring the Bloom merged() guard: n_items
                # drives the rebuild heuristic and must track distinct keys
                h = np.unique(new_pdf["url_hash"].to_numpy())
                present = test_fn(arr, h, k, m)
                if delta > 0:
                    # counters increment for EVERY add (multiset discipline
                    # — skipping "already present" keys would let a later
                    # deletion of a colliding key zero this key's counters:
                    # the classic false-deletion hazard); n_items counts
                    # only keys not already present (set accounting)
                    apply_fn(arr, h, +1, k, m)
                    n_delta = int((~present).sum())
                else:
                    # decrement ONLY keys that test present: removing an
                    # absent key would steal counts from every key sharing
                    # its slots. Residual risk is a real false positive
                    # (~fpp), the documented counting-filter deletion
                    # contract ("only remove what you added").
                    apply_fn(arr, h[present], -1, k, m)
                    n_delta = -int(present.sum())
            return pd.DataFrame(
                {"bucket": [int(key[0])], "filter": [arr.tobytes()],
                 "n_items": [max(0, n + n_delta)], "m": [m], "k": [k]}
            )

        seg = (
            self._bucketed(rows)
            .groupby("bucket")
            .cogroup(self.segments.groupby("bucket"))
            .applyInPandas(op, schema=SEG_SCHEMA)
        )
        untouched = self.segments.join(
            self._bucketed(rows).select("bucket").distinct(), "bucket", "left_anti"
        )
        out = seg.unionByName(untouched)
        self.segments = out
        return out

    def build(self, frontier: DataFrame) -> DataFrame:
        m, k = self.m, self.k
        apply_fn = _apply_counters

        def make(pdf):
            arr = np.zeros(m, dtype=np.uint8)
            apply_fn(arr, pdf["url_hash"].to_numpy(), 1, k, m)
            return pd.DataFrame(
                {"bucket": [int(pdf["bucket"].iloc[0])], "filter": [arr.tobytes()],
                 "n_items": [len(pdf)], "m": [m], "k": [k]}
            )

        seg = self._bucketed(frontier).groupBy("bucket").applyInPandas(
            make, schema=SEG_SCHEMA
        )
        self.segments = seg
        return seg

    def merged(self, new_rows: DataFrame) -> DataFrame:
        return self._segment_op(new_rows, +1)

    def removed(self, rows: DataFrame) -> DataFrame:
        """Delete urls from the seen set — the operation Bloom cannot do."""
        return self._segment_op(rows, -1)

    def maybe_rebuild(self, frontier: DataFrame, stats=None) -> DataFrame | None:
        """Counter-segment rebuild (the inherited Bloom version would write
        BIT segments into a counter table — wrong layout)."""
        assert self.segments is not None, "load/build first"
        if stats is None:
            stats = self.seg_stats()
        grow: dict[int, int] = {}
        for bucket, n_items, m in stats:
            if n_items > self._capacity_of(m):
                new_m = m
                while self._capacity_of(new_m) < 2 * n_items:
                    new_m *= 2
                grow[int(bucket)] = new_m
        if not grow:
            return None
        k = self.k
        apply_fn = _apply_counters

        def make(pdf):
            b = int(pdf["bucket"].iloc[0])
            m2 = grow[b]
            arr = np.zeros(m2, dtype=np.uint8)  # one byte per counter slot
            h = np.unique(pdf["url_hash"].to_numpy())
            apply_fn(arr, h, 1, k, m2)
            return pd.DataFrame(
                {"bucket": [b], "filter": [arr.tobytes()],
                 "n_items": [len(h)], "m": [m2], "k": [k]}
            )

        overflow = sorted(grow)
        rebuilt = (
            self._bucketed(frontier)
            .where(F.col("bucket").isin(overflow))
            .groupBy("bucket")
            .applyInPandas(make, schema=SEG_SCHEMA)
        )
        kept = self.segments.where(~F.col("bucket").isin(overflow))
        out = rebuilt.unionByName(kept)
        self.segments = out
        return out

    def mark(self, candidates: DataFrame) -> DataFrame:
        assert self.segments is not None, "load/build first"

        def probe(key, cand_pdf, seg_pdf):
            if not len(cand_pdf):
                return pd.DataFrame({"url": [], "maybe": []}).astype(
                    {"url": str, "maybe": bool}
                )
            if not len(seg_pdf):
                maybe = np.zeros(len(cand_pdf), dtype=bool)
            else:
                m, k = int(seg_pdf["m"].iloc[0]), int(seg_pdf["k"].iloc[0])
                arr = np.frombuffer(seg_pdf["filter"].iloc[0], dtype=np.uint8)
                maybe = np.ones(len(cand_pdf), dtype=bool)
                h = cand_pdf["url_hash"].to_numpy()
                for idx in _positions(h, k, m):
                    maybe &= arr[idx] > 0
            return pd.DataFrame({"url": cand_pdf["url"], "maybe": maybe})

        marks = (
            self._bucketed(candidates)
            .groupby("bucket")
            .cogroup(self.segments.groupby("bucket"))
            .applyInPandas(probe, schema="url string, maybe boolean")
        )
        joined = candidates.join(marks, "url", "left")
        return joined.withColumn("maybe", F.coalesce(F.col("maybe"), F.lit(False)))
