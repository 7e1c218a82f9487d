"""CuckooSeen: the deletion-capable seen-set fallback (north_rule)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from spider_spark.canon import url_hash_col
from spider_spark.seen import CuckooSeen, SeenSet


def _urls(spark, urls):
    return spark.createDataFrame([(u,) for u in urls], "url string").withColumn(
        "url_hash", url_hash_col(F.col("url"))
    )


@pytest.fixture(scope="module")
def seen(spark):
    s = CuckooSeen(n_buckets=4, fpp=0.01, capacity_per_bucket=1 << 12)
    base = _urls(spark, [f"https://h{i % 3}.x.com/p/{i}" for i in range(200)])
    s.build(base).persist().count()
    return s


def test_membership_after_build(spark, seen):
    cand = _urls(spark, [f"https://h{i % 3}.x.com/p/{i}" for i in range(190, 210)])
    maybe, new = seen.split(cand)
    maybe_urls = {r.url for r in maybe.collect()}
    new_urls = {r.url for r in new.collect()}
    # no false negatives: all 190..199 must be 'maybe'
    assert {f"https://h{i % 3}.x.com/p/{i}" for i in range(190, 200)} <= maybe_urls
    # the genuinely-new 200..209 mostly land in 'new' (fpp allows strays)
    assert len(new_urls) >= 8


def test_remove_restores_membership_answer(spark, seen):
    gone = _urls(spark, [f"https://h{i % 3}.x.com/p/{i}" for i in range(0, 10)])
    seen.removed(gone).persist().count()
    maybe, new = seen.split(gone)
    # removal is the whole point vs Bloom: removed urls read as new again
    assert new.count() >= 8  # shared counters may keep a few 'maybe'
    # other members are untouched
    others = _urls(spark, [f"https://h{i % 3}.x.com/p/{i}" for i in range(50, 60)])
    maybe2, new2 = seen.split(others)
    assert new2.count() == 0


def test_merge_then_member(spark, seen):
    extra = _urls(spark, [f"https://new.x.com/q/{i}" for i in range(20)])
    seen.merged(extra).persist().count()
    maybe, new = seen.split(extra)
    assert new.count() == 0  # all present, no false negatives


def test_bloom_cannot_delete_contract(spark):
    """Document the asymmetry: SeenSet has no removed()."""
    assert not hasattr(SeenSet, "removed") or not callable(
        getattr(SeenSet, "removed", None)
    )
