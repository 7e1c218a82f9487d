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


def test_bloom_overflow_rebuild(spark):
    """VERDICT r01 item 5: a bucket whose n_items exceeds capacity is
    rebuilt from the frontier with doubled m; FP rate recovers, no false
    negatives ever, n_items resets to ground truth."""
    s = SeenSet(n_buckets=2, fpp=0.01, capacity_per_bucket=64)
    m0 = s.m
    base = _urls(spark, [f"https://a.x.com/p/{i}" for i in range(40)])
    s.build(base).persist().count()
    assert s.maybe_rebuild(base) is None  # under capacity: no-op

    # overflow both buckets well past capacity (64/bucket, ~400 keys total)
    frontier = _urls(spark, [f"https://a.x.com/p/{i}" for i in range(400)])
    s.merged(frontier).persist().count()
    seg_before = {r["bucket"]: (r["n_items"], r["m"]) for r in
                  s.segments.select("bucket", "n_items", "m").collect()}
    assert any(n > 64 for n, _ in seg_before.values())

    # telemetry counters BEFORE rebuild: the overflowed filter is
    # saturated, so fresh urls read as maybe-seen at a high rate — the
    # same n_maybe/n_new counters round.py lands in fetch_log's _bloom row
    fresh = _urls(spark, [f"https://b.y.com/q/{i}" for i in range(500)])
    fp_before = s.mark(fresh).where(F.col("maybe")).count() / 500

    rebuilt = s.maybe_rebuild(frontier)
    assert rebuilt is not None
    rebuilt.persist().count()
    seg_after = {r["bucket"]: (r["n_items"], r["m"], r["k"]) for r in
                 s.segments.select("bucket", "n_items", "m", "k").collect()}
    for b, (n, m, k) in seg_after.items():
        assert m > m0  # grew
        assert s._capacity_of(m) >= 2 * n  # headroom restored
        assert k == s.k
    # no false negatives after rebuild
    maybe, new = s.split(frontier)
    assert new.count() == 0
    # FP rate SNAPS BACK after maybe_rebuild: saturated before (an
    # overflowed 2·64-capacity filter holding 400 keys reads nearly
    # everything as maybe), near the configured fpp after
    maybe_f, new_f = s.split(fresh)
    fp_after = maybe_f.count() / 500
    assert fp_before >= 0.5, fp_before
    assert fp_after <= 0.05, fp_after
    assert fp_after < fp_before / 5


def test_crawl_emits_bloom_telemetry(spark, tmp_path):
    """The crawl loop logs per-round probe counters under the _bloom
    sentinel host (SURVEY.md §7 step 4)."""
    from spider_spark import corpus, tables
    from spider_spark.crawl import crawl
    from spider_spark.round import CrawlConfig

    pages_pd = corpus.make_pages(n_pages=120, n_hosts=6, seed=5)
    pages = spark.createDataFrame(pages_pd)
    seeds_pd = corpus.make_seeds(pages_pd, n_seeds=2, include_missing=False)
    seeds = list(zip(seeds_pd["url"], seeds_pd["depth"]))
    policy = spark.createDataFrame(corpus.make_host_policy(pages_pd))
    s = crawl(spark, tmp_path / "wd", pages, seeds, policy,
              CrawlConfig(max_depth=3, max_rounds=6, use_bloom=True,
                          bloom_buckets=4))
    fl = tables.read_appended(spark, tmp_path / "wd", "fetch_log")
    bloom = fl.where(F.col("host") == "_bloom").collect()
    assert len(bloom) >= 1
    for r in bloom:
        assert r["partition_id"] == -1
        assert r["n_claimed"] == r["n_fetched"] + r["n_missed"]  # maybe + new
    # sentinel rows never reach per-host consumers
    from spider_spark.round import policy_backoff
    hosts = {r["host"] for r in policy_backoff(policy, fl, miss_threshold=-1.0)
             .select("host").collect()}
    assert "_bloom" not in hosts


def test_cuckoo_overflow_rebuild_keeps_delete_semantics(spark):
    """CuckooSeen's rebuild must produce COUNTER segments (the Bloom-bit
    layout would corrupt them): after an overflow rebuild, membership holds
    and remove() still works."""
    s = CuckooSeen(n_buckets=2, fpp=0.01, capacity_per_bucket=64)
    frontier = _urls(spark, [f"https://c.z.com/p/{i}" for i in range(300)])
    s.build(frontier).persist().count()
    rebuilt = s.maybe_rebuild(frontier)
    assert rebuilt is not None
    rebuilt.persist().count()
    # no false negatives post-rebuild
    maybe, new = s.split(frontier)
    assert new.count() == 0
    # deletions still function on the rebuilt counters
    gone = _urls(spark, [f"https://c.z.com/p/{i}" for i in range(5)])
    s.removed(gone).persist().count()
    _, new2 = s.split(gone)
    assert new2.count() >= 4


def test_remove_absent_url_does_not_corrupt_members(spark):
    """The deletion guard: removing urls never added must not steal
    counts from present members (present-test before decrement), and
    duplicate rows within a removal batch decrement once."""
    s = CuckooSeen(n_buckets=2, fpp=0.01, capacity_per_bucket=1 << 10)
    members = _urls(spark, [f"https://m.x.com/p/{i}" for i in range(50)])
    s.build(members).persist().count()
    # remove a large batch of absent urls, each listed twice
    absent = [f"https://ghost.y.com/q/{i}" for i in range(200)]
    s.removed(_urls(spark, absent + absent)).persist().count()
    maybe, new = s.split(members)
    assert new.count() == 0  # members still all present
    # n_items untouched by absent removals (modulo fp-rate collisions)
    assert sum(n for _, n, _ in s.seg_stats()) >= 48


def test_remove_batch_duplicates_decrement_once(spark):
    s = CuckooSeen(n_buckets=2, fpp=0.01, capacity_per_bucket=1 << 10)
    a = _urls(spark, ["https://a.x.com/1", "https://a.x.com/2"])
    s.build(a).persist().count()
    # the same url listed 3x in one removal batch must not over-decrement
    # n_items (batch is unique'd) — n_items floor is 1, not 0
    tripled = _urls(spark, ["https://a.x.com/1"] * 3)
    s.removed(tripled).persist().count()
    assert sum(n for _, n, _ in s.seg_stats()) == 1
