"""Merge-on-read frontier (cfg.frontier_mode="mor") equivalence.

The mor loop writes per-round DELTAS (absolute status updates for claimed/
denied rows, new children, additive inlink counts) and resolves latest-wins
on read, compacting only when deltas outgrow ``compact_ratio`` of the base
— the Iceberg MOR analog of the COW MERGE loop (tables.py). These tests pin
the contract: for ANY compaction cadence the resolved frontier, the items,
and the links are row-identical to the COW run of the same crawl.
"""

from __future__ import annotations

import pytest

from spider_spark import corpus, tables
from spider_spark.crawl import crawl
from spider_spark.round import CrawlConfig


@pytest.fixture(scope="module")
def inputs(spark):
    pages_pd = corpus.make_pages(n_pages=120, n_hosts=10, seed=42)
    seeds_pd = corpus.make_seeds(pages_pd, n_seeds=3)
    policy_pd = corpus.make_host_policy(pages_pd)
    pages = spark.createDataFrame(pages_pd)
    policy = spark.createDataFrame(policy_pd)
    seeds = list(zip(seeds_pd["url"], seeds_pd["depth"]))
    return pages, seeds, policy


def _frontier_rows(spark, wd, last_round):
    df = tables.read_frontier_resolved(spark, wd, last_round)
    return sorted(tuple(r) for r in df.collect())


def _run(spark, wd, inputs, cfg, resume=False):
    pages, seeds, policy = inputs
    return crawl(spark, wd, pages, seeds, policy, cfg, resume=resume)


@pytest.fixture(scope="module")
def cow_run(spark, inputs, tmp_path_factory):
    wd = tmp_path_factory.mktemp("cow")
    cfg = CrawlConfig(max_depth=3, max_rounds=20)
    s = _run(spark, wd, inputs, cfg)
    return s, _frontier_rows(spark, wd, s.last_round), wd


@pytest.mark.parametrize(
    "compact_ratio,label",
    [(10.0**9, "never"), (0.05, "often")],
    ids=["deltas-only", "frequent-compaction"],
)
def test_mor_equals_cow(spark, inputs, tmp_path, cow_run, compact_ratio, label):
    cow_summary, cow_rows, cow_wd = cow_run
    cfg = CrawlConfig(max_depth=3, max_rounds=20, frontier_mode="mor",
                      compact_ratio=compact_ratio)
    s = _run(spark, tmp_path / "wd", inputs, cfg)
    assert s == cow_summary  # rounds_run + all by-status counts
    assert _frontier_rows(spark, tmp_path / "wd", s.last_round) == cow_rows
    # append-only outputs identical too
    for name in ("items", "links"):
        a = tables.read_appended(spark, cow_wd, name)
        b = tables.read_appended(spark, tmp_path / "wd", name)
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    # the cadence actually differs between the two parametrizations
    bases = [
        tables.frontier_base_round(tmp_path / "wd", r)
        for r in range(s.last_round + 1)
    ]
    if label == "never":
        assert set(bases) == {0}, "deltas-only run must never compact"
    else:
        assert len(set(bases)) > 1, "frequent-compaction run must compact"


def test_mor_delta_rounds_write_no_full_frontier(spark, inputs, tmp_path):
    cfg = CrawlConfig(max_depth=3, max_rounds=20, frontier_mode="mor",
                      compact_ratio=10.0**9)
    s = _run(spark, tmp_path / "wd", inputs, cfg)
    assert s.last_round >= 2
    for r in range(1, s.last_round + 1):
        m = tables.read_manifest(tmp_path / "wd", r)
        assert "frontier" not in m["tables"], "delta round rewrote the base"
        assert m["frontier_base"] == 0
        # delta volume ≪ frontier volume is the whole point: updates can
        # only cover rows claimed this round
        assert "frontier_updates" in m["tables"]


def test_mor_with_bloom_seen_set(spark, inputs, tmp_path, cow_run):
    _, cow_rows, _ = cow_run
    cfg = CrawlConfig(max_depth=3, max_rounds=20, frontier_mode="mor",
                      compact_ratio=0.4, use_bloom=True, bloom_buckets=8)
    s = _run(spark, tmp_path / "wd", inputs, cfg)
    assert _frontier_rows(spark, tmp_path / "wd", s.last_round) == cow_rows


def test_mor_resume_mid_crawl(spark, inputs, tmp_path, cow_run):
    _, cow_rows, _ = cow_run
    cfg = CrawlConfig(max_depth=3, max_rounds=2, frontier_mode="mor",
                      compact_ratio=10.0**9)
    _run(spark, tmp_path / "wd", inputs, cfg)
    s = _run(spark, tmp_path / "wd", inputs,
             CrawlConfig(max_depth=3, max_rounds=20, frontier_mode="mor",
                         compact_ratio=10.0**9),
             resume=True)
    assert _frontier_rows(spark, tmp_path / "wd", s.last_round) == cow_rows


def test_mor_pagerank_round_compacts(spark, inputs, tmp_path):
    """PageRank rewrites every priority — in mor it must run as a cow-style
    compaction round (the snapshot becomes the new base) and stay
    equivalent to the cow pagerank run."""
    cfg_cow = CrawlConfig(max_depth=3, max_rounds=20, pagerank_every=2)
    cfg_mor = CrawlConfig(max_depth=3, max_rounds=20, pagerank_every=2,
                          frontier_mode="mor", compact_ratio=10.0**9)
    s1 = _run(spark, tmp_path / "cow", inputs, cfg_cow)
    s2 = _run(spark, tmp_path / "mor", inputs, cfg_mor)
    assert s1 == s2
    # a pagerank round (rnd-1 divisible by 2, rnd>1) must be its own base
    pr_round = 3
    if s2.last_round >= pr_round:
        assert tables.frontier_base_round(tmp_path / "mor", pr_round) == pr_round
    a = _frontier_rows(spark, tmp_path / "cow", s1.last_round)
    b = _frontier_rows(spark, tmp_path / "mor", s2.last_round)
    # priority (index 10) is a pagerank float — partitioning-order summation
    # differs between the runs by ≤1 ulp; everything else must be exact
    assert [r[:10] + r[11:] for r in a] == [r[:10] + r[11:] for r in b]
    for ra, rb in zip(a, b):
        assert abs(ra[10] - rb[10]) <= 1e-12 * max(1.0, abs(ra[10]))


def test_vacuum_retention(spark, inputs, tmp_path):
    """Vacuum drops superseded frontier data, keeps append history and
    resumability; MOR bases referenced by protected rounds survive."""
    import os

    for mode, ratio in (("cow", None), ("mor", 0.05)):
        wd = tmp_path / mode
        cfg = (CrawlConfig(max_depth=3, max_rounds=20) if mode == "cow"
               else CrawlConfig(max_depth=3, max_rounds=20, frontier_mode="mor",
                                compact_ratio=ratio))
        s = _run(spark, wd, inputs, cfg)
        assert s.rounds_run >= 4
        before = _frontier_rows(spark, wd, s.last_round)
        items_before = tables.read_appended(spark, wd, "items").count()
        rep = tables.vacuum(wd, keep=2)
        assert rep["deleted_dirs"] > 0 and rep["bytes_freed"] > 0
        # frontier of old rounds gone, manifests edited, appends intact
        for r in range(0, rep["cutoff"]):
            rd = tables._round_dir(wd, r)
            if not (rd / "manifest.json").exists():
                continue
            assert not (rd / "frontier").exists()
            m = tables.read_manifest(wd, r)
            assert m.get("vacuumed") and "frontier" not in m.get("tables", [])
        assert _frontier_rows(spark, wd, s.last_round) == before
        assert tables.read_appended(spark, wd, "items").count() == items_before
        s2 = _run(spark, wd, inputs, cfg, resume=True)
        assert s2.rounds_run == 0  # finished crawl: resume is a no-op
        # idempotent: second vacuum frees nothing more
        assert tables.vacuum(wd, keep=2)["deleted_dirs"] == 0


def test_vacuum_gcs_seen_segments_and_reports_clear_error(spark, inputs, tmp_path):
    """seen_segments is full-rewrite-per-round like the frontier: vacuum
    must GC superseded copies; reading a vacuumed cow round's frontier
    fails with a clear error, not a bare KeyError."""
    import pytest as _pytest

    wd = tmp_path / "wd"
    cfg = CrawlConfig(max_depth=3, max_rounds=20, use_bloom=True, bloom_buckets=4)
    s = _run(spark, wd, inputs, cfg)
    assert s.rounds_run >= 4
    rep = tables.vacuum(wd, keep=2)
    assert rep["deleted_dirs"] > 0
    for r in range(0, rep["cutoff"]):
        rd = tables._round_dir(wd, r)
        if not (rd / "manifest.json").exists():
            continue
        assert not (rd / "seen_segments").exists()
        # vacuumed cow round: resolution fails with the real story
        with _pytest.raises(FileNotFoundError, match="no longer recoverable"):
            tables.frontier_base_round(wd, r)
    # latest round's seen set still loads (resume path intact)
    from spider_spark.seen import SeenSet

    seg = SeenSet.load(spark, wd, s.last_round, n_buckets=4, fpp=0.01)
    assert seg.segments.count() > 0
