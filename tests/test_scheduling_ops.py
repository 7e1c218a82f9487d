"""Unit tests for the session-7 crawl-scheduling / trainer-layout
operators: conditional_refetch, politeness_schedule, focused_priority,
epoch_shuffle. The sf0.01 driver oracles pin the happy paths value-level;
these pin the edges the fixtures can't reach (empty history, unknown
hosts, duplicate edges, bucket-boundary rank composition, growth
stability)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from spider_spark.pagerank import focused_priority
from spider_spark.sampling import epoch_shuffle
from spider_spark.webindex import conditional_refetch, politeness_schedule


# ---------------------------------------------------- conditional refetch
def _hist(spark, rows):
    return spark.createDataFrame(rows, "url string, warc_ts long, digest string")


def _live(spark, rows):
    return spark.createDataFrame(rows, "url string, digest string, n_bytes long")


def test_conditional_refetch_uses_latest_validator(spark):
    # earlier capture matches live, LATEST does not -> modified (a crawler
    # revalidates against the newest stored validator, not any old one)
    hist = _hist(spark, [("u", 1, "LIVE"), ("u", 2, "old")])
    live = _live(spark, [("u", "LIVE", 100)])
    [r] = conditional_refetch(hist, live).collect()
    assert r.outcome == "modified"
    assert r.last_ts == 2
    assert (r.bytes_saved, r.bytes_fetched) == (0, 100)


def test_conditional_refetch_not_modified_and_first_fetch(spark):
    hist = _hist(spark, [("a", 1, "d1"), ("a", 2, "d2")])
    live = _live(spark, [("a", "d2", 70), ("b", "x", 30)])
    out = {r.url: r for r in conditional_refetch(hist, live).collect()}
    assert out["a"].outcome == "not_modified"
    assert out["a"].bytes_saved == 70 and out["a"].bytes_fetched == 0
    assert out["b"].outcome == "first_fetch"
    assert out["b"].last_ts is None
    assert out["b"].bytes_fetched == 30


def test_conditional_refetch_empty_history(spark):
    hist = _hist(spark, [])
    live = _live(spark, [("a", "x", 5)])
    [r] = conditional_refetch(hist, live).collect()
    assert r.outcome == "first_fetch"


# ---------------------------------------------------- politeness schedule
def test_politeness_schedule_slots_and_defaults(spark):
    batch = spark.createDataFrame(
        [("u1", "h1", 2.0), ("u2", "h1", 1.0), ("u3", "h1", 3.0),
         ("u4", "h2", 1.0)],
        "url string, host string, priority double",
    )
    policy = spark.createDataFrame(
        [("h1", 5.0)], "host string, crawl_delay double"
    )
    out = {r.url: r for r in
           politeness_schedule(batch, policy, "2024-06-01 00:00:00").collect()}
    # best priority (lowest value) first within the host
    assert [out[u].slot for u in ("u2", "u1", "u3")] == [0, 1, 2]
    assert out["u3"].fetch_offset_s == 10.0
    assert out["u3"].fetch_at == datetime.datetime(2024, 6, 1, 0, 0, 10)
    # unknown host falls back to a 1 s delay, slot arithmetic intact
    assert out["u4"].slot == 0 and out["u4"].fetch_offset_s == 0.0


def test_politeness_schedule_deterministic_tiebreak(spark):
    batch = spark.createDataFrame(
        [("b", "h", 1.0), ("a", "h", 1.0)], "url string, host string, priority double"
    )
    policy = spark.createDataFrame([("h", 2.0)], "host string, crawl_delay double")
    out = {r.url: r.slot for r in
           politeness_schedule(batch, policy, "2024-01-01 00:00:00").collect()}
    assert out == {"a": 0, "b": 1}  # url breaks priority ties


# ---------------------------------------------------- focused priority
def test_focused_priority_argmax_inherit_and_distinct_parents(spark):
    links = spark.createDataFrame(
        [("p1", "c"), ("p2", "c"), ("p2", "c"), ("p3", "d"), ("px", "c")],
        "src string, dst string",
    )
    scores = spark.createDataFrame(
        [("p1", 0.2), ("p2", 0.9), ("p3", 0.5)], "url string, score double"
    )
    out = {r.url: r for r in focused_priority(links, scores, decay=0.5).collect()}
    # best parent wins; duplicate edges count one parent; unscored parent
    # (px) contributes nothing
    assert out["c"].best_parent_score == 0.9
    assert out["c"].rank == 0.45
    assert out["c"].n_parents == 2
    assert out["d"].rank == 0.25 and out["d"].n_parents == 1


def test_focused_priority_composes_with_apply_priority(spark):
    # the docstring contract: apply_priority consumes the output unchanged
    # — ranks negate into the frontier's ascending pop-priority, so the
    # best-scored target must end up popped FIRST (lowest priority value)
    from spider_spark.pagerank import apply_priority

    links = spark.createDataFrame(
        [("p1", "a"), ("p2", "b")], "src string, dst string"
    )
    scores = spark.createDataFrame(
        [("p1", 0.9), ("p2", 0.1)], "url string, score double"
    )
    frontier = spark.createDataFrame(
        [("a", 5.0), ("b", 5.0), ("c", 5.0)], "url string, priority double"
    )
    ranks = focused_priority(links, scores, decay=0.5).select("url", "rank")
    out = {r.url: r.priority for r in apply_priority(frontier, ranks).collect()}
    assert out["a"] < out["b"] < out["c"]  # a: -0.45, b: -0.05, c: unranked 5.0
    assert out["c"] == 5.0


# ---------------------------------------------------- epoch shuffle
def _naive_order(df, id_col, seed):
    from spider_spark.sampling import sample_hash_col

    return [
        r[id_col]
        for r in df.select(id_col, sample_hash_col(F.col(id_col), f"epoch:{seed}").alias("_k"))
        .orderBy("_k", id_col)
        .collect()
    ]


def test_epoch_shuffle_matches_naive_global_order(spark):
    df = spark.range(0, 997).withColumnRenamed("id", "doc_id")
    out = epoch_shuffle(df, "doc_id", "s1", n_buckets=7)
    got = [r.doc_id for r in out.orderBy("shuffle_idx").collect()]
    assert got == _naive_order(df, "doc_id", "s1")
    # dense 0..n-1
    idx = sorted(r.shuffle_idx for r in out.collect())
    assert idx == list(range(997))


def test_epoch_shuffle_seed_changes_permutation(spark):
    df = spark.range(0, 200).withColumnRenamed("id", "doc_id")
    a = {r.doc_id: r.shuffle_idx for r in epoch_shuffle(df, "doc_id", "e1").collect()}
    b = {r.doc_id: r.shuffle_idx for r in epoch_shuffle(df, "doc_id", "e2").collect()}
    assert a != b  # different epochs, different permutations
    assert sorted(a.values()) == sorted(b.values())  # both dense


def test_epoch_shuffle_growth_stable_relative_order(spark):
    # within an epoch, the relative order of surviving rows must not move
    # when the corpus grows (hash keys don't depend on corpus size)
    small = spark.range(0, 100).withColumnRenamed("id", "doc_id")
    big = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    s = {r.doc_id: r.shuffle_idx for r in epoch_shuffle(small, "doc_id", "g").collect()}
    b = {r.doc_id: r.shuffle_idx for r in epoch_shuffle(big, "doc_id", "g").collect()}
    small_by_idx = sorted(s, key=s.get)
    common_in_big_order = sorted(s, key=b.get)
    assert small_by_idx == common_in_big_order


def test_epoch_shuffle_single_bucket_degenerates_to_global(spark):
    df = spark.range(0, 50).withColumnRenamed("id", "doc_id")
    out = [r.doc_id for r in
           epoch_shuffle(df, "doc_id", "x", n_buckets=1).orderBy("shuffle_idx").collect()]
    assert out == _naive_order(df, "doc_id", "x")


# ---------------------------------------------------- temperature quotas
def test_temperature_quotas_sum_and_flattening(spark):
    from spider_spark.curation import temperature_quotas

    rows = [("en",)] * 80 + [("fr",)] * 16 + [("is",)] * 4
    df = spark.createDataFrame(rows, "lang string")
    out = {r.source: r for r in
           temperature_quotas(df, "lang", budget=50, alpha=0.5).collect()}
    assert sum(r.quota for r in out.values()) == 50
    # alpha < 1 flattens: head loses share vs proportional, tail gains
    assert out["en"].quota < 0.80 * 50
    assert out["is"].quota > 0.04 * 50
    # p ∝ sqrt(n): en/is ratio sqrt(80/4) ≈ 4.47, not 20
    assert abs(out["en"].p / out["is"].p - (80 / 4) ** 0.5) < 1e-9


def test_temperature_quotas_alpha_one_is_proportional(spark):
    from spider_spark.curation import temperature_quotas

    rows = [("a",)] * 30 + [("b",)] * 20 + [("c",)] * 50
    df = spark.createDataFrame(rows, "lang string")
    out = {r.source: r.quota for r in
           temperature_quotas(df, "lang", budget=10, alpha=1.0).collect()}
    assert out == {"a": 3, "b": 2, "c": 5}


def test_temperature_quotas_remainder_ties_break_by_source(spark):
    from spider_spark.curation import temperature_quotas

    # two equal-size domains, odd budget: the extra seat must go to the
    # lexicographically smaller source, deterministically
    rows = [("x",)] * 10 + [("y",)] * 10
    df = spark.createDataFrame(rows, "lang string")
    out = {r.source: r.quota for r in
           temperature_quotas(df, "lang", budget=7, alpha=0.5).collect()}
    assert out == {"x": 4, "y": 3}


# ---------------------------------------------------- revisit plan
def test_revisit_plan_tiers_intervals_overdue(spark):
    from spider_spark.webindex import revisit_plan

    rows = (
        # hot: digest changes every capture; last at 5 -> due 6, overdue@8
        [("h", i, f"d{i}") for i in range(1, 6)]
        # cold: never changes; last at 4 -> due 16, not overdue
        + [("c", i, "same") for i in range(1, 5)]
        # single capture: rate 0 -> cold
        + [("s", 1, "x")]
    )
    hist = spark.createDataFrame(rows, "url string, obs_ts long, digest string")
    out = {r.url: r for r in revisit_plan(hist, now=8).collect()}
    assert out["h"].tier == "hot" and out["h"].interval == 1
    assert (out["h"].due, out["h"].overdue) == (6, True)
    assert out["c"].tier == "cold" and out["c"].due == 16 and not out["c"].overdue
    assert out["s"].tier == "cold" and out["s"].change_rate == 0.0


def test_revisit_plan_custom_intervals(spark):
    from spider_spark.webindex import revisit_plan

    hist = spark.createDataFrame(
        [("u", 1, "a"), ("u", 2, "b"), ("u", 3, "c")],
        "url string, obs_ts long, digest string",
    )
    [r] = revisit_plan(hist, now=10, intervals=(2, 5, 9)).collect()
    assert r.tier == "hot" and r.interval == 2 and r.due == 5 and r.overdue


def test_focused_in_crawl_loop(spark, tmp_path):
    """priority_source='focused' drives the reprioritization hook end to
    end: quality logits of already-extracted items propagate to frontier
    children through the link graph."""
    from spider_spark import corpus, tables
    from spider_spark.crawl import crawl
    from spider_spark.round import CrawlConfig

    pages_pd = corpus.make_pages(n_pages=120, n_hosts=6, seed=11)
    seeds = list(zip(*(corpus.make_seeds(pages_pd)[c] for c in ("url", "depth"))))
    pages = spark.createDataFrame(pages_pd)
    policy = spark.createDataFrame(corpus.make_host_policy(pages_pd))
    wd = str(tmp_path / "wd")
    s = crawl(spark, wd, pages, seeds, policy,
              CrawlConfig(max_depth=3, max_rounds=8, pagerank_every=2,
                          priority_source="focused"))
    assert s.n_done > 0
    fr = tables.read_table(spark, wd, tables.latest_round(wd), "frontier")
    # reprioritized rows carry -decay*logit — fractional, unlike the
    # integer depth-based defaults
    assert fr.where("priority != cast(priority as int)").count() > 0


def test_priority_source_focused_is_allowed_and_typo_rejected(spark):
    import pytest as _pytest

    from spider_spark.round import CrawlConfig

    CrawlConfig(priority_source="focused")  # must not raise
    with _pytest.raises(ValueError):
        CrawlConfig(priority_source="FOCUSED")
