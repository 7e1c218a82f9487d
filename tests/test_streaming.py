"""Streaming facade: micro-batch rounds over a landing directory, and the
event-time windowed aggregation with watermark."""

from __future__ import annotations

import pyspark.sql.functions as F

from spider_spark import corpus, streaming, tables
from spider_spark.round import CrawlConfig


def _write_pages_batch(spark, pages_pd, lo, hi, dest):
    part = pages_pd.iloc[lo:hi][["url", "warc_ts", "html"]]
    spark.createDataFrame(part).write.mode("append").parquet(str(dest))


def test_stream_crawl_drains_directory(spark, tmp_path):
    pages_pd = corpus.make_pages(n_pages=80, n_hosts=6, seed=42)
    seeds_pd = corpus.make_seeds(pages_pd, n_seeds=3, include_missing=False)
    policy = spark.createDataFrame(corpus.make_host_policy(pages_pd))
    seeds = list(zip(seeds_pd["url"], seeds_pd["depth"]))

    ingest = tmp_path / "ingest"
    wd = tmp_path / "wd"
    _write_pages_batch(spark, pages_pd, 0, 40, ingest)
    _write_pages_batch(spark, pages_pd, 40, 80, ingest)

    q = streaming.stream_crawl(
        spark, ingest, wd, seeds, policy,
        CrawlConfig(max_depth=3, use_bloom=False, write_coalesce=2),
        rounds_per_batch=3,
    )
    q.awaitTermination(300)

    last = tables.latest_round(wd)
    assert last and last >= 3
    frontier = tables.read_table(spark, wd, last, "frontier")
    by_status = dict(frontier.groupBy("status").count().collect())
    assert by_status.get("done", 0) > 0
    # second batch added corpus pages → fewer missing fetches than batch 1 alone
    items = tables.read_appended(spark, wd, "items")
    assert items.count() == by_status.get("done", 0)


def test_host_fetch_rates_watermark(spark, tmp_path):
    pages_pd = corpus.make_pages(n_pages=60, n_hosts=5, seed=7)
    pages_pd = pages_pd.sort_values("warc_ts").reset_index(drop=True)
    ingest = tmp_path / "ingest2"
    for lo in range(0, 60, 15):
        spark.createDataFrame(
            pages_pd.iloc[lo:lo + 15][["url", "warc_ts", "html"]].copy()
        ).coalesce(1).write.mode("append").parquet(str(ingest))

    out = tmp_path / "rates_out"
    # corpus timestamps span ~60s; 10s windows + zero-delay watermark, with
    # one file per micro-batch so the watermark advances BETWEEN batches and
    # closes earlier windows (append mode emits only closed windows)
    df = streaming.host_fetch_rates(
        spark, ingest, watermark="0 seconds", window_len="10 seconds",
        max_files_per_trigger=1,
    )
    q = (
        df.writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.read.parquet(str(out))
    # append mode emits only watermark-closed windows; with AvailableNow the
    # final watermark closes all but the trailing window
    assert got.count() > 0
    total = got.agg(F.sum("n_fetched")).collect()[0][0]
    assert total <= 60
    assert {r.host for r in got.select("host").distinct().collect()} <= {
        u.split("/")[2].lower() for u in pages_pd["url"]
    }


def test_stateful_host_progress_accumulates_across_restarts(spark, tmp_path):
    """applyInPandasWithState: per-host running totals survive across
    micro-batches AND across query restarts (state in the checkpoint)."""
    pages_pd = corpus.make_pages(n_pages=60, n_hosts=4, seed=9)
    ingest = tmp_path / "ingest"
    ckpt = str(tmp_path / "ckpt")

    def run_query(sink_name):
        rows = []
        out = streaming.stateful_host_progress(spark, ingest)
        q = (
            out.writeStream.foreachBatch(
                lambda df, _id: rows.extend(df.collect())
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        # keep the LAST emission per host (update mode re-emits totals)
        return {r["host"]: (r["n_pages"], r["n_bytes"]) for r in rows}

    _write_pages_batch(spark, pages_pd, 0, 30, ingest)
    first = run_query("hp1")
    assert sum(v[0] for v in first.values()) == 30
    assert all(v[1] > 0 for v in first.values())

    # restart with NEW data and the SAME checkpoint: totals must carry on
    _write_pages_batch(spark, pages_pd, 30, 60, ingest)
    second = run_query("hp2")
    # every host's cumulative count is >= its first-run count, grand total 60
    total = 0
    for host, (n, b) in second.items():
        total += n
        if host in first:
            assert n >= first[host][0]
            assert b >= first[host][1]
    # hosts not re-observed in batch 2 emit nothing in update mode; add them
    for host, (n, b) in first.items():
        if host not in second:
            total += n
    assert total == 60


def test_stateful_host_progress_idle_timeout_gc(spark, tmp_path):
    """ProcessingTimeTimeout state GC: hosts left idle past the timeout are
    emitted with closed=true (final totals attached) while a refreshed
    host stays open. One continuous 1 s-trigger query (availableNow
    restarts cost minutes on this box); timers fire in the empty batches
    Spark schedules while timeouts are pending."""
    import time

    pages_pd = corpus.make_pages(n_pages=60, n_hosts=4, seed=9)
    ingest = tmp_path / "ingest"
    all_hosts = sorted({u.split("/")[2].lower() for u in pages_pd["url"]})
    victim = all_hosts[0]

    _write_pages_batch(spark, pages_pd, 0, 60, ingest)  # dir must exist pre-start
    rows = []
    out = streaming.stateful_host_progress(spark, ingest, idle_timeout_ms=1500)
    q = (
        out.writeStream.foreachBatch(lambda df, _id: rows.extend(df.collect()))
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:

        def wait_for(pred, timeout_s=120):
            t0 = time.time()
            while time.time() - t0 < timeout_s:
                if pred():
                    return True
                time.sleep(0.5)
            return False

        assert wait_for(lambda: {r["host"] for r in rows} >= set(all_hosts))
        # idle: timers expire; empty batches emit closures for every host
        assert wait_for(
            lambda: set(all_hosts) <= {r["host"] for r in rows if r["closed"]}
        ), [r["host"] for r in rows if r["closed"]]
        n_before = len(rows)
        # refresh ONE host: fresh (state was removed) non-closed emission
        one = pages_pd[pages_pd["url"].str.contains(victim, regex=False)]
        spark.createDataFrame(one[["url", "warc_ts", "html"]]).write.mode(
            "append").parquet(str(ingest))
        assert wait_for(
            lambda: any(
                r["host"] == victim and not r["closed"] for r in rows[n_before:]
            )
        )
        fresh = [r for r in rows[n_before:] if r["host"] == victim and not r["closed"]]
        # state removal observable: the count restarted from the new rows
        assert fresh[-1]["n_pages"] == len(one)
        assert all(r["n_pages"] > 0 for r in rows)
    finally:
        q.stop()


def test_stream_first_wins_dedup(spark, tmp_path):
    """Duplicate urls (including canonical-equivalent spellings) inside the
    watermark horizon collapse to the first arrival; distinct urls pass."""
    import pandas as pd

    ingest = tmp_path / "in"
    ingest.mkdir()
    t0 = pd.Timestamp("2026-02-01 10:00:00")
    rows = [
        ("https://h.example.com/a", t0, b"x"),
        ("https://h.example.com/a", t0 + pd.Timedelta("1 min"), b"y"),   # dup
        ("HTTPS://H.example.com/a", t0 + pd.Timedelta("2 min"), b"z"),   # canonical dup
        ("https://h.example.com/b", t0 + pd.Timedelta("1 min"), b"w"),
    ]
    spark.createDataFrame(
        pd.DataFrame(rows, columns=["url", "warc_ts", "html"])
    ).coalesce(1).write.mode("overwrite").parquet(str(ingest))

    out = streaming.stream_first_wins_urls(spark, ingest, watermark="10 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("fw")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.url.lower() for r in spark.sql("select url from fw").collect()}
    assert got == {"https://h.example.com/a", "https://h.example.com/b"}


def test_stream_content_seen_dedups_mirror_bytes(spark, tmp_path):
    """Identical payloads under different urls collapse to the first
    arrival inside the watermark horizon; distinct payloads pass."""
    import pandas as pd

    ingest = tmp_path / "in_cs"
    ingest.mkdir()
    t0 = pd.Timestamp("2026-02-01 10:00:00")
    rows = [
        ("https://a.example.com/1", t0, b"<html>same</html>"),
        ("https://b.example.com/1", t0 + pd.Timedelta("1 min"), b"<html>same</html>"),
        ("https://c.example.com/1", t0 + pd.Timedelta("2 min"), b"<html>same</html>"),
        ("https://d.example.com/u", t0 + pd.Timedelta("1 min"), b"<html>unique</html>"),
    ]
    spark.createDataFrame(
        pd.DataFrame(rows, columns=["url", "warc_ts", "html"])
    ).coalesce(1).write.mode("overwrite").parquet(str(ingest))

    out = streaming.stream_content_seen(spark, ingest, watermark="10 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("cs")
        .option("checkpointLocation", str(tmp_path / "ck_cs"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.url for r in spark.sql("select url from cs").collect()}
    assert got == {"https://a.example.com/1", "https://d.example.com/u"}


def test_stream_content_seen_distinguishes_invalid_utf8_bytes(spark, tmp_path):
    """Byte-distinct payloads whose invalid-UTF-8 bytes would collide under
    a string cast (both map to U+FFFD) must BOTH pass — the digest hashes
    raw bytes, never a lossy decode."""
    import pandas as pd

    ingest = tmp_path / "in_bin"
    ingest.mkdir()
    t0 = pd.Timestamp("2026-02-01 10:00:00")
    rows = [
        ("https://a.example.com/1", t0, b"<html>\x80</html>"),
        ("https://b.example.com/1", t0 + pd.Timedelta("1 min"), b"<html>\xfe</html>"),
    ]
    spark.createDataFrame(
        pd.DataFrame(rows, columns=["url", "warc_ts", "html"])
    ).coalesce(1).write.mode("overwrite").parquet(str(ingest))

    out = streaming.stream_content_seen(spark, ingest, watermark="10 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("csb")
        .option("checkpointLocation", str(tmp_path / "ck_bin"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert spark.sql("select count(*) n from csb").collect()[0]["n"] == 2


def test_stream_window_rates_matches_batch(spark):
    """The registered streaming query (AvailableNow → memory sink) must
    equal the batch computation of the same windows — the streaming
    engine's state/trigger path is the thing under test."""
    from spider_spark.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    got = {tuple(r) for r in QUERIES["stream_window_rates"](spark, sf).collect()}
    ev = spark.read.parquet(f"{sf}/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    batch = {
        tuple(r)
        for r in ev.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type", "n_events", "sum_value",
        )
        .collect()
    }
    assert got == batch and len(got) > 0
