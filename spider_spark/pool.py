"""Scored resource pool as a DataFrame (SURVEY.md §2.E — ProxyPool).

The reference keeps a Redis sorted set of proxies scored 0..100
(ProxyPool/proxypool/db.py:19-99, setting.py:13-15). The Spark-native pool
is a small DataFrame with the same operators; in the crawl engine it is
broadcast to the round job (the Flask /random HTTP hop — api.py:16-38 —
disappears into a broadcast join).

MIN=0, INITIAL=10, MAX=100 per setting.py:13-15.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

MIN_SCORE = 0
INITIAL_SCORE = 10
MAX_SCORE = 100
PROXY_RE = r"^\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}:\d{1,5}$"


def add(pool: DataFrame, new: DataFrame) -> DataFrame:
    """E1 (db.py:19-30): format-validate, insert only if absent, score 10."""
    valid = new.select("proxy").where(F.col("proxy").rlike(PROXY_RE)).distinct()
    fresh = valid.join(pool.select("proxy"), "proxy", "left_anti").withColumn(
        "score", F.lit(INITIAL_SCORE)
    )
    return pool.unionByName(fresh)


def decrease(pool: DataFrame, failed: DataFrame) -> DataFrame:
    """E3 (db.py:47-59): score −1 on failure; evict when it falls BELOW
    MIN. The reference decrements while ``score > MIN_SCORE`` and zrems
    otherwise — so a failure at score 1 lands the proxy AT 0 and keeps
    it; only the next failure (score ≤ MIN at probe time) removes it.
    Post-decrement keep-if ``>= MIN`` reproduces exactly that: 1→0 kept,
    0→−1 removed, untouched 0 kept."""
    delta = failed.select("proxy").distinct().withColumn("_dec", F.lit(1))
    return (
        pool.join(delta, "proxy", "left")
        .select("proxy", (F.col("score") - F.coalesce(F.col("_dec"), F.lit(0))).alias("score"))
        .where(F.col("score") >= MIN_SCORE)
    )


def promote(pool: DataFrame, ok: DataFrame) -> DataFrame:
    """E4 (db.py:69-76): set score to MAX on successful probe."""
    mark = ok.select("proxy").distinct().withColumn("_max", F.lit(True))
    return pool.join(mark, "proxy", "left").select(
        "proxy",
        F.when(F.col("_max"), F.lit(MAX_SCORE)).otherwise(F.col("score")).alias("score"),
    )


def refill(pool: DataFrame, source: DataFrame, cap: int) -> DataFrame:
    """E7 (getter.py:12-30): stop refilling when the pool is at capacity;
    otherwise add() from the source crawlers, truncating to the cap."""
    n = pool.count()
    if n >= cap:
        return pool
    # validate + dedup BEFORE the limit: limiting the raw source first let
    # already-present or malformed rows consume the quota and under-fill
    # the pool even when enough fresh valid proxies existed
    valid = source.select("proxy").where(F.col("proxy").rlike(PROXY_RE)).distinct()
    fresh = valid.join(pool.select("proxy"), "proxy", "left_anti")
    return pool.unionByName(
        fresh.limit(cap - n).withColumn("score", F.lit(INITIAL_SCORE))
    )


def top_batch(pool: DataFrame, start: int, stop: int) -> DataFrame:
    """E5 (db.py:78-86): ranked range scan [start, stop) by descending score
    (proxy asc tiebreak — zset lexicographic order analog)."""
    w = Window.orderBy(F.desc("score"), F.asc("proxy"))
    return (
        pool.withColumn("rank", F.row_number().over(w))
        .where((F.col("rank") > start) & (F.col("rank") <= stop))
        .select("proxy", "score", "rank")
    )


def pick_hash(pool: DataFrame, salt: str = "probe") -> DataFrame:
    """E2, oracle-able form: among rows tied at the pool's max score, pick
    the argmax of the shared 60-bit hash of ``proxy || salt`` — uniform
    over the top tier when the salt varies per request (the reference's
    RANDOMKEY-among-MAX_SCORE, db.py:32-38), fully deterministic for the
    DuckDB oracle. One broadcast scalar + one TakeOrdered(1): no full
    sort, no window."""
    from spider_spark.textops import hash60

    mx = pool.agg(F.max("score").alias("score"))
    return (
        pool.join(F.broadcast(mx), "score")
        .withColumn("_h", hash60(F.concat(F.col("proxy"), F.lit(salt))))
        .orderBy(F.desc("_h"))
        .limit(1)
        .select("proxy", "score")
    )


def pick_random(pool: DataFrame, seed: int = 42) -> DataFrame:
    """E2 (db.py:32-45): prefer MAX_SCORE members; else random from the
    top-100 by score; deterministic via seeded hash order (the reference's
    random.choice is the only nondeterminism — seeded here)."""
    maxed = pool.where(F.col("score") == MAX_SCORE)
    top = top_batch(pool, 0, 100).drop("rank")
    pick_from = maxed if maxed.limit(1).count() > 0 else top
    return (
        pick_from.withColumn("_r", F.xxhash64(F.col("proxy"), F.lit(seed)))
        .orderBy("_r")
        .limit(1)
        .drop("_r")
    )


def probe_cycle(pool: DataFrame, outcomes: DataFrame,
                batch_size: int = 10) -> DataFrame:
    """E6/E9: one full tester cycle as ONE distributed pass
    (ProxyPool/proxypool/tester.py:17-61 + scheduler.py:10-50 semantics,
    setting.py BATCH_TEST_SIZE=10): the cycle walks the pool in ranked
    batches of ``batch_size`` (zrevrange order: score desc, proxy asc) and
    per probe applies promote-to-MAX on success (tester.py:32 redis.max)
    or decrease-with-evict on failure (tester.py:34-38 redis.decrease,
    db.py:47-59: −1, remove when the score falls to MIN).

    ``outcomes`` (proxy, ok) is the probe-result table — the sandbox has
    no network, so the aiohttp GET is externalized exactly like the pages
    table externalizes fetches. Batch membership snapshots the ranking at
    cycle start: the reference re-reads the LIVE zset per batch, so an
    in-cycle promotion can reshuffle ranks and retest/skip proxies —
    nondeterminism, not semantics; the snapshot is the deterministic
    round-based reading. Proxies without an outcome row keep their score
    (an unfinished cycle). The pool is a resource table (≤50k rows by the
    E7 cap), so the single global ranking window is driver-cheap, and the
    whole cycle is one window + one broadcast-sized join — no per-proxy
    loop, no collect."""
    w = Window.orderBy(F.desc("score"), F.asc("proxy"))
    ranked = pool.withColumn("rank", F.row_number().over(w))
    j = ranked.join(outcomes.select("proxy", "ok"), "proxy", "left")
    after = (
        F.when(F.col("ok").isNull(), F.col("score"))
        .when(F.col("ok"), F.lit(MAX_SCORE))
        .otherwise(F.col("score") - 1)
    )
    return j.select(
        "proxy",
        F.expr(f"CAST((rank - 1) DIV {int(batch_size)} AS INT)").alias("batch_no"),
        F.col("score").cast("int").alias("score_before"),
        F.coalesce(F.col("ok"), F.lit(False)).alias("ok"),
        # keep-at-MIN, evict below it — db.py:47-59 keeps a proxy that a
        # failure lands exactly ON MIN_SCORE (see decrease())
        F.when(after >= MIN_SCORE, after).cast("int").alias("score_after"),
        (~(after >= MIN_SCORE)).alias("evicted"),
    )
