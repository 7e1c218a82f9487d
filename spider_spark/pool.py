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
# db.py:26 ``re.match('\d+\.\d+\.\d+\.\d+\:\d+', proxy)``: PREFIX match
# with unbounded digit runs — '1234.5.6.7:8' and '1.2.3.4:80/junk' both
# pass in the reference, so they pass here (round-4 review fix: the prior
# fully-anchored {1,3}-bounded pattern silently rejected what the
# reference accepts).
PROXY_RE = r"^\d+\.\d+\.\d+\.\d+:\d+"


def add(pool: DataFrame, new: DataFrame) -> DataFrame:
    """E1 (db.py:19-30): format-validate, insert-if-absent at score 10 —
    where "absent" is the reference's ``if not self.db.zscore(...)``:
    zscore returns the score and **0 is falsy**, so a pooled proxy
    sitting AT score 0 is re-added, i.e. its score resets to INITIAL
    (round-4 review fix; the prior presence-only anti-join kept it at 0)."""
    valid = new.select("proxy").where(F.col("proxy").rlike(PROXY_RE)).distinct()
    marked = pool.join(valid.withColumn("_readd", F.lit(True)), "proxy", "left")
    kept = marked.select(
        "proxy",
        F.when(
            F.col("_readd").isNotNull() & (F.col("score") == MIN_SCORE),
            F.lit(INITIAL_SCORE),
        ).otherwise(F.col("score")).alias("score"),
    )
    fresh = valid.join(pool.select("proxy"), "proxy", "left_anti").withColumn(
        "score", F.lit(INITIAL_SCORE)
    )
    return kept.unionByName(fresh)


def decrease(pool: DataFrame, failed: DataFrame) -> DataFrame:
    """E3 (db.py:47-59): score −1 per failure; evict when it falls BELOW
    MIN. The reference decrements while ``score > MIN_SCORE`` and zrems
    otherwise — so a failure at score 1 lands the proxy AT 0 and keeps
    it; only the next failure (score ≤ MIN at probe time) removes it.
    Post-decrement keep-if ``>= MIN`` reproduces exactly that: 1→0 kept,
    0→−1 removed, untouched 0 kept. ``failed`` multiplicity counts: N
    rows for one proxy decrement it N times, matching N sequential
    decrease() calls (subtract-then-clamp crosses the eviction boundary
    at most once, so the batched form is sequence-equivalent)."""
    delta = failed.groupBy("proxy").agg(F.count(F.lit(1)).alias("_dec"))
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
    otherwise add() from the source crawlers, truncating to the cap.

    Documented deviation: the reference checks POOL_UPPER_THRESHOLD once
    at cycle start and then adds EVERY crawled proxy (it can overshoot
    the cap within a cycle). Truncating at the cap is the bounded-
    resource reading this engine keeps deliberately — at scale the
    "source" is a dataframe of arbitrary size, and the cap is the
    contract."""
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
    """E5 (db.py:78-86): ranked range scan [start, stop) by descending
    score. Tiebreak: ZREVRANGE reverses ZRANGE's ascending-lexicographic
    tie order, so equal scores come back member-DESCENDING (round-4
    review fix: the asc tiebreak put different proxies inside a batch
    boundary than Redis would)."""
    w = Window.orderBy(F.desc("score"), F.desc("proxy"))
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
    top **101** by score — ``zrevrange(KEY, 0, 100)`` has an INCLUSIVE
    stop index (round-4 review fix: was top-100). Deterministic via
    seeded hash order (the reference's random.choice is the only
    nondeterminism — seeded here)."""
    maxed = pool.where(F.col("score") == MAX_SCORE)
    top = top_batch(pool, 0, 101).drop("rank")
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
    loop, no collect. Tie order member-desc per ZREVRANGE (see
    top_batch)."""
    w = Window.orderBy(F.desc("score"), F.desc("proxy"))
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
