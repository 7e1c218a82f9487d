"""Deterministic sampling for corpus curation.

A training-data pipeline needs samples that are REPRODUCIBLE — the same
rows selected on every run, at every cluster size, from either engine.
``DataFrame.sample`` gives none of that (its outcome depends on partition
layout and seed plumbing), so these operators derive membership from the
shared cross-engine md5 hash (textops.hash60) of a key column:

- hash_sample: Bernoulli p-sample, map-only — a pushdown-able filter, no
  shuffle, no state; composable with any downstream operator.
- stratified_sample: exact per-stratum quotas by hash rank — one window
  over an Exchange(strata) (each stratum ranks independently, so skewed
  strata parallelize across their own partition, and quotas cap the
  output regardless of stratum size).

Scale: both are single-pass; hash_sample survives any corpus size
unchanged, stratified_sample's window sees only per-stratum rows and the
quota keeps result volume bounded. No reference analog (the reference
never samples); builder-brief pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from spider_spark.textops import hash60

SAMPLE_MOD = 1_000_000


def sample_hash_col(key: Column, salt: str = "sample") -> Column:
    """The sampling hash: hash60 of 'salt:key', reproducible in DuckDB as
    textops.hash60_sql over the same concatenation."""
    return hash60(F.concat_ws(":", F.lit(salt), key.cast("string")))


def hash_sample(
    df: DataFrame, rate: float, key_col: str, salt: str = "sample"
) -> DataFrame:
    """Deterministic Bernoulli sample: keep rows whose sampling hash lands
    under ``rate`` of the modulus. Same rows selected everywhere."""
    bucket = F.pmod(sample_hash_col(F.col(key_col), salt), F.lit(SAMPLE_MOD))
    return df.where(bucket < int(rate * SAMPLE_MOD))


def split_col(
    key: Column, weights: dict[str, float], salt: str = "split"
) -> Column:
    """Deterministic train/val/test assignment: a CASE chain over the
    sampling-hash bucket, so every row lands in exactly one split, the
    assignment is identical on every engine and cluster size, and a row
    never migrates between splits when the corpus grows (membership
    depends only on the row's own key). Weights must sum to ≤ 1; any
    remainder falls to the LAST split."""
    names = list(weights)
    bucket = F.pmod(sample_hash_col(key, salt), F.lit(SAMPLE_MOD))
    expr = F.lit(names[-1])
    hi = 0.0
    cuts: list[tuple[str, int]] = []
    for name in names[:-1]:
        hi += weights[name]
        cuts.append((name, int(hi * SAMPLE_MOD)))
    for name, cut in reversed(cuts):
        expr = F.when(bucket < cut, F.lit(name)).otherwise(expr)
    return expr


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    quota: int,
    key_col: str,
    salt: str = "sample",
) -> DataFrame:
    """Exact ``quota`` rows per stratum, picked by ascending sampling hash
    (ties broken by the key, so the pick is total-ordered and stable)."""
    h = sample_hash_col(F.col(key_col), salt)
    w = Window.partitionBy(strata_col).orderBy(h, F.col(key_col))
    return (
        df.withColumn("_srn", F.row_number().over(w))
        .where(F.col("_srn") <= quota)
        .drop("_srn")
    )


def weighted_sample(
    df: DataFrame,
    strata_col: str,
    k: int,
    key_col: str,
    weight_col: str,
    salt: str = "wsample",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement, exact k per
    stratum — the A-ES exponential-jump scheme (Efraimidis & Spirakis,
    "Weighted random sampling with a reservoir", IPL 2006 — public):
    every row draws a key ``-ln(u)/w`` from its own hash-uniform
    ``u ∈ (0,1]`` and weight ``w``; the k SMALLEST keys per stratum are
    exactly a weighted reservoir sample (row selection probability ∝ w,
    without replacement). The "randomness" is the shared cross-engine md5
    hash of (salt, key), so the sample is identical on any engine, any
    cluster size, any partition layout — and a row's key never changes
    when the corpus grows, so incremental re-curation keeps prior picks
    stable unless genuinely outweighed.

    Physical shape: the key is a map-only expression; per-stratum top-k is
    a row_number window that Spark's InferWindowGroupLimit rewrites into a
    partial per-partition top-k BEFORE the Exchange(strata) (rank-limit
    pushdown), so the shuffle carries ≤ k·partitions rows per stratum, not
    the stratum. Weights must be > 0 — caller clamps (e.g. n_chars + 1).

    Returns the sampled rows plus ``wkey`` (rounded to 9) and ``srank``.
    Pipeline surface: temperature-sampling a domain mix by quality weight
    is exactly this operator with w = quality**(1/T)."""
    h = F.pmod(sample_hash_col(F.col(key_col), salt), F.lit(SAMPLE_MOD))
    u = (h + 1.0) / float(SAMPLE_MOD + 1)  # uniform in (0, 1], never ln(0)
    wkey = -F.log(u) / F.col(weight_col).cast("double")
    win = Window.partitionBy(strata_col).orderBy(wkey.asc(), F.col(key_col))
    return (
        df.withColumn("wkey", wkey)
        .withColumn("srank", F.row_number().over(win).cast("int"))
        .where(F.col("srank") <= k)
        .withColumn("wkey", F.round("wkey", 9))
    )


HASH60_SPACE = 1 << 60


def epoch_shuffle(
    df: DataFrame,
    id_col: str,
    seed: str,
    n_buckets: int = 64,
) -> DataFrame:
    """Deterministic global epoch shuffle with a SCALABLE dense index:
    every row gets ``shuffle_idx`` ∈ [0, n) — its position in the corpus
    ordered by the cross-engine hash of (seed, id) — without ever running
    a global-order window (a single-partition bottleneck that is the
    classic zipWithIndex trap at 10^10 rows). A trainer consumes epochs
    by changing ``seed``: each epoch is an independent uniform permutation,
    reproducible on any engine / cluster size / partition layout, and a
    given row's relative order against surviving rows is stable under
    corpus growth within an epoch (hash keys don't move).

    The distributed-ranking pattern (range-partitioned histogram offsets):

    1. key = hash60(seed:id) — uniform in [0, 2^60);
    2. bucket = key // ceil(2^60 / B) — a RANGE of the key space, so
       bucket order IS key order and ranks compose across buckets
       (a pmod bucket would interleave and break this);
    3. per-bucket counts (one partial-agg shuffle of B rows) →
       running-sum offsets over the ≤B-row histogram (tiny window);
    4. broadcast-join offsets back; shuffle_idx = bucket_offset +
       (row_number within Exchange(bucket) by (key, id) − 1).

    Equality with the naive plan is exact: ORDER BY (key, id) ties can
    only fall inside one bucket, so per-bucket rank + offset equals the
    global row_number. Hash uniformity bounds every bucket at ~n/B rows
    (B chosen ~ cluster cores × 4 at scale), so the only per-key window
    sees 1/B of the corpus and skew is structurally impossible — no salt
    needed because the key is already a cryptographic hash.

    The input lineage IS evaluated twice (histogram pass + rank pass),
    deliberately uncached: at 10^10 rows the histogram pass is a
    column-pruned scan + partial count (cheap), while persisting the
    keyed corpus to make it single-pass would materialize the full
    dataset to executor storage — strictly worse. Callers with an
    expensive upstream lineage should persist BEFORE calling, where they
    know what the lineage costs."""
    width = -(-HASH60_SPACE // n_buckets)  # ceil
    key = sample_hash_col(F.col(id_col), f"epoch:{seed}")
    # `div`, not `/`: float division loses integer precision above 2^53,
    # and a boundary key mis-bucketed by one breaks rank composition
    keyed = df.withColumn("_k", key).withColumn(
        "_b", F.expr(f"_k div {width}L")
    )
    hist = keyed.groupBy("_b").agg(F.count(F.lit(1)).alias("_c"))
    off_w = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = hist.select(
        "_b", F.coalesce(F.sum("_c").over(off_w), F.lit(0)).alias("_off")
    )
    rank_w = Window.partitionBy("_b").orderBy(F.col("_k"), F.col(id_col))
    return (
        keyed.join(F.broadcast(offsets), "_b")
        .withColumn(
            "shuffle_idx",
            (F.col("_off") + F.row_number().over(rank_w) - 1).cast("long"),
        )
        .drop("_k", "_b", "_off")
    )
