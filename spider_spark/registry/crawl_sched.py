"""Conditional refetch / politeness schedule / epoch shuffle — registry tier split out of the former
monolithic queries.py (round 4). Conventions live in
spider_spark/registry/__init__.py; enumeration order is preserved by
the import order there."""

from __future__ import annotations

from pyspark.sql import functions as F
from spider_spark import textops, webindex
from spider_spark.registry._base import T, q


# =====================================================================
# Conditional refetch / focused priority / politeness schedule /
# epoch shuffle — session-7 crawl-scheduling + trainer-layout additions
# =====================================================================

@q(
    "revisit_plan",
    """
    WITH h AS (
      SELECT doc_id,
             'https://h' || (doc_id % 13)::VARCHAR || '.docs.example.com/d/'
               || doc_id::VARCHAR AS url,
             i,
             md5(doc_id::VARCHAR || ':' || (i // (1 + doc_id % 6))::VARCHAR) AS digest
      FROM documents CROSS JOIN (SELECT unnest(generate_series(1, 6)) AS i) g
      WHERE i <= 4 + doc_id % 3),
    c AS (
      SELECT url, i,
             CASE WHEN lag(digest) OVER (PARTITION BY url ORDER BY i) IS NULL THEN 0
                  WHEN digest != lag(digest) OVER (PARTITION BY url ORDER BY i) THEN 1
                  ELSE 0 END AS changed
      FROM h),
    a AS (SELECT url, count(*)::INT AS n_obs, sum(changed)::INT AS n_changes,
                 max(i)::BIGINT AS last_obs
          FROM c GROUP BY url),
    r AS (
      SELECT url,
             CASE WHEN n_obs > 1 THEN n_changes::DOUBLE / (n_obs - 1)::DOUBLE
                  ELSE 0.0 END AS change_rate,
             last_obs
      FROM a),
    t AS (
      SELECT url, change_rate, last_obs,
             CASE WHEN change_rate >= 0.8 THEN 'hot'
                  WHEN change_rate >= 0.3 THEN 'warm' ELSE 'cold' END AS tier
      FROM r),
    p AS (
      SELECT url, tier, change_rate, last_obs,
             (CASE tier WHEN 'hot' THEN 1 WHEN 'warm' THEN 4 ELSE 12 END)::INT AS interval
      FROM t)
    SELECT url, tier, change_rate, last_obs, interval,
           (last_obs + interval)::BIGINT AS due,
           (last_obs + interval) <= 8 AS overdue
    FROM p
    """,
)
def revisit_plan_q(spark, sf_dir):
    """Revisit schedule composition (webindex.revisit_plan): change-rate
    tiers (Cho & Garcia-Molina estimator) mapped to concrete revisit
    intervals (hot 1 / warm 4 / cold 12) and a due capture index, with
    overdue flagged at now=8 — the row set an incremental crawl round
    feeds its frontier from. The plant varies BOTH axes per url: capture
    counts 4-6 (last_obs differs) and digest rollover periods 1-6 (tier
    differs), so due/overdue are value-checked across the full grid. Same
    one-Exchange shape as recrawl_priority (the lag window and the
    summary agg share the url shuffle)."""
    d = T(spark, sf_dir, "documents").select("doc_id")
    dd = F.col("doc_id")
    hist = (
        d.select(
            dd,
            F.explode(
                F.sequence(F.lit(1), (F.lit(4) + dd % 3).cast("int"))
            ).alias("i_raw"),
        )
        .select(dd, F.col("i_raw").cast("long").alias("i"))
        .select(
            F.concat(
                F.lit("https://h"), (dd % 13).cast("string"),
                F.lit(".docs.example.com/d/"), dd.cast("string"),
            ).alias("url"),
            F.col("i").alias("obs_ts"),
            F.md5(
                F.concat(
                    dd.cast("string"), F.lit(":"),
                    F.expr("i div (1 + doc_id % 6)").cast("string"),
                )
            ).alias("digest"),
        )
    )
    return webindex.revisit_plan(hist, now=8)


@q(
    "temperature_mix",
    """
    WITH agg AS (SELECT lang AS source, count(*)::BIGINT AS n_docs
                 FROM documents GROUP BY lang),
    w AS (SELECT source, n_docs, sqrt(n_docs::DOUBLE) AS wt FROM agg),
    p AS (SELECT source, n_docs, wt / sum(wt) OVER () AS p FROM w),
    s AS (SELECT source, n_docs, p,
                 floor(round(p * 100, 9))::BIGINT AS base,
                 round(round(p * 100, 9) - floor(round(p * 100, 9)), 9) AS frac
          FROM p),
    r AS (SELECT *, 100 - sum(base) OVER () AS leftover,
                 row_number() OVER (ORDER BY frac DESC, source) AS rn
          FROM s)
    SELECT source, n_docs, round(p, 9) AS p,
           (base + CASE WHEN rn <= leftover THEN 1 ELSE 0 END)::BIGINT AS quota
    FROM r
    """,
)
def temperature_mix(spark, sf_dir):
    """Temperature-reweighted sampling quotas (curation.temperature_quotas
    — the XLM-R / LLaMA corpus rule, p_d ∝ n_d^α): per-language quotas at
    α=0.5 over the naturally skewed lang column (en dominates ~3.4×), so
    the flattening is value-visible — en's share drops, tail languages
    gain. Largest-remainder apportionment makes Σ quota == budget exactly,
    deterministically (floor + fractional-rank seats, ties by source).
    α=0.5 is the oracle-exact configuration (sqrt is correctly rounded;
    pow is not — see the operator docstring). One count shuffle; every
    window runs over the |domains|-row aggregate."""
    from spider_spark.curation import temperature_quotas

    d = T(spark, sf_dir, "documents").select("lang")
    out = temperature_quotas(d, "lang", budget=100, alpha=0.5)
    return out.select("source", "n_docs", F.round("p", 9).alias("p"), "quota")

_REFETCH_URL_SQL = (
    "'https://h' || (doc_id % 13)::VARCHAR || '.docs.example.com/d/' || doc_id::VARCHAR"
)


@q(
    "conditional_refetch",
    f"""
    WITH h AS (
      SELECT {_REFETCH_URL_SQL} AS url, i::BIGINT AS ts,
             CASE WHEN i = 3 AND doc_id % 7 = 0 THEN md5(doc_id::VARCHAR || ':live')
                  ELSE md5(doc_id::VARCHAR || ':' || i::VARCHAR) END AS digest
      FROM documents CROSS JOIN (SELECT unnest([1, 2, 3]) AS i) g
      WHERE doc_id % 5 != 0),
    last AS (
      SELECT url, ts AS last_ts, digest AS validator FROM (
        SELECT url, ts, digest,
               row_number() OVER (PARTITION BY url ORDER BY ts DESC, digest DESC) AS rn
        FROM h) WHERE rn = 1),
    lv AS (
      SELECT {_REFETCH_URL_SQL} AS url,
             md5(doc_id::VARCHAR || ':live') AS live_digest,
             n_chars::BIGINT AS n_bytes
      FROM documents)
    SELECT lv.url,
           CASE WHEN validator IS NULL THEN 'first_fetch'
                WHEN live_digest = validator THEN 'not_modified'
                ELSE 'modified' END AS outcome,
           last_ts,
           (CASE WHEN validator IS NOT NULL AND live_digest = validator
                 THEN n_bytes ELSE 0 END)::BIGINT AS bytes_saved,
           (CASE WHEN validator IS NOT NULL AND live_digest = validator
                 THEN 0 ELSE n_bytes END)::BIGINT AS bytes_fetched
    FROM lv LEFT JOIN last ON lv.url = last.url
    """,
)
def conditional_refetch(spark, sf_dir):
    """HTTP revalidation planning (webindex.conditional_refetch, RFC 9110
    §13): the archive's latest capture per URL is the validator; the live
    payload classifies each refetch as first_fetch / not_modified (304,
    body never transferred) / modified. The plant gives every archived URL
    three captures whose digests all differ EXCEPT the last capture of
    doc_id % 7 == 0 (which equals the live digest) — so only a
    latest-capture window gets the 304 set right, and doc_id % 5 == 0 has
    no history at all (first_fetch). bytes_saved prices the politeness
    budget's effective page rate."""
    d = T(spark, sf_dir, "documents").select("doc_id", "n_chars")
    dd = F.col("doc_id")
    url = F.concat(
        F.lit("https://h"), (dd % 13).cast("string"),
        F.lit(".docs.example.com/d/"), dd.cast("string"),
    )
    live_digest = F.md5(F.concat(dd.cast("string"), F.lit(":live")))
    hist = (
        d.where(dd % 5 != 0)
        .select(dd, F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("i"))
        .select(
            url.alias("url"),
            F.col("i").cast("long").alias("warc_ts"),
            F.when((F.col("i") == 3) & (dd % 7 == 0), live_digest)
            .otherwise(
                F.md5(F.concat(dd.cast("string"), F.lit(":"),
                               F.col("i").cast("string")))
            ).alias("digest"),
        )
    )
    live = d.select(
        url.alias("url"), live_digest.alias("digest"),
        F.col("n_chars").alias("n_bytes"),
    )
    return webindex.conditional_refetch(hist, live)


@q(
    "politeness_schedule",
    f"""
    WITH batch AS (
      SELECT {_REFETCH_URL_SQL} AS url,
             'h' || (doc_id % 13)::VARCHAR || '.docs.example.com' AS host,
             (doc_id % 100)::DOUBLE / 10.0 AS priority
      FROM documents),
    pol AS (
      SELECT DISTINCT 'h' || (doc_id % 13)::VARCHAR || '.docs.example.com' AS host,
             (1 + (doc_id % 13) % 5)::DOUBLE AS crawl_delay
      FROM documents),
    slotted AS (
      SELECT url, host, priority,
             (row_number() OVER (PARTITION BY host ORDER BY priority ASC, url) - 1)::INT AS slot
      FROM batch)
    SELECT s.url, s.host, s.slot,
           s.slot * p.crawl_delay AS fetch_offset_s,
           make_timestamp(((epoch('2024-06-01 00:00:00'::TIMESTAMP)
                            + s.slot * p.crawl_delay) * 1000000)::BIGINT) AS fetch_at
    FROM slotted s JOIN pol p ON s.host = p.host
    """,
)
def politeness_schedule(spark, sf_dir):
    """Politeness schedule materialization (webindex.politeness_schedule):
    the popped batch becomes per-host wall-clock fetch slots — best
    priority first, one slot every Crawl-delay seconds from the round
    start — so a 1000-executor fleet stays polite with NO cross-executor
    rate limiter (the host Exchange is the assignment, timestamps are
    preassigned data). Reference: the sleep-per-request loop in qcc.py /
    client_crawler.py, RFC 9309 Crawl-delay. Hosts carry distinct delays
    (1-5 s) so slot arithmetic is value-checked per host."""
    d = T(spark, sf_dir, "documents").select("doc_id")
    dd = F.col("doc_id")
    host = F.concat(
        F.lit("h"), (dd % 13).cast("string"), F.lit(".docs.example.com")
    )
    url = F.concat(
        F.lit("https://h"), (dd % 13).cast("string"),
        F.lit(".docs.example.com/d/"), dd.cast("string"),
    )
    batch = d.select(
        url.alias("url"), host.alias("host"),
        ((dd % 100).cast("double") / 10.0).alias("priority"),
    )
    policy = d.select(
        host.alias("host"),
        (1 + (dd % 13) % 5).cast("double").alias("crawl_delay"),
    ).distinct()
    return webindex.politeness_schedule(batch, policy, "2024-06-01 00:00:00")


@q(
    "focused_priority",
    f"""
    WITH n AS (SELECT count(*) AS cnt FROM documents),
    l AS (
      SELECT 'https://h' || (doc_id % 13)::VARCHAR || '.example.com/d/' || doc_id::VARCHAR AS src,
             'https://h' || (((7 * doc_id + k) % cnt) % 13)::VARCHAR || '.example.com/d/'
               || ((7 * doc_id + k) % cnt)::VARCHAR AS dst
      FROM documents CROSS JOIN n CROSS JOIN (SELECT unnest([1, 2, 3]) AS k) g),
    s AS (
      SELECT 'https://h' || (doc_id % 13)::VARCHAR || '.example.com/d/' || doc_id::VARCHAR AS src,
             ((doc_id * 37) % 101)::DOUBLE / 100.0 AS sc
      FROM documents)
    SELECT dst AS url,
           max(sc) * 0.85 AS rank,
           max(sc) AS best_parent_score,
           count(DISTINCT l.src) AS n_parents
    FROM l JOIN s ON l.src = s.src
    GROUP BY dst
    """,
)
def focused_priority_q(spark, sf_dir):
    """Focused-crawl priority (pagerank.focused_priority — Chakrabarti et
    al. WWW 1999): an undiscovered URL inherits the best linking page's
    relevance score damped one hop, steering the frontier toward on-topic
    regions instead of BFS. One links⋈scores join + one Exchange(dst)
    max/count agg — max is algebraic, so partial aggregation absorbs
    hot-target fan-in (no collect_set state). The doc-graph plant (i →
    7i+k mod N) gives every target 1-3 scored parents with distinct
    deterministic scores, value-checking the argmax-inherit rule."""
    from spider_spark.pagerank import focused_priority

    docs = T(spark, sf_dir, "documents").select("doc_id")
    n = docs.count()
    dd = F.col("doc_id")

    def _u(c):
        return F.concat(
            F.lit("https://h"), (c % 13).cast("string"),
            F.lit(".example.com/d/"), c.cast("string"),
        )

    links = docs.select(
        dd, F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("k")
    ).select(
        _u(dd).alias("src"), _u((dd * 7 + F.col("k")) % n).alias("dst")
    )
    scores = docs.select(
        _u(dd).alias("url"),
        (((dd * 37) % 101).cast("double") / 100.0).alias("score"),
    )
    return focused_priority(links, scores, decay=0.85)


@q(
    "epoch_shuffle",
    f"""
    SELECT doc_id,
           (row_number() OVER (
              ORDER BY {textops.hash60_sql("'epoch:42:' || doc_id::VARCHAR")},
                       doc_id) - 1)::BIGINT AS shuffle_idx
    FROM documents
    """,
)
def epoch_shuffle_q(spark, sf_dir):
    """Deterministic epoch shuffle (sampling.epoch_shuffle): a dense
    per-epoch permutation index with NO global-order window — the
    range-partitioned histogram-offset ranking pattern (per-bucket counts
    → running offsets over the B-row histogram → per-bucket row_number +
    offset). The oracle IS the naive global row_number over the hash
    order, so driver-green certifies the decomposition exact: bucket
    boundaries compose ranks correctly (integer `div`, never float), ties
    resolve identically, and the index is dense 0..n-1. A trainer draws
    epoch t by changing the seed; reproducible on any engine, cluster
    size, or partition layout."""
    from spider_spark.sampling import epoch_shuffle

    d = T(spark, sf_dir, "documents").select("doc_id")
    return epoch_shuffle(d, "doc_id", "42", n_buckets=64).select(
        "doc_id", "shuffle_idx"
    )


