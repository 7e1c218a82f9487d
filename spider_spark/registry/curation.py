"""Semantic dedup, similarity self-join, weighted sampling, vocab — registry tier split out of the former
monolithic queries.py (round 4). Conventions live in
spider_spark/registry/__init__.py; enumeration order is preserved by
the import order there."""

from __future__ import annotations

import tempfile
from pyspark.sql import functions as F
from spider_spark import dedup, textops
from spider_spark import tables as tbl
from spider_spark.registry._base import T, q
from spider_spark.registry.text import _SQL_TOKENS, _sql_shingles


# =====================================================================
# Round-3 session-3: semantic dedup, similarity self-join, weighted
# sampling, vocabulary coverage
# =====================================================================

@q(
    "semdedup_flags",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    l AS (
      SELECT vec_id AS lid, v AS lv,
             row_number() OVER (ORDER BY md5(vec_id::VARCHAR), vec_id) - 1 AS cid
      FROM e QUALIFY cid < 8),
    asg AS (
      SELECT vec_id, cid FROM (
        SELECT e.vec_id, l.cid,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY list_cosine_similarity(e.v, l.lv) DESC, l.cid) AS rn
        FROM e CROSS JOIN l)
      WHERE rn = 1),
    dropped AS (
      SELECT DISTINCT xb.vec_id
      FROM asg xa JOIN asg xb ON xa.cid = xb.cid AND xa.vec_id < xb.vec_id
      JOIN e ea ON ea.vec_id = xa.vec_id
      JOIN e eb ON eb.vec_id = xb.vec_id
      WHERE list_cosine_similarity(ea.v, eb.v) >= 0.47)
    SELECT a.vec_id, a.cid::INT AS cluster_id, d.vec_id IS NULL AS is_kept
    FROM asg a LEFT JOIN dropped d ON d.vec_id = a.vec_id
    """,
)
def semdedup_flags(spark, sf_dir):
    """SemDeDup (Abbas et al. 2023): cluster the embedding space, compare
    cosine pairs only WITHIN a cluster, keep the lowest id per dup group —
    the semantic tier above exact/minhash dedup. Deterministic leader
    clustering (smallest-md5 rows are the leaders; argmax-cosine assignment
    ties by leader index) so the oracle reproduces the clusters exactly.
    Threshold 0.47 sits in the corpus' measured cosine gap. Every row is
    output with its cluster and keep flag, so the clustering itself is
    value-checked, not just the dup verdicts."""
    return dedup.semdedup_flags(
        T(spark, sf_dir, "embeddings"), n_clusters=8, threshold=0.47
    )


@q(
    "tfidf_sim_join",
    f"""
    WITH tok AS (SELECT doc_id, {_SQL_TOKENS} AS w FROM documents),
    g AS (SELECT doc_id,
                 unnest(list_transform(generate_series(1, greatest(len(w) - 2, 0)),
                                       i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS term
          FROM tok),
    tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM g GROUP BY 1, 2),
    dfx AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM g GROUP BY 1
            HAVING count(DISTINCT doc_id) <= 64),
    n AS (SELECT count(*)::BIGINT AS n FROM documents),
    w AS (SELECT doc_id, term, tf * ln((n + 1.0) / (df + 1.0)) AS w
          FROM tf JOIN dfx USING (term) CROSS JOIN n),
    nm AS (SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM w GROUP BY doc_id),
    d AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, sum(a.w * b.w) AS dot
          FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
    SELECT a_id, b_id, round(dot / (na.nrm * nb.nrm), 6) AS cos
    FROM d JOIN nm na ON na.doc_id = a_id JOIN nm nb ON nb.doc_id = b_id
    WHERE dot / (na.nrm * nb.nrm) >= 0.3
    """,
)
def tfidf_sim_join(spark, sf_dir):
    """All-pairs document similarity by TF-IDF cosine over 3-gram shingle
    terms via the inverted-index self-join (Lin SIGIR'09) — a pair is
    scored only if it shares an indexed shingle, and the df-cap (64)
    bounds the join at O(vocab · max_df²) regardless of corpus size.
    Threshold 0.3 sits in a measured void: the fixture corpus has NO pair
    with shingle-space cosine in [0.15, 0.45] (dup families score ≥0.5,
    background noise <0.15), so float last-ulp can't flip membership."""
    return dedup.tfidf_cosine_pairs(
        T(spark, sf_dir, "documents"), threshold=0.3, max_df=64, n=3
    )


_WSAMPLE_HASH_SQL = textops.hash60_sql("'wsample:' || doc_id::VARCHAR")

@q(
    "sample_weighted_length",
    f"""
    WITH h AS (
      SELECT doc_id, lang,
             ((({_WSAMPLE_HASH_SQL}) % 1000000) + 1.0) / 1000001.0 AS u,
             (n_chars + 1)::DOUBLE AS w
      FROM documents),
    k AS (SELECT doc_id, lang, -ln(u) / w AS wkey FROM h),
    r AS (SELECT doc_id, lang, wkey,
                 row_number() OVER (PARTITION BY lang ORDER BY wkey, doc_id)::INT AS srank
          FROM k)
    SELECT doc_id, lang, round(wkey, 9) AS wkey, srank FROM r WHERE srank <= 25
    """,
)
def sample_weighted_length(spark, sf_dir):
    """Deterministic weighted sampling without replacement (Efraimidis-
    Spirakis A-ES keys over the cross-engine hash), 25 docs per language
    weighted by document length — the temperature-sampling primitive a
    domain-mix pipeline uses. Selection probability ∝ n_chars+1 within
    each stratum; the pick is identical at any cluster size and stable
    under corpus growth (a row's key depends only on the row)."""
    from spider_spark import sampling

    d = T(spark, sf_dir, "documents").withColumn(
        "_w", (F.col("n_chars") + 1).cast("double")
    )
    return sampling.weighted_sample(d, "lang", 25, "doc_id", "_w").select(
        "doc_id", "lang", "wkey", "srank"
    )


@q(
    "vocab_oov_rate",
    f"""
    WITH tok AS (SELECT doc_id, unnest({_SQL_TOKENS}) AS term FROM documents),
    vocab AS (
      SELECT term FROM (
        SELECT term, count(*) AS cnt FROM tok GROUP BY term
        ORDER BY cnt DESC, term LIMIT 20)),
    per AS (
      SELECT t.doc_id,
             count(*)::INT AS n_tokens,
             count(*) FILTER (v.term IS NULL)::INT AS n_oov
      FROM tok t LEFT JOIN vocab v ON v.term = t.term
      GROUP BY t.doc_id)
    SELECT d.doc_id,
           coalesce(per.n_tokens, 0) AS n_tokens,
           coalesce(per.n_oov, 0) AS n_oov,
           round(CASE WHEN per.n_tokens IS NULL THEN 0
                      ELSE per.n_oov::DOUBLE / per.n_tokens END, 6) AS oov_rate
    FROM documents d LEFT JOIN per ON per.doc_id = d.doc_id
    """,
)
def vocab_oov_rate(spark, sf_dir):
    """Tokenizer-vocabulary coverage: build the top-V corpus vocabulary by
    term frequency (ties by term — exact integer ranking, engine-stable)
    and score every document's out-of-vocabulary token rate — the signal
    that decides whether a tokenizer/vocab fits a corpus before training.
    Scale shape: one tokenize pass feeds the vocab agg (vocab-sized) and
    the per-doc agg; membership is a broadcast left join against the V-row
    vocabulary; the rate divides exact integers (bit-identical anywhere)."""
    d = T(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(textops.tokens_col(F.col("text"))).alias("term"))
    vocab = (
        tok.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "term")
        .limit(20)
        .select("term", F.lit(True).alias("_in"))
    )
    per = (
        tok.join(F.broadcast(vocab), "term", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_tokens"),
            F.sum(F.when(F.col("_in").isNull(), 1).otherwise(0)).cast("int").alias("n_oov"),
        )
    )
    return (
        d.select("doc_id").join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_tokens"), F.lit(0)).alias("n_tokens"),
            F.coalesce(F.col("n_oov"), F.lit(0)).alias("n_oov"),
            F.round(
                F.when(F.col("n_tokens").isNull(), F.lit(0.0)).otherwise(
                    F.col("n_oov").cast("double") / F.col("n_tokens")
                ),
                6,
            ).alias("oov_rate"),
        )
    )


_PACK_HASH_SQL = textops.hash60_sql("'pack:' || doc_id::VARCHAR")

@q(
    "pack_sequences",
    f"""
    WITH base AS (
      SELECT doc_id,
             (({_PACK_HASH_SQL}) % 8)::INT AS bucket,
             ({_PACK_HASH_SQL}) AS h,
             len({_SQL_TOKENS})::BIGINT AS n_tokens
      FROM documents),
    s AS (
      SELECT doc_id, bucket, n_tokens,
             coalesce(sum(n_tokens) OVER (
               PARTITION BY bucket ORDER BY h, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS strt
      FROM base)
    SELECT doc_id, bucket, (strt // 256)::BIGINT AS bin_id,
           (strt % 256)::INT AS bin_offset, n_tokens
    FROM s
    """,
)
def pack_sequences(spark, sf_dir):
    """GPT-style concat-and-chunk sequence packing into 256-token training
    bins, bucketed 8 ways so the running-offset window parallelizes (one
    independent token stream per bucket — training shards map 1:1). Every
    quantity is an exact integer, so the layout is bit-identical on any
    engine and stable under corpus growth (a new doc perturbs only its own
    bucket)."""
    from spider_spark import curation

    return curation.pack_sequences(
        T(spark, sf_dir, "documents"), seq_len=256, n_buckets=8
    )


@q(
    "dedup_incremental",
    f"""
    WITH t AS (SELECT doc_id, {_SQL_TOKENS} AS w FROM documents),
    g AS (SELECT doc_id, unnest({_sql_shingles(3)}) AS shingle FROM t),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM g GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter
      FROM g a JOIN g b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    pairs AS (
      SELECT a_id, b_id
      FROM inter JOIN sizes sa ON sa.doc_id = a_id JOIN sizes sb ON sb.doc_id = b_id
      WHERE inter::DOUBLE / (sa.n_sh + sb.n_sh - inter)::DOUBLE >= 0.8),
    -- old = doc_id < 400 (ids ascend), so in any qualifying a<b pair the
    -- dying side is b: either a is old, or both are new and b is larger
    dropped AS (SELECT DISTINCT b_id AS doc_id FROM pairs WHERE b_id >= 400)
    SELECT d.doc_id, dr.doc_id IS NULL AS is_kept
    FROM documents d LEFT JOIN dropped dr ON dr.doc_id = d.doc_id
    WHERE d.doc_id >= 400
    """,
)
def dedup_incremental(spark, sf_dir):
    """Incremental near-dup admission: the last 100 docs arrive as a new
    batch and are gated against the 400-doc existing corpus (exact 3-gram
    Jaccard ≥ 0.8 against any old doc or a smaller-id batch-mate ⇒ drop).
    The LSH candidate join generates only pairs touching the new batch —
    the old×old quadrant, the 10^10-row bulk in production, never exists —
    and the oracle is the full exact-Jaccard answer, so the band
    configuration's completeness is value-checked end-to-end."""
    d = T(spark, sf_dir, "documents")
    return dedup.incremental_dup_flags(
        d.where(F.col("doc_id") < 400), d.where(F.col("doc_id") >= 400),
        threshold=0.8, n=3,
    )


@q(
    "stream_window_rates",
    """
    WITH w AS (
      -- exact integer microseconds: epoch(ts)::BIGINT would ROUND the
      -- fractional second and misplace boundary-adjacent events
      SELECT make_timestamp((epoch_us(ts) // 300000000) * 300000000) AS ws,
             event_type,
             count(*)::BIGINT AS n_events,
             sum(CAST(value AS DECIMAL(18,2)))::DOUBLE AS sum_value
      FROM events GROUP BY 1, 2)
    SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type, n_events, sum_value
    FROM w
    """,
)
def stream_window_rates(spark, sf_dir):
    """Structured Streaming, value-checked end-to-end: the events table is
    REPLAYED through readStream (AvailableNow trigger), aggregated into
    5-minute event-time tumbling windows per event_type under a 10-minute
    watermark, sunk to memory in complete mode, and the materialized sink
    is returned — so the driver's DuckDB gate checks the STREAMING engine's
    output (trigger batching, state store, window assignment) against
    batch SQL, not a batch re-statement of it. Money-style exact-decimal
    sums keep the values order-independent across trigger batches; window
    starts render as strings (house timestamp convention). At production
    scale this is the per-host fetch-rate monitor (streaming.host_fetch_
    rates) shape: state is bounded by windows-in-horizon × group keys,
    and the watermark frees closed windows."""
    import os
    import shutil
    import uuid

    src = f"{sf_dir}/events.parquet"
    schema = spark.read.parquet(src).schema
    if not os.path.isdir(src):
        # the file stream source ingests DIRECTORIES (files arrive over
        # time); a single-file fixture is staged as a one-file ingest dir
        ingest = tempfile.mkdtemp(suffix="_ingest")
        shutil.copy(src, os.path.join(ingest, "part-0.parquet"))
        src = ingest
    name = f"swr_{uuid.uuid4().hex[:8]}"
    ck = tempfile.mkdtemp()
    agg = (
        spark.readStream.schema(schema).parquet(src)
        # parquet stores TIMESTAMP_NTZ; event-time watermarks require an
        # instant. The container session tz is UTC, so the cast is a pure
        # type change (oracle reads the same NTZ values as UTC instants).
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
    )
    sq = (
        agg.writeStream.format("memory").queryName(name)
        .outputMode("complete").trigger(availableNow=True)
        .option("checkpointLocation", ck).start()
    )
    sq.awaitTermination()
    return spark.table(name).select(
        F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type", "n_events", "sum_value",
    )


@q(
    "decontaminate_bloom_gate",
    f"""
    WITH tok AS (SELECT doc_id, {_SQL_TOKENS} AS w FROM documents),
    g AS (SELECT doc_id, unnest({_sql_shingles(5)}) AS shingle FROM tok),
    bench AS (SELECT DISTINCT shingle FROM g WHERE doc_id % 7 = 0),
    bad AS (SELECT DISTINCT g.doc_id FROM g JOIN bench USING(shingle)
            WHERE g.doc_id % 7 != 0)
    SELECT d.doc_id FROM documents d
    LEFT JOIN bad ON bad.doc_id = d.doc_id
    WHERE d.doc_id % 7 != 0 AND bad.doc_id IS NULL
    """,
)
def decontaminate_bloom_gate(spark, sf_dir):
    """Bloom-gated decontamination — decontaminate() at the scale where the
    benchmark outgrows a broadcast set: benchmark 5-gram hashes become one
    broadcast Bloom filter probed map-side (Arrow kernel, zero shuffle for
    the gate); only maybe-hit docs reach the exact verify, so the output
    EQUALS exact decontamination — the same Bloom-prefilter + exact-resolve
    contract as the crawl URL-seen set (seen.SeenSet.split → anti-join),
    value-checked here against the exact SQL answer. Same eval-split
    fixture as decontaminate_overlap (doc_id % 7 == 0 plays the benchmark)."""
    d = T(spark, sf_dir, "documents")
    kept = dedup.decontaminate_bloom(
        d.where(F.col("doc_id") % 7 != 0), d.where(F.col("doc_id") % 7 == 0), n=5
    )
    return kept.select("doc_id")


@q(
    "quality_model_scores",
    f"""
    WITH t AS (SELECT doc_id, text, {_SQL_TOKENS} AS toks FROM documents),
    f AS (SELECT doc_id,
            len(toks)::BIGINT AS n_tokens,
            length(text)::BIGINT AS n_chars,
            len(list_filter(toks, x -> x IN ('the','a','and','of','to')))::BIGINT AS n_stop,
            (length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))::BIGINT AS n_punct
          FROM t)
    SELECT doc_id,
           round(
             1.0
             + 9.0 * (CASE WHEN n_tokens > 0 THEN n_stop::DOUBLE / n_tokens::DOUBLE ELSE 0.0 END)
             + -7.0 * (CASE WHEN n_chars > 0 THEN n_punct::DOUBLE / n_chars::DOUBLE ELSE 0.0 END)
             + -0.22 * (CASE WHEN n_tokens > 0 THEN n_chars::DOUBLE / n_tokens::DOUBLE ELSE 0.0 END)
             + -48.0 * (1.0 / (1.0 + n_tokens::DOUBLE)),
           9) AS quality_logit,
           (  1.0
             + 9.0 * (CASE WHEN n_tokens > 0 THEN n_stop::DOUBLE / n_tokens::DOUBLE ELSE 0.0 END)
             + -7.0 * (CASE WHEN n_chars > 0 THEN n_punct::DOUBLE / n_chars::DOUBLE ELSE 0.0 END)
             + -0.22 * (CASE WHEN n_tokens > 0 THEN n_chars::DOUBLE / n_tokens::DOUBLE ELSE 0.0 END)
             + -48.0 * (1.0 / (1.0 + n_tokens::DOUBLE))
           ) >= 0.0 AS keep
    FROM f
    """,
)
def quality_model_scores(spark, sf_dir):
    """Model-based quality filtering (curation.quality_lr_score): linear
    classifier over exact-integer-derived features, folded into the scan
    as one codegen map pass. The oracle recomputes the logit with the
    IDENTICAL evaluation order — all features are ratios of exact ints and
    IEEE arithmetic is exactly rounded, so the doubles match bit-for-bit
    (the registry's no-transcendentals discipline)."""
    from spider_spark import curation

    return curation.quality_lr_score(T(spark, sf_dir, "documents"))


@q(
    "corpus_export_manifest",
    f"""
    WITH s AS (SELECT doc_id, text,
                      ({textops.hash60_sql("'shard:' || doc_id::VARCHAR")}) % 8 AS shard
               FROM documents)
    SELECT shard::INT AS shard,
           count(*) AS n_docs,
           sum(len({_SQL_TOKENS})::BIGINT)::BIGINT AS n_tokens,
           sum(strlen(text)::BIGINT)::BIGINT AS n_bytes,
           min(doc_id) AS min_id,
           max(doc_id) AS max_id
    FROM s GROUP BY shard
    """,
)
def corpus_export_manifest(spark, sf_dir):
    """Deterministic sharded corpus export (tables.export_shards): the
    write actually happens — one repartition(shard) shuffle routes every
    document to its writer task, hash order fixes within-shard layout —
    and the returned manifest is computed from the files READ BACK, so
    green here certifies the sink roundtrip, not just the plan. The
    oracle recomputes shard assignment + stats from the raw table (hash60
    is 60-bit positive, so DuckDB's % equals Spark's pmod). The outer
    ``::BIGINT`` on the oracle's sums matters: DuckDB widens sum(BIGINT)
    to HUGEINT, which pandas-backed hashers render as float
    (``262144.0`` vs Spark's ``262144``) — numerically equal, textually
    different (driver r04 hash_match:false, judge-diagnosed).

    Driver-re-execution robustness: the manifest is fully materialized
    (eager localCheckpoint + count) BEFORE the export tempdir is removed,
    so any later re-collect replays from checkpointed blocks, never from
    the deleted files."""
    import shutil

    d = T(spark, sf_dir, "documents").select("doc_id", "text")
    out = tempfile.mkdtemp(prefix="export_shards_")
    try:
        manifest = tbl.export_shards(d, out, n_shards=8).localCheckpoint(eager=True)
        manifest.count()  # force every partition into checkpoint storage
        return manifest
    finally:
        shutil.rmtree(out, ignore_errors=True)


