"""Unit tests for the training-data-pipeline operators: multimodal plumbing,
vector search invariants, pool semantics, dedup structure."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from spider_spark import dedup, media, pool, vectorops

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


# ---------------------------------------------------------------- multimodal
def test_media_meta_fake_decoder(spark, docs):
    m = docs.select(
        F.col("doc_id").alias("media_id"), F.encode("text", "UTF-8").alias("payload")
    )
    out = media.extract_media_meta(m, decoder=media.fake_decoder).collect()
    assert len(out) == docs.count()
    for r in out[:20]:
        assert r.error is None
        assert r.format == "fake"
        assert 64 <= r.width < 576 and 64 <= r.height < 576
        assert r.n_bytes > 0 and len(r.sha256_prefix) == 16


def test_media_meta_decode_error_becomes_data(spark, docs):
    m = docs.limit(5).select(
        F.col("doc_id").alias("media_id"), F.encode("text", "UTF-8").alias("payload")
    )
    out = media.extract_media_meta(m, decoder=media.decode_image).collect()
    assert all(r.error is not None and "NotImplementedError" in r.error for r in out)
    assert all(r.n_bytes > 0 for r in out)  # stat columns still computed


def test_frame_sample_plan(spark, docs):
    m = docs.limit(3).select(
        F.col("doc_id").alias("media_id"), F.encode("text", "UTF-8").alias("payload")
    )
    frames = media.frame_sample_plan(m, every_n=4).collect()
    assert len(frames) > 3
    assert all(r.frame_no % 4 == 0 for r in frames)


# -------------------------------------------------------------------- vector
def test_brute_force_topk_invariants(spark, emb):
    out = vectorops.brute_force_topk(emb, emb.where(F.col("vec_id") < 3), k=4).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
        assert r.neighbor_id != r.query_id
    assert set(by_q) == {0, 1, 2}
    for rows in by_q.values():
        assert sorted(r.rank for r in rows) == [1, 2, 3, 4]


def test_lsh_topk_subset_of_bucket(spark, emb):
    out = vectorops.lsh_topk(emb, emb.where(F.col("vec_id") < 3), k=3, n_bits=2)
    rows = out.collect()
    assert all(r.rank <= 3 for r in rows)


# ---------------------------------------------------------------------- pool
def test_pool_add_validates_and_dedups(spark):
    p0 = spark.createDataFrame([("1.2.3.4:80", 50)], "proxy string, score int")
    new = spark.createDataFrame(
        [("1.2.3.4:80",), ("5.6.7.8:3128",), ("not-a-proxy",)], "proxy string"
    )
    out = {r.proxy: r.score for r in pool.add(p0, new).collect()}
    assert out == {"1.2.3.4:80": 50, "5.6.7.8:3128": pool.INITIAL_SCORE}


def test_pool_promote_and_evict(spark):
    p0 = spark.createDataFrame(
        [("a:1", 1), ("b:2", 50), ("c:3", 90)], "proxy string, score int"
    )
    failed = spark.createDataFrame([("a:1",)], "proxy string")
    ok = spark.createDataFrame([("c:3",)], "proxy string")
    out = {r.proxy: r.score for r in pool.promote(pool.decrease(p0, failed), ok).collect()}
    assert out == {"b:2": 50, "c:3": pool.MAX_SCORE}  # a:1 evicted at score 0


# --------------------------------------------------------------------- dedup
def test_exact_dupes_survivor_is_min_id(spark, docs):
    d = docs.select("doc_id", "text")
    doubled = d.unionByName(
        d.select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    )
    out = dedup.exact_dupes(doubled).collect()
    assert len(out) == 2 * d.count()
    assert all(r.survivor_id == r.doc_id % 100000 for r in out)


def test_simhash_blocking_equals_quadratic(spark, docs):
    """Chunk-blocked pair join must equal the brute-force answer (pigeonhole
    guarantees recall for hamming ≤ 3 over 4 chunks)."""
    small = docs.where(F.col("doc_id") < 80)
    blocked = {(r.a_id, r.b_id, r.hamming) for r in dedup.simhash_pairs(small, 3).collect()}
    sh = dedup.simhash_table(small)
    a = sh.select(F.col("doc_id").alias("a_id"), F.col("simhash").alias("ha"))
    b = sh.select(F.col("doc_id").alias("b_id"), F.col("simhash").alias("hb"))
    brute = {
        (r.a_id, r.b_id, r.hamming)
        for r in a.join(b, F.col("a_id") < F.col("b_id"))
        .select(
            "a_id", "b_id",
            F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).cast("long").alias("hamming"),
        )
        .where(F.col("hamming") <= 3)
        .collect()
    }
    assert blocked == brute


def test_pool_refill_caps(spark):
    p0 = spark.createDataFrame([("1.1.1.1:80", 50)], "proxy string, score int")
    src = spark.createDataFrame(
        [(f"2.2.2.{i}:80",) for i in range(10)], "proxy string"
    )
    out = pool.refill(p0, src, cap=4)
    assert out.count() == 4
    full = pool.refill(out, src, cap=4)
    assert full.count() == 4  # at capacity: no-op


def test_transliterate_is_import_gated(spark):
    from spider_spark import textops
    import pytest as _pytest

    with _pytest.raises(NotImplementedError, match="pypinyin"):
        textops.transliterate_udf()


def test_pool_pick_random_deterministic(spark):
    p0 = spark.createDataFrame(
        [("a:1", 100), ("b:2", 100), ("c:3", 40)], "proxy string, score int"
    )
    a = pool.pick_random(p0, seed=7).collect()[0].proxy
    b = pool.pick_random(p0, seed=7).collect()[0].proxy
    assert a == b and a in {"a:1", "b:2"}  # prefers MAX_SCORE members
