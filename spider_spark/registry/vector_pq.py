"""PQ / ADC approximate nearest neighbor — registry tier split out of the former
monolithic queries.py (round 4). Conventions live in
spider_spark/registry/__init__.py; enumeration order is preserved by
the import order there."""

from __future__ import annotations

from pyspark.sql import functions as F
from spider_spark import vectorops
from spider_spark.registry._base import T, q


# =====================================================================
# PQ / ADC approximate nearest neighbor — spider_spark.vectorops
# =====================================================================

def _pq_plant_codebooks() -> list[list[list[float]]]:
    """Deterministic planted codebooks: cb[j][c][d] = ((j·8+c)·4+d) % 11 − 5.
    Mod 11 keeps all 8 entries of a subspace distinct (4·Δc ≡ 0 mod 11 has
    no solution for 0 < Δc < 8), so L2-argmin encoding is unambiguous."""
    return [
        [[float(((j * 8 + c) * 4 + d) % 11 - 5) for d in range(4)] for c in range(8)]
        for j in range(4)
    ]


@q(
    "ann_pq_adc_topk",
    """
    WITH ids AS (SELECT vec_id AS i FROM embeddings),
    qs AS (SELECT vec_id AS q FROM embeddings WHERE vec_id % 97 = 0),
    dims AS (SELECT j, d FROM generate_series(0, 3) t1(j)
             CROSS JOIN generate_series(0, 3) t2(d)),
    scores AS (
      SELECT q, i,
             sum( (((q * 3 + (j * 4 + d)) % 9) - 4)::DOUBLE
                * ((((j * 8 + ((i + j) % 8)) * 4 + d) % 11) - 5)::DOUBLE ) AS score
      FROM ids CROSS JOIN qs CROSS JOIN dims
      GROUP BY q, i),
    ranked AS (
      SELECT q AS query_id, i AS neighbor_id,
             row_number() OVER (PARTITION BY q ORDER BY score DESC, i) AS rank,
             score
      FROM scores)
    SELECT query_id, neighbor_id, rank::INT AS rank, score
    FROM ranked WHERE rank <= 5
    """,
)
def ann_pq_adc_topk(spark, sf_dir):
    """Product-quantization ANN (vectorops.pq_encode/pq_topk_encoded —
    Jégou et al. TPAMI'11): the corpus is compressed to m=4 codes/vector
    and top-k runs on ADC lookup sums, never rereading raw floats — the
    32-64× scan-size cut that makes vector search viable at 100 TB (and
    composes with IVF list-probing). The fixture plants zero-quantization-
    error vectors (exact codebook concatenations), so the REAL encoder
    (L2 argmin, codegen) must recover every planted code and the ADC
    ranking is exactly the true inner-product ranking the oracle computes
    from the closed-form plants. Trained-codebook recall is contract-
    tested in pytest (pq_recall_at_k ≥ floor); this query certifies the
    distributed encode+score path value-level."""
    cbs = _pq_plant_codebooks()
    e = T(spark, sf_dir, "embeddings").select("vec_id")
    vid = F.col("vec_id")
    corpus_vec = F.concat(
        *[
            F.element_at(
                F.array(*[
                    F.array(*[F.lit(x) for x in cbs[j][c]]).cast("array<double>")
                    for c in range(8)
                ]),
                ((vid + j) % 8 + 1).cast("int"),
            )
            for j in range(4)
        ]
    )
    corpus = e.select(vid, corpus_vec.alias("embedding"))
    codes = vectorops.pq_encode(corpus, cbs)
    qvec = F.transform(
        F.sequence(F.lit(0), F.lit(15)),
        lambda d: ((vid * 3 + d) % 9 - 4).cast("double"),
    )
    queries_df = e.where(vid % 97 == 0).select(vid, qvec.alias("embedding"))
    return vectorops.pq_topk_encoded(codes, queries_df, cbs, k=5)


@q(
    "ann_pq_refined_topk",
    """
    WITH ids AS (SELECT vec_id AS i FROM embeddings),
    qs AS (SELECT vec_id AS q FROM embeddings WHERE vec_id % 97 = 0),
    dims AS (SELECT j, d FROM generate_series(0, 3) t1(j)
             CROSS JOIN generate_series(0, 3) t2(d)),
    terms AS (
      SELECT q, i,
             (((q * 3 + (j * 4 + d)) % 9) - 4)::DOUBLE AS qx,
             ((((j * 8 + ((i + j) % 8)) * 4 + d) % 11) - 5)::DOUBLE AS vx
      FROM ids CROSS JOIN qs CROSS JOIN dims),
    scores AS (
      SELECT q, i, sum(qx * vx) AS ip,
             sum(qx * vx) / (sqrt(sum(qx * qx)) * sqrt(sum(vx * vx))) AS cos
      FROM terms GROUP BY q, i),
    short AS (
      SELECT q, i, cos,
             row_number() OVER (PARTITION BY q ORDER BY ip DESC, i) AS adc_rank
      FROM scores),
    reranked AS (
      SELECT q AS query_id, i AS neighbor_id,
             row_number() OVER (PARTITION BY q ORDER BY cos DESC, i) AS rank,
             cos AS score
      FROM short WHERE adc_rank <= 100)
    SELECT query_id, neighbor_id, rank::INT AS rank, score
    FROM reranked WHERE rank <= 5
    """,
)
def ann_pq_refined_topk(spark, sf_dir):
    """PQ refine (vectorops.pq_topk_refined — the FAISS IVFPQ+refine
    pattern): ADC shortlists the top-100 per query over the compressed
    codes, then ONLY those rows fetch raw vectors for an exact cosine
    re-rank. Same zero-quantization-error plants as ann_pq_adc_topk, so
    the oracle replays the exact two-stage ranking in closed form:
    IP-ordered shortlist membership, then cosine re-rank inside it — the
    shortlist join, the vector refetch join, and both windows are all
    value-checked (every sum is integer-exact in doubles, and the cosine
    division/sqrt tree is written identically on both engines)."""
    cbs = _pq_plant_codebooks()
    e = T(spark, sf_dir, "embeddings").select("vec_id")
    vid = F.col("vec_id")
    corpus_vec = F.concat(
        *[
            F.element_at(
                F.array(*[
                    F.array(*[F.lit(x) for x in cbs[j][c]]).cast("array<double>")
                    for c in range(8)
                ]),
                ((vid + j) % 8 + 1).cast("int"),
            )
            for j in range(4)
        ]
    )
    corpus = e.select(vid, corpus_vec.alias("embedding"))
    codes = vectorops.pq_encode(corpus, cbs)
    qvec = F.transform(
        F.sequence(F.lit(0), F.lit(15)),
        lambda d: ((vid * 3 + d) % 9 - 4).cast("double"),
    )
    queries_df = e.where(vid % 97 == 0).select(vid, qvec.alias("embedding"))
    return vectorops.pq_topk_refined(
        corpus, codes, queries_df, cbs, k=5, shortlist=100
    )


