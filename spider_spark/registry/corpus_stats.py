"""Exact percentile aggregation — corpus length statistics — registry tier split out of the former
monolithic queries.py (round 4). Conventions live in
spider_spark/registry/__init__.py; enumeration order is preserved by
the import order there."""

from __future__ import annotations

from pyspark.sql import functions as F
from spider_spark.registry._base import T, q


# =====================================================================
# Exact percentile aggregation — corpus length statistics
# =====================================================================

@q(
    "doc_length_quantiles",
    """
    SELECT lang,
           count(*) AS n_docs,
           round(quantile_cont(n_chars, 0.5), 6) AS p50,
           round(quantile_cont(n_chars, 0.9), 6) AS p90,
           round(quantile_cont(n_chars, 0.99), 6) AS p99
    FROM documents GROUP BY lang
    """,
)
def doc_length_quantiles(spark, sf_dir):
    """Exact linear-interpolated percentiles of document length per
    language — the length-distribution audit every curation run starts
    from (sequence-packing bin sizing, truncation-loss estimates). Spark's
    exact ``percentile`` and DuckDB's ``quantile_cont`` share the
    index = p·(n−1) + linear-interpolation definition, so the doubles
    match bit-for-bit. At 100 TB you'd swap in approx_percentile
    (t-digest, mergeable partial aggs) — the exact form here IS the
    oracle-checkable baseline that would validate it."""
    d = T(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.percentile("n_chars", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("n_chars", F.lit(0.9)), 6).alias("p90"),
        F.round(F.percentile("n_chars", F.lit(0.99)), 6).alias("p99"),
    )


