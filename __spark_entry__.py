"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship crawl over a deterministic link graph derived from
               the sf0.001 documents table (full engine: frontier rounds,
               politeness, Bloom seen-set, snapshot/resume).
queries()    — one entry per implemented operator from SURVEY.md §2 plus the
               training-data-pipeline tier (dedup/similarity/text/multimodal).
oracle_sql() — DuckDB-runnable ANSI SQL equivalents; see
               spider_spark/queries.py for the cross-engine determinism
               conventions (decimal sums, shared md5-prefix hash, rounding).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from spider_spark.queries import ORACLES, QUERIES, flagship_entry

# Enumeration order: the driver's per-round verification window is finite, so
# queries with no green driver record yet come first — the 26 never-checked
# entries plus ann_lsh_topk (whose only driver record predates its oracle).
# All other queries follow in registration order.
_PRIORITY = [
    "ann_lsh_topk",
    "cms_heavy_hitters",
    "media_frame_sample",
    "host_kcore",
    "semdedup_flags",
    "tfidf_sim_join",
    "sample_weighted_length",
    "vocab_oov_rate",
    "pack_sequences",
    "dedup_incremental",
    "stream_window_rates",
    "decontaminate_bloom_gate",
    "quality_model_scores",
    "corpus_export_manifest",
    "doc_length_quantiles",
    "bpe_learn_merges",
    "ann_pq_adc_topk",
    "ann_pq_refined_topk",
    "feed_seeds",
    "robots_asof_policy",
    "range_join_events",
    "revisit_plan",
    "temperature_mix",
    "conditional_refetch",
    "politeness_schedule",
    "focused_priority",
    "epoch_shuffle",
]


def _ordered(mapping: dict) -> dict:
    head = {k: mapping[k] for k in _PRIORITY if k in mapping}
    tail = {k: v for k, v in mapping.items() if k not in head}
    return {**head, **tail}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship_entry(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    return _ordered(dict(ORACLES))
