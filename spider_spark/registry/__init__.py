"""Driver-contract query registry: every operator claimed in SURVEY.md §2
(plus the training-data-pipeline tier) as a (Spark callable, DuckDB oracle
SQL) pair over the driver's parquet tables.

Contract (README / __spark_entry__.py): each Spark query and its oracle
produce identical row counts, schemas (column names), and order-insensitive
value hashes at sf0.01. Conventions that make cross-engine hashes match:

- every computed column aliased identically on both sides;
- money aggregates summed as DECIMAL (exact, order-independent) and cast to
  DOUBLE at the end;
- doubles from windowed float sums rounded to 6-9 places (segment-tree vs
  sequential summation differ in the last ulp);
- ratios derived only from exact integers (bit-identical division);
- all hashing via the shared md5-prefix hash60 (textops.hash60 /
  textops.hash60_sql);
- timestamps rendered with date_format/strftime to sidestep type gaps.

Queries whose semantics SQL cannot express (the iterative crawl, approximate
LSH ANN) return None oracles → the driver records rows-only checks — except
crawl_docs, whose BFS fixpoint IS expressible as a recursive CTE, giving the
crawl engine itself a full value-level oracle.
"""

from __future__ import annotations

from spider_spark.registry._base import ORACLES, QUERIES, T, q  # noqa: F401

# One import per tier, in the original monolith's section order — the
# @q decorators register on import, so THIS list is the enumeration
# order the rotation below rearranges.
from spider_spark.registry import (  # noqa: E402,F401
    relational,
    frontier,
    pool,
    kline,
    parse,
    text,
    dedup,
    vector,
    media,
    crawl,
    webindex,
    curation,
    corpus_stats,
    tokenize,
    vector_pq,
    feeds,
    joins,
    crawl_sched,
)

from spider_spark.registry.crawl import flagship_entry  # noqa: F401

_MODULES = [relational, frontier, pool, kline, parse, text, dedup, vector, media, crawl, webindex, curation, corpus_stats, tokenize, vector_pq, feeds, joins, crawl_sched]


# =====================================================================
# Driver-verification window rotation
# =====================================================================
# The correctness driver verifies the FIRST 50 registry entries per round.
# Registration above follows the module's topical layout; the driver-facing
# order is rotated here so queries with no green driver record yet come
# first. Round-4 window: the 26 entries never checked in any
# CORRECTNESS_r0{1,2,3}.json, plus ann_lsh_topk (its only driver record is
# r01 `no_oracle`, before the value-level oracle existed), plus this
# round's additions (media_real_decode / media_real_resize — the vendored
# real image codec). Names listed but not registered are skipped;
# everything else keeps its original relative order, so slots 30-50 fall
# to the r01-verified topical head (q1/q3/q5, crawl_docs, dedup tier, …) —
# refreshing the OLDEST green records rather than r03's fresh ones.
_VERIFY_FIRST: list[str] = [
    # --- only driver record is a pre-oracle failure (r01 no_oracle) ---
    "ann_lsh_topk",
    # --- never driver-verified (r01 ∪ r02 ∪ r03 miss), relative order ---
    "cms_heavy_hitters", "media_frame_sample", "host_kcore", "semdedup_flags",
    "tfidf_sim_join", "sample_weighted_length", "vocab_oov_rate",
    "pack_sequences", "dedup_incremental", "stream_window_rates",
    "decontaminate_bloom_gate", "quality_model_scores",
    "corpus_export_manifest", "doc_length_quantiles", "bpe_learn_merges",
    "ann_pq_adc_topk", "ann_pq_refined_topk", "feed_seeds",
    "robots_asof_policy", "range_join_events", "revisit_plan",
    "temperature_mix", "conditional_refetch", "politeness_schedule",
    "focused_priority", "epoch_shuffle",
    # --- round-4 additions: real image codec, no driver record yet ---
    "media_real_decode", "media_real_resize",
]


def _rotate_registry() -> None:
    front = [n for n in _VERIFY_FIRST if n in QUERIES]
    rest = [n for n in QUERIES if n not in set(front)]
    order = front + rest
    for d in (QUERIES, ORACLES):
        snap = {k: d[k] for k in order if k in d}
        d.clear()
        d.update(snap)


_rotate_registry()
