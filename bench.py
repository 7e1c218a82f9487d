"""Headline benchmark (driver contract): run the flagship queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and print ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The north-star metric (BASELINE.json) is URLs fetched+extracted/sec, so the
crawl flagship reports its throughput alongside per-query wall times.
Optional env:
    SPARK_GRAFT_SF_DIR   parquet dir (default /root/testdata/sf0.1)
    SPARK_GRAFT_CPUS     core count (default 32)
    BENCH_QUERIES        comma-separated subset override
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from spider_spark.session import get_spark  # noqa: E402


HEADLINE = [
    "crawl_docs",            # the flagship: full frontier engine
    "q1_pricing_summary",
    "q3_shipping_topk",
    "q5_nation_revenue",
    "per_host_topk",
    "first_wins_dedup",
    "rolling_mean_ma5",
    "sessionize",
    "lang_id",
    "quality_scores",
    "doc_fingerprints",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "dedup_embedding_bucketed",
    "ann_topk",
    "ann_lsh_topk",
    "media_meta",
    "pagerank_ranks",
    "qcc_xpath_fields",      # round 2: DOM XPath extraction over messy html
    "css_select_fields",     # round 2: CSS-selector extraction
    "gold_cross_volume",     # round 2: composed window screen
    "zhihu_user_items",      # round 2: nested-array item family
    "dedup_clusters",        # round 2: CC survivor resolution
    "bm25_topk",             # round 2: BM25 keyword retrieval
    "ann_ivf_topk",          # round 2: IVF centroid-partitioned ANN
    "decontaminate_overlap",  # round 2: train/eval 5-gram decontamination
    "repetition_scores",     # round 2: Gopher-style repetition gate
    "sample_stratified_lang",  # round 2: deterministic stratified sampling
    "line_dedup_boilerplate",  # round 2: cross-doc boilerplate strip
    "curate_corpus",         # round 2: composed end-to-end curation pipeline
    "main_content_extract",  # round 2: readability-lite boilerplate removal
    "lm_perplexity_scores",  # round 2: CCNet-style unigram-LM quality signal
    "dup_passage_spans",     # round 2: passage-level duplicate spans
    "tfidf_top_terms",       # round 2: per-doc TF-IDF keywords
    "anchor_text_agg",       # round 2: DOM anchor-text target profiles
    "hll_distinct_tokens",   # round 2: HLL distinct sketch telemetry
    "surt_keys",             # round 2: SURT url keys (archive-index keying)
    "cdx_index",             # round 2: CDX capture index build
    "url_trap_scores",       # round 2: URL-shape crawler-trap scoring
    "host_graph_rank",       # round 2: host-aggregated PageRank
    "shingle_containment",   # round 2: asymmetric containment dedup
    "recrawl_priority",      # round 2: change-rate recrawl tiers
    "cdx_lookup",            # round 2: pruned CDX sink + lookup roundtrip
    "dsir_weights",          # round 2: DSIR importance weighting
    "hits_scores",           # round 2: HITS hub/auth link analysis
    "trustrank_scores",      # round 2: seeded-teleport spam demotion
    "redirect_resolve",      # round 2: pointer-doubling alias collapse
    "blocklist_gate",        # round 2: UT1-style domain+term blocklist
    "content_sniff",         # round 2: magic-byte type routing
    "registrable_domains",   # round 2: PSL eTLD+1 extraction
    "fair_share_budgets",    # round 2: water-filling budget split
    "cc_star_contraction",   # round 2: diameter-independent connected components
    "dedup_survivor_flags",  # round 2: pairs→clusters→keep-one pipeline
    "mirror_hosts",          # round 2: Bharat-Broder mirror-host detection
    "content_seen_first",    # round 2: Mercator content-seen gate
    "canonical_collapse",    # round 2: rel=canonical chain collapse
    "url_template_mining",   # round 2: per-host path-template shapes
    "meta_robots_gate",      # round 2: in-page REP directives
    "warc_dedup_roundtrip",  # round 2: revisit-record dedup WARC sink
    "phrase_search",         # round 2: positional-index phrase intersection
    "opic_scores",           # round 2: OPIC cash-propagation priorities
    "sitemap_staleness",     # round 2: lastmod-driven conditional recrawl
    "containment_lsh",       # round 3: LSH-candidate-restricted containment
    "pool_probe_cycle",      # round 3: proxy tester cycle as one pass
    "media_resize",          # round 3: multimodal fit-within resize (map-only)
    "host_triangles",        # round 3: degree-ordered triangle counting
    "bpe_token_counts",      # round 3: GPT-2-style pre-tokenizer budgeting
    "media_frame_sample",    # round 3: frame-sampling explode plumbing
    "host_kcore",            # round 3: k-core decomposition by iterative peel
    "cms_heavy_hitters",     # round 3: count-min sketch heavy hitters
    "semdedup_flags",        # round 3: SemDeDup cluster-scoped semantic dedup
    "tfidf_sim_join",        # round 3: inverted-index TF-IDF similarity join
    "sample_weighted_length",  # round 3: A-ES weighted reservoir sampling
    "vocab_oov_rate",        # round 3: tokenizer-vocabulary coverage
    "pack_sequences",        # round 3: GPT concat-and-chunk packing
    "dedup_incremental",     # round 3: batch-vs-corpus LSH admission
    "stream_window_rates",   # round 3: streaming windows w/ value oracle
    "decontaminate_bloom_gate",  # round 3: Bloom-gated decontamination
    "quality_model_scores",  # round 3: model-based quality classifier
    "corpus_export_manifest",  # round 3: sharded export (real write+readback)
    "conditional_refetch",   # round 3: HTTP 304 revalidation planning
    "politeness_schedule",   # round 3: per-host fetch-slot materialization
    "focused_priority",      # round 3: focused-crawl score propagation
    "epoch_shuffle",         # round 3: histogram-offset global shuffle index
    "media_real_decode",     # round 4: vendored PNG codec, real header decode
    "media_real_resize",     # round 4: pixel-true decode→resize→re-encode
    "media_jpeg_decode",     # round 5: baseline JPEG huffman+IDCT pixel decode
]


def main() -> None:
    from spider_spark.queries import QUERIES

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    names = [
        n for n in os.environ.get("BENCH_QUERIES", ",".join(HEADLINE)).split(",") if n
    ]
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    spark = get_spark(
        app_name="spider_spark_bench",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    # Warm the JVM before measuring (standard JIT-bench practice, same role
    # as JMH warmup iterations): a miniature crawl at sf0.001 compiles the
    # codegen/shuffle/parquet paths the flagship exercises — cold-JVM
    # crawl_docs runs ~1.5x its steady-state time, and a per-round engine
    # should be graded on steady-state rounds, not on one-time JIT cost.
    spark.range(1000).selectExpr("sum(id)").collect()
    if "crawl_docs" in names:
        import tempfile

        from spider_spark.crawl import crawl
        from spider_spark.queries import _doc_pages
        from spider_spark.round import CrawlConfig

        wpages, wseeds, wpolicy, _ = _doc_pages(
            spark, sf_dir.rsplit("sf", 1)[0] + "sf0.001", limit=60
        )
        crawl(spark, tempfile.mkdtemp(prefix="bench_warm_"), wpages, wseeds,
              wpolicy, CrawlConfig(max_rounds=4, use_bloom=False, n_salt=4,
                                   write_coalesce=4, seq_mode="hash"))

    timings: dict[str, float] = {}
    extra: dict[str, float] = {}
    for name in names:
        t0 = time.time()
        df = QUERIES[name](spark, sf_dir)
        # noop sink: forces full evaluation of every column — count() lets
        # column pruning skip the actual work for narrow projections
        df.write.format("noop").mode("overwrite").save()
        n_rows = df.count()
        dt = time.time() - t0
        timings[name] = round(dt, 3)
        if name == "crawl_docs":
            # n_rows = URLs fetched+extracted end-to-end (BASELINE metric)
            extra["crawl_urls"] = n_rows
            extra["crawl_urls_per_sec"] = round(n_rows / dt, 2)
        print(f"# {name}: {dt:.2f}s rows={n_rows}", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": cpus,
        **extra,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
