"""Operator correctness vs the DuckDB oracle (SURVEY.md §5.1) at sf0.001.

A fast representative subset runs in CI; the full 38-pair sweep is
tests/run_oracle_check.py (and the driver runs everything at sf0.01).
"""

from __future__ import annotations

import pytest

from spider_spark.queries import ORACLES, QUERIES
from tests.oracle_harness import compare, duck_connection

SF_DIR = "/root/testdata/sf0.001"

# one per operator family: agg, join+topk, window-pop, rolling, scalar/hash,
# text, minhash dedup, simhash dedup, ANN, multimodal, pagerank
SUBSET = [
    "q1_pricing_summary",
    "q3_shipping_topk",
    "per_host_topk",
    "rolling_mean_ma5",
    "relative_date_norm",
    "md5_ids",
    "lang_id",
    "doc_fingerprints",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_topk",
    "media_meta",
    "pagerank_ranks",
    "qcc_xpath_fields",   # round 2: DOM XPath structural extraction
    "gold_cross_volume",  # round 2: composed window screen
    "curate_corpus",      # round 2: full composed curation pipeline
    "line_dedup_boilerplate",  # round 2: cross-doc line dedup
    "hits_scores",        # round 2: HITS hub/auth over the link graph
    "trustrank_scores",   # round 2: seeded-teleport spam demotion
    "redirect_resolve",   # round 2: pointer-doubling alias collapse
    "blocklist_gate",     # round 2: UT1-style domain+term blocklist
    "content_sniff",      # round 2: magic-byte vs declared Content-Type
    "registrable_domains", # round 2: PSL eTLD+1 longest-suffix match
    "fair_share_budgets",  # round 2: water-filling round budget split
]


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", SUBSET)
def test_oracle_parity(spark, duck, name):
    rep = compare(QUERIES[name](spark, SF_DIR), duck, ORACLES[name])
    assert rep["ok"], {k: v for k, v in rep.items() if k != "first_diffs"} | {
        "first_diffs": rep.get("first_diffs", [])[:2]
    }


def test_rows_only_queries_run(spark):
    """Queries without oracles must still run and return sane rows."""
    df = QUERIES["ann_lsh_topk"](spark, SF_DIR)
    rows = df.collect()
    assert len(rows) > 0
    assert {r["rank"] for r in rows} <= {1, 2, 3, 4, 5}


def test_registry_contract():
    assert set(ORACLES) <= set(QUERIES)
    # round 2: every query carries a value-level oracle — even the
    # approximate ANN (its multi-probe config reaches full recall on the
    # fixture, so the exact top-k SQL is its oracle)
    assert set(QUERIES) == set(ORACLES)
