"""All table schemas, fixed and explicit.

The reference is schema-on-write-never (every field a Python str, e.g.
分布式京东商品详情页/client_crawler.py:113-121, 企查查工商数据/qcc.py:78-89);
this engine is the opposite discipline: every table has a pinned StructType
and extraction failures become NULLs + an error column, never swallowed
(reference swallows them: qcc.py:60-62).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# -- input corpus (BASELINE.json: input_hint) --------------------------------
PAGES = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), True),
        StructField("html", BinaryType(), True),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
    ]
)

SEEDS = StructType(
    [
        StructField("url", StringType(), False),
        StructField("depth", IntegerType(), False),
    ]
)

# -- frontier: the URL work queue (reference: Mongo doc
#    {_id: md5(url), url, status, queue_time, depth, pr},
#    mongo_redis_mgr.py:48-55).  Rounds replace wall-clock; discovered_seq
#    pins BFS order under parallelism (SURVEY.md §7 hard part (b)). ---------
FRONTIER = StructType(
    [
        StructField("url", StringType(), False),          # raw, uncanonicalized (parity key, A1)
        StructField("url_md5", StringType(), False),      # reference identifier parity (C14)
        StructField("url_hash", LongType(), False),       # xxhash64(canonical) — seen-set key
        StructField("host", StringType(), True),
        StructField("depth", IntegerType(), False),
        StructField("status", StringType(), False),       # new | done | failed
        StructField("discovered_round", IntegerType(), False),
        StructField("fetched_round", IntegerType(), True),
        StructField("discovered_seq", LongType(), False), # global BFS total order
        StructField("inlink_count", LongType(), False),   # Redis counter analog (mongo_redis_mgr.py:43-47)
        StructField("priority", DoubleType(), False),     # PageRank-refreshed (A6, done right)
        StructField("attempt", IntegerType(), False),     # retry budget (MAX_PAGE_TRIED, client_crawler.py:362)
    ]
)

# -- link graph (reference: urlpr docs, mongo_redis_mgr.py:66-74) -----------
LINKS = StructType(
    [
        StructField("src", StringType(), False),
        StructField("dst", StringType(), False),
        StructField("pos", IntegerType(), False),  # position in page (determinism)
    ]
)

# -- broadcast host policy (politeness A12 + robots A13) ---------------------
HOST_POLICY = StructType(
    [
        StructField("host", StringType(), False),
        StructField("crawl_delay", DoubleType(), False),
        StructField("robots_allow", ArrayType(StringType()), False),
        StructField("robots_deny", ArrayType(StringType()), False),
        StructField("host_budget", IntegerType(), False),  # max fetches/round; <0 = unlimited
    ]
)

# -- extracted items (qcc company struct, qcc.py:78-89; FIXTURES.md §5) ------
QCC_COMPANY = StructType(
    [
        StructField("company_name", StringType(), True),
        StructField("registered_capital", StringType(), True),
        StructField("contributed_capital", StringType(), True),
        StructField("management_forms", StringType(), True),
        StructField("established_data", StringType(), True),
        StructField("Organization_Number", StringType(), True),
        StructField("address", StringType(), True),
        StructField("business_scope", StringType(), True),
    ]
)

ITEMS = StructType(
    [
        StructField("url", StringType(), False),
        StructField("url_md5", StringType(), False),
        StructField("fetched_round", IntegerType(), False),
        StructField("title", StringType(), True),
        StructField("text", StringType(), True),        # byte-parity extraction target
        StructField("company", QCC_COMPANY, True),
        StructField("error", StringType(), True),       # extraction errors are data, not pass
    ]
)

# -- per-round lineage + counters (north_rule: per-partition fetch lineage) --
FETCH_LOG = StructType(
    [
        StructField("round", IntegerType(), False),
        StructField("partition_id", IntegerType(), False),
        StructField("host", StringType(), True),
        StructField("n_claimed", LongType(), False),
        StructField("n_fetched", LongType(), False),
        StructField("n_missed", LongType(), False),
    ]
)

# -- partitioned Bloom seen-set segments (north_rule) ------------------------
SEEN_SEGMENTS = StructType(
    [
        StructField("bucket", IntegerType(), False),
        StructField("filter", BinaryType(), False),
        StructField("n_items", LongType(), False),
    ]
)

# -- proxy-pool resource table (ProxyPool/proxypool/db.py) -------------------
PROXY_POOL = StructType(
    [
        StructField("proxy", StringType(), False),
        StructField("score", IntegerType(), False),
    ]
)
