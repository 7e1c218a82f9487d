"""spider_spark — a from-scratch PySpark-native crawl/analytics engine.

Reimplements the query and data-processing capabilities of the reference
crawler collection (mujinveil/Spider) as idiomatic Spark dataflow:

- batch-iterative URL frontier over snapshot-versioned tables
  (reference: 分布式京东商品详情页/mongo_redis_mgr.py — Mongo queue + Redis seen-set)
- partitioned Bloom-filter URL-seen set keyed by xxhash64(canonical_url)
- per-host politeness budgets + robots allow/deny via a broadcast policy table
- vectorized pandas/Arrow UDF extraction with byte-identical text parity
- PageRank frontier reprioritization as a between-rounds DataFrame job
  (reference: master.py:125-149, implemented correctly)
- secondary operator families: proxy-pool scoring (ProxyPool/proxypool/db.py),
  kline rolling windows (Kline_analyze.py:128-161), JSON field-map projections
  (weibo/zhihuuser spiders).

Nothing in here ports reference code; the reference defines WHAT is computed
(SURVEY.md), this package decides HOW, Spark-first.
"""

__version__ = "0.1.0"

from spider_spark.crawl import CrawlSummary, crawl  # noqa: E402,F401
from spider_spark.round import CrawlConfig  # noqa: E402,F401

__all__ = ["CrawlConfig", "CrawlSummary", "crawl", "__version__"]
