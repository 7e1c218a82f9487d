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

# Enumeration order (driver verification window) is owned by
# spider_spark.queries._VERIFY_FIRST — queries with no green driver
# record yet enumerate first.


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship_entry(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
