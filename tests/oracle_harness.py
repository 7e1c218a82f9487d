"""Local replica of the driver's Spark-vs-DuckDB comparison.

Runs a queries()[name] DataFrame and the matching oracle_sql()[name] on the
same sf dir, compares row count, column names, and an order-insensitive
value representation (rows sorted by their string form, columns sorted by
name). Used by tests/test_oracle_parity.py and for fast iteration.
"""

from __future__ import annotations

import math
from typing import Any

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(v: Any) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision — parity must be exact
    if isinstance(v, bool):
        return str(v)
    return str(v)


def canonical_rows(cols: list[str], rows: list[tuple]) -> list[tuple[str, ...]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> dict:
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    res = con.execute(sql)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()

    report: dict = {
        "rows_spark": len(s_rows),
        "rows_oracle": len(d_rows),
        "cols_spark": sorted(s_cols),
        "cols_oracle": sorted(d_cols),
    }
    report["count_match"] = len(s_rows) == len(d_rows)
    report["schema_match"] = sorted(s_cols) == sorted(d_cols)
    if report["count_match"] and report["schema_match"]:
        a = canonical_rows(s_cols, s_rows)
        b = canonical_rows(d_cols, d_rows)
        report["values_match"] = a == b
        if not report["values_match"]:
            diff = [(x, y) for x, y in zip(a, b) if x != y]
            report["first_diffs"] = diff[:5]
    else:
        report["values_match"] = False
    report["ok"] = bool(report["count_match"] and report["schema_match"] and report["values_match"])
    return report
