"""CLI: run every oracle-backed query against DuckDB at a given sf dir.

    python tests/run_oracle_check.py [sf_dir] [name ...]

Prints one line per query; nonzero exit if any mismatch.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from spider_spark.session import get_spark  # noqa: E402
from spider_spark.queries import ORACLES, QUERIES  # noqa: E402
from tests.oracle_harness import compare, duck_connection  # noqa: E402


def main() -> int:
    args = [a for a in sys.argv[1:]]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.001"
    names = [a for a in args if "/" not in a] or list(ORACLES)

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    con = duck_connection(sf_dir)
    failed = []
    for name in names:
        t0 = time.time()
        try:
            if name not in ORACLES:
                df = QUERIES[name](spark, sf_dir)
                n = df.count()
                print(f"{name:28s} rows-only  rows={n}  ({time.time()-t0:.1f}s)")
                continue
            rep = compare(QUERIES[name](spark, sf_dir), con, ORACLES[name])
            status = "OK " if rep["ok"] else "FAIL"
            print(
                f"{name:28s} {status} rows={rep['rows_spark']}/{rep['rows_oracle']}"
                f" schema={rep['schema_match']} values={rep['values_match']}"
                f" ({time.time()-t0:.1f}s)"
            )
            if not rep["ok"]:
                failed.append(name)
                if rep.get("first_diffs"):
                    for a, b in rep["first_diffs"]:
                        print(f"    spark : {a}\n    oracle: {b}")
                elif not rep["schema_match"]:
                    print(f"    spark cols : {rep['cols_spark']}")
                    print(f"    oracle cols: {rep['cols_oracle']}")
        except Exception as exc:  # noqa: BLE001
            failed.append(name)
            print(f"{name:28s} ERROR {type(exc).__name__}: {exc}")
    print(f"\n{len(names) - len(failed)}/{len(names)} ok; failed: {failed}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
