"""Executor-level scaling evidence: N vs 4N REAL executor JVMs.

`bench_scaling.py` measures the sanctioned local[k] substitute (N vs 4N
cores in one JVM). This script runs the SAME measured job — identical
code, identical Spark-generated input — under the north rule's literal
deployment shape: ``spark-submit --py-files spider_spark.zip`` against a
``local-cluster[n_executors, cores_per_executor, mem_mb]`` master.

local-cluster is Spark's one-box standalone cluster: it launches one
Worker JVM + one Executor JVM per slot, so the N→4N comparison crosses
everything that distinguishes executors from threads — private heaps and
GC, private python-worker pools, broadcast re-materialization per
executor, and netty block transfer for every shuffle/broadcast between
JVMs. The only cluster ingredient missing is the NIC.

Usage (the pair the ladder records):

    python bench_cluster.py zip                       # build the zip once
    SPARK_SUBMIT_OPTS= spark-submit --driver-memory 16g \
        --py-files /tmp/spider_spark_submit.zip,bench_scaling.py \
        bench_cluster.py 2 2 8192                     # N  = 2 executors
    ... bench_cluster.py 8 2 8192                     # 4N = 8 executors

Per-executor size (cores, memory) is held constant across the pair —
exactly how a real cluster scales out — so total resources grow 4× with
executor count. Prints one JSON line: the bench_scaling payload plus the
executor topology. Efficiency = tput(4N) / (4 · tput(N)).

Plain ``python bench_cluster.py N C MEM`` also works: get_spark ships the
package via addPyFile (the same mechanism --py-files uses).
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from bench_scaling import run_bench  # noqa: E402
from spider_spark.session import get_spark  # noqa: E402

ZIP_PATH = "/tmp/spider_spark_submit.zip"


def build_zip() -> str:
    """Package spider_spark for --py-files (what CI/cron would do once)."""
    import zipfile

    import spider_spark

    pkg_dir = os.path.dirname(os.path.abspath(spider_spark.__file__))
    with zipfile.ZipFile(ZIP_PATH, "w") as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.join("spider_spark",
                                                os.path.relpath(full, pkg_dir)))
    return ZIP_PATH


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "zip":
        print(build_zip())
        return
    n_exec = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    mem_mb = int(sys.argv[3]) if len(sys.argv) > 3 else 8192
    total = n_exec * cores

    os.environ.setdefault("SPIDER_SPARK_DRIVER_MEM", "16g")
    spark = get_spark(
        app_name=f"cluster_{n_exec}x{cores}",
        master=f"local-cluster[{n_exec},{cores},{mem_mb}]",
        shuffle_partitions=int(os.environ.get("BENCH_SHUFFLE_MULT", "3")) * total,
        extra_conf={
            # same rationale as bench_scaling: AQE re-plan barriers cost more
            # than they save on a many-small-shuffles iterative job
            "spark.sql.adaptive.enabled": os.environ.get("BENCH_AQE", "false"),
            "spark.executor.memory": f"{mem_mb}m",
            "spark.executor.cores": str(cores),
        },
    )
    out = run_bench(spark)
    print(json.dumps({
        "executors": n_exec, "cores_per_executor": cores,
        "executor_mem_mb": mem_mb, "total_cores": total, **out,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
