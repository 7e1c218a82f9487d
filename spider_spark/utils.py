"""Distributed helpers.

``with_global_rank`` solves SURVEY.md §7 hard part (b): crawl-order parity
needs a deterministic *global* total order over newly discovered URLs, but a
``row_number()`` window with no PARTITION BY collapses to a single task —
a non-starter at 10^10 rows. Instead:

1. range-repartition on the order key (partition p holds smaller keys than
   partition p+1),
2. bake ``spark_partition_id()`` into the rows and eagerly localCheckpoint —
   ONE materialization, so no job-to-job layout drift (AQE may re-plan
   between jobs; with the pid persisted in the data it cannot matter),
3. per-partition counts (K integers to the driver, never rows) → prefix-sum
   offsets,
4. rank = windowed row_number within each pid partition + offset.

The per-pid window is balanced by construction (range partitions), so no
skew; everything scales linearly with data volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def with_global_rank(
    df: DataFrame, order_cols: list[str], out_col: str, num_partitions: int | None = None
) -> DataFrame:
    n = int(
        num_partitions
        or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    part = (
        df.repartitionByRange(n, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    counts = dict(part.groupBy("_pid").count().collect())
    if not counts:
        return part.drop("_pid").withColumn(out_col, F.lit(0).cast("long"))
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):  # range partitions: ascending pid = ascending keys
        offsets[pid] = acc
        acc += counts[pid]
    offset_map = F.create_map(
        *[F.lit(x) for pid_off in offsets.items() for x in pid_off]
    )
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    return (
        part.withColumn(
            out_col,
            (F.row_number().over(w) - 1 + offset_map[F.col("_pid")]).cast("long"),
        )
        .drop("_pid")
    )
