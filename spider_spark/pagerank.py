"""PageRank frontier reprioritization — A6 done right.

The reference intends this (master.py:125-149: every 1200s, pause the
cluster, build a networkx DiGraph from the link collection, run
``nx.pagerank(g, 0.9)``, write ``pr`` back to every frontier doc) but the
implementation never worked: pagerank is recomputed inside the innermost
edge loop (master.py:141), uses py2 ``.iteritems()`` (:143), and the
dequeue never reads ``pr`` anyway (mongo_redis_mgr.py:31-40) —
SURVEY.md §2.H.1/3.

Here: plain iterative DataFrame PageRank (no GraphFrames dependency, no
stop-the-world — runs between rounds under snapshot isolation), damping
α matching the reference's 0.9. Ranks land in ``frontier.priority``
(negated: lower priority value = popped sooner).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(links: DataFrame, alpha: float = 0.9, iters: int = 10) -> DataFrame:
    """links(src, dst) → (url, rank). Dangling mass redistributed uniformly.

    Scale: each iteration is one shuffle (groupBy dst) + one broadcast-able
    join with out-degrees; out-degrees are computed once and cached. At
    10^10 edges, AQE handles the hot-dst skew the Zipf corpus creates.
    """
    edges = links.select("src", "dst").dropDuplicates(["src", "dst"])
    edges = edges.persist()
    nodes = edges.select(F.col("src").alias("url")).union(
        edges.select(F.col("dst").alias("url"))
    ).distinct().persist()
    n = nodes.count()
    if n == 0:
        edges.unpersist()
        nodes.unpersist()
        return links.sparkSession.createDataFrame([], "url string, rank double")

    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg")).persist()
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))

    for _ in range(iters):
        contribs = (
            edges.join(ranks, edges.src == ranks.url, "inner")
            .join(outdeg, "src")
            .select(F.col("dst").alias("url"), (F.col("rank") / F.col("outdeg")).alias("c"))
            .groupBy("url")
            .agg(F.sum("c").alias("received"))
        )
        # dangling nodes contribute their mass uniformly: total rank of
        # nodes with no out-edges
        dangling = (
            ranks.join(outdeg, ranks.url == outdeg.src, "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .collect()[0][0]
        )
        base = (1.0 - alpha) / n + alpha * dangling / n
        ranks = nodes.join(contribs, "url", "left").select(
            "url",
            (F.lit(base) + F.lit(alpha) * F.coalesce(F.col("received"), F.lit(0.0))).alias("rank"),
        )
        ranks = ranks.localCheckpoint(eager=False)  # truncate iterative lineage

    edges.unpersist()
    outdeg.unpersist()
    nodes.unpersist()
    return ranks


def apply_priority(frontier: DataFrame, ranks: DataFrame) -> DataFrame:
    """MERGE ranks into frontier.priority (higher rank ⇒ popped sooner)."""
    return (
        frontier.join(ranks, "url", "left")
        .withColumn("priority", F.when(F.col("rank").isNotNull(), -F.col("rank")).otherwise(F.col("priority")))
        .drop("rank")
    )
