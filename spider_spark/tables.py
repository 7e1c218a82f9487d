"""Snapshot-versioned table storage — the Iceberg-shaped persistence layer.

This sandbox has no Iceberg runtime jar, so the engine implements the same
contract over plain Parquet: one immutable snapshot directory per crawl
round, a JSON manifest written LAST (commit point), resume = latest round
with a manifest. Maps 1:1 onto Iceberg:

- snapshot dir            ↔ Iceberg snapshot (COW MERGE of the frontier)
- manifest.json           ↔ snapshot metadata / manifest list
- read latest manifest    ↔ time travel to current snapshot
- crash between data and manifest ⇒ orphan dir, ignored on resume
  (atomicity the same way Iceberg gets it: metadata swap is the commit)

Swapping in real Iceberg is a config change (catalog + ``writeTo``), not a
redesign; the engine only touches this module for IO.

Layout::

    workdir/snapshots/round_00000/manifest.json
                                  frontier/   (full rewrite per round — COW)
                                  links/      (per-round append)
                                  items/      (per-round append)
                                  fetch_log/  (per-round append)
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

APPEND_TABLES = ("links", "items", "fetch_log")


def _round_dir(workdir: str | Path, round_no: int) -> Path:
    return Path(workdir) / "snapshots" / f"round_{round_no:05d}"


def write_snapshot(
    workdir: str | Path, round_no: int, tables: dict[str, DataFrame],
    stats: dict | None = None, partition_by: dict[str, list[str]] | None = None,
    stats_fn=None,
) -> None:
    """``partition_by`` maps table name → hive partition columns (D5): the
    crawl loop writes the frontier partitioned by ``status``, so the next
    round's ``status='new'`` scans prune to one directory instead of
    reading every row back (PLANS.md carries the explain evidence — the
    Iceberg partition-spec analog).

    ``stats_fn()`` (optional) runs AFTER the table writes and BEFORE the
    manifest commit; its dict is merged into manifest ``stats``. The crawl
    loop uses it to fold the next round's empty-frontier check and the
    Bloom overflow stats into this round's (cache-hot) write phase —
    replacing two cold per-round Spark jobs with manifest reads."""
    rdir = _round_dir(workdir, round_no)
    # concurrent writes: each table write is a separate Spark job whose
    # scheduling latency would otherwise serialize; the manifest below is
    # still the single commit point, so atomicity is unchanged
    from concurrent.futures import ThreadPoolExecutor

    def write_one(item):
        name, df = item
        w = df.write.mode("overwrite")
        cols = (partition_by or {}).get(name)
        if cols:
            w = w.partitionBy(*cols)
        w.parquet(str(rdir / name))

    with ThreadPoolExecutor(max_workers=max(1, len(tables))) as pool:
        list(pool.map(write_one, tables.items()))
    stats = dict(stats or {})
    if stats_fn is not None:
        stats.update(stats_fn())
    manifest = {"round": round_no, "tables": sorted(tables), "stats": stats}
    tmp = rdir / "manifest.json.tmp"
    tmp.write_text(json.dumps(manifest, indent=1))
    tmp.rename(rdir / "manifest.json")  # commit point


def read_manifest(workdir: str | Path, round_no: int) -> dict | None:
    p = _round_dir(workdir, round_no) / "manifest.json"
    if not p.exists():
        return None
    return json.loads(p.read_text())


def latest_round(workdir: str | Path) -> int | None:
    snaps = Path(workdir) / "snapshots"
    if not snaps.exists():
        return None
    rounds = [
        int(d.name.split("_")[1])
        for d in snaps.iterdir()
        if d.name.startswith("round_") and (d / "manifest.json").exists()
    ]
    return max(rounds) if rounds else None


def read_table(spark: SparkSession, workdir: str | Path, round_no: int, name: str) -> DataFrame:
    return spark.read.parquet(str(_round_dir(workdir, round_no) / name))


def write_jsonl(df: DataFrame, path: str | Path) -> None:
    """D7: JSON-lines sink (Meituan/pipelines.py:13-24 appends
    ``json.dumps(item, ensure_ascii=False)`` per line) — Spark's json
    writer emits exactly one JSON object per line."""
    df.write.mode("overwrite").option("ignoreNullFields", "false").json(str(path))


def read_items_latest(spark: SparkSession, workdir: str | Path) -> DataFrame | None:
    """D2 keyed-upsert view over the append-only items table: latest row per
    url_md5 (the reference upserts by id — weibo/pipelines.py:71-73; our
    append+latest-wins read gives the same answer with append-only writes,
    i.e. a merge-on-read MERGE)."""
    from pyspark.sql.window import Window

    items = read_appended(spark, workdir, "items")
    if items is None:
        return None
    w = Window.partitionBy("url_md5").orderBy(F.desc("fetched_round"))
    return items.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")


def read_appended(spark: SparkSession, workdir: str | Path, name: str,
                  upto_round: int | None = None) -> DataFrame | None:
    """Union of an append-only table across all committed snapshots."""
    snaps = Path(workdir) / "snapshots"
    paths = []
    for d in sorted(snaps.iterdir()):
        if not d.name.startswith("round_") or not (d / "manifest.json").exists():
            continue
        rno = int(d.name.split("_")[1])
        if upto_round is not None and rno > upto_round:
            continue
        t = d / name
        if t.exists():
            paths.append(str(t))
    if not paths:
        return None
    return spark.read.parquet(*paths)
