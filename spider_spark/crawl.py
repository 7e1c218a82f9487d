"""Driver loop: crawl to fixpoint with one snapshot per round.

The reference's master/worker coordination (master.py heartbeats, pause
barriers, TCP registration — SURVEY.md §2 A7-A9) collapses into this loop:
a Spark round IS the barrier; resume-from-snapshot IS crash recovery (and
fixes the reference's stranded-'downloading'-rows bug §2.H.2 by
construction — no claim state is ever persisted mid-round).

Each round reads the frontier back from the snapshot it just wrote: that
truncates lineage (no ever-growing plan), makes every round independently
resumable, and is exactly how an Iceberg COW MERGE loop behaves.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spider_spark import tables
from spider_spark.pagerank import apply_priority, pagerank
from spider_spark.round import (
    CrawlConfig,
    RoundResult,
    run_round,
    seeds_frontier_df,
    seeds_to_frontier,
)
from spider_spark.seen import SeenSet


@dataclass
class CrawlSummary:
    rounds_run: int
    last_round: int
    n_urls: int
    n_done: int
    n_failed: int
    n_denied: int


def crawl(
    spark: SparkSession,
    workdir: str | Path,
    pages: DataFrame,
    seeds: list[tuple[str, int]] | DataFrame,
    policy: DataFrame,
    cfg: CrawlConfig | None = None,
    resume: bool = False,
) -> CrawlSummary:
    cfg = cfg or CrawlConfig()
    workdir = Path(workdir)
    mor = cfg.frontier_mode == "mor"

    # Compile robots Allow/Disallow patterns (RFC 9309 wildcards +
    # longest-match lengths) ONCE per crawl — run_round's compile_policy
    # call is idempotent, so the per-round loop never pays the (tiny,
    # policy-sized) Arrow stage again. policy_backoff preserves the
    # compiled columns (withColumn-only).
    from spider_spark.robots import compile_policy

    policy = compile_policy(policy)

    start = tables.latest_round(workdir) if resume else None
    if start is None:
        # fresh crawl into a used workdir: clear prior snapshots FIRST. A
        # shorter fresh crawl would otherwise leave the old crawl's higher
        # rounds in place — latest_round()/read_appended would then mix two
        # crawls' data (resume picking the STALE frontier, items unioned
        # across both) — silent corruption, not a theoretical edge.
        snaps = Path(workdir) / "snapshots"
        if snaps.exists():
            import shutil

            shutil.rmtree(snaps)
        if isinstance(seeds, DataFrame):
            frontier0 = seeds_frontier_df(seeds)  # distributed seed injection
        else:
            frontier0 = seeds_to_frontier(spark, seeds)
        frontier0 = frontier0.persist()
        tbls = {"frontier": frontier0}
        seen = SeenSet(cfg.bloom_buckets, cfg.bloom_fpp) if cfg.use_bloom else None
        if seen is not None:
            tbls["seen_segments"] = seen.build(frontier0).persist()

        def stats0():
            out = {"by_status": {"new": frontier0.count()}}
            out["n_new"] = out["by_status"]["new"]
            if mor:
                out["base_rows"] = out["n_new"]
                out["mor_delta_rows"] = 0
            if seen is not None:
                out["seen"] = seen.seg_stats()
            return out

        pb = {"frontier": ["status"]} if cfg.partition_frontier else None
        tables.write_snapshot(workdir, 0, tbls, partition_by=pb,
                              stats_fn=stats0,
                              frontier_base=0 if mor else None)
        for df in tbls.values():
            df.unpersist()
        start = 0

    # stats ride the manifest: the next round's empty-frontier check and
    # the Bloom overflow decision cost zero Spark jobs (they were computed
    # cache-hot during the previous round's write phase)
    prev_stats: dict = (tables.read_manifest(workdir, start) or {}).get("stats", {})

    rounds_run = 0
    rnd = start
    for rnd in range(start + 1, cfg.max_rounds + 1):
        n_new_prev = prev_stats.get("n_new")
        if n_new_prev == 0:
            # checked BEFORE the read: an all-empty partitioned frontier
            # (empty seed list) leaves no schema-bearing files to read
            rnd -= 1
            break

        # pagerank reprioritization touches every row's priority — in mor
        # that is by definition a base rewrite, so the round runs cow-style
        # and its snapshot becomes the new compaction base
        pagerank_fires = bool(
            cfg.pagerank_every and rnd > 1 and (rnd - 1) % cfg.pagerank_every == 0
        )
        frontier_urls = None
        if mor and not pagerank_fires:
            # scheduling read: resolved 'new' rows only (base partition-
            # pruned + children deltas); dedup side: 2-column urls scan
            frontier = tables.read_frontier_new(spark, workdir, rnd - 1)
            frontier_urls = tables.read_frontier_urls(spark, workdir, rnd - 1)
            round_cfg = cfg
        elif mor:
            frontier = tables.read_frontier_resolved(spark, workdir, rnd - 1)
            round_cfg = replace(cfg, frontier_mode="cow")
        else:
            frontier = tables.read_table(spark, workdir, rnd - 1, "frontier")
            round_cfg = cfg
            if n_new_prev is None:  # legacy manifest: partition-pruned probe
                if frontier.where(F.col("status") == "new").limit(1).count() == 0:
                    rnd -= 1
                    break

        seen_mark = None
        seen = None
        if cfg.use_bloom:
            seen = SeenSet.load(
                spark, workdir, rnd - 1,
                n_buckets=cfg.bloom_buckets, fpp=cfg.bloom_fpp,
            )
            # overflow decision from the manifest stats (no job); any
            # overflowed bucket is rebuilt from the frontier with doubled m
            # before this round's probes, so degraded FP geometry lasts at
            # most the round that overflowed it
            seg_stats = prev_stats.get("seen")
            seen.maybe_rebuild(
                frontier_urls if frontier_urls is not None else frontier,
                stats=[tuple(s) for s in seg_stats] if seg_stats else None,
            )
            seen_mark = seen.mark

        if pagerank_fires:
            all_links = tables.read_appended(spark, workdir, "links", upto_round=rnd - 1)
            if all_links is not None:
                ranks = None
                if cfg.priority_source == "opic":
                    from spider_spark.pagerank import opic_cash

                    ranks = opic_cash(all_links, iters=cfg.pagerank_iters)
                elif cfg.priority_source == "focused":
                    # focused crawling (Chakrabarti WWW'99): frontier URLs
                    # inherit the best linking page's quality logit, damped
                    # one hop — the crawl steers toward on-topic regions.
                    # Scores come from the items already extracted this
                    # crawl (no extra fetch); one join + one agg per firing.
                    from spider_spark.curation import quality_lr_score
                    from spider_spark.pagerank import focused_priority

                    all_items = tables.read_appended(
                        spark, workdir, "items", upto_round=rnd - 1
                    )
                    if all_items is not None:
                        scores = quality_lr_score(
                            all_items.select("url", "text"), id_col="url"
                        ).select(
                            F.col("doc_id").alias("url"),
                            F.col("quality_logit").alias("score"),
                        )
                        ranks = focused_priority(
                            all_links, scores, decay=cfg.pagerank_alpha
                        ).select("url", "rank")
                else:
                    ranks = pagerank(all_links, cfg.pagerank_alpha, cfg.pagerank_iters)
                if ranks is not None:
                    frontier = apply_priority(frontier, ranks)

        result: RoundResult = run_round(
            spark, frontier, pages, policy, rnd, round_cfg,
            seen_mark=seen_mark, frontier_urls=frontier_urls,
        )
        mor_delta_round = result.frontier is None
        if mor_delta_round:
            tbls = {
                "frontier_updates": result.updates,
                "frontier_children": result.children,
                "frontier_inlinks": result.inlink_deltas,
                "links": result.links,
                "items": result.items,
                "fetch_log": result.fetch_log,
            }
            new_urls = result.children
        else:
            tbls = {
                "frontier": result.frontier,
                "links": result.links,
                "items": result.items,
                "fetch_log": result.fetch_log,
            }
            new_urls = result.frontier.where(F.col("discovered_round") == rnd)
        if seen is not None:
            seg = seen.merged(new_urls).persist()
            tbls["seen_segments"] = seg
            result.cached.append(seg)
        if cfg.write_coalesce > 0:
            # coalesce is safe here ONLY because the count job below
            # populates every persist before the write jobs run: each write
            # then reads cached partitions through the coalesce without
            # re-planning the upstream chain at the tiny partition count
            # (which is what made repartition necessary before the
            # count-first ordering — and costs one exchange per table per
            # round that coalesce doesn't)
            tbls = {k: df.coalesce(cfg.write_coalesce) for k, df in tbls.items()}

        # Materialize the round's shared caches ONCE, before the concurrent
        # table writes: persist() is lazy and cache population is not
        # synchronized, so five simultaneous write jobs would otherwise
        # RACE to compute the same uncached claim/fetch/parse/merge chain
        # and duplicate it up to 5x (measured: 210 core-s of jobs for a
        # 60 s wall before this; the same status groupBy doubles as next
        # round's empty-check + the final summary).
        frontier_base = None
        if mor_delta_round:
            # mor accounting: by_status rolls forward from the deltas alone
            # (updates are absolute post-states of previously-'new' rows;
            # children are all 'new') — no full-frontier job anywhere.
            # ONE fused job: unioning the children count under a sentinel
            # status materializes the children cache AND both counters in a
            # single job submit instead of two serial ones — the per-round
            # fixed cost is job-submit-dominated at small rounds (PLANS.md
            # fixed-cost model), so every fused job moves the scaling floor.
            stat_rows = (
                result.updates.groupBy("status").count()
                .unionByName(
                    result.children.agg(
                        F.lit("__children").alias("status"),
                        F.count(F.lit(1)).alias("count"),
                    )
                )
            ).collect()
            upd_counts = {
                r["status"]: r["count"] for r in stat_rows
                if r["status"] != "__children"
            }
            n_children = sum(
                r["count"] for r in stat_rows if r["status"] == "__children"
            )
            if "by_status" in prev_stats:
                by_status = dict(prev_stats["by_status"])
            else:
                # legacy/stripped manifest: probe the committed state once
                # instead of silently rolling deltas forward from zero
                # (which would make every count and the final CrawlSummary
                # report post-resume deltas only) — same fallback the cow
                # branch's partition-pruned probe provides
                by_status = {
                    r["status"]: r["count"]
                    for r in tables.read_frontier_resolved(spark, workdir, rnd - 1)
                    .groupBy("status").count().collect()
                }
            n_touched = sum(upd_counts.values())
            for s in ("done", "failed", "denied"):
                if upd_counts.get(s):
                    by_status[s] = by_status.get(s, 0) + upd_counts[s]
            by_status["new"] = (
                by_status.get("new", 0)
                - (n_touched - upd_counts.get("new", 0))
                + n_children
            )
            delta_rows = prev_stats.get("mor_delta_rows", 0) + n_touched + n_children
            base_rows = prev_stats.get("base_rows", 0)
            frontier_base = tables.frontier_base_round(workdir, rnd - 1)
            if delta_rows > cfg.compact_ratio * max(base_rows, 1):
                # compaction: fold all deltas (committed + this round's,
                # still uncommitted) into a new full base written in THIS
                # snapshot — one manifest commit covers both, exactly like
                # Iceberg rewrite_data_files stacked on the MERGE snapshot
                tbls["frontier"] = tables.resolve_with_pending(
                    spark, workdir, rnd - 1,
                    result.updates, result.children, result.inlink_deltas,
                )
                if cfg.write_coalesce > 0:
                    # tbls was coalesced before this branch ran — the
                    # compacted frontier (the round's LARGEST table) must
                    # honor the same file-count setting
                    tbls["frontier"] = tbls["frontier"].coalesce(cfg.write_coalesce)
                frontier_base = rnd
                base_rows = sum(by_status.values())
                delta_rows = 0
        else:
            by_status = {
                r["status"]: r["count"]
                for r in result.frontier.groupBy("status").count().collect()
            }
            if mor:  # pagerank compaction round: cow write becomes new base
                frontier_base = rnd
                base_rows = sum(by_status.values())
                delta_rows = 0
        seen_stats = None
        if seen is not None:
            # Bloom-merge job fusion: seg_stats()'s n_buckets-row collect
            # IS the cache materialization for the merged segments — one
            # job instead of a count job now plus a stats job inside the
            # post-write stats_fn (the snapshot-commit serial tail).
            seen_stats = seen.seg_stats()

        def round_stats():
            out = {"by_status": by_status, "n_new": by_status.get("new", 0)}
            if mor:
                out["base_rows"] = base_rows
                out["mor_delta_rows"] = delta_rows
            if seen_stats is not None:
                out["seen"] = seen_stats
            return out

        # D5: frontier hive-partitioned by status — the hot `status='new'`
        # scan (empty-check + next round's claim filter) prunes to the
        # 'new' directory instead of re-reading done/failed/denied rows
        pb = {"frontier": ["status"]} if cfg.partition_frontier else None
        tables.write_snapshot(workdir, rnd, tbls, partition_by=pb,
                              stats_fn=round_stats, frontier_base=frontier_base)
        prev_stats = (tables.read_manifest(workdir, rnd) or {}).get("stats", {})
        if cfg.backoff_factor > 1.0 or cfg.recover_factor > 1.0:
            # B7: blocked hosts get slower budgets next round; with
            # recover_factor set, clean hosts step back toward the pinned
            # baseline (AIMD — backoff is a loop, not a ratchet).
            # Materialize EAGERLY and AFTER the snapshot write (parsed is
            # cache-hot and fetch_log tiny): a lazy checkpoint would only
            # materialize next round, after the unpersist below, forcing a
            # full recompute of this round's claim/fetch/parse pipeline
            # (ADVICE r01).
            from spider_spark.round import (
                pin_policy_base, policy_backoff, policy_recover,
            )

            policy = pin_policy_base(policy)
            if cfg.backoff_factor > 1.0:
                policy = policy_backoff(
                    policy, result.fetch_log, factor=cfg.backoff_factor
                )
            if cfg.recover_factor > 1.0:
                policy = policy_recover(
                    policy, result.fetch_log, recover_factor=cfg.recover_factor
                )
            policy = policy.localCheckpoint(eager=True)
        for df in result.cached:
            df.unpersist()
        rounds_run += 1

    by_status = prev_stats.get("by_status")
    if by_status is None:  # legacy manifests
        final = tables.read_table(spark, workdir, rnd, "frontier")
        by_status = dict(final.groupBy("status").count().collect())
    return CrawlSummary(
        rounds_run=rounds_run,
        last_round=rnd,
        n_urls=sum(by_status.values()),
        n_done=by_status.get("done", 0),
        n_failed=by_status.get("failed", 0),
        n_denied=by_status.get("denied", 0),
    )
