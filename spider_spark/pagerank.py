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

    # materialize BEFORE unpersisting the inputs: the final lazy
    # checkpoint otherwise recomputes the last hop from the raw links
    # scan on the caller's first action (hits/opic already do this)
    ranks = ranks.localCheckpoint(eager=True)
    edges.unpersist()
    outdeg.unpersist()
    nodes.unpersist()
    return ranks


def hits(links: DataFrame, iters: int = 5) -> DataFrame:
    """links(src, dst) → (url, hub, auth): Kleinberg HITS, L1-normalized.

    The reference ranks frontier docs by a single PageRank score
    (master.py:125-149); HITS complements it for crawl scheduling — high-hub
    pages (directories, sitemaps, link farms) are where new URLs surface, so
    a hub-weighted pop finds fresh content faster, while auth identifies the
    pages worth recrawling. Classic alternation:

        auth(v) = Σ_{u→v} hub(u);   hub(u) = Σ_{u→v} auth(v)

    each followed by L1 normalization (sum-normalize, not L2: one aggregate,
    no sqrt, and the oracle's float path stays identical).

    Scale: per iteration exactly two shuffles (groupBy dst, groupBy src) over
    the deduped edge set, plus an O(1)-byte scalar collect for the norm —
    same footprint as pagerank(). Lineage truncated per iteration via
    localCheckpoint so the plan stays flat at any iteration count. At 10^10
    edges the hot-dst skew is the same Zipf shape pagerank() handles (AQE
    skew-split on a cluster; explicit salting not needed since the aggregate
    is partial-aggregable map-side).
    """
    edges = links.select("src", "dst").dropDuplicates(["src", "dst"]).persist()
    nodes = edges.select(F.col("src").alias("url")).union(
        edges.select(F.col("dst").alias("url"))
    ).distinct().persist()
    n = nodes.count()
    if n == 0:
        edges.unpersist()
        nodes.unpersist()
        return links.sparkSession.createDataFrame(
            [], "url string, hub double, auth double")

    scores = nodes.select("url", F.lit(1.0 / n).alias("hub"), F.lit(1.0 / n).alias("auth"))

    # Each half-step PERSISTS its raw sums before the norm collect: the
    # collect is then also the cache materialization, so the auth chain is
    # computed once per iteration instead of ~3× (norm job + hub step +
    # next iteration each re-deriving it — measured 20.5 s → ~7 s at sf0.1).
    live: list = []  # caches the lazy `scores` plan still references
    for _ in range(iters):
        # auth step: sum incoming hub mass, then L1-normalize
        a_raw = (
            edges.join(scores.select("url", "hub"), F.col("src") == F.col("url"))
            .groupBy("dst").agg(F.sum("hub").alias("a"))
        )
        a = nodes.join(a_raw, F.col("url") == F.col("dst"), "left").select(
            "url", F.coalesce(F.col("a"), F.lit(0.0)).alias("a")).persist()
        a_norm = a.agg(F.sum("a")).collect()[0][0] or 1.0
        auth = a.select("url", (F.col("a") / F.lit(a_norm)).alias("auth"))
        # hub step: sum outgoing (new) auth mass, then L1-normalize
        h_raw = (
            edges.join(auth, F.col("dst") == F.col("url"))
            .groupBy("src").agg(F.sum("auth").alias("h"))
        )
        h = nodes.join(h_raw, F.col("url") == F.col("src"), "left").select(
            "url", F.coalesce(F.col("h"), F.lit(0.0)).alias("h")).persist()
        h_norm = h.agg(F.sum("h")).collect()[0][0] or 1.0
        hub = h.select("url", (F.col("h") / F.lit(h_norm)).alias("hub"))
        # lazy lineage cut: persist alone leaves the logical plan nesting
        # (scores appears twice per iteration ⇒ exponential analyzed-plan
        # growth; AQE's plan-string alone OOMs the driver by iter 4). The
        # checkpoint materializes at the next iteration's norm collect while
        # a/h are still cached, so it costs no recompute.
        scores = hub.join(auth, "url").localCheckpoint(eager=False)
        # previous iteration's caches fed this plan up to the persisted a/h
        # boundary; with a and h now materialized they can go
        for c in live:
            c.unpersist()
        live = [a, h]

    scores = scores.localCheckpoint(eager=True)
    for c in live:
        c.unpersist()
    edges.unpersist()
    nodes.unpersist()
    return scores


def trustrank(links: DataFrame, trusted: DataFrame,
              alpha: float = 0.85, iters: int = 5) -> DataFrame:
    """links(src, dst) × trusted(url) → (url, rank): personalized PageRank
    with the teleport vector restricted to a trusted seed set
    (Gyöngyi, Garcia-Molina & Pedersen, "Combating Web Spam with
    TrustRank", VLDB 2004 — public paper).

    Why a crawler wants it: plain PageRank (the reference's single
    reprioritization signal, master.py:125-149) is gameable — link farms
    accumulate rank from anywhere. TrustRank mass can ONLY enter through
    the seed set and decays with distance from it, so pages unreachable
    from trusted hosts score ~0 no matter how densely they interlink.
    ``rank_pagerank / rank_trustrank`` ratios flag spam for crawl-tier
    demotion; ``apply_priority`` accepts the output unchanged.

        t = (1-α)·d + α·(Mᵀt + dangling_mass·d),   d = 1{url∈S}/|S|

    Dangling mass teleports through d too (consistent personalization —
    mass never leaks to untrusted nodes via dead ends).

    Scale: identical footprint to pagerank() — one groupBy(dst) shuffle +
    one outdeg join per iteration, an O(1)-byte scalar collect for the
    dangling mass, lineage cut per iteration. The seed indicator join is
    computed once, outside the loop.
    """
    edges = links.select("src", "dst").dropDuplicates(["src", "dst"]).persist()
    nodes = edges.select(F.col("src").alias("url")).union(
        edges.select(F.col("dst").alias("url"))
    ).distinct()
    seeds = trusted.select(F.col(trusted.columns[0]).alias("url")).distinct()
    # teleport vector d, materialized once: indicator/|S∩V| per node
    base = nodes.join(seeds.withColumn("_s", F.lit(1)), "url", "left").select(
        "url", F.coalesce(F.col("_s"), F.lit(0)).alias("_s")).persist()
    n_seeds = base.agg(F.sum("_s")).collect()[0][0] or 0
    if n_seeds == 0:
        edges.unpersist()
        base.unpersist()
        # no trusted node appears in the graph: nothing is reachable
        return base.select("url", F.lit(0.0).alias("rank"))
    d_vec = base.select("url", (F.col("_s") / F.lit(float(n_seeds))).alias("d"))
    d_vec = d_vec.persist()
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg")).persist()
    ranks = d_vec.select("url", F.col("d").alias("rank"))

    for _ in range(iters):
        contribs = (
            edges.join(ranks, edges.src == ranks.url, "inner")
            .join(outdeg, "src")
            .select(F.col("dst").alias("url"),
                    (F.col("rank") / F.col("outdeg")).alias("c"))
            .groupBy("url")
            .agg(F.sum("c").alias("received"))
        )
        dangling = (
            ranks.join(outdeg, ranks.url == outdeg.src, "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .collect()[0][0]
        )
        ranks = d_vec.join(contribs, "url", "left").select(
            "url",
            (
                F.lit(1.0 - alpha) * F.col("d")
                + F.lit(alpha) * (F.coalesce(F.col("received"), F.lit(0.0))
                                  + F.lit(dangling) * F.col("d"))
            ).alias("rank"),
        )
        ranks = ranks.localCheckpoint(eager=False)

    ranks = ranks.localCheckpoint(eager=True)  # see pagerank: materialize
    edges.unpersist()                          # before freeing inputs
    base.unpersist()
    d_vec.unpersist()
    outdeg.unpersist()
    return ranks


def apply_priority(frontier: DataFrame, ranks: DataFrame) -> DataFrame:
    """MERGE ranks into frontier.priority (higher rank ⇒ popped sooner).
    Output schema == frontier schema EXACTLY: rank tables may carry extra
    columns (focused_priority's best_parent_score/n_parents), and leaking
    them broke downstream unionByName/snapshot writes."""
    merged = (
        frontier.join(ranks.select("url", "rank"), "url", "left")
        .withColumn("priority", F.when(F.col("rank").isNotNull(), -F.col("rank")).otherwise(F.col("priority")))
    )
    return merged.select(*frontier.columns)


def opic_cash(links: DataFrame, iters: int = 5) -> DataFrame:
    """Synchronous OPIC — Adaptive On-line Page Importance Computation
    (Abiteboul, Preda, Cobena, WWW 2003 — public): every node starts with
    cash 1/n; each step a node distributes ALL its cash equally along its
    out-edges (dangling nodes give theirs to every node via the paper's
    virtual node) and banks the distributed amount in its history.
    Importance estimate after T steps = history + cash — unlike PageRank
    it needs no damping parameter and converges while the crawl runs,
    which is why crawlers (Heritrix's OPIC variant) use it as the frontier
    priority: ``apply_priority`` accepts the output unchanged via the
    ``rank`` column.

    Scale shape: identical to pagerank() — one Exchange(dst) contribution
    agg + a broadcast-able out-degree join + an O(1)-byte dangling scalar
    collect per iteration; state (url, cash, hist) rides one DataFrame,
    lineage cut per iteration."""
    edges = links.select("src", "dst").dropDuplicates(["src", "dst"]).persist()
    nodes = edges.select(F.col("src").alias("url")).union(
        edges.select(F.col("dst").alias("url"))
    ).distinct().persist()
    n = nodes.count()
    if n == 0:
        edges.unpersist()
        nodes.unpersist()
        return links.sparkSession.createDataFrame([], "url string, rank double")

    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("od")).persist()
    state = nodes.select(
        "url", F.lit(1.0 / n).alias("cash"), F.lit(0.0).alias("hist")
    )
    for _ in range(iters):
        received = (
            edges.join(state.select(F.col("url").alias("src"), "cash"), "src")
            .join(outdeg, "src")
            .select(F.col("dst").alias("url"), (F.col("cash") / F.col("od")).alias("c"))
            .groupBy("url")
            .agg(F.sum("c").alias("received"))
        )
        dangling = (
            state.join(outdeg, state.url == outdeg.src, "left_anti")
            .agg(F.coalesce(F.sum("cash"), F.lit(0.0)))
            .collect()[0][0]
        )
        state = (
            state.join(received, "url", "left")
            .select(
                "url",
                (F.coalesce(F.col("received"), F.lit(0.0))
                 + F.lit(dangling / n)).alias("cash"),
                (F.col("hist") + F.col("cash")).alias("hist"),
            )
            .localCheckpoint(eager=False)  # truncate iterative lineage
        )
    out = state.select("url", (F.col("hist") + F.col("cash")).alias("rank"))
    out = out.localCheckpoint(eager=True)
    edges.unpersist()
    outdeg.unpersist()
    nodes.unpersist()
    return out


def focused_priority(
    links: DataFrame,
    scores: DataFrame,
    decay: float = 0.85,
    url_col: str = "url",
    score_col: str = "score",
) -> DataFrame:
    """Focused-crawl frontier priority (Chakrabarti, van den Berg, Dom,
    "Focused crawling: a new approach to topic-specific Web resource
    discovery", WWW 1999 — public): an undiscovered URL inherits the
    topical relevance of the best page that links to it, damped by one
    hop — the crawler expands the frontier greedily toward on-topic
    regions instead of breadth-first. ``scores`` is any per-page relevance
    signal (here curation.quality_lr_score's classifier logit; the paper's
    is a text classifier too).

    Returns (url, rank, best_parent_score, n_parents) for every link
    TARGET with at least one scored parent — ``rank`` is the damped
    inherited relevance, in the same positive-higher-is-better convention
    as pagerank/trustrank/opic ranks, so ``apply_priority`` consumes the
    output unchanged (it negates rank into the frontier's ascending
    pop-priority itself).

    Scale shape: one equi join links⋈scores on src (scores is per-CRAWLED-
    page — orders of magnitude smaller than the frontier — and broadcast-
    able while the crawled set is; afterwards it hash-partitions the same
    as the links table), then one Exchange(dst) max/count agg. max() is
    algebraic, so partial aggregation bounds hot-target reducer state the
    same way the inlink counter's sum does — no collect_set, no skew
    hazard. Priority propagates ONE hop per round, exactly the cadence the
    round loop re-scores at; no iteration, no convergence state."""
    parent = scores.select(
        F.col(url_col).alias("src"), F.col(score_col).alias("_s")
    )
    return (
        links.select("src", "dst")
        .join(parent, "src")
        .groupBy(F.col("dst").alias("url"))
        .agg(
            F.max("_s").alias("best_parent_score"),
            F.countDistinct("src").alias("n_parents"),
        )
        .select(
            "url",
            (F.col("best_parent_score") * F.lit(decay)).alias("rank"),
            "best_parent_score",
            "n_parents",
        )
    )
