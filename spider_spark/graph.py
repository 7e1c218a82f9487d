"""Distributed connected components: alternating large-star / small-star.

The pairs→clusters completion step the dedup family needs: MinHash/SimHash/
Jaccard emit *pairwise* duplicate edges, but the keep-one-copy decision is
per *component* (a near-dup cluster is a clique-ish blob, possibly chained
through intermediate revisions). ``connected_components`` turns the edge
list into ``(node, rep)`` where ``rep`` is the component minimum — the
canonical survivor id — without ever materializing the transitive closure.

Algorithm (Kiveris, Lattanzi, Mirrokni, Rastogi, Vassilvitskii,
"Connected Components in MapReduce and Beyond", SoCC'14 — public paper):
repeat { large-star; small-star } until the edge set is a fixed point.
Both operations only hook nodes to smaller-labelled neighbours, so every
intermediate edge set stays within the original components (no merging
across components, no splitting), and the fixed point is a star per
component centred on its minimum. Convergence is O(log² n) rounds — for
dup clusters (tiny diameters) it is 2-3 rounds in practice.

Scale shape per round: two groupBy-min shuffles (partially aggregable
map-side) + one join each, all keyed on node id — the same Zipf-skew
profile as pagerank(), handled by AQE skew-split on a cluster. The
convergence probe is an O(1)-byte (count, hash-sum) scalar collect, not a
set comparison; each round's output is eagerly localCheckpoint'ed so the
plan stays flat at any round count (the lesson of pagerank.hits: persist
alone leaves the analyzed plan nesting exponentially).

Reference parity: mujinveil/Spider has no graph clustering (its dedup is
the per-URL seen set, client_crawler.py); this module serves the brief's
training-data-pipeline tier (near-dup cluster collapse at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _edge_stats(e: DataFrame) -> tuple[int, int]:
    """(count, xxhash64-xor) fingerprint of an edge set — the O(1)-byte
    convergence probe. bit_xor, not sum: ANSI mode (Spark 4 default) makes
    a 64-bit hash SUM throw ARITHMETIC_OVERFLOW, while xor can't overflow
    and is order-independent; the edge set is distinct, so the xor's
    even-multiplicity cancellation can't fire. A false fixed-point needs a
    64-bit collision between consecutive rounds (~2⁻⁶⁴); the failure mode
    is one round early-stop on an almost-star graph, never a wrong merge."""
    row = e.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.bit_xor(F.xxhash64("u", "v")), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iters: int = 25,
) -> DataFrame:
    """(node, rep) for every node incident to an edge; rep = component min.

    Node ids may be any orderable type (string urls, bigint doc_ids) — the
    total order is Spark's, which matches DuckDB's for strings and ints,
    so the recursive-CTE oracle reproduces reps exactly. Self-loops are
    dropped; isolated nodes never enter ``edges`` and are the caller's
    coalesce (``rep = node``), exactly like the left-join in
    ``dedup_cluster_reps``.
    """
    spark = edges.sparkSession
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .where(F.col("a") != F.col("b"))
        .select(F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    if e.isEmpty():
        schema_t = dict(edges.dtypes)[src]
        return spark.createDataFrame([], f"node {schema_t}, rep {schema_t}")

    prev = _edge_stats(e)
    for _ in range(max_iters):
        # ---- large-star: every node hooks its LARGER neighbours to the
        # minimum of its closed neighbourhood.
        sym = e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        m = sym.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
        ls = (
            sym.join(m, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
        )
        # large-star output is (bigger, smaller)-oriented by construction:
        # emitted (v, m) has m ≤ u < v — no self-pair filter needed.
        # ---- small-star: every node points its smaller neighbourhood
        # (and itself) at that neighbourhood's minimum.
        mn = ls.groupBy("u").agg(F.min("v").alias("m"))
        ss_self = mn.select("u", F.col("m").alias("v"))
        ss_nbr = (
            ls.join(mn, "u")
            .where(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        e_next = (
            ss_self.unionAll(ss_nbr)
            .where(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=True)  # flat plan + materialized once
        )
        cur = _edge_stats(e_next)
        e = e_next
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds "
            "(guaranteed O(log² n) — raise max_iters for adversarial graphs)"
        )
    # fixed point is a star per component: (node, rep) with rep < node;
    # add the centres themselves so every incident node gets a row.
    reps = e.select(F.col("v").alias("node")).distinct().join(
        e.select(F.col("u").alias("node")).distinct(), "node", "left_anti"
    ).select("node", F.col("node").alias("rep"))
    return e.select(F.col("u").alias("node"), F.col("v").alias("rep")).unionByName(reps)


def dedup_cluster_reps(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iters: int = 25,
) -> DataFrame:
    """Collapse pairwise dup edges into per-document survivors.

    docs:  any DataFrame with ``id_col`` (one row per document).
    pairs: (a_id, b_id) dup edges from jaccard_pairs / minhash_lsh_pairs /
           simhash_pairs — any threshold.
    Returns (doc_id, rep, is_survivor): ``rep`` = min doc id of the near-dup
    component (itself for unique docs), ``is_survivor`` = keep flag. The
    downstream keep-one-copy filter is ``WHERE is_survivor`` — one
    broadcast-or-shuffle join against the (tiny: only docs in dup pairs)
    label table, never a join against the pair list.
    """
    labels = connected_components(pairs, src="a_id", dst="b_id", max_iters=max_iters)
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(labels, F.col("doc_id") == F.col("node"), "left")
        .select(
            "doc_id",
            F.coalesce(F.col("rep"), F.col("doc_id")).alias("rep"),
            (F.coalesce(F.col("rep"), F.col("doc_id")) == F.col("doc_id")).alias(
                "is_survivor"
            ),
        )
    )


def triangle_counts(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Per-node triangle counts + local clustering coefficient over the
    undirected simple graph induced by ``edges``.

    Why a crawler wants this: dense triangle neighbourhoods in the HOST
    graph are the classic link-farm / mirror-ring signature (TrustRank's
    spam-mass cousin), and local clustering feeds the same crawl-ordering
    policy tier as pagerank()/hits(). The reference has no graph analytics
    at all (its link handling is per-URL set_url_links, master.py); this
    is brief-mandated web-graph capability.

    Algorithm: degree-ordered compact-forward (Latapy, TCS 2008; the
    node-iterator++ of Suri & Vassilvitskii, WWW'11 — public papers).
    Every undirected edge is oriented from the lower (degree, node) end to
    the higher, so each wedge u→{v,w} is generated exactly once at its
    lowest-order vertex and the wedge count is bounded by m·α (α =
    arboricity) instead of Σ deg² — the difference between a Zipf-skewed
    web host graph melting a straggler task and finishing: the hottest
    hub generates NO wedges because all its edges point INTO it.

    Plan shape: distinct (1 shuffle on the canonical edge) → degree agg
    (1 shuffle, map-side partial) → two degree joins (broadcast-able when
    the node table is small; hash otherwise) → self-join on the wedge
    centre u (1 shuffle, the bounded one) → left-semi close-edge probe
    (1 shuffle) → role-explode + count (1 shuffle, partial-agg absorbs
    hub skew). No driver collects, no row-data materialization.
    """
    # und fans out 4× (degree agg ×2, orientation join, close-edge probe)
    # and deg 3× (two orientation joins + the final join) — persist both or
    # every consumer re-executes the distinct/agg lineage (measured 7.4 s →
    # 1.7-3.5 s on a 15k-edge graph at local[32]; the un-persisted physical
    # plan was 675 nodes of repeated scan+Exchange).
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
        .persist()
    )
    keyed = (
        und.join(deg.select(F.col("node").alias("a"), F.col("degree").alias("da")), "a")
        .join(deg.select(F.col("node").alias("b"), F.col("degree").alias("db")), "b")
    )
    lo_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = keyed.select(
        F.when(lo_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(lo_first, F.col("b")).otherwise(F.col("a")).alias("v"),
    )
    right = oriented.select(F.col("u").alias("u2"), F.col("v").alias("w"))
    wedges = (
        oriented.join(right, F.col("u") == F.col("u2"))
        .where(F.col("v") < F.col("w"))
        .select("u", "v", "w")
    )
    # close the wedge against the CANONICAL edge set: (v, w) is already
    # lexicographic (v < w), exactly und's (a, b) key
    tri = wedges.join(
        und, (wedges["v"] == und["a"]) & (wedges["w"] == und["b"]), "left_semi"
    )
    cnt = (
        tri.select(F.col("u").alias("node"))
        .unionAll(tri.select(F.col("v").alias("node")))
        .unionAll(tri.select(F.col("w").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    d, t = F.col("degree"), F.col("n_triangles")
    out = (
        deg.join(cnt, "node", "left")
        .select(
            "node",
            "degree",
            F.coalesce(t, F.lit(0)).cast("long").alias("n_triangles"),
            F.when(
                d > 1,
                2.0 * F.coalesce(t, F.lit(0)).cast("double")
                / (d.cast("double") * (d.cast("double") - 1.0)),
            )
            .otherwise(F.lit(0.0))
            .alias("clustering"),
        )
    )
    # node-sized result: checkpoint eagerly so the und/deg caches can be
    # RELEASED (they were previously persisted for the session's lifetime)
    out = out.localCheckpoint(eager=True)
    und.unpersist()
    deg.unpersist()
    return out


def kcore(
    edges: DataFrame,
    k: int = 3,
    src: str = "src",
    dst: str = "dst",
    max_iters: int | None = None,
) -> DataFrame:
    """(node, in_core, core_degree) — synchronous k-core peel over the
    undirected simple graph: every round removes ALL nodes of degree < k
    simultaneously, until a fixed point. in_core marks k-core membership;
    core_degree is the node's degree within the surviving subgraph (0
    outside).

    Why a crawler wants this: the k-core is the standard dense-subgraph
    sieve — link farms and tightly-mirrored boilerplate rings live in
    high cores while the honest long-tail web (tree-ish, low-degree)
    peels away; core membership is a cheap feature next to
    trustrank/triangle clustering, and k-core is the classic first pass
    of web-graph structure analysis (Alvarez-Hamelin et al., NIPS'05;
    Batagelj-Zaversnik O(m) peel — public papers). The reference has no
    graph tier at all.

    Scale shape per round: one degree agg (map-side partial absorbs hub
    skew) + two semi-joins keyed on the edge endpoints; the surviving
    edge set only SHRINKS, so per-round cost is monotonically
    non-increasing. Convergence probe is an O(1)-byte edge count; each
    round's survivor set is localCheckpoint'ed (lazy) so the plan stays
    flat at any peel depth. Peel depth is hub-bounded (~log) on web-shaped
    graphs but O(n) on CHAINS (a pagination chain peels 2 edges per
    round), so the loop runs to the fixed point by default — the edge
    count is monotone decreasing, so termination is guaranteed;
    ``max_iters`` is an optional budget that raises instead of silently
    returning unconverged cores.
    """
    cur = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    all_nodes = (
        cur.select(F.col("a").alias("node"))
        .unionAll(cur.select(F.col("b").alias("node")))
        .distinct()
        .persist()
    )
    all_nodes.count()  # materialize BEFORE peeling mutates cur's lineage

    n_edges = cur.count()
    rounds = 0
    while True:
        if max_iters is not None and rounds >= max_iters:
            raise RuntimeError(f"k-core peel did not converge in {max_iters} rounds")
        rounds += 1
        if n_edges == 0:
            break
        deg = (
            cur.select(F.col("a").alias("node"))
            .unionAll(cur.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("degree"))
        )
        keep = deg.where(F.col("degree") >= k).select("node")
        nxt = (
            cur.join(keep.withColumnRenamed("node", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("node", "b"), "b", "left_semi")
            .select("a", "b")
            .localCheckpoint(eager=False)
        )
        n_nxt = nxt.count()
        if n_nxt == n_edges:
            break
        cur, n_edges = nxt, n_nxt

    core_deg = (
        cur.select(F.col("a").alias("node"))
        .unionAll(cur.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("core_degree"))
    )
    out = all_nodes.join(core_deg, "node", "left").select(
        "node",
        F.col("core_degree").isNotNull().alias("in_core"),
        F.coalesce(F.col("core_degree"), F.lit(0)).cast("long").alias("core_degree"),
    ).localCheckpoint(eager=True)
    all_nodes.unpersist()
    # free the initial edge snapshot's cache; intermediate peel rounds are
    # lazy localCheckpoints (unpersist on a checkpointed frame is a no-op)
    cur.unpersist()
    return out
