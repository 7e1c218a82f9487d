"""End-to-end corpus curation: the composed webtext training-data pipeline.

One declarative DataFrame chain that strings the individual operators this
engine provides into the standard curation sequence a 100 TB web corpus
actually runs (C4/Gopher/RefinedWeb-style):

    1. quality gate        — length floor, punctuation cap, language
                             allowlist, stopword floor (textops.quality_cols)
    2. repetition gate     — duplicate-2-gram fraction cap (Gopher)
    3. exact dedup         — min-id survivor per md5(text)
    4. decontamination     — drop docs sharing word 5-grams with the
                             benchmark/eval set (dedup.decontaminate)
    5. split assignment    — deterministic hash-bucket train/val/test
                             (sampling.split_col)

Plan shape at scale: stages 1-2 are map-only projections/filters fused
into the scan (whole-stage codegen, pushdown-able); stage 3 is one
Exchange(md5(text)) window; stage 4 is a broadcast hash join against the
(small) benchmark shingle set plus one per-doc agg; stage 5 is map-only.
Total: two shuffles for the whole pipeline, both keyed on things that
cannot skew pathologically (a cryptographic text hash; per-doc ids).
Cheap gates run first so each shuffle sees only surviving rows.

No reference analog (the reference crawls; it never curates) — this is
builder-brief training-data-pipeline surface, and the flagship
composition showing the operators are mutually compatible, not just
individually green.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from spider_spark import dedup, sampling, textops

DEFAULT_SPLITS = {"train": 0.90, "val": 0.05, "test": 0.05}


def unigram_lm_scores(
    docs: DataFrame,
    ref: DataFrame,
    max_vocab: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Perplexity-proxy quality scoring (the CCNet/KenLM-filter analog,
    public method: score web docs by a language model fit on a trusted
    reference corpus; drop the high-perplexity tail). KenLM itself isn't
    installable here, so the model is an add-one-smoothed UNIGRAM LM —
    the same pipeline shape, exactly reproducible in SQL.

    Returns (doc_id, n_tokens, bits_per_token): mean -log2 P(w), OOV
    smoothed to 1/(T+V).

    Scale shape: fitting is one explode + count agg over the (small)
    reference; scoring streams the corpus through a BROADCAST join
    against the vocabulary (``max_vocab`` caps it at the top-K words for
    broadcastability on open-vocab corpora — dropped words score as OOV,
    which is exactly what a capped KenLM vocab does) and aggregates once
    per doc. One corpus shuffle total."""
    ref_toks = ref.select(
        F.explode(textops.tokens_col(F.col(text_col))).alias("w")
    )
    cnt = ref_toks.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    if max_vocab is not None:
        # distributed TakeOrdered, not a global row_number window: the
        # unpartitioned window funneled the WHOLE vocabulary through one
        # task in exactly the open-vocab case the cap exists for
        cnt = cnt.orderBy(F.desc("c"), "w").limit(max_vocab)
    tot = cnt.agg(
        F.sum("c").cast("long").alias("t"), F.count(F.lit(1)).cast("long").alias("v")
    )
    toks = docs.select(
        id_col, F.explode(textops.tokens_col(F.col(text_col))).alias("w")
    )
    scored = (
        toks.join(F.broadcast(cnt), "w", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            id_col,
            (-F.log2(
                (F.coalesce(F.col("c"), F.lit(0)) + 1).cast("double")
                / (F.col("t") + F.col("v")).cast("double")
            )).alias("b"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.round(F.avg("b"), 6).alias("bits_per_token"),
    )


def curate(
    docs: DataFrame,
    benchmark: DataFrame,
    *,
    min_tokens: int = 12,
    langs: tuple[str, ...] = ("en", "zh"),
    max_dup2: float = 0.5,
    contamination_n: int = 5,
    split_weights: dict[str, float] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Run the full curation pipeline; returns
    (doc_id, lang, n_tokens, split) for every surviving doc."""
    split_weights = split_weights or DEFAULT_SPLITS
    qc = textops.quality_cols(F.col(text_col))
    lang = textops.lang_id_col(F.col(text_col))

    # 1. quality gate — keep-rules are the negation of corpus_keep_filter's
    # drop cascade, evaluated in one codegen'd pass over the scan.
    gated = docs.select(
        id_col,
        text_col,
        lang.alias("lang"),
        qc["n_tokens"].alias("n_tokens"),
        textops.tokens_col(F.col(text_col)).alias("_w"),
    ).where(
        (qc["n_tokens"] >= min_tokens)
        & (qc["n_punct"] * 5 <= qc["n_chars"])
        & lang.isin(*langs)
        & (qc["stopword_ratio"] * 100 >= 2)
    )

    # 2. repetition gate — grams materialized as their OWN aliased column
    # first: `_g2` is then referenced three times below, and Spark's
    # CollapseProject refuses to inline a multiply-referenced non-trivial
    # alias, so the gram array is built once per row. Writing the three
    # references as three copies of the grams EXPRESSION instead was a
    # measured 4× slowdown on this stage (each copy re-walked the tokens).
    g = gated.select(
        id_col, text_col, "lang", "n_tokens",
        textops.grams_all_col(F.col("_w"), 2).alias("_g2"),
    )
    rep = g.select(
        id_col, text_col, "lang", "n_tokens",
        F.when(F.size("_g2") == 0, F.lit(0.0))
        .otherwise(1 - F.size(F.array_distinct("_g2")).cast("double") / F.size("_g2"))
        .alias("_d2"),
    ).where(F.col("_d2") <= max_dup2)

    # 3. decontamination — benchmark shingles broadcast; corpus streams.
    # Runs BEFORE exact dedup although the stages commute exactly
    # (contamination is a pure function of text, so every exact-duplicate
    # of a doc is uniformly contaminated): the anti-join references its
    # input lineage twice, and here that lineage is still map-only — the
    # recompute costs a second columnar scan, not a second window shuffle.
    rep = rep.drop("_d2")
    clean = dedup.decontaminate(
        rep, benchmark, n=contamination_n, id_col=id_col, text_col=text_col
    )

    # 4. exact dedup — min-id survivor per content hash; the pipeline's
    # only wide shuffle, run once over rows that survived every gate.
    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(F.col(id_col))
    surv = (
        clean.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )

    # 5. split assignment — map-only hash buckets.
    return surv.select(
        id_col,
        "lang",
        "n_tokens",
        sampling.split_col(F.col(id_col), split_weights).alias("split"),
    )


def dsir_weights(
    pool: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_vocab: int | None = 1_000_000,
) -> DataFrame:
    """DSIR-style importance weights (Data Selection via Importance
    Resampling, Xie et al. 2023, public method): weight each pool document
    by how much more likely a TARGET-domain language model finds it than
    the POOL's own language model — mean per-token
    log2 P_target(w) − log2 P_pool(w). Selection then keeps the top-weight
    documents (resampling ∝ weight in the paper; the deterministic top-k
    variant composes with sampling.hash_sample for the stochastic form).

    The paper uses hashed-bigram LMs; here both LMs are add-one-smoothed
    unigram models (same estimator as unigram_lm_scores, so the weight is
    exactly reproducible in SQL). Positive = target-like, negative =
    generic-web-like.

    Scale shape: two explode+count fits (target is small by definition;
    the pool fit is one extra shuffle over the same exploded tokens the
    scoring pass needs anyway), then scoring streams the pool through TWO
    broadcast vocabulary joins and aggregates once per doc — one pool-wide
    shuffle total, no driver-side state."""

    def _fit(df: DataFrame):
        toks = df.select(F.explode(textops.tokens_col(F.col(text_col))).alias("w"))
        cnt = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
        tot = cnt.agg(
            F.sum("c").cast("long").alias("t"),
            F.count(F.lit(1)).cast("long").alias("v"),
        )
        return cnt, tot

    t_cnt, t_tot = _fit(target)
    p_cnt, p_tot = _fit(pool)
    if max_vocab is not None:
        # the pool vocabulary is web-open (10^7-8 distinct tokens at
        # scale); broadcasting it uncapped is the exact blow-up
        # unigram_lm_scores' max_vocab exists to prevent. Dropped words
        # score as OOV on both sides — the capped-KenLM discipline.
        t_cnt = t_cnt.orderBy(F.desc("c"), "w").limit(max_vocab)
        p_cnt = p_cnt.orderBy(F.desc("c"), "w").limit(max_vocab)
    toks = pool.select(
        id_col, F.explode(textops.tokens_col(F.col(text_col))).alias("w")
    )
    scored = (
        toks.join(F.broadcast(t_cnt.withColumnRenamed("c", "ct")), "w", "left")
        .join(F.broadcast(p_cnt.withColumnRenamed("c", "cp")), "w", "left")
        .crossJoin(F.broadcast(t_tot.select(F.col("t").alias("tt"), F.col("v").alias("tv"))))
        .crossJoin(F.broadcast(p_tot.select(F.col("t").alias("pt"), F.col("v").alias("pv"))))
        .select(
            id_col,
            (
                F.log2(
                    (F.coalesce(F.col("ct"), F.lit(0)) + 1).cast("double")
                    / (F.col("tt") + F.col("tv")).cast("double")
                )
                - F.log2(
                    (F.coalesce(F.col("cp"), F.lit(0)) + 1).cast("double")
                    / (F.col("pt") + F.col("pv")).cast("double")
                )
            ).alias("lr"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.round(F.avg("lr"), 6).alias("dsir_weight"),
    )


def blocklist_filter(
    docs: DataFrame,
    blocked_domains: DataFrame,
    blocked_terms: list[str],
    *,
    host_col: str = "host",
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bad_ratio: float = 0.0,
) -> DataFrame:
    """UT1-style domain + word blocklist gate (the standard public-blocklist
    filter every web-text pipeline runs — cf. RefinedWeb/FineWeb pipelines;
    UT1 is the Université Toulouse 1 public blocklist).

    Returns docs + (domain_blocked, n_bad_terms, bad_ratio, keep).

    - ``blocked_domains`` (DataFrame, one ``domain`` column) match by DNS
      suffix: ``d3.com`` blocks ``d3.com`` AND ``w.d3.com``. Instead of a
      LIKE-join (cross product at scale), each host explodes into its ≤~10
      label suffixes and equi-joins the blocklist — broadcast at the ~10^6
      rows real blocklists have, a plain shuffled semi-join beyond that.
    - ``blocked_terms`` (Python list) ship as an InSet literal INTO codegen:
      occurrences are counted by an array filter on the token array —
      map-only, no shuffle, no UDF.

    The one shuffle in the whole gate is the suffix semi-join; term
    counting, ratio, and the keep verdict are a single codegen'd pass.
    """
    # DNS names are case-insensitive: fold the host like the term side
    # already folds text (a 'ads.EXAMPLE.COM' host silently bypassed the
    # lowercase blocklist before)
    labels = F.split(F.lower(F.col(host_col)), r"\.")
    n = F.size(labels)
    sfx = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.concat_ws(".", F.slice(labels, i, n)),
    )
    bl = F.broadcast(
        blocked_domains.select(F.lower(F.col("domain")).alias("_sfx")).distinct()
    )
    hit_ids = (
        docs.select(id_col, F.explode(sfx).alias("_sfx"))
        .join(bl, "_sfx", "left_semi")
        .select(id_col).distinct()
        .withColumn("_dom_hit", F.lit(True))
    )
    toks = textops.tokens_col(F.lower(F.col(text_col)))
    terms = [t.lower() for t in blocked_terms]
    out = (
        docs.join(hit_ids, id_col, "left")
        .withColumn("_toks", toks)
        .withColumn(
            "n_bad_terms",
            F.size(F.filter(F.col("_toks"), lambda t: t.isin(*terms))).cast("long"),
        )
        .withColumn(
            "bad_ratio",
            F.when(F.size("_toks") > 0,
                   F.col("n_bad_terms") / F.size("_toks")).otherwise(F.lit(0.0)),
        )
        .withColumn("domain_blocked", F.coalesce(F.col("_dom_hit"), F.lit(False)))
        .withColumn(
            "keep",
            ~F.col("domain_blocked") & (F.col("bad_ratio") <= F.lit(max_bad_ratio)),
        )
        .drop("_dom_hit", "_toks")
    )
    return out


def pack_sequences(
    docs: DataFrame,
    seq_len: int,
    n_buckets: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """GPT-style concat-and-chunk sequence packing: lay documents
    end-to-end in a deterministic order and cut the stream into fixed
    ``seq_len``-token training windows — the step that turns a curated
    corpus into pretraining examples (zero padding waste except one
    partial bin per bucket; documents crossing a boundary continue in the
    next bin, exactly the GPT-2/3 data layout — Radford et al. 2019,
    Brown et al. 2020, public).

    The stream is bucketed FIRST (pmod of the cross-engine hash of the
    id, ``n_buckets`` ways) and packed independently per bucket: the
    running-offset window — the one inherently sequential step — runs on
    per-bucket partitions instead of one global sort, so packing
    parallelizes to ``n_buckets`` tasks and scales by raising n_buckets
    with the corpus (each bucket is an independent token stream; training
    shards map 1:1 to buckets). Order within a bucket is (hash, id) —
    shuffle-stable, layout-independent, and growth-stable: inserting new
    docs perturbs only the buckets they land in. Every quantity is an
    exact integer (token counts via textops.tokens_col), so the layout is
    bit-identical on any engine.

    Returns (doc_id, bucket, bin_id, bin_offset, n_tokens): the document
    starts in global bin (bucket, bin_id) at token offset bin_offset."""
    h = textops.hash60(F.concat_ws(":", F.lit("pack"), F.col(id_col).cast("string")))
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.pmod(h, F.lit(n_buckets)).cast("int").alias("bucket"),
        h.alias("_h"),
        F.size(textops.tokens_col(F.col(text_col))).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("_h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return base.select(
        "doc_id",
        "bucket",
        F.floor(start / seq_len).cast("long").alias("bin_id"),
        F.pmod(start, F.lit(seq_len)).cast("int").alias("bin_offset"),
        "n_tokens",
    )


# Literal "trained" weights for the model-based quality filter below. At
# production scale these come out of a fastText / logistic-regression fit on
# labeled (kept, rejected) documents (CCNet Wenzek et al. 2020, DCLM Li et
# al. 2024 — public recipes); the ENGINE contract is only that scoring is a
# broadcast-weights map pass, so the weights ship as a plain dict and the
# fitted model swaps in without a plan change.
QUALITY_LR_WEIGHTS: dict[str, float] = {
    "bias": 1.0,
    "stopword_ratio": 9.0,      # English-like prose has stopwords
    "punct_ratio": -7.0,        # symbol soup / boilerplate penalty
    "chars_per_token": -0.22,   # very long "words" = code/base64/URLs
    "inv_tokens": -48.0,        # 1/(1+n_tokens): short-doc penalty
}


def quality_lr_score(docs: DataFrame, weights: dict[str, float] | None = None,
                     id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Model-based quality filtering (the classifier stage of CCNet/DCLM
    pipelines): a linear model over deterministic text features, scored in
    one whole-stage-codegen map pass — no shuffle, no UDF, no model server.

    Scale shape: the model is a handful of LITERAL coefficients folded into
    the projection (at 100 TB the scan is the whole cost; scoring rides it
    for free and the keep-filter pushes into the same stage). A real
    fastText model (300k n-gram rows) would instead broadcast-join its
    embedding table — same engine surface, one broadcast.

    Determinism: every feature is a ratio of exact integers
    (textops.quality_cols counts), and IEEE +,-,*,/ are exactly rounded, so
    with a fixed evaluation order the logit is BIT-identical on any engine
    — no transcendentals (the sigmoid is monotone, so thresholding the
    logit IS thresholding the probability; emit the logit).

    Returns (doc_id, quality_logit, keep)."""
    w = weights or QUALITY_LR_WEIGHTS
    feats = textops.quality_cols(F.col(text_col))
    n_tokens = feats["n_tokens"].cast("double")
    n_chars = feats["n_chars"].cast("double")
    punct_ratio = F.when(
        feats["n_chars"] > 0, feats["n_punct"].cast("double") / n_chars
    ).otherwise(F.lit(0.0))
    chars_per_token = F.when(feats["n_tokens"] > 0, n_chars / n_tokens).otherwise(F.lit(0.0))
    inv_tokens = F.lit(1.0) / (F.lit(1.0) + n_tokens)
    logit = (
        F.lit(float(w["bias"]))
        + F.lit(float(w["stopword_ratio"])) * feats["stopword_ratio"]
        + F.lit(float(w["punct_ratio"])) * punct_ratio
        + F.lit(float(w["chars_per_token"])) * chars_per_token
        + F.lit(float(w["inv_tokens"])) * inv_tokens
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.round(logit, 9).alias("quality_logit"),
        (logit >= 0.0).alias("keep"),
    )


def temperature_quotas(
    docs: DataFrame,
    source_col: str,
    budget: int,
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-reweighted domain quotas — the multilingual/multi-source
    sampling rule from XLM-R (Conneau et al. 2020) and the LLaMA corpus
    recipe (public): sample probability p_d ∝ n_d^alpha, alpha < 1
    flattening the head so tail domains keep representation. Returns one
    row per domain: (source, n_docs, p, quota) with Σ quota == budget
    EXACTLY via largest-remainder apportionment (floor everywhere, then
    the remaining seats go to the largest fractional parts, ties broken
    by source — fully deterministic, no iteration).

    Scale shape: one partial-agg count shuffle reduces the corpus to the
    domain table; every window after that runs over |domains| rows (10^5-6
    at web scale — driver-free but trivially small for windows). The
    realized sample is then stratified_sample with per-stratum k = quota
    (one corpus window), so the whole mix costs two shuffles end to end.

    Cross-engine determinism (oracle contract): alpha = 0.5 keeps every
    per-domain weight bit-identical (sqrt is IEEE-correctly-rounded;
    pow is libm-dependent), but the TOTAL Σ√n_d is a float sum whose
    accumulation order the engines don't share, so p can differ in the
    last ulp. Seats and fractional remainders are therefore rounded to
    9 decimals BEFORE flooring/ranking on both engines — a seat flips
    only if two domains' remainders (or a remainder and an integer
    boundary) genuinely coincide within 1e-9, which a fixture controls
    and real corpora make vanishingly unlikely; this is tolerance-by-
    construction, not bit-exactness. Arbitrary alpha adds the pow()
    divergence on top; value-level oracles should pin alpha=0.5."""
    if alpha == 0.5:
        weight = F.sqrt(F.col("n_docs").cast("double"))
    else:
        weight = F.pow(F.col("n_docs").cast("double"), F.lit(float(alpha)))
    agg = docs.groupBy(F.col(source_col).alias("source")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    w_all = Window.partitionBy()
    p = weight / F.sum(weight).over(w_all)
    # round-before-floor/rank absorbs the sum-order ulp (see docstring)
    seats = F.round(p * F.lit(float(budget)), 9)
    base = F.floor(seats).cast("long")
    frac = F.round(seats - F.floor(seats), 9)
    shorted = agg.select(
        "source", "n_docs", p.alias("p"), base.alias("_base"),
        frac.alias("_frac"),
    ).withColumn("_left", F.lit(budget) - F.sum("_base").over(w_all))
    w_rank = Window.orderBy(F.col("_frac").desc(), F.col("source"))
    return (
        shorted.withColumn("_r", F.row_number().over(w_rank))
        .select(
            "source", "n_docs", "p",
            (F.col("_base")
             + F.when(F.col("_r") <= F.col("_left"), F.lit(1)).otherwise(F.lit(0))
             ).cast("long").alias("quota"),
        )
    )
