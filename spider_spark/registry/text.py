"""Text analysis (training-data tier) over documents — registry tier split out of the former
monolithic queries.py (round 4). Conventions live in
spider_spark/registry/__init__.py; enumeration order is preserved by
the import order there."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window
from spider_spark import textops
from spider_spark.registry._base import T, q


# =====================================================================
# Text analysis (training-data tier) over documents
# =====================================================================

_SQL_TOKENS = "list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '')"


def _sql_shingles(n: int) -> str:
    gram = " || ' ' || ".join(f"w[i+{k}]" for k in range(n))
    return (
        f"list_distinct(list_transform(generate_series(1, greatest(len(w) - {n - 1}, 0)), i -> {gram}))"
    )


@q(
    "token_counts",
    f"""
    SELECT doc_id,
           len({_SQL_TOKENS})::INT AS n_ws_tokens,
           len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\s]'))::INT AS n_bpe_pieces
    FROM documents
    """,
)
def token_counts(spark, sf_dir):
    """Token counting: whitespace + BPE-ish piece regex."""
    d = T(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(textops.tokens_col(F.col("text"))).alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), 0)).alias("n_bpe_pieces"),
    )


_BM25_TERMS = ("spark", "hash", "merge")
_BM25_K1, _BM25_B = 1.2, 0.75


def _bm25_sql() -> str:
    tf_cols = ", ".join(
        f"len(list_filter(w, x -> x = '{t}'))::DOUBLE AS tf{i}"
        for i, t in enumerate(_BM25_TERMS)
    )
    df_cols = ", ".join(
        f"sum((tf{i} > 0)::INT)::DOUBLE AS df{i}" for i in range(len(_BM25_TERMS))
    )
    contribs = " + ".join(
        f"ln((n_docs - df{i} + 0.5) / (df{i} + 0.5) + 1.0)"
        f" * (tf{i} * {_BM25_K1 + 1}) / (tf{i} + {_BM25_K1} * (1 - {_BM25_B} + {_BM25_B} * dl / avgdl))"
        for i in range(len(_BM25_TERMS))
    )
    return f"""
    WITH toks AS (SELECT doc_id, {_SQL_TOKENS} AS w FROM documents),
    base AS (SELECT doc_id, len(w)::DOUBLE AS dl, {tf_cols} FROM toks),
    g AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl, {df_cols} FROM base)
    SELECT doc_id, round({contribs}, 6) AS bm25
    FROM base, g
    ORDER BY bm25 DESC, doc_id LIMIT 20
    """


@q("bm25_topk", _bm25_sql())
def bm25_topk(spark, sf_dir):
    """BM25 top-k keyword retrieval over the documents table — the ranked
    lookup a training-data pipeline runs for targeted corpus slices.

    Whole plan is JVM builtins: one tokenize pass computes dl + per-term
    tf, one single-row agg yields N/avgdl/df (broadcast back — no second
    scan shuffle), scoring is arithmetic, and the top-k is a TakeOrdered
    (never a global sort). Operand order matches the oracle SQL exactly
    so IEEE doubles agree bit-for-bit everywhere except ln(), which both
    engines compute correctly-rounded-in-practice; round(...,6) absorbs
    any last-ulp drift. Scales as one map + one tiny broadcast at 100 TB."""
    d = T(spark, sf_dir, "documents")
    toks = d.select("doc_id", textops.tokens_col(F.col("text")).alias("toks"))
    def eq(term):
        # single-parameter closure: a `lambda t, term=term` would be handed
        # (element, index) by pyspark's higher-order-function binding
        return lambda t: t == F.lit(term)

    base = toks.select(
        "doc_id",
        F.size("toks").cast("double").alias("dl"),
        *[
            F.size(F.filter("toks", eq(term))).cast("double").alias(f"tf{i}")
            for i, term in enumerate(_BM25_TERMS)
        ],
    )
    g = base.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("int")).cast("double").alias(f"df{i}")
            for i in range(len(_BM25_TERMS))
        ],
    )
    j = base.crossJoin(F.broadcast(g))
    score = None
    for i in range(len(_BM25_TERMS)):
        tf, df = F.col(f"tf{i}"), F.col(f"df{i}")
        idf = F.log((F.col("n_docs") - df + 0.5) / (df + 0.5) + 1.0)
        contrib = idf * (tf * (_BM25_K1 + 1)) / (
            tf + _BM25_K1 * (1 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
        )
        score = contrib if score is None else score + contrib
    return (
        j.select("doc_id", F.round(score, 6).alias("bm25"))
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(20)
    )


@q(
    "tfidf_top_terms",
    f"""
    WITH tok AS (SELECT doc_id, unnest({_SQL_TOKENS}) AS term FROM documents),
    tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY doc_id, term),
    df AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM tok GROUP BY term),
    n AS (SELECT count(*)::BIGINT AS n FROM documents),
    s AS (SELECT doc_id, term, tf,
                 round(tf * ln((n + 1.0) / (df + 1.0)), 6) AS tfidf
          FROM tf JOIN df USING (term) CROSS JOIN n),
    r AS (SELECT *, row_number() OVER
            (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rnk FROM s)
    SELECT doc_id, rnk::INT AS rnk, term, tf, tfidf FROM r WHERE rnk <= 3
    """,
)
def tfidf_top_terms(spark, sf_dir):
    """Per-doc TF-IDF keyword extraction (top-3 terms): the classic
    corpus-characterization / doc-tagging signal. Smoothed idf
    ln((N+1)/(df+1)); ranking is over the ROUNDED score (ties broken by
    term) so rank order is engine-independent.

    Scale shape: one tokenize pass feeds both tf (groupBy doc,term — one
    shuffle) and df (groupBy term — the vocabulary agg); scoring joins tf
    against the vocabulary on term (AQE broadcasts when the vocab is
    small; plain shuffle join otherwise — never a driver collect). The
    per-doc top-3 is a window PARTITIONED BY doc_id — no global sort, no
    skew (partition = one doc)."""
    d = T(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(textops.tokens_col(F.col("text"))).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).cast("long").alias("tf"))
    df = tok.groupBy("term").agg(F.countDistinct("doc_id").cast("long").alias("df"))
    n = d.agg(F.count(F.lit(1)).cast("long").alias("n"))
    s = (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id", "term", "tf",
            F.round(
                F.col("tf") * F.log((F.col("n") + 1.0) / (F.col("df") + 1.0)), 6
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), "term")
    return (
        s.withColumn("rnk", F.row_number().over(w).cast("int"))
        .where(F.col("rnk") <= 3)
        .select("doc_id", "rnk", "term", "tf", "tfidf")
    )


_CMS_DEPTH = 4
_CMS_WIDTH = 64        # deliberately tight: 150 keys in 64 buckets forces
                       # collisions so the min-over-rows estimator is
                       # actually exercised (overestimate > 0 on the fixture)


@q(
    "cms_heavy_hitters",
    f"""
    WITH ev AS (SELECT 'h' || user_id::VARCHAR AS k FROM events),
    d AS (SELECT unnest([{", ".join(str(i) for i in range(_CMS_DEPTH))}]) AS i),
    hb AS (SELECT k, i, ({textops.hash60_sql("i::VARCHAR || ':' || k")}) % {_CMS_WIDTH} AS b
           FROM ev, d),
    counters AS (SELECT i, b, count(*) AS c FROM hb GROUP BY i, b),
    truth AS (SELECT k, count(*) AS true_count FROM ev GROUP BY k),
    kb AS (SELECT t.k, t.true_count, d.i,
                  ({textops.hash60_sql("d.i::VARCHAR || ':' || t.k")}) % {_CMS_WIDTH} AS b
           FROM truth t, d)
    SELECT kb.k AS host,
           kb.true_count::BIGINT AS true_count,
           min(c.c)::BIGINT AS cms_estimate,
           (min(c.c) - kb.true_count)::BIGINT AS overestimate
    FROM kb JOIN counters c ON c.i = kb.i AND c.b = kb.b
    GROUP BY kb.k, kb.true_count
    """,
)
def cms_heavy_hitters(spark, sf_dir):
    """Count-min sketch (Cormode-Muthukrishnan, J.Alg 2005) frequency
    estimation — the hot-host / heavy-hitter telemetry a frontier needs at
    10^10 URLs, where an exact per-host count is a full shuffle but the
    sketch is ONE map pass partially aggregated into depth×width = 256
    counter cells (map-side combine reduces every partition to ≤256 rows
    before the exchange; the counter table then BROADCASTS to estimate any
    key set). Deterministic row hashes via the shared md5 hash60, so DuckDB
    reproduces every counter cell and every min-estimate exactly; width is
    sized below the fixture's key count so collisions (and the CMS
    one-sided overestimate) are real in the output. The exact count rides
    along to make the query self-auditing — overestimate ≥ 0 is the CMS
    guarantee, asserted in pytest."""
    ev = T(spark, sf_dir, "events").select(
        F.concat(F.lit("h"), F.col("user_id").cast("string")).alias("k")
    )
    depth_lits = F.array(*[F.lit(i) for i in range(_CMS_DEPTH)])

    def bucket(i_col, k_col):
        return textops.hash60(
            F.concat(i_col.cast("string"), F.lit(":"), k_col)
        ) % _CMS_WIDTH

    hb = ev.select("k", F.explode(depth_lits).alias("i")).select(
        "k", "i", bucket(F.col("i"), F.col("k")).alias("b")
    )
    counters = hb.groupBy("i", "b").agg(F.count(F.lit(1)).alias("c"))
    truth = ev.groupBy("k").agg(F.count(F.lit(1)).alias("true_count"))
    kb = truth.select("k", "true_count", F.explode(depth_lits).alias("i")).select(
        "k", "true_count", "i", bucket(F.col("i"), F.col("k")).alias("b")
    )
    est = (
        kb.join(F.broadcast(counters), ["i", "b"])
        .groupBy("k", "true_count")
        .agg(F.min("c").alias("cms_estimate"))
    )
    return est.select(
        F.col("k").alias("host"),
        F.col("true_count").cast("long").alias("true_count"),
        F.col("cms_estimate").cast("long").alias("cms_estimate"),
        (F.col("cms_estimate") - F.col("true_count")).cast("long").alias("overestimate"),
    )


_HLL_M = 1024          # 2^10 registers
_HLL_ALPHA = 0.7205407583220416   # 0.7213 / (1 + 1.079/1024), inlined both sides
_HLL_POW51 = 2251799813685248     # 2^51


@q(
    "hll_distinct_tokens",
    f"""
    WITH tok AS (SELECT doc_id, unnest({_SQL_TOKENS}) AS tok FROM documents),
    keys AS (SELECT 'vocab' AS scope, tok AS k FROM tok
             UNION ALL
             SELECT 'doc_terms' AS scope, doc_id::VARCHAR || ':' || tok AS k FROM tok),
    h AS (SELECT scope, {textops.hash60_sql('k')} AS h FROM keys),
    reg AS (SELECT scope, h % {_HLL_M} AS b,
                   max(CASE WHEN h // {_HLL_M} = 0 THEN 51
                            ELSE 51 - length(bin(h // {_HLL_M})) END) AS m
            FROM h GROUP BY scope, b),
    s AS (SELECT scope, count(*)::BIGINT AS present,
                 sum(1::BIGINT << (51 - m))::BIGINT AS s_present
          FROM reg GROUP BY scope),
    e AS (SELECT scope, present,
                 {_HLL_M} - present AS v,
                 {_HLL_ALPHA}::DOUBLE * {_HLL_M} * {_HLL_M} * {_HLL_POW51}
                   / (s_present + ({_HLL_M} - present) * {_HLL_POW51}) AS e_raw
          FROM s),
    x AS (SELECT scope, count(DISTINCT k)::BIGINT AS exact_distinct
          FROM keys GROUP BY scope)
    SELECT scope, {_HLL_M} AS m, v::BIGINT AS n_empty,
           round(CASE WHEN v > 0 AND e_raw <= 2560.0
                      THEN {_HLL_M} * ln({_HLL_M} / v::DOUBLE) ELSE e_raw END,
                 3) AS est_distinct,
           exact_distinct
    FROM e JOIN x USING (scope)
    """,
)
def hll_distinct_tokens(spark, sf_dir):
    """HyperLogLog distinct-count sketch over the corpus vocabulary,
    value-level reproducible: registers are exact integers (shared
    md5-prefix hash60, bucket = h mod 1024, rho = leading zeros of the
    remaining 50 bits + 1), the harmonic sum is computed in the INTEGER
    domain (sum of 2^(51-M_j) as BIGINT — no float-summation-order drift),
    and only the final division/ln is floating point (round(,3) absorbs
    ulp). Flajolet et al.'s small-range correction applied below 2.5m.

    This is the sketch a 100 TB pipeline uses for distinct-URL / distinct
    -token telemetry: one map pass + a (scope × 1024)-row agg — versus the
    full shuffle of count(DISTINCT). Two scopes so BOTH estimator branches
    are exercised on the fixture: 'vocab' (tiny — linear counting) and
    'doc_terms' (thousands — the raw harmonic-mean branch). The exact
    count rides along purely to make the query self-auditing (relative
    error visible in the output)."""
    d = T(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(textops.tokens_col(F.col("text"))).alias("tok"))
    keys = tok.select(F.lit("vocab").alias("scope"), F.col("tok").alias("k")).unionAll(
        tok.select(
            F.lit("doc_terms").alias("scope"),
            F.concat(F.col("doc_id").cast("string"), F.lit(":"), "tok").alias("k"),
        )
    )
    h = keys.select("scope", textops.hash60(F.col("k")).alias("h"))
    # integer `div`, NOT `/`: h is up to 60 bits, and double division would
    # round away the low bits that decide the bucket remainder
    rem = F.expr(f"h div {_HLL_M}")
    rho = F.when(rem == 0, F.lit(51)).otherwise(
        F.lit(51) - F.length(F.conv(rem.cast("string"), 10, 2))
    )
    reg = (
        h.select("scope", (F.col("h") % _HLL_M).alias("b"), rho.alias("rho"))
        .groupBy("scope", "b")
        .agg(F.max("rho").alias("m"))
    )
    s = reg.groupBy("scope").agg(
        F.count(F.lit(1)).cast("long").alias("present"),
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(51 - m AS INT))"))
        .cast("long")
        .alias("s_present"),
    )
    e = s.select(
        "scope",
        (F.lit(_HLL_M) - F.col("present")).alias("v"),
        (
            F.lit(_HLL_ALPHA * _HLL_M * _HLL_M * _HLL_POW51)
            / (F.col("s_present") + (F.lit(_HLL_M) - F.col("present")) * F.lit(_HLL_POW51))
        ).alias("e_raw"),
    )
    x = keys.groupBy("scope").agg(
        F.countDistinct("k").cast("long").alias("exact_distinct")
    )
    return e.join(x, "scope").select(
        "scope",
        F.lit(_HLL_M).alias("m"),
        F.col("v").cast("long").alias("n_empty"),
        F.round(
            F.when(
                (F.col("v") > 0) & (F.col("e_raw") <= 2560.0),
                F.lit(float(_HLL_M)) * F.log(F.lit(_HLL_M) / F.col("v").cast("double")),
            ).otherwise(F.col("e_raw")),
            3,
        ).alias("est_distinct"),
        "exact_distinct",
    )


_MIX_QUOTA = 1500  # tokens per lang stratum
_MIX_HASH = textops.hash60_sql("'mix:' || doc_id::VARCHAR")


@q(
    "token_budget_mix",
    f"""
    WITH t AS (SELECT lang, doc_id, len({_SQL_TOKENS})::BIGINT AS n_tokens,
                      {_MIX_HASH} AS hk
               FROM documents),
    c AS (SELECT *, sum(n_tokens) OVER
            (PARTITION BY lang ORDER BY hk, doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM t)
    SELECT lang, doc_id, n_tokens, cum::BIGINT AS cum_tokens
    FROM c WHERE cum - n_tokens < {_MIX_QUOTA}
    """,
)
def token_budget_mix(spark, sf_dir):
    """Data-mixture construction under a per-stratum TOKEN budget (public
    method: pretraining mixtures are specified in tokens per source/lang,
    not document counts — a count quota over-samples short docs). Docs are
    admitted in deterministic hash order (unbiased, reproducible at any
    cluster size) until the stratum's running token total passes the
    budget; the straddling doc is kept, so every stratum reaches ≥ quota
    when it has the supply.

    Scale shape: one cumulative-sum window PARTITIONED BY the stratum —
    never a global sort; a stratum's rows co-locate on one partition,
    which is exactly the right skew story when strata are
    (source, lang) slices of bounded size. Composes upstream of
    sampling.split_col."""
    d = T(spark, sf_dir, "documents")
    t = d.select(
        "lang",
        "doc_id",
        F.size(textops.tokens_col(F.col("text"))).cast("long").alias("n_tokens"),
        textops.hash60(
            F.concat(F.lit("mix:"), F.col("doc_id").cast("string"))
        ).alias("hk"),
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("hk", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        t.withColumn("cum", F.sum("n_tokens").over(w))
        .where(F.col("cum") - F.col("n_tokens") < _MIX_QUOTA)
        .select("lang", "doc_id", "n_tokens", F.col("cum").cast("long").alias("cum_tokens"))
    )


_PASSAGE_L = 8


def _dup_passage_sql() -> str:
    gram = " || ' ' || ".join(f"w[i+{k}]" for k in range(_PASSAGE_L))
    return f"""
    WITH toks AS (SELECT doc_id, {_SQL_TOKENS} AS w FROM documents),
    g AS (SELECT doc_id, i AS pos, {textops.hash60_sql(f"({gram})")} AS h
          FROM toks, unnest(generate_series(1, greatest(len(w) - {_PASSAGE_L - 1}, 0))) AS t(i)),
    dup AS (SELECT h FROM g GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
    p AS (SELECT doc_id, pos FROM g WHERE h IN (SELECT h FROM dup)),
    isl AS (SELECT doc_id, pos,
                   pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
            FROM p)
    SELECT doc_id, min(pos)::INT AS span_start,
           (max(pos) + {_PASSAGE_L - 1})::INT AS span_end,
           (max(pos) + {_PASSAGE_L} - min(pos))::INT AS span_len
    FROM isl GROUP BY doc_id, grp
    """


def _dup_passage_removed_sql() -> str:
    spans = _dup_passage_sql().strip()
    return f"""
    WITH spans AS ({spans}),
    cover AS (SELECT DISTINCT doc_id, unnest(generate_series(span_start, span_end)) AS pos
              FROM spans),
    tok AS (SELECT doc_id, i AS pos, ws[i] AS w
            FROM (SELECT doc_id, {_SQL_TOKENS} AS ws FROM documents),
                 unnest(generate_series(1, len(ws))) AS t(i)),
    kept AS (SELECT tok.doc_id, tok.pos, tok.w
             FROM tok LEFT JOIN cover
               ON tok.doc_id = cover.doc_id AND tok.pos = cover.pos
             WHERE cover.pos IS NULL)
    SELECT doc_id,
           coalesce(string_agg(w, ' ' ORDER BY pos), '') AS clean_text,
           count(w)::BIGINT AS n_kept
    FROM documents LEFT JOIN kept USING (doc_id)
    GROUP BY doc_id
    """


@q("dup_passage_removed", _dup_passage_removed_sql())
def dup_passage_removed(spark, sf_dir):
    """The removal half of passage-level dedup: apply the duplicated-span
    mask from ``dup_passage_spans`` and reassemble each doc's surviving
    tokens in order (Lee et al. cut the repeated sequence from EVERY
    occurrence; dropped-token counts make the cut auditable).

    Scale shape: spans explode into covered positions (bounded by span
    length — never by doc length), the mask is an anti-join on
    (doc_id, pos), and reassembly is a partition-local sorted
    string-agg per doc — the same in-expression reassembly discipline as
    line_dedup_boilerplate. No windows beyond the span detection it
    composes."""
    d = T(spark, sf_dir, "documents")
    spans = dup_passage_spans(spark, sf_dir)
    cover = spans.select(
        "doc_id",
        F.explode(F.sequence("span_start", "span_end")).alias("pos"),
    ).distinct()
    tok = d.select(
        "doc_id",
        F.posexplode(textops.tokens_col(F.col("text"))).alias("pos0", "w"),
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "w")
    kept = tok.join(cover, ["doc_id", "pos"], "left_anti")
    agg = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "w"))), lambda s: s["w"]
            ),
            " ",
        ).alias("clean_text"),
        F.count(F.lit(1)).cast("long").alias("n_kept"),
    )
    return d.select("doc_id").join(agg, "doc_id", "left").select(
        "doc_id",
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
    )


@q("dup_passage_spans", _dup_passage_sql())
def dup_passage_spans(spark, sf_dir):
    """Passage-level exact-duplicate span detection — the substring-dedup
    step of modern pretraining pipelines (public method: Lee et al.,
    "Deduplicating Training Data Makes Language Models Better": remove any
    ≥L-token sequence that repeats across the corpus; doc-level dedup
    misses these). Suffix arrays don't distribute; the Spark-shaped
    equivalent is positional L-gram hashing: every L-gram position, keep
    grams seen in ≥2 DISTINCT docs, then merge adjacent duplicated
    positions into maximal spans (gap-and-islands: pos − row_number).

    Returns (doc_id, span_start, span_end, span_len) in 1-based token
    coordinates — the mask a removal pass applies.

    Scale shape: grams travel as their 60-bit hash, never as strings —
    the dup-gram shuffle is 8 bytes/gram (collision behavior identical in
    the oracle, which joins on the same hash); the ≥2-docs filter is one
    map-side-combinable agg; span merge is a window PARTITIONED BY doc
    (no skew: partition = one doc's duplicated positions)."""
    d = T(spark, sf_dir, "documents")
    toks = d.select("doc_id", textops.tokens_col(F.col("text")).alias("w"))
    g = toks.select(
        "doc_id",
        F.posexplode(textops.grams_all_col(F.col("w"), _PASSAGE_L)).alias(
            "pos0", "gram"
        ),
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), textops.hash60(F.col("gram")).alias("h"))
    dup = (
        g.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .where(F.col("nd") >= 2)
        .select("h")
    )
    p = g.join(dup, "h", "left_semi").select("doc_id", "pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    isl = p.withColumn("grp", F.col("pos") - F.row_number().over(w))
    return (
        isl.groupBy("doc_id", "grp")
        .agg(
            F.min("pos").cast("int").alias("span_start"),
            (F.max("pos") + (_PASSAGE_L - 1)).cast("int").alias("span_end"),
            (F.max("pos") + _PASSAGE_L - F.min("pos")).cast("int").alias("span_len"),
        )
        .select("doc_id", "span_start", "span_end", "span_len")
    )


def _lang_score_sql(lang: str) -> str:
    pats = textops.LANG_MARKERS[lang]
    terms = [
        f"((length(p) - length(replace(p, '{p_}', ''))) / {len(p_)})" for p_ in pats
    ]
    return "(" + " + ".join(terms) + ")::DOUBLE"


_LANGS_DESC = sorted(textops.LANG_MARKERS, reverse=True)
_LANG_CASE = "CASE " + " ".join(
    f"WHEN s_{l} = m THEN '{l}'" for l in _LANGS_DESC[:-1]
) + f" ELSE '{_LANGS_DESC[-1]}' END"

@q(
    "lang_id",
    f"""
    WITH scored AS (
      SELECT doc_id,
             {" , ".join(f"{_lang_score_sql(l)} AS s_{l}" for l in sorted(textops.LANG_MARKERS))}
      FROM (SELECT doc_id, ' ' || text || ' ' AS p FROM documents)),
    m AS (SELECT *, greatest({', '.join('s_' + l for l in sorted(textops.LANG_MARKERS))}) AS m FROM scored)
    SELECT doc_id, {_LANG_CASE} AS lang_pred, s_en AS score_en FROM m
    """,
)
def lang_id(spark, sf_dir):
    """Language-ID n-gram/stopword heuristic; argmax with deterministic
    lexicographically-last tiebreak (matched CASE chain in the oracle)."""
    d = T(spark, sf_dir, "documents")
    scores = textops.lang_scores_col(F.col("text"))
    return d.select(
        "doc_id",
        textops.lang_id_col(F.col("text")).alias("lang_pred"),
        scores["en"].alias("score_en"),
    )


@q(
    "quality_scores",
    f"""
    WITH t AS (SELECT doc_id, text, {_SQL_TOKENS} AS toks FROM documents)
    SELECT doc_id,
           len(toks)::BIGINT AS n_tokens,
           length(text)::BIGINT AS n_chars,
           len(list_filter(toks, x -> x IN ('the','a','and','of','to')))::BIGINT AS n_stopwords,
           (length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))::BIGINT AS n_punct,
           CASE WHEN len(toks) > 0
                THEN len(list_filter(toks, x -> x IN ('the','a','and','of','to')))::DOUBLE / len(toks)::DOUBLE
                ELSE 0.0 END AS stopword_ratio
    FROM t
    """,
)
def quality_scores(spark, sf_dir):
    """Quality scoring: integer features + exact-ratio stopword share."""
    d = T(spark, sf_dir, "documents")
    cols = textops.quality_cols(F.col("text"))
    return d.select("doc_id", *[c.alias(k) for k, c in cols.items()])


@q(
    "corpus_keep_filter",
    f"""
    WITH t AS (SELECT doc_id, text, {_SQL_TOKENS} AS toks, ' ' || text || ' ' AS p FROM documents),
    q AS (SELECT doc_id,
            len(toks)::BIGINT AS n_tokens,
            length(text)::BIGINT AS n_chars,
            (length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))::BIGINT AS n_punct,
            CASE WHEN len(toks) > 0
                 THEN len(list_filter(toks, x -> x IN ('the','a','and','of','to')))::DOUBLE / len(toks)::DOUBLE
                 ELSE 0.0 END AS stopword_ratio,
            {" , ".join(f"{_lang_score_sql(l)} AS s_{l}" for l in sorted(textops.LANG_MARKERS))}
          FROM t),
    m AS (SELECT *, greatest({', '.join('s_' + l for l in sorted(textops.LANG_MARKERS))}) AS m FROM q)
    SELECT doc_id,
           CASE WHEN n_tokens < 12 THEN 'drop:too_short'
                WHEN n_punct * 5 > n_chars THEN 'drop:punct_heavy'
                WHEN ({_LANG_CASE}) NOT IN ('en', 'zh') THEN 'drop:lang'
                WHEN stopword_ratio * 100 < 2 THEN 'drop:stopword_low'
                ELSE 'keep' END AS verdict,
           n_tokens, round(stopword_ratio, 6) AS stopword_ratio
    FROM m
    """,
)
def corpus_keep_filter(spark, sf_dir):
    """The training-data gate that composes the text-analysis operators
    into an actual keep/drop decision with a reason code — length floor,
    punctuation-density cap, language allowlist (en/zh), stopword-ratio
    floor — first-failing-rule-wins, the standard web-corpus filter
    cascade (C4-200/Gopher-style rules re-expressed over this engine's
    deterministic features). Every branch is exact-integer-derived, so the
    verdict is bit-identical cross-engine."""
    d = T(spark, sf_dir, "documents")
    qc = textops.quality_cols(F.col("text"))
    lang = textops.lang_id_col(F.col("text"))
    verdict = (
        F.when(qc["n_tokens"] < 12, F.lit("drop:too_short"))
        .when(qc["n_punct"] * 5 > qc["n_chars"], F.lit("drop:punct_heavy"))
        .when(~lang.isin("en", "zh"), F.lit("drop:lang"))
        .when(qc["stopword_ratio"] * 100 < 2, F.lit("drop:stopword_low"))
        .otherwise(F.lit("keep"))
    )
    return d.select(
        "doc_id", verdict.alias("verdict"),
        qc["n_tokens"].alias("n_tokens"),
        F.round(qc["stopword_ratio"], 6).alias("stopword_ratio"),
    )


@q(
    "doc_fingerprints",
    f"""
    WITH t AS (SELECT doc_id, {_SQL_TOKENS} AS w FROM documents),
    g AS (SELECT doc_id, {_sql_shingles(5)} AS grams FROM t)
    SELECT doc_id,
           len(grams)::BIGINT AS n_shingles,
           coalesce(list_min(list_transform(grams, s -> {textops.hash60_sql('s')})), 0)::BIGINT AS fp_min,
           (coalesce(list_sum(list_transform(grams, s -> {textops.hash60_sql('s')} % 1000003)), 0) % 1000000007)::BIGINT AS fp_sum_mod
    FROM g
    """,
)
def doc_fingerprints(spark, sf_dir):
    """Document fingerprinting: rolling-hash digest over word 5-grams
    (tokens and grams materialized stepwise — see textops.grams_col)."""
    d = T(spark, sf_dir, "documents")
    toks = d.select("doc_id", textops.tokens_col(F.col("text")).alias("toks"))
    grams = toks.select("doc_id", textops.grams_col(F.col("toks"), 5).alias("grams"))
    cols = textops.fingerprint_cols(F.col("grams"))
    return grams.select("doc_id", *[c.alias(k) for k, c in cols.items()])


@q(
    "bpe_token_counts",
    f"""
    WITH t AS (SELECT doc_id, coalesce(text, '') AS text FROM documents),
    b AS (SELECT doc_id,
                 regexp_extract_all(text, '{textops.BPE_SPLIT_PATTERN.replace("'", "''")}') AS pieces,
                 {_SQL_TOKENS} AS toks
          FROM t)
    SELECT doc_id,
           len(pieces)::BIGINT AS n_bpe_tokens,
           len(list_filter(pieces, p -> regexp_matches(p, '\\p{{L}}')))::BIGINT AS n_word_pieces,
           len(toks)::BIGINT AS n_ws_tokens,
           CASE WHEN len(toks) > 0
                THEN round(len(pieces)::DOUBLE / len(toks)::DOUBLE, 6)
                ELSE 0.0 END AS pieces_per_word
    FROM b
    """,
)
def bpe_token_counts(spark, sf_dir):
    """LLM token budgeting: BPE-style pre-tokenizer counts (GPT-2 split
    pattern, textops.BPE_SPLIT_PATTERN) next to plain whitespace counts —
    the pieces_per_word ratio is the standard chars-free fertility proxy
    for budget planning. Entirely JVM-side regexp_extract_all (no Python
    in the hot path); the oracle runs the IDENTICAL pattern through
    DuckDB's RE2 — the pattern is written to the common Java-regex/RE2
    dialect (no lookahead, explicit whitespace class) so both engines
    tokenize bit-identically. Builder-brief text-analysis tier (token
    counting: whitespace + a BPE-ish regex); reference has no tokenizer
    (its text handling stops at regex field extraction, qcc.py)."""
    d = T(spark, sf_dir, "documents")
    pieces = textops.bpe_tokens_col(F.col("text"))
    toks = textops.tokens_col(F.coalesce(F.col("text"), F.lit("")))
    b = d.select(
        "doc_id", pieces.alias("pieces"), toks.alias("toks")
    )
    n_p, n_t = F.size("pieces").cast("long"), F.size("toks").cast("long")
    word = F.filter(F.col("pieces"), lambda p: p.rlike(r"\p{L}"))
    return b.select(
        "doc_id",
        n_p.alias("n_bpe_tokens"),
        F.size(word).cast("long").alias("n_word_pieces"),
        n_t.alias("n_ws_tokens"),
        F.when(n_t > 0, F.round(n_p.cast("double") / n_t.cast("double"), 6))
        .otherwise(F.lit(0.0))
        .alias("pieces_per_word"),
    )


