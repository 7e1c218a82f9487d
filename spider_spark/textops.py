"""Text-analysis operators for the training-data pipeline tier.

Column-expression builders (JVM-side, whole-stage codegen — no Python in
the hot path) for: tokenization, shingling, MinHash signatures, SimHash,
language-ID heuristic, quality scoring, token counting, and document
fingerprinting. Every operator has an exact ANSI-SQL equivalent (see
queries.py oracles) built on the same deterministic hash so results are
bit-identical across engines.

Cross-engine hash: the reference keys everything on ``md5(url)``
(分布式京东商品详情页/mongo_redis_mgr.py:49); we extend that to a shared
60-bit integer hash ``conv(substr(md5(s),1,15),16,10)`` that DuckDB
reproduces as ``('0x'||substr(md5(s),1,15))::UBIGINT::BIGINT`` — the
foundation for MinHash/SimHash parity without any UDF.

Scale notes (100 TB): every function here is a narrow per-row map — no
shuffle, embarrassingly parallel, scales linearly with input splits. The
MinHash banding is seeded-xxhash64 arithmetic over the shingle array
(higher-order array functions), not k md5 passes — and not a UDF.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F


def hash60(col: Column) -> Column:
    """Shared deterministic 60-bit hash (md5 prefix), identical in DuckDB."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def hash60_sql(expr: str) -> str:
    """DuckDB rendering of :func:`hash60` over SQL expression ``expr``."""
    return f"(('0x' || substr(md5({expr}), 1, 15))::UBIGINT::BIGINT)"


# ---------------------------------------------------------------- tokenizing
#: explicit whitespace class, NOT \s: Java's \s is [ \t\n\x0B\f\r] while
#: RE2's (DuckDB) excludes \x0B — a crawled page containing a vertical tab
#: would tokenize differently per engine and break every downstream
#: bit-identical contract (shingles, Jaccard, fingerprints, phrase index).
#: The same class must appear in the SQL twin (queries._SQL_TOKENS).
WS_CLASS = r"[ \t\n\x0B\f\r]+"


def tokens_col(text: Column) -> Column:
    """Whitespace tokens, empty strings dropped (matches DuckDB
    regexp_split + list_filter over the SAME explicit class)."""
    return F.filter(F.split(text, WS_CLASS), lambda t: t != "")


#: GPT-2-family pre-tokenizer split pattern (Radford et al. 2019, public),
#: minus the trailing ``\s+(?!\S)`` lookahead — RE2 (DuckDB) has no
#: lookahead, so the oracle-reproducible variant merges it into the plain
#: ``\s+`` branch (the only divergence from GPT-2: a token-leading space
#: before a final whitespace run is not split off — count-identical on any
#: text without trailing interior whitespace runs). Whitespace is the
#: explicit class ``[ \t\n\r\f]`` rather than ``\s``: Java's default ``\s``
#: includes ``\x0B`` while RE2's does not, and the pattern must mean the
#: SAME thing to Spark (java.util.regex) and DuckDB (RE2). Both engines use
#: leftmost-FIRST alternation, so branch order is semantics — keep it.
BPE_SPLIT_PATTERN = (
    r"'(?:s|t|re|ve|m|ll|d)"
    r"| ?\p{L}+| ?\p{N}+"
    r"| ?[^ \t\n\r\f\p{L}\p{N}]+"
    r"|[ \t\n\r\f]+"
)


def bpe_tokens_col(text: Column) -> Column:
    """BPE-style pre-tokens (the unit a byte-pair encoder would merge
    within): contractions split off, letter runs / digit runs / punctuation
    runs each with an optional leading space, whitespace runs kept. All
    JVM-side (regexp_extract_all → whole-stage codegen); the per-token cost
    a Python tokenizer UDF would pay per ROW is paid once per BATCH of
    codegen here. Token *counts* from this split are the standard proxy for
    LLM token budgeting when the merge table itself isn't needed."""
    return F.regexp_extract_all(
        F.coalesce(text, F.lit("")), F.lit(BPE_SPLIT_PATTERN), 0
    )


def grams_all_col(toks: Column, n: int) -> Column:
    """ALL word n-grams (duplicates kept) over a token-array column —
    the within-doc repetition signals need multiplicity.

    Built as arrays_zip of n shifted slices, NOT element_at over a
    sequence: an element_at lambda re-evaluates its array child per index,
    so when Catalyst inlines the tokens expression (filter pushdown,
    project collapse) the gram walk turns quadratic — measured 15× on the
    curation pipeline, where the repetition-gate predicate gets pushed
    into the scan. Slices evaluate the child once each, keeping the walk
    linear no matter how the optimizer rewrites the surrounding plan.
    (Bonus: a <n-token doc now yields [] exactly like the SQL oracle's
    generate_series(1,0) — the sequence formulation produced a bogus
    DESCENDING [1,0] index pair on that edge.)"""
    length = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    z = F.arrays_zip(*[F.slice(toks, k + 1, length) for k in range(n)])
    return F.transform(z, lambda s: F.concat_ws(" ", *[s[str(k)] for k in range(n)]))


def grams_col(toks: Column, n: int) -> Column:
    """Distinct word n-grams over a token-array column (slice-zip based —
    see grams_all_col for why that formulation is optimizer-proof)."""
    return F.array_distinct(grams_all_col(toks, n))


def word_shingles_col(text: Column, n: int = 3) -> Column:
    """One-shot shingles from raw text — convenience for small inputs; hot
    paths use tokens_col + grams_col across two selects (see grams_col)."""
    return grams_col(tokens_col(text), n)


# ------------------------------------------------------------------- simhash
SIMHASH_BITS = 60  # the shared hash is 60 bits wide


def simhash_bit_sums(tok_hash: Column) -> list[Column]:
    """Per-bit ±1 votes for one token hash (to be summed per document)."""
    return [
        (F.shiftright(tok_hash, i).bitwiseAND(F.lit(1)) * 2 - 1).alias(f"b{i}")
        for i in range(SIMHASH_BITS)
    ]


def simhash_from_sums(sums: list[Column]) -> Column:
    """Fold per-bit vote sums into the 60-bit SimHash (tie ⇒ bit set)."""
    out = F.lit(0).cast("long")
    for i, s in enumerate(sums):
        out = out + F.when(s >= 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
    return out


def hamming_col(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


# A small built-in hanzi→pinyin table covering the city names the reference
# actually transliterates (Meituan city lists — major-city coverage). Public
# knowledge (standard Hanyu Pinyin readings); pypinyin's full Unihan table
# takes over seamlessly when installed. Per-character, tone-less — exactly
# lazy_pinyin's default output for these unambiguous characters.
CITY_PINYIN: dict[str, str] = {
    "北": "bei", "京": "jing", "上": "shang", "海": "hai", "广": "guang",
    "州": "zhou", "深": "shen", "圳": "zhen", "天": "tian", "津": "jin",
    "重": "zhong", "庆": "qing", "成": "cheng", "都": "du", "武": "wu",
    "汉": "han", "西": "xi", "安": "an", "南": "nan", "杭": "hang",
    "苏": "su", "宁": "ning", "波": "bo", "郑": "zheng", "长": "chang",
    "沙": "sha", "春": "chun", "哈": "ha", "尔": "er", "滨": "bin",
    "沈": "shen", "阳": "yang", "大": "da", "连": "lian", "青": "qing",
    "岛": "dao", "厦": "xia", "门": "men", "福": "fu", "昆": "kun",
    "明": "ming", "贵": "gui", "兰": "lan", "太": "tai", "原": "yuan",
    "石": "shi", "家": "jia", "庄": "zhuang", "济": "ji", "合": "he",
    "肥": "fei", "无": "wu", "锡": "xi", "东": "dong", "莞": "guan",
    "佛": "fo", "山": "shan", "珠": "zhu", "港": "gang", "澳": "ao",
}


def transliterate_udf(mapping: dict[str, str] | None = None):
    """C12: pinyin transliteration (Meituan/spiders/meituan.py:42,
    美团酒店/city_name.py:23 build city URLs from
    ``''.join(lazy_pinyin(city))``).

    Resolution order per character: pypinyin's lazy_pinyin when installed
    (full Unihan fidelity) → the injected/built-in CITY_PINYIN table →
    the character itself (lazy_pinyin's own passthrough for non-hanzi).
    The built-in table covers the major-city names the reference feeds
    this, so the operator is functional out of the box in this container
    and byte-compatible with lazy_pinyin on that domain."""
    table = dict(CITY_PINYIN)
    table.update(mapping or {})
    try:
        from pypinyin import lazy_pinyin
    except ImportError:
        lazy_pinyin = None

    from pyspark.sql.functions import pandas_udf

    def one(x):
        if x is None:
            return None
        if lazy_pinyin is not None:
            # caller-injected overrides STILL win per character (the
            # documented resolution order) — otherwise output silently
            # differs between hosts with and without pypinyin, the exact
            # nondeterminism the injected table exists to prevent
            if mapping and any(ch in mapping for ch in x):
                return "".join(
                    mapping[ch] if ch in mapping else "".join(lazy_pinyin(ch))
                    for ch in x
                )
            return "".join(lazy_pinyin(x))
        return "".join(table.get(ch, ch) for ch in x)

    @pandas_udf("string")
    def transliterate(s: pd.Series) -> pd.Series:
        return s.map(one)

    return transliterate


# --------------------------------------------------------- language heuristic
# stopword marker sets per language; counted via length-difference (the one
# string primitive every engine implements identically)
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of "],
    "de": [" der ", " und ", " das "],
    "fr": [" le ", " et ", " les "],
    "es": [" el ", " y ", " los "],
    "zh": ["的", "是", "了"],
}


def _count_occurrences(text: Column, pat: str) -> Column:
    return (F.length(text) - F.length(F.replace(text, F.lit(pat), F.lit("")))) / F.lit(len(pat))


def lang_scores_col(text: Column) -> dict[str, Column]:
    padded = F.concat(F.lit(" "), text, F.lit(" "))
    return {
        lang: sum((_count_occurrences(padded, p) for p in pats), F.lit(0.0)).cast("double")
        for lang, pats in LANG_MARKERS.items()
    }


def lang_id_col(text: Column) -> Column:
    """argmax over marker scores; deterministic lang-name tiebreak."""
    scores = lang_scores_col(text)
    pairs = [F.struct(c.alias("s"), F.lit(lang).alias("l")) for lang, c in sorted(scores.items())]
    # greatest struct = highest score, then lexicographically LAST lang;
    # invert lang for a smallest-name tiebreak is overkill — keep (s, l) max.
    return F.greatest(*pairs)["l"]


# ------------------------------------------------------------- quality score
STOPWORDS = ["the", "a", "and", "of", "to"]


def quality_cols(text: Column) -> dict[str, Column]:
    """Deterministic quality features: exact integer counts + one ratio
    derived from them (ratio of ints → bit-identical double everywhere)."""
    toks = tokens_col(text)
    n_tokens = F.size(toks).cast("long")
    n_chars = F.length(text).cast("long")
    n_stop = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS))).cast("long")
    n_punct = (
        F.length(text) - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    ).cast("long")
    stop_ratio = F.when(n_tokens > 0, n_stop.cast("double") / n_tokens.cast("double")).otherwise(F.lit(0.0))
    return {
        "n_tokens": n_tokens,
        "n_chars": n_chars,
        "n_stopwords": n_stop,
        "n_punct": n_punct,
        "stopword_ratio": stop_ratio,
    }


# --------------------------------------------------------------- PII redact
# Patterns chosen to mean the same thing in Java regex (Spark) and RE2
# (DuckDB): no lookaround, no backrefs, explicit character classes.
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    (r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
]


def pii_count_cols(text: Column) -> dict[str, Column]:
    """Exact per-kind PII hit counts (JVM regexp_count; the email pass must
    run the counts BEFORE redaction since <EMAIL> kills later matches)."""
    return {
        "n_email": F.regexp_count(text, F.lit(PII_PATTERNS[0][0])).cast("long"),
        "n_ip": F.regexp_count(text, F.lit(PII_PATTERNS[1][0])).cast("long"),
        "n_phone": F.regexp_count(text, F.lit(PII_PATTERNS[2][0])).cast("long"),
    }


def redact_pii_col(text: Column) -> Column:
    """Standard webtext-pipeline PII scrub (emails, IPv4, phone numbers →
    typed placeholders). A chained JVM regexp_replace — one codegen'd map
    pass, no shuffle, no Python; email first so its dots never feed the IP
    pattern."""
    out = text
    for pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


# ---------------------------------------------------------- unicode normalize
def nfc_normalize_udf():
    """Unicode NFC normalization as an Arrow-batched pandas UDF (Spark has
    no built-in normalizer; ICU lives JVM-side but isn't exposed as a SQL
    function). Vectorized ``Series.str.normalize`` — one C pass per batch,
    no per-row Python. DuckDB twin: ``nfc_normalize(text)``.

    Web-crawled text mixes composed and decomposed forms of the same
    grapheme ('é' vs 'e'+U+0301); every downstream exact/dedup hash treats
    them as different documents unless normalization runs first."""

    @F.pandas_udf("string")
    def nfc(s: pd.Series) -> pd.Series:
        return s.str.normalize("NFC")

    return nfc


# -------------------------------------------------------------- fingerprints
def fingerprint_cols(grams: Column) -> dict[str, Column]:
    """Document fingerprint over a bound grams column: hash the word n-gram
    stream, keep min / count / modular sum — an order-invariant rolling-hash
    digest (winnowing's min-selection step), exactly reproducible in SQL."""
    hashes = F.transform(grams, hash60)
    return {
        "n_shingles": F.size(grams).cast("long"),
        "fp_min": F.coalesce(F.array_min(hashes), F.lit(0).cast("long")),
        "fp_sum_mod": F.coalesce(
            F.aggregate(hashes, F.lit(0).cast("long"), lambda acc, h: acc + h % F.lit(1_000_003)),
            F.lit(0).cast("long"),
        )
        % F.lit(1_000_000_007),
    }


# ------------------------------------------------ positional index / phrases
def positional_index(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Positional inverted-index postings: one (term, doc_id, pos) row per
    token occurrence — the structure phrase/proximity search needs beyond
    BM25's bag-of-words. At archive scale the postings table is written
    bucketed BY TERM (the same hive-bucket layout write_cdx uses for
    urlkeys), so a phrase lookup prunes to its terms' buckets instead of
    scanning the corpus."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"), tokens_col(F.col(text_col)).alias("toks")
    )
    return toks.select("doc_id", F.posexplode("toks").alias("pos", "term"))


def phrase_hits(docs: DataFrame, phrase: str, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Exact phrase search over the positional index: for the k-term
    phrase, each posting of term i votes for candidate start ``pos - i``;
    a start with all k distinct votes is a match (the classic
    positional-intersection algorithm, e.g. Manning/Raghavan/Schütze IIR
    §2.4 — public). Returns (doc_id, n_hits, first_pos), 0-based.

    Plan: the index scan filters to the phrase's terms FIRST (term-bucket
    pruning at scale), then one groupBy(doc_id, start) vote count and one
    per-doc agg — no self-join chain, so a k-word phrase costs the same
    two shuffles as a 2-word one. Repeated terms in the phrase are
    handled by counting distinct term SLOTS, not distinct terms."""
    terms = [t for t in phrase.lower().split() if t]
    if not terms:
        raise ValueError("empty phrase")
    k = len(terms)
    idx = positional_index(docs, id_col, text_col)
    votes = None
    for i, t in enumerate(terms):
        # search is case-INSENSITIVE: the query is lowercased above, so the
        # index side must fold too — comparing raw terms silently returned
        # zero hits for any phrase occurrence with uppercase letters
        part = idx.where(F.lower(F.col("term")) == t).select(
            "doc_id", (F.col("pos") - i).alias("start"), F.lit(i).alias("slot")
        )
        votes = part if votes is None else votes.unionByName(part)
    starts = (
        votes.where(F.col("start") >= 0)
        .groupBy("doc_id", "start")
        .agg(F.count_distinct("slot").alias("n_slots"))
        .where(F.col("n_slots") == k)
    )
    return starts.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_hits"), F.min("start").alias("first_pos")
    )
