"""Distributed BPE tokenizer training (Sennrich et al. ACL'16 / GPT-2
byte-level variant's merge-learning loop) — the tokenizer-side operator an
LLM data pipeline runs over the same corpus it curates.

Scale shape (the reason this is corpus-scale feasible at all): the corpus
is touched by exactly ONE shuffle — the pre-token count. Every merge
iteration afterwards runs on the *word-count table*, which is Zipf-small
(10^6-10^7 distinct pre-tokens for a 10^12-token corpus), exactly how
fastBPE / HuggingFace trainers work single-node; here the word table
itself is a DataFrame so a 10^8-row multilingual vocabulary still fits the
cluster. Per iteration: one pair-count aggregation (shuffle on the tiny
word table) + an O(1)-byte argmax collect + a map-side merge rewrite
(aggregate HOF — JVM, no Python). The merged word table is
localCheckpoint'ed each round to keep the plan flat across hundreds of
merges.

Merge application inside a word is the classic greedy left-to-right
non-overlapping pass ("aaa" + merge(a,a) → ["aa","a"]), expressed as a
fold with a one-symbol carry — whole-stage codegen, no Python worker.
"""

from __future__ import annotations

# module-level, not inside bpe_encode: `from __future__ import annotations`
# stringifies the UDF's type hints and pyspark resolves them against MODULE
# globals — a function-local `import pandas as pd` leaves 'pd.Series'
# unevaluatable and the pandas_udf signature inference fails
import pandas as pd  # noqa: F401 (used by UDF type-hint resolution)
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from spider_spark.textops import bpe_tokens_col

MERGE_SCHEMA = "rank int, lhs string, rhs string, count long"


def chars_col(word: Column) -> Column:
    """Word → array of single characters (empty strings dropped — some
    split() builds emit boundary empties)."""
    return F.filter(F.split(word, ""), lambda x: x != "")


def merge_pair_col(symbols: Column, left: str, right: str) -> Column:
    """Apply ONE merge (left, right) → left||right to a symbol array,
    greedy left-to-right non-overlapping (the BPE contract): a fold whose
    accumulator carries the previous unmerged symbol. Overlaps resolve
    leftmost-first: [a,a,a] with (a,a) → [aa, a]."""
    merged = left + right
    init = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("carry"),
    )

    def step(acc: Column, s: Column) -> Column:
        return (
            F.when(
                acc["carry"].isNull(),
                F.struct(acc["out"].alias("out"), s.alias("carry")),
            )
            .when(
                (acc["carry"] == left) & (s == right),
                F.struct(
                    F.concat(acc["out"], F.array(F.lit(merged))).alias("out"),
                    F.lit(None).cast("string").alias("carry"),
                ),
            )
            .otherwise(
                F.struct(
                    F.concat(acc["out"], F.array(acc["carry"])).alias("out"),
                    s.alias("carry"),
                )
            )
        )

    return F.aggregate(
        symbols,
        init,
        step,
        lambda acc: F.when(acc["carry"].isNull(), acc["out"]).otherwise(
            F.concat(acc["out"], F.array(acc["carry"]))
        ),
    )


def _pairs(cur: DataFrame) -> DataFrame:
    """(l, r, cnt): adjacent-pair counts over the word table, weighted by
    word frequency. zip_with pads the shorter slice with NULL — the last
    (s_n, NULL) sentinel is filtered, not counted."""
    tail = F.slice(
        F.col("_sym"), 2, F.greatest(F.size("_sym") - 1, F.lit(0))
    )
    pair = F.zip_with(
        F.col("_sym"), tail, lambda a, b: F.struct(a.alias("l"), b.alias("r"))
    )
    return (
        cur.select("_n", F.explode(pair).alias("p"))
        .where(F.col("p.r").isNotNull())
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("_n").alias("cnt"))
    )


def bpe_train_from_words(
    words: DataFrame,
    n_merges: int,
    word_col: str = "word",
    count_col: str = "count",
) -> DataFrame:
    """Learn ``n_merges`` BPE merges from a (word, count) table. Returns
    (rank, lhs, rhs, count) — rank 1 is the first-learned merge. Argmax
    tiebreak is deterministic: (count DESC, lhs ASC, rhs ASC), so the
    learned table is reproducible on any cluster/partitioning. Stops early
    if the vocabulary runs out of pairs."""
    spark = words.sparkSession
    cur = words.select(
        F.col(count_col).cast("long").alias("_n"),
        chars_col(F.col(word_col)).alias("_sym"),
    ).localCheckpoint()
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        top = (
            _pairs(cur)
            .orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        l, r, cnt = top[0]["l"], top[0]["r"], int(top[0]["cnt"])
        merges.append((rank, l, r, cnt))
        cur = cur.select(
            "_n", merge_pair_col(F.col("_sym"), l, r).alias("_sym")
        ).localCheckpoint()
    return spark.createDataFrame(merges, MERGE_SCHEMA)


def bpe_train(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
) -> DataFrame:
    """Corpus → learned merge table. The corpus-sized work is the single
    pre-token count shuffle (bpe_tokens_col is the GPT-style regex
    pre-tokenizer, codegen); training then runs on the Zipf-small word
    table — see module doc."""
    words = (
        docs.select(F.explode(bpe_tokens_col(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("count"))
    )
    return bpe_train_from_words(words, n_merges)


def bpe_segment(word: str, ranked_merges: dict[tuple[str, str], int]) -> list[str]:
    """Reference-grade single-word encoder: repeatedly apply the
    lowest-rank applicable merge (HuggingFace/GPT-2 inference order).
    Driver/test-side helper and the kernel of ``bpe_encode``."""
    sym = [c for c in word]
    while len(sym) > 1:
        best = None
        for i in range(len(sym) - 1):
            rk = ranked_merges.get((sym[i], sym[i + 1]))
            if rk is not None and (best is None or rk < best[0]):
                best = (rk, i)
        if best is None:
            break
        _, i = best
        # merge ALL occurrences of this pair left-to-right before rescanning
        pair = (sym[i], sym[i + 1])
        out, j = [], 0
        while j < len(sym):
            if j < len(sym) - 1 and (sym[j], sym[j + 1]) == pair:
                out.append(sym[j] + sym[j + 1])
                j += 2
            else:
                out.append(sym[j])
                j += 1
        sym = out
    return sym


def bpe_encode(
    docs: DataFrame,
    merges: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Tokenize with a learned merge table: pre-tokenize JVM-side, then
    segment each pre-token with an Arrow-batched pandas UDF over the
    broadcast merge dict (the merge table is rank-bounded — KB-scale — so
    a closure broadcast is the right shape; per-row Python is not, and the
    regex pre-split already happened in codegen). Adds ``bpe_tokens``
    (array<string>) and ``n_bpe_tokens``."""
    from pyspark.sql.functions import pandas_udf

    ranked = {
        (r["lhs"], r["rhs"]): r["rank"] for r in merges.collect()
    }
    b = docs.sparkSession.sparkContext.broadcast(ranked)

    @pandas_udf("array<string>")
    def seg(words: pd.Series) -> pd.Series:
        rm = b.value
        cache: dict[str, list[str]] = {}

        def run(ws):
            out: list[str] = []
            for w in ws:
                if w not in cache:
                    cache[w] = bpe_segment(w, rm)
                out.extend(cache[w])
            return out

        return words.map(run)

    pre = docs.withColumn("_pre", bpe_tokens_col(F.col(text_col)))
    return pre.withColumn("bpe_tokens", seg(F.col("_pre"))).withColumn(
        "n_bpe_tokens", F.size("bpe_tokens")
    ).drop("_pre")
