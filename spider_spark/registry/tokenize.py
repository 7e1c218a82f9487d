"""Distributed BPE tokenizer training — registry tier split out of the former
monolithic queries.py (round 4). Conventions live in
spider_spark/registry/__init__.py; enumeration order is preserved by
the import order there."""

from __future__ import annotations

from pyspark.sql import functions as F
from spider_spark.registry._base import T, q


# =====================================================================
# Distributed BPE tokenizer training — spider_spark.tokenize
# =====================================================================

@q(
    "bpe_learn_merges",
    """
    WITH wc AS (
      SELECT chr((97 + (doc_id % 8) * 2)::INT) || chr((98 + (doc_id % 8) * 2)::INT) AS w,
             (8 - doc_id % 8)::BIGINT AS reps
      FROM documents),
    counts AS (
      SELECT substr(w, 1, 1) AS lhs, substr(w, 2, 1) AS rhs,
             sum(reps)::BIGINT AS "count"
      FROM wc GROUP BY w)
    SELECT row_number() OVER (ORDER BY "count" DESC, lhs, rhs)::INT AS rank,
           lhs, rhs, "count"
    FROM counts
    """,
)
def bpe_learn_merges(spark, sf_dir):
    """Distributed BPE merge learning (tokenize.bpe_train_from_words,
    Sennrich ACL'16): 8 planted two-character words with frequency-
    hierarchy counts — each word dies into one symbol when merged, so the
    learned merge ORDER must equal the global (count DESC, lhs, rhs) sort
    the oracle computes in closed form. This pins the whole iterative
    loop value-level: weighted pair counting over duplicate word rows,
    the deterministic argmax tiebreak, and merge application per round.
    Overlap/multi-symbol merge semantics are pinned separately by
    pytest parity against a pure-Python reference trainer
    (tests/test_tokenize.py). Scale: ONE corpus shuffle total (word
    count); iterations run on the Zipf-small word table."""
    from spider_spark import tokenize as tok

    d = T(spark, sf_dir, "documents").select("doc_id")
    did = F.col("doc_id")
    words = d.select(
        F.concat(
            F.char(F.lit(97) + (did % 8) * 2), F.char(F.lit(98) + (did % 8) * 2)
        ).alias("word"),
        (F.lit(8) - did % 8).cast("long").alias("count"),
    )
    return tok.bpe_train_from_words(words, n_merges=8)


