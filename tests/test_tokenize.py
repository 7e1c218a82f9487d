"""Distributed BPE training/encoding (spider_spark/tokenize.py) vs a
pure-Python reference implementation of the same (Sennrich) semantics."""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import functions as F

from spider_spark import tokenize as tok

# Python re lacks \p{L}/\p{N}; on the ASCII test corpus this is the exact
# equivalent of textops.BPE_SPLIT_PATTERN (same branch order = same
# leftmost-first semantics).
PY_SPLIT_PATTERN = (
    r"'(?:s|t|re|ve|m|ll|d)"
    r"| ?[A-Za-z]+| ?[0-9]+"
    r"| ?[^ \t\n\r\fA-Za-z0-9]+"
    r"|[ \t\n\r\f]+"
)


# ---------------------------------------------------------------- reference

def _ref_merge_word(sym: list[str], pair: tuple[str, str]) -> list[str]:
    out, j = [], 0
    while j < len(sym):
        if j < len(sym) - 1 and (sym[j], sym[j + 1]) == pair:
            out.append(sym[j] + sym[j + 1])
            j += 2
        else:
            out.append(sym[j])
            j += 1
    return out


def _ref_train(word_counts: dict[str, int], n_merges: int):
    vocab = {tuple(w): n for w, n in word_counts.items()}
    merges = []
    for rank in range(1, n_merges + 1):
        pairs: Counter = Counter()
        for sym, n in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += n
        if not pairs:
            break
        (l, r), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, l, r, cnt))
        vocab = {
            tuple(_ref_merge_word(list(sym), (l, r))): n for sym, n in vocab.items()
        }
    return merges


def _pretok(text: str) -> list[str]:
    return re.findall(PY_SPLIT_PATTERN, text)


CORPUS = [
    "the cat sat on the mat",
    "the bat and the rat chat",
    "that hat is flat, that cat is fat",
    "thither the weather withers",
    "banana bandana ananas",
]


def test_merge_pair_col_overlaps_leftmost_first(spark):
    df = spark.createDataFrame(
        [(["a", "a", "a"],), (["a", "a", "a", "a"],), (["b", "a", "a"],), ([],)],
        "sym array<string>",
    )
    got = [list(r["m"]) for r in
           df.select(tok.merge_pair_col(F.col("sym"), "a", "a").alias("m")).collect()]
    assert got == [["aa", "a"], ["aa", "aa"], ["b", "aa"], []]


def test_bpe_train_matches_reference_on_corpus(spark):
    wc = Counter(w for t in CORPUS for w in _pretok(t))
    expected = _ref_train(dict(wc), n_merges=12)

    docs = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    got = [
        (r["rank"], r["lhs"], r["rhs"], r["count"])
        for r in tok.bpe_train(docs, n_merges=12).orderBy("rank").collect()
    ]
    assert got == expected


def test_bpe_train_weighted_duplicate_word_rows(spark):
    # the SAME word split across rows must count as the sum of its rows
    words = spark.createDataFrame(
        [("abab", 3), ("abab", 2), ("cd", 4)], "word string, count long"
    )
    got = [
        (r["rank"], r["lhs"], r["rhs"], r["count"])
        for r in tok.bpe_train_from_words(words, 3).orderBy("rank").collect()
    ]
    expected = _ref_train({"abab": 5, "cd": 4}, 3)
    assert got == expected
    # first merge is (a,b) with count 2 occurrences × 5 = 10
    assert got[0] == (1, "a", "b", 10)


def test_bpe_train_stops_when_pairs_exhausted(spark):
    words = spark.createDataFrame([("ab", 1)], "word string, count long")
    got = tok.bpe_train_from_words(words, 10).collect()
    assert len(got) == 1  # after (a,b) the word is one symbol — no pairs left


def test_bpe_encode_matches_reference_segmentation(spark):
    docs = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    merges = tok.bpe_train(docs, n_merges=12)
    ranked = {(r["lhs"], r["rhs"]): r["rank"] for r in merges.collect()}
    out = tok.bpe_encode(docs, merges).select("text", "bpe_tokens", "n_bpe_tokens")
    for r in out.collect():
        expected = [
            s for w in _pretok(r["text"]) for s in tok.bpe_segment(w, ranked)
        ]
        assert list(r["bpe_tokens"]) == expected
        assert r["n_bpe_tokens"] == len(expected)
        # round-trip: concatenating tokens reconstructs the pre-token text
        assert "".join(r["bpe_tokens"]) == "".join(_pretok(r["text"]))
