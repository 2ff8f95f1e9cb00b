"""Real BPE: learn-on-sample determinism, golden merges, lossless
detokenization, distributed-apply equivalence."""

import pytest
from pyspark.sql import functions as F

from from_superset_to_clickhouse_spark.operators.tokenizer import (
    EOW,
    bpe_tokenize,
    encode_word,
    learn_bpe,
)


def _ref_learn(words_counts, n_merges):
    # independent reference implementation (textbook formulation)
    vocab = {tuple(w) + (EOW,): c for w, c in words_counts.items()}
    merges = []
    for _ in range(n_merges):
        pairs = {}
        for sym, c in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        top = max(pairs.values())
        best = min(p for p, c in pairs.items() if c == top)
        merges.append(best)
        new = {}
        for sym, c in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and (sym[i], sym[i + 1]) == best:
                    out.append(sym[i] + sym[i + 1])
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new[tuple(out)] = new.get(tuple(out), 0) + c
        vocab = new
    return merges


def test_learn_matches_reference_and_is_deterministic(spark):
    rows = [(i, "low lower lowest low low newer newest new") for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = learn_bpe(df, n_merges=12)
    counts = {"low": 9, "lower": 3, "lowest": 3, "newer": 3, "newest": 3, "new": 3}
    assert merges == _ref_learn(counts, 12)
    assert merges == learn_bpe(df.repartition(7), n_merges=12)


def test_encode_word_applies_lowest_rank_first():
    # ranks: ('a','b')=0 then ('ab','c')=1 -> "abc" becomes one token
    ranks = {("a", "b"): 0, ("ab", "c"): 1, ("c", EOW): 2}
    assert encode_word("abc", ranks) == ["abc", EOW]
    # without the second merge, 'c' merges with EOW by rank 2
    assert encode_word("abc", {("a", "b"): 0, ("c", EOW): 1}) == [
        "ab",
        "c" + EOW,
    ]


def test_tokenize_lossless_and_counts(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "the the the"), (3, "")],
        "doc_id long, text string",
    )
    merges = learn_bpe(df, n_merges=30)
    out = {r["id"]: r for r in bpe_tokenize(df, merges).collect()}
    # lossless: concatenating tokens and splitting on EOW reproduces the
    # normalized word stream
    for i, text in [(1, "the quick brown fox"), (2, "the the the")]:
        words = text.split()
        joined = "".join(out[i]["tokens"])
        assert joined == "".join(w + EOW for w in words)
        assert out[i]["n_tokens"] == len(out[i]["tokens"])
    assert out[3]["n_tokens"] == 0
    # 'the' is frequent enough to become a single token
    assert "the" + EOW in out[2]["tokens"]
    assert out[2]["n_tokens"] == 3


def test_tokenize_partition_invariant(spark):
    df = spark.createDataFrame(
        [(i, f"alpha beta gamma delta doc{i}") for i in range(50)],
        "doc_id long, text string",
    )
    merges = learn_bpe(df, n_merges=20)
    a = sorted(
        (r["id"], tuple(r["tokens"]))
        for r in bpe_tokenize(df, merges).collect()
    )
    b = sorted(
        (r["id"], tuple(r["tokens"]))
        for r in bpe_tokenize(df.repartition(11), merges).collect()
    )
    assert a == b
