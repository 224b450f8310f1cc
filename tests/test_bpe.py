"""Distributed BPE training/encoding vs the independent scalar twin."""

import pytest

from stractt_spark.pyoracle import _apply_merge_py, bpe_count_py, bpe_train_py


def test_bpe_train_py_classic():
    # Sennrich-style toy vocab: 'lo' then 'low' should emerge first
    wc = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    ms = bpe_train_py(wc, 4)
    # pair counts round 1: (e,s)=9, (s,t)=9 tie → lexicographically
    # greatest pair wins → 'st'; round 2: (e,st)=9 → 'est'
    assert [m[3] for m in ms][:2] == ["st", "est"]
    # 'est' (9 weighted occurrences) precedes anything from 'low' (7)
    merged = [m[3] for m in ms]
    assert not any("lo" in m for m in merged[:2])


def test_apply_merge_overlap():
    assert _apply_merge_py(list("aaaa"), "a", "a") == ["aa", "aa"]
    assert _apply_merge_py(list("aaa"), "a", "a") == ["aa", "a"]
    assert _apply_merge_py(list("xab"), "a", "b") == ["x", "ab"]


def test_bpe_spark_matches_twin(spark):
    """Spark trainer == scalar twin on a vocab with tie-break and
    early-stop edges; Spark encoder == exhaustive-by-rank twin."""
    from collections import Counter

    from stractt_spark.functions.tokenizer import tokenize_ascii
    from stractt_spark.operators.bpe import (
        bpe_token_counts,
        learn_bpe,
        word_counts,
    )

    rows = [
        (0, "low low low lower lowest"),
        (1, "newest newest newest widest widest"),
        (2, "ab ab ba ba"),          # (a,b) vs (b,a) tie — rule decides
        (3, "unique"),               # singleton words exercise early stop
        (4, ""),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    n_merges = 12
    got = [
        (r["rank"], r["left"], r["right"], r["merged"])
        for r in learn_bpe(
            spark, word_counts(docs, "text", "doc_id"), n_merges
        ).orderBy("rank").collect()
    ]
    wc = Counter(t for _, txt in rows for t in tokenize_ascii(txt))
    exp = bpe_train_py(dict(wc), n_merges)
    assert got == exp

    pairs = [(m[1], m[2]) for m in exp]
    enc = {
        r["doc_id"]: r
        for r in bpe_token_counts(
            docs, "text", "doc_id",
            spark.createDataFrame(
                exp, "rank long, left string, right string, merged string"
            ),
        ).collect()
    }
    for i, txt in rows:
        words = tokenize_ascii(txt)
        assert enc[i]["n_words"] == len(words)
        assert enc[i]["n_bpe_tokens"] == sum(
            bpe_count_py(w, pairs) for w in words
        )


def test_bpe_early_stop():
    # every word unique and length 1..2 with all-distinct pairs of
    # count 1 → best pair count < 2 → zero merges
    ms = bpe_train_py({"ab": 1, "cd": 1, "ef": 1}, 10)
    assert ms == []
