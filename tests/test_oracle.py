"""BM25 oracle: hand-computed micro-corpus + query semantics.

Mirrors the reference behavior tests (SURVEY.md §5): match/non-match, AND,
NOT, top-k bound, tie-break determinism.
"""

import math

from stractt_spark.functions.bm25 import K1, B, idf
from stractt_spark.functions.fieldnorm import quantize_length
from stractt_spark.oracle import build_oracle


def test_hand_computed_single_term():
    rows = [
        (0, "spark index engine"),          # dl=3
        (1, "index index merge"),           # dl=3, tf(index)=2
        (2, "sort merge shuffle network"),  # dl=4
    ]
    idx = build_oracle(rows)
    assert idx.num_docs == 3
    assert idx.avgdl == (3 + 3 + 4) / 3
    res = idx.search("index", k=10)
    assert [d for d, _ in res] == [1, 0]
    # hand-compute doc 1: tf=2, dl=quantize(3)=3, df=2, N=3
    w = idf(2, 3) * (K1 + 1)
    dl = int(quantize_length(3))
    expect = w * 2 / (2 + K1 * (1 - B + B * dl / idx.avgdl))
    assert math.isclose(res[0][1], expect, rel_tol=1e-12)


def test_and_semantics_and_not():
    rows = [
        (0, "alpha beta gamma"),
        (1, "alpha beta"),
        (2, "alpha delta"),
    ]
    idx = build_oracle(rows)
    assert {d for d, _ in idx.search("alpha beta", k=10)} == {0, 1}
    assert {d for d, _ in idx.search("alpha -beta", k=10)} == {2}
    assert idx.search("alpha zzz", k=10) == []  # Must on missing term
    assert {d for d, _ in idx.search("alpha zzz", k=10, mode="should")} == {0, 1, 2}


def test_topk_and_tiebreak():
    # 30 identical docs: identical scores → doc_id asc ordering
    rows = [(i, "same text here") for i in range(30)]
    idx = build_oracle(rows)
    res = idx.search("same", k=10)
    assert [d for d, _ in res] == list(range(10))
    assert len({s for _, s in res}) == 1


def test_punctuation_query_tokens():
    rows = [(0, "use foo.bar here"), (1, "use foobar here")]
    idx = build_oracle(rows)
    # "foo.bar" analyzes to [foo, ., bar] → AND → only doc 0
    assert [d for d, _ in idx.search("foo.bar", k=10)] == [0]


def test_duplicate_term_cap():
    rows = [(0, "word " * 50), (1, "word other")]
    idx = build_oracle(rows)
    q = " ".join(["word"] * 15)  # >MAX_SIMILAR_TERMS
    res15 = idx.search(q, k=10)
    res10 = idx.search(" ".join(["word"] * 10), k=10)
    assert res15 == res10
