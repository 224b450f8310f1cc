"""PhraseQuery semantics: multi-token query units matched by adjacency,
scored with Σ-member-idf weight and phrase-count tf (reference
query/parser.rs:228-236, bm25.rs:66-90)."""

import math

import pytest

from stractt_spark.functions.query_parse import parse_query
from stractt_spark.oracle import build_oracle
from stractt_spark.plans.engine import SearchEngine
from stractt_spark.sources.corpus import make_corpus


def test_parse_phrase_units():
    pq = parse_query("foo.bar baz -qux", "ascii", phrase=True)
    assert pq.phrases == [["foo", ".", "bar"]]
    assert pq.pos_terms == ["baz"]
    assert pq.neg_terms == ["qux"]
    assert set(pq.all_match_terms) == {"foo", ".", "bar", "baz"}


def test_oracle_phrase_adjacency():
    rows = [
        (0, "use foo.bar here"),        # foo . bar adjacent
        (1, "use foo and bar here"),    # not adjacent
        (2, "foo.bar foo.bar twice"),   # 2 phrase matches
        (3, "bar.foo reversed"),        # wrong order
    ]
    idx = build_oracle(rows)
    res = idx.search("foo.bar", k=10, phrase=True)
    assert {d for d, _ in res} == {0, 2}
    assert idx.phrase_freq(["foo", ".", "bar"], 2) == 2
    # doc 2's higher phrase tf must outscore doc 0 given similar dl
    scores = dict(res)
    assert scores[2] > scores[0]


@pytest.fixture(scope="module")
def corpus_pair(spark):
    rows = make_corpus(400)
    oracle = build_oracle([(i, r["content"]) for i, r in enumerate(rows)])
    docs = spark.createDataFrame(
        [(i, r["content"]) for i, r in enumerate(rows)], "doc_id long, content string"
    )
    eng = SearchEngine.from_docs(docs, positions=True)
    return oracle, eng


PHRASE_QUERIES = [
    ("+=", "must"),                   # "+ =" adjacent: frequent in corpus
    ("::", "must"),
    ("()", "should"),
    ("merge.sort", "must"),           # identifier.identifier chain
    ("foo.bar", "must"),              # zero-hit phrase
    ("buffer +=", "must"),            # mixed term + phrase
    ("buffer ()", "should"),
]


def test_phrase_queries_not_vacuous(corpus_pair):
    oracle, _ = corpus_pair
    for q in ["+=", "::", "()"]:
        assert len(oracle.search(q, k=50, phrase=True)) >= 10, q
    # "->" parses as MustNot of ">" (leading '-' is the NOT operator,
    # reference parser.rs:100-109) → no positive units → empty
    assert oracle.search("->", k=10, phrase=True) == []


@pytest.mark.parametrize("query,mode", PHRASE_QUERIES)
def test_phrase_rank_identity(corpus_pair, query, mode):
    oracle, eng = corpus_pair
    expected = oracle.search(query, k=10, mode=mode, phrase=True)
    got = eng.search_list(query, k=10, mode=mode, phrase=True)
    assert [d for d, _ in got] == [d for d, _ in expected], (query, mode)
    for (d1, s1), (_, s2) in zip(got, expected):
        assert math.isclose(s1, s2, rel_tol=1e-9, abs_tol=1e-12), (query, d1)


def test_phrase_vs_and_differ(corpus_pair):
    """Phrase mode is stricter than AND of the same tokens."""
    oracle, eng = corpus_pair
    q = "merge.sort"
    and_docs = {d for d, _ in eng.search_list(q, k=400, mode="must")}
    ph_docs = {d for d, _ in eng.search_list(q, k=400, mode="must", phrase=True)}
    assert ph_docs and ph_docs < and_docs
