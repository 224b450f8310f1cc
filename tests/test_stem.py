"""Porter stemmer golden vectors (examples from Porter 1980) and the
Stemmed analyzer end-to-end: stemming must match both directions —
an inflected query finds base-form docs and vice versa (reference
behavior tests /root/reference/src/inverted_index.rs:480-1055)."""

import math
import shutil

import pytest

from stractt_spark.functions.stem import porter_stem, stem_tokens
from stractt_spark.functions.tokenizer import get_analyzer

# canonical examples from the algorithm description (Porter 1980)
GOLDEN = {
    # step 1a
    "caresses": "caress", "ponies": "poni", "ties": "ti", "caress": "caress",
    "cats": "cat",
    # step 1b (+ cleanup)
    "feed": "feed", "agreed": "agre", "plastered": "plaster", "bled": "bled",
    "motoring": "motor", "sing": "sing", "conflated": "conflat",
    "troubled": "troubl", "sized": "size", "hopping": "hop", "tanned": "tan",
    "falling": "fall", "hissing": "hiss", "fizzed": "fizz", "failing": "fail",
    "filing": "file",
    # step 1c
    "happy": "happi", "sky": "sky",
    # step 2
    "relational": "relat", "conditional": "condit", "rational": "ration",
    "valenci": "valenc", "hesitanci": "hesit", "digitizer": "digit",
    "conformabli": "conform", "radicalli": "radic", "differentli": "differ",
    "vileli": "vile", "analogousli": "analog",
    "vietnamization": "vietnam", "predication": "predic", "operator": "oper",
    "feudalism": "feudal", "decisiveness": "decis", "hopefulness": "hope",
    "callousness": "callous", "formaliti": "formal", "sensitiviti": "sensit",
    "sensibiliti": "sensibl",
    # step 3
    "triplicate": "triplic", "formative": "form", "formalize": "formal",
    "electriciti": "electr", "electrical": "electr", "hopeful": "hope",
    "goodness": "good",
    # step 4
    "revival": "reviv", "allowance": "allow", "inference": "infer",
    "airliner": "airlin", "gyroscopic": "gyroscop", "adjustable": "adjust",
    "defensible": "defens", "irritant": "irrit", "replacement": "replac",
    "adjustment": "adjust", "dependent": "depend", "adoption": "adopt",
    "homologou": "homolog", "communism": "commun", "activate": "activ",
    "angulariti": "angular", "homologous": "homolog", "effective": "effect",
    "bowdlerize": "bowdler",
    # step 5
    "probate": "probat", "rate": "rate", "cease": "ceas",
    "controll": "control", "roll": "roll",
}


def test_porter_golden_vectors():
    bad = {w: (porter_stem(w), want) for w, want in GOLDEN.items()
           if porter_stem(w) != want}
    assert not bad, bad


def test_porter_short_words_unchanged():
    for w in ["a", "is", "be", "on", "c", "+", ""]:
        assert porter_stem(w) == w


def test_stemmed_analyzer_tokens():
    an = get_analyzer("stemmed_ascii")
    assert an("Merging sorted files") == ["merg", "sort", "file"]
    # punctuation singles pass through untouched
    assert an("c++") == ["c", "+", "+"]
    assert stem_tokens(["running", "runs", "run"]) == ["run", "run", "run"]


def test_stemming_both_directions_search(spark):
    """Index built with the Stemmed analyzer: inflected query → base doc,
    base query → inflected doc (reference inverted_index.rs:480-1055),
    rank-identical to the python oracle under the same analyzer."""
    from stractt_spark.oracle import build_oracle
    from stractt_spark.plans.build import SegmentIndex, build_index_fused

    rows = [
        (0, "the dog runs quickly across merged fields"),
        (1, "dogs running fast merge their field notes"),
        (2, "a cat sleeps; nothing relational here"),
        (3, "relations and relation tables"),
        (4, "completely unrelated text about parsing"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, content string")
    d = "/tmp/stractt_test_stemmed_idx"
    shutil.rmtree(d, ignore_errors=True)
    build_index_fused(
        spark, docs, d, text_col="content", docs_per_segment=8,
        analyzer="stemmed_ascii",
    )
    idx = SegmentIndex(spark, d).cache()
    oracle = build_oracle(rows, analyzer="stemmed_ascii")

    # run/runs/running all stem to "run"; merge/merged/merging to "merg"
    for query, expect_docs in [
        ("running", {0, 1}),
        ("run", {0, 1}),
        ("merging", {0, 1}),
        ("relational", {2, 3}),
        ("relation", {2, 3}),
    ]:
        got = idx.search_list(query, k=10, mode="must")
        assert {d_ for d_, _ in got} == expect_docs, query
        expected = oracle.search(query, k=10, mode="must")
        assert [d_ for d_, _ in got] == [d_ for d_, _ in expected], query
        for (_, s1), (_, s2) in zip(got, expected):
            assert math.isclose(s1, s2, rel_tol=1e-9, abs_tol=1e-12), query


def test_stemmed_rank_identity_on_corpus(spark):
    from stractt_spark.oracle import build_oracle
    from stractt_spark.plans.build import SegmentIndex, build_index_fused
    from stractt_spark.sources.corpus import make_corpus

    rows = make_corpus(300)
    docs = spark.createDataFrame(
        [(i, r["content"]) for i, r in enumerate(rows)], "doc_id long, content string"
    )
    d = "/tmp/stractt_test_stemmed_corpus_idx"
    shutil.rmtree(d, ignore_errors=True)
    build_index_fused(
        spark, docs, d, text_col="content", docs_per_segment=128,
        analyzer="stemmed_ascii",
    )
    idx = SegmentIndex(spark, d).cache()
    oracle = build_oracle(
        [(i, r["content"]) for i, r in enumerate(rows)], analyzer="stemmed_ascii"
    )
    for query, mode in [("merges sorting", "must"), ("hashes joining", "should"),
                        ("parsed", "should")]:
        got = idx.search_list(query, k=10, mode=mode)
        expected = oracle.search(query, k=10, mode=mode)
        assert [d_ for d_, _ in got] == [d_ for d_, _ in expected], (query, mode)
        for (_, s1), (_, s2) in zip(got, expected):
            assert math.isclose(s1, s2, rel_tol=1e-9, abs_tol=1e-12)
