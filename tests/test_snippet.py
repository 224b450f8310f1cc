"""Snippet generation: ported reference unit tests
(/root/reference/src/snippet.rs:421-560) plus the Spark pipeline shape.

The ported cases use the ``alnum`` tokenizer (tantivy SimpleTokenizer —
alphanumeric runs only), matching the reference tests exactly; the
pipeline tests use the index's own analyzer.
"""

import math

import pytest

from stractt_spark.operators.snippet import (
    generate_snippets,
    search_fragments,
    select_best_fragment,
    snippet_of,
    term_weights_of,
    to_html,
)

TEST_TEXT = (
    "Rust is a systems programming language sponsored by\n"
    'Mozilla which describes it as a "safe, concurrent, practical language", '
    "supporting functional and\n"
    "imperative-procedural paradigms. Rust is syntactically similar to "
    "C++[according to whom?],\n"
    "but its designers intend it to provide better memory safety while still "
    "maintaining\nperformance.\n"
    "Rust is free and open-source software, released under an MIT License, "
    "or Apache License\n"
    "2.0. Its designers have refined the language through the experiences of "
    "writing the Servo\n"
    "web browser layout engine[14] and the Rust compiler. A large proportion "
    "of current commits\nto the project are from community members.[15]\n"
    'Rust won first place for "most loved programming language" in the Stack '
    "Overflow Developer\nSurvey in 2016, 2017, and 2018."
)


def _html_of(text, terms, max_chars):
    best = select_best_fragment(
        search_fragments(text, terms, max_chars, analyzer="alnum")
    )
    if best is None:
        return ""
    frag = text[best.start_offset:best.stop_offset]
    rel = [(a - best.start_offset, b - best.start_offset)
           for a, b in best.highlighted]
    return to_html(frag, rel)


def test_snippet_reference_fragments():
    # snippet.rs test_snippet
    terms = {"rust": 1.0, "language": 0.9}
    fragments = search_fragments(TEST_TEXT, terms, 100, analyzer="alnum")
    assert len(fragments) == 7
    assert math.isclose(fragments[0].score, 1.9)
    assert fragments[0].stop_offset == 89
    assert _html_of(TEST_TEXT, terms, 100) == (
        "<b>Rust</b> is a systems programming <b>language</b> sponsored by\n"
        'Mozilla which describes it as a "safe'
    )


def test_snippet_scored_fragment():
    # snippet.rs test_snippet_scored_fragment
    terms = {"rust": 1.0, "language": 0.9}
    fragments = search_fragments(TEST_TEXT, terms, 20, analyzer="alnum")
    assert math.isclose(fragments[0].score, 1.0)
    assert fragments[0].stop_offset == 17
    assert _html_of(TEST_TEXT, terms, 20) == "<b>Rust</b> is a systems"

    terms = {"rust": 0.9, "language": 1.0}
    fragments = search_fragments(TEST_TEXT, terms, 20, analyzer="alnum")
    assert math.isclose(fragments[0].score, 0.9)
    assert fragments[0].stop_offset == 17
    assert _html_of(TEST_TEXT, terms, 20) == "programming <b>language</b>"


def test_snippet_in_second_fragment():
    fragments = search_fragments("a b c d e f g", {"c": 1.0}, 3, "alnum")
    assert len(fragments) == 1
    assert math.isclose(fragments[0].score, 1.0)
    assert (fragments[0].start_offset, fragments[0].stop_offset) == (4, 7)
    assert _html_of("a b c d e f g", {"c": 1.0}, 3) == "<b>c</b> d"


def test_snippet_with_term_at_the_end_of_fragment():
    fragments = search_fragments("a b c d e f f g", {"f": 1.0}, 3, "alnum")
    assert len(fragments) == 2
    assert (fragments[0].start_offset, fragments[0].stop_offset) == (8, 11)
    assert _html_of("a b c d e f f g", {"f": 1.0}, 3) == "e <b>f</b>"


def test_snippet_with_second_fragment_has_the_highest_score():
    fragments = search_fragments(
        "a b c d e f g", {"f": 1.0, "a": 0.9}, 7, "alnum"
    )
    assert len(fragments) == 2
    assert math.isclose(fragments[0].score, 0.9)
    assert (fragments[0].start_offset, fragments[0].stop_offset) == (0, 7)
    assert _html_of("a b c d e f g", {"f": 1.0, "a": 0.9}, 7) == "e <b>f</b> g"


def test_snippet_with_term_not_in_text():
    assert search_fragments("a b c d", {"z": 1.0}, 3, "alnum") == []
    assert snippet_of("a b c d", {"z": 1.0}, 3, "alnum") == ""
    assert snippet_of("", {"z": 1.0}, 3, "alnum") == ""


def test_html_escaping_outside_and_inside_highlights():
    text = "x <tag> rust & more"
    out = snippet_of(text, {"rust": 1.0}, 280, "alnum")
    assert "<b>rust</b>" in out
    assert "&lt;tag&gt;" in out
    assert "&amp;" in out


def test_term_weights_reference_shape():
    # 1 / (1 + df), zero-df terms dropped (snippet.rs:223-241)
    w = term_weights_of({"a": 1, "b": 0, "c": 9})
    assert w == {"a": 0.5, "c": 0.1}


def test_generate_snippets_spark_matches_local(spark):
    """The Arrow pipeline produces exactly snippet_of per row, and empty
    texts fall back to the (empty) prefix."""
    from stractt_spark.sources.corpus import make_corpus

    rows = make_corpus(60)
    docs = spark.createDataFrame(
        [(i, r["content"]) for i, r in enumerate(rows)] + [(60, "")],
        "doc_id long, content string",
    )
    term_df = {"merge": 25, "sort": 19}
    got = {
        r["doc_id"]: r["snippet"]
        for r in generate_snippets(
            docs, "content", "doc_id", term_df, analyzer="ascii"
        ).collect()
    }
    weights = term_weights_of(term_df)
    for i, r in enumerate(rows):
        assert got[i] == snippet_of(r["content"], weights, analyzer="ascii"), i
    assert got[60] == ""


def test_snippets_on_search_results(spark):
    """End-to-end: top-k search → doc join → snippets highlight the query
    terms and respect the 280-char fragment bound."""
    import re
    import shutil

    from stractt_spark.plans.build import SegmentIndex, build_index_fused
    from stractt_spark.sources.corpus import make_corpus

    rows = make_corpus(300)
    docs = spark.createDataFrame(
        [(i, r["content"]) for i, r in enumerate(rows)], "doc_id long, content string"
    )
    d = "/tmp/stractt_test_snippet_idx"
    shutil.rmtree(d, ignore_errors=True)
    build_index_fused(spark, docs, d, text_col="content", docs_per_segment=128)
    idx = SegmentIndex(spark, d)
    top = idx.search("merge sort", k=5, mode="should")
    joined = top.join(docs, "doc_id")
    term_df = idx.term_df(["merge", "sort"])
    out = generate_snippets(
        joined, "content", "doc_id", term_df, analyzer=idx.analyzer
    ).collect()
    assert len(out) == 5
    for r in out:
        snip = r["snippet"]
        assert "<b>merge</b>" in snip or "<b>sort</b>" in snip, snip
        plain = re.sub(r"</?b>", "", snip)
        assert len(plain) <= 280 + 20  # escaping may lengthen
