"""Goggles: ported reference vectors (intersection_with_slop,
pattern_query.rs:431-459), parser, pattern automaton, and the full
rerank behaviors (discard/boost/empty-discard, goggles/mod.rs tests)."""

import numpy as np
import pytest

from stractt_spark.functions.goggles import (
    SCALE,
    compile_pattern,
    intersection_with_slop,
    parse_goggle,
    pattern_phrase_count,
)

MAX = 1 << 60


@pytest.mark.parametrize("left,right,slop,expected", [
    # pattern_query.rs test_intersection_with_slop — verbatim
    ([20, 75, 77], [18, 21, 60], MAX, [21, 60]),
    ([21, 60], [50, 61], 1, [61]),
    ([1, 2, 3], [], 1, []),
    ([], [1, 2, 3], 1, []),
    ([1, 2, 3], [4, 5, 6], 1, [4]),
    ([1, 2, 3], [4, 5, 6], MAX, [4, 5, 6]),
    ([21, 60], [61, 62], 2, [61, 62]),
    ([60], [61, 62], 2, [61, 62]),
])
def test_intersection_with_slop_reference_vectors(left, right, slop, expected):
    got = intersection_with_slop(
        np.asarray(left, dtype=np.int64), np.asarray(right, dtype=np.int64), slop
    )
    assert got.tolist() == expected


def test_parse_goggle_instructions():
    g = parse_goggle(
        """
        ! name: Test
        /this/is/*/pattern
        $discard,site=b.com
        $boost=10,site=a.com
        merge sort$downrank=3
        |start end|$incontent
        @bm25 = 2.5
        """
    )
    assert g.alterations == {"bm25": 2.5}
    i0, i1, i2, i3, i4 = g.instructions
    assert i0.patterns == ["/this/is/", "*", "/pattern"]
    assert i1.action == "discard" and i1.site == "b.com" and not i1.patterns
    assert not i1.is_empty_discard  # has site → targeted discard
    assert i2.action == "boost" and i2.value == 10 and i2.site == "a.com"
    assert i3.patterns == ["merge", "sort"]
    assert i3.action == "downrank" and i3.value == 3
    assert i4.patterns == ["|", "start", "end", "|"]
    assert i4.field_sel == "content"
    assert parse_goggle("$discard").instructions[0].is_empty_discard
    assert parse_goggle("$discard").has_empty_discard


def _count(text: str, pattern: list[str]) -> int:
    terms, ops = compile_pattern(pattern, "ascii")
    from stractt_spark.functions.tokenizer import get_analyzer

    toks = get_analyzer("ascii")(text)
    pos = {}
    for i, t in enumerate(toks):
        if t in set(terms):
            pos.setdefault(t, []).append(i)
    return pattern_phrase_count(
        {t: np.asarray(p) for t, p in pos.items()}, ops, len(toks)
    )


def test_pattern_adjacency_and_wildcard():
    assert _count("the merge sort runs", ["merge", "sort"]) == 1
    assert _count("the merge quick sort", ["merge", "sort"]) == 0  # gap 2 > slop 1
    assert _count("the merge quick sort", ["merge", "*", "sort"]) == 1
    assert _count("merge a b c d sort", ["merge", "*", "sort"]) == 1
    assert _count("sort then merge", ["merge", "sort"]) == 0  # order matters
    # a raw part is split by the field tokenizer into adjacent terms
    assert _count("a merge sort b", ["merge sort"]) == 1
    assert _count("x/this/is/a/pattern/y", ["/this/is/a/pattern"]) == 1


def test_pattern_anchors():
    assert _count("start middle end", ["|", "start"]) == 1
    assert _count("pre start middle", ["|", "start"]) == 0
    assert _count("middle the end", ["end", "|"]) == 1
    assert _count("end is not last", ["end", "|"]) == 0
    assert _count("only", ["|", "only", "|"]) == 1


def test_pattern_delimiter_is_noop():
    assert _count("a merge sort b", ["merge", "^", "sort"]) == 1


@pytest.fixture(scope="module")
def goggle_corpus(spark):
    rows = [
        (0, "a.com", "the quick merge sort algorithm runs fast"),
        (1, "b.com", "hash join details and merge notes"),
        (2, "a.com", "hash join implementation guide"),
        (3, "c.com", "hash join and also a merge sort section"),
        (4, "b.com", "hash join hash join hash join"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, site string, text string")
    return docs


def _base_scores(spark, docs):
    from stractt_spark.plans.engine import SearchEngine

    eng = SearchEngine.from_docs(
        docs, text_col="text", id_col="doc_id", analyzer="ascii", cache=False
    )
    # uncut base: every matching doc keeps its exact score
    return eng.search("hash join", k=10**6, mode="should")


def test_goggle_discard_and_boost_sites(spark, goggle_corpus):
    """mod.rs discard_and_boost_sites shape: discard one site, boost
    another; boosted docs outrank everything (const ±n·SCALE)."""
    from stractt_spark.operators.goggles import apply_goggle

    base = _base_scores(spark, goggle_corpus)
    out = apply_goggle(
        base, goggle_corpus, "text", "doc_id",
        "$discard,site=b.com\n$boost=10,site=a.com",
        k=10, site_col="site",
    ).collect()
    ids = [r["doc_id"] for r in out]
    assert 1 not in ids and 4 not in ids          # b.com discarded
    assert ids[0] == 2                             # a.com matcher boosted
    by_id = {r["doc_id"]: r["score"] for r in out}
    assert by_id[2] > by_id[3] + 9 * SCALE        # +10·SCALE dominates


def test_goggle_pattern_boost_and_downrank(spark, goggle_corpus):
    from stractt_spark.operators.goggles import apply_goggle

    base = _base_scores(spark, goggle_corpus)
    out = apply_goggle(
        base, goggle_corpus, "text", "doc_id",
        "merge sort$boost=2\n$downrank=1,site=b.com",
        k=10, site_col="site",
    ).collect()
    by_id = {r["doc_id"]: r["score"] for r in out}
    # doc 3 contains adjacent "merge sort" → +1000; doc 1 (b.com) → −500
    assert by_id[3] == max(by_id.values())
    assert by_id[1] < by_id[4]  # 1 and 4 both b.com… both downranked
    ids_sorted = [r["doc_id"] for r in out]
    assert ids_sorted[0] == 3


def test_goggle_empty_discard_keeps_only_matched(spark, goggle_corpus):
    """mod.rs:662-668: '$discard' + site boosts → results restricted to
    docs matching some other instruction."""
    from stractt_spark.operators.goggles import apply_goggle

    base = _base_scores(spark, goggle_corpus)
    out = apply_goggle(
        base, goggle_corpus, "text", "doc_id",
        "$discard\n$site=a.com,boost=6\n$site=b.com,boost=1",
        k=10, site_col="site",
    ).collect()
    ids = [r["doc_id"] for r in out]
    assert set(ids) <= {0, 1, 2, 4}          # only a.com/b.com docs
    assert ids[0] == 2                        # a.com (+6·SCALE) first


def test_site_rankings_into_goggle():
    """site_rankings.rs:25-70: preferred → boost 5, disliked → downrank 5,
    blocked → discard."""
    from stractt_spark.functions.goggles import SiteRankings

    g = SiteRankings(
        preferred=["a.com"], disliked=["b.com"], blocked=["c.com"]
    ).into_goggle()
    assert len(g.instructions) == 3
    assert (g.instructions[0].site, g.instructions[0].action,
            g.instructions[0].value) == ("a.com", "boost", 5)
    assert (g.instructions[1].site, g.instructions[1].action,
            g.instructions[1].value) == ("b.com", "downrank", 5)
    assert (g.instructions[2].site, g.instructions[2].action) == ("c.com", "discard")
    assert not g.has_empty_discard


def test_site_rankings_applied(spark, goggle_corpus):
    from stractt_spark.functions.goggles import SCALE, SiteRankings
    from stractt_spark.operators.goggles import apply_goggle

    base = _base_scores(spark, goggle_corpus)
    g = SiteRankings(preferred=["a.com"], disliked=[], blocked=["b.com"]).into_goggle()
    out = apply_goggle(
        base, goggle_corpus, "text", "doc_id", g, k=10, site_col="site"
    ).collect()
    ids = [r["doc_id"] for r in out]
    assert 1 not in ids and 4 not in ids
    assert ids[0] == 2  # preferred a.com matcher (+5·SCALE)


def test_autosuggest_lexicographic_prefix():
    from stractt_spark.functions.autosuggest import Autosuggest

    a = Autosuggest(["mars", "map", "maple", "mapreduce", "zebra", "mask"])
    assert a.suggestions("ma") == ["map", "maple", "mapreduce", "mars", "mask"]
    assert a.suggestions("MAP") == ["map", "maple", "mapreduce"]
    assert a.suggestions("q") == []
    assert a.suggestions("ma", k=2) == ["map", "maple"]


def test_autosuggest_df_matches_driver(spark):
    from stractt_spark.functions.autosuggest import Autosuggest, suggest_df

    terms = ["mars", "map", "maple", "mapreduce", "zebra", "mask", "magic"]
    df = spark.createDataFrame([(t,) for t in terms], "term string")
    got = [r["term"] for r in suggest_df(df, "ma", k=4).collect()]
    assert got == Autosuggest(terms).suggestions("ma", k=4)


def test_goggle_field_selector_targets_column(spark):
    """An instruction with a field selector pattern-matches the mapped
    column, not the default text column (mod.rs:231-262)."""
    from stractt_spark.operators.goggles import instruction_match_set
    from stractt_spark.functions.goggles import parse_goggle

    docs = spark.createDataFrame(
        [(0, "nothing here", "merge sort title"),
         (1, "merge sort body", "other title")],
        "doc_id long, text string, title string",
    )
    g = parse_goggle("merge sort$intitle,boost=2")
    mset = instruction_match_set(
        docs, "text", "doc_id", g.instructions[0],
        field_cols={"title": "title"},
    )
    assert {r["doc_id"] for r in mset.collect()} == {0}
    # without the mapping it falls back to the text column
    mset2 = instruction_match_set(docs, "text", "doc_id", g.instructions[0])
    assert {r["doc_id"] for r in mset2.collect()} == {1}


def test_goggle_bm25_alteration(spark, goggle_corpus):
    """@bm25 = 0 zeroes the relevance signal: ranking becomes purely
    const-boost driven (signal coefficient override, signal.rs:343-387)."""
    from stractt_spark.operators.goggles import apply_goggle

    base = _base_scores(spark, goggle_corpus)
    out = apply_goggle(
        base, goggle_corpus, "text", "doc_id",
        "@bm25 = 0\n$boost=2,site=a.com",
        k=10, site_col="site",
    ).collect()
    by_id = {r["doc_id"]: r["score"] for r in out}
    # candidates stay the base match set (reference Must-query semantics:
    # Should goggle clauses never expand the docset); a.com matchers score
    # exactly the const bonus, everything else exactly 0
    for d, sc in by_id.items():
        assert sc in (0.0, 1000.0), (d, sc)
    assert by_id[2] == 1000.0
    assert 0 not in by_id  # doc 0 doesn't match the base query


def test_goggle_over_persisted_index(spark, goggle_corpus):
    """Goggles compose with the persisted segment index: an uncut
    idx.search(k=large) is a valid base for apply_goggle."""
    import shutil

    from stractt_spark.operators.goggles import apply_goggle
    from stractt_spark.plans.build import SegmentIndex, build_index_fused

    d = "/tmp/stractt_test_goggle_idx"
    shutil.rmtree(d, ignore_errors=True)
    build_index_fused(spark, goggle_corpus.select("doc_id", "text"), d,
                      text_col="text", docs_per_segment=8)
    idx = SegmentIndex(spark, d)
    base = idx.search("hash join", k=10**6, mode="should")
    out = apply_goggle(
        base, goggle_corpus, "text", "doc_id",
        "$discard,site=b.com\n$boost=10,site=a.com",
        k=10, site_col="site",
    ).collect()
    ids = [r["doc_id"] for r in out]
    assert 1 not in ids and 4 not in ids
    assert ids[0] == 2
