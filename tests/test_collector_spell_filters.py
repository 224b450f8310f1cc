"""Field filters (attr terms), paging/offset, diversity re-rank, spell
correction, early-termination quota."""

import shutil

import pytest

from stractt_spark.functions.spell import SpellChecker, levenshtein, max_edit_distance
from stractt_spark.operators.collector import page, rerank_diverse
from stractt_spark.plans.build import SegmentIndex, build_index_fused
from stractt_spark.sources.corpus import make_corpus

IDX = "/tmp/stractt_test_attridx"


@pytest.fixture(scope="module")
def built(spark):
    rows = make_corpus(500)
    docs = spark.createDataFrame(
        [(i, r["repo"], r["lang"], r["content"]) for i, r in enumerate(rows)],
        "doc_id long, repo string, lang string, content string",
    )
    shutil.rmtree(IDX, ignore_errors=True)
    build_index_fused(
        spark, docs, IDX, docs_per_segment=96, attr_cols=["repo", "lang"]
    )
    return SegmentIndex(spark, IDX).cache(), rows


def test_repo_filter(built):
    index, rows = built
    hits = index.search_list("lang:python buffer", k=50)
    assert hits
    for d, _ in hits:
        assert rows[d]["lang"] == "python"
    unfiltered = index.search_list("buffer", k=500)
    assert {d for d, _ in hits} <= {d for d, _ in unfiltered}


def test_anti_filter(built):
    index, rows = built
    hits = index.search_list("-repo:org0/repo0 buffer", k=50)
    assert hits
    for d, _ in hits:
        assert rows[d]["repo"] != "org0/repo0"


def test_filter_scores_unaffected(built):
    """Filter terms carry no score weight: a doc's score with a filter ==
    its score without (reference deviation documented: site: filters are
    pure predicates here, not scored Must terms)."""
    index, rows = built
    filtered = dict(index.search_list("lang:go buffer", k=50))
    unfiltered = dict(index.search_list("buffer", k=500))
    for d, s in filtered.items():
        assert abs(unfiltered[d] - s) < 1e-12


def test_paging(built):
    index, _ = built
    full = index.search_list("buffer", k=30)
    p1 = index.search_list("buffer", k=10, offset=0)
    p2 = index.search_list("buffer", k=10, offset=10)
    p3 = index.search_list("buffer", k=10, offset=20)
    assert p1 + p2 + p3 == full
    assert page([(1, 1.0), (2, 0.5)], k=5, offset=1) == [(2, 0.5)]


def test_quota_subset(built):
    index, _ = built
    full = {d for d, _ in index.search_list("buffer", k=500)}
    quota = {d for d, _ in index.search_list(
        "buffer", k=500, max_docs_per_segment=20, unsafe_quota=True
    )}
    assert quota <= full
    assert len(quota) < len(full)


def test_quota_raises_on_unsorted_index(built):
    """max_docs on a doc-id-ordered index is an unsound cut — it must
    refuse unless the caller explicitly opts into approximation."""
    import pytest

    index, _ = built
    with pytest.raises(ValueError, match="unsafe_quota"):
        index.search_list("buffer", k=10, max_docs_per_segment=20)


def test_rerank_diverse():
    # two "sites": docs 0-2 site A (high scores), 3-4 site B
    rows = [(0, 10.0), (1, 9.0), (2, 8.0), (3, 7.5), (4, 7.0)]
    site = {0: "a", 1: "a", 2: "a", 3: "b", 4: "b"}
    out = rerank_diverse(rows, [lambda d: site[d]], scales=(14.0,), k=5)
    docs = [d for d, _ in out]
    # second 'a' doc penalized 9.0*14/15=8.4 still > 7.5 → kept; third 'a'
    # penalized 8*14/16=7.0 → ties 7.0 vs doc3's 7.5 → doc3 rises
    assert docs == [0, 1, 2, 3, 4] or docs.index(3) < docs.index(2) + 2
    # stronger penalty forces interleaving
    out2 = rerank_diverse(rows, [lambda d: site[d]], scales=(0.1,), k=5)
    assert [d for d, _ in out2][:2] == [0, 3]


def test_search_diverse_runs(built):
    index, _ = built
    res = index.search_diverse("buffer", k=10)
    assert len(res) == 10
    assert all(isinstance(s, float) for _, s in res)


def test_spell_checker(built):
    index, _ = built
    sc = index.spell_checker(dict_size=1000)
    assert "buffer" in sc.counts
    assert sc.correct("bufer") == "buffer"     # 1 edit
    assert sc.correct("buffer") is None        # known term
    # 1-edit typo within the log-length budget (a transposition like
    # "mrege" is 2 plain-Levenshtein edits — over budget for len 5)
    assert sc.suggest_query(["mergee", "sort"]) == ["merge", "sort"]
    assert sc.suggest_query(["merge", "sort"]) is None
    # no attr/sentinel pollution in the dictionary
    assert not any(t.startswith(("\x00", "\x01")) for t in sc.counts)


def test_levenshtein_and_budget():
    assert levenshtein("abc", "abc", 2) == 0
    assert levenshtein("abc", "abd", 2) == 1
    assert levenshtein("abc", "xyz", 1) == 2  # cutoff+1
    assert max_edit_distance("ab") == 1
    assert max_edit_distance("abcdefgh") == 2


def test_compound_split(built):
    index, _ = built
    sc = index.spell_checker(dict_size=1000)
    joined = "mergesort"
    assert sc.split_compound(joined) == ("merge", "sort")


def test_search_corrected_fallback(spark):
    """Zero-result query falls back to the spell-corrected query (the
    reference surfaces the correction alongside results)."""
    import shutil

    from stractt_spark.plans.build import SegmentIndex, build_index_fused
    from stractt_spark.sources.corpus import make_corpus

    rows = make_corpus(300)
    docs = spark.createDataFrame(
        [(i, r["content"]) for i, r in enumerate(rows)], "doc_id long, content string"
    )
    d = "/tmp/stractt_test_spellsearch_idx"
    shutil.rmtree(d, ignore_errors=True)
    build_index_fused(spark, docs, d, text_col="content", docs_per_segment=128)
    idx = SegmentIndex(spark, d).cache()

    # typo'd query (edit distance 1: "buffe" → "buffer", the only
    # dictionary term within budget) → corrected, re-run
    got, corrected = idx.search_corrected("buffe scan", k=5, mode="must")
    assert corrected == "buffer scan"
    direct = idx.search_list(corrected, k=5, mode="must")
    assert got == direct and got

    # clean query → no correction attempted
    got2, corrected2 = idx.search_corrected("buffer scan", k=5, mode="must")
    assert corrected2 is None and got2 == direct


def test_bang_parsing_and_resolution():
    """``!bang`` shortcuts (reference src/query/parser.rs:312-313 +
    src/bangs.rs:133-190 — the reference's own unit test is the spec):
    unregistered tags fall through to normal term scoring; the first
    registered tag redirects with {{{s}}} substituted."""
    from stractt_spark.functions.query_parse import (
        parse_query,
        resolve_bang,
    )

    table = {"ty": "https://www.youtube.com/results?search_query={{{s}}}"}
    # no bang at all
    assert parse_query("no bangs").bangs == []
    assert resolve_bang("no bangs", table) is None
    # a bang-shaped term with an unregistered tag: surfaced as a
    # candidate, no redirect, and STILL scored as a normal term
    pq = parse_query("!no bangs")
    assert pq.bangs == ["no"]
    assert pq.pos_terms == ["!", "no", "bangs"]  # punct-as-token parity
    assert resolve_bang("!no bangs", table) is None
    # registered tag → redirect with the rest of the query substituted
    pq = parse_query("!ty bangs")
    assert pq.bangs == ["ty"]
    assert resolve_bang("!ty bangs", table) == (
        "ty", "https://www.youtube.com/results?search_query=bangs"
    )
    # substitution keeps every OTHER unit verbatim, bang position free
    assert resolve_bang("cat !ty videos", table)[1] == (
        "https://www.youtube.com/results?search_query=cat videos"
    )
    # negated bang is a MustNot term, not a shortcut
    pq = parse_query("-!ty bangs")
    assert pq.bangs == []
    assert "!" in pq.neg_terms and "ty" in pq.neg_terms
    assert resolve_bang("-!ty bangs", table) is None


def test_search_split_compound(built):
    """Zero-result compound query → balanced dictionary split retry
    (reference src/spell/splitter.rs:26): rows == the split query's
    ordinary top-k, and the corrected string is surfaced."""
    idx, _rows = built
    rows, corrected = idx.search_split("mergesort", k=5, mode="must")
    assert corrected == "merge sort"
    assert rows == idx.search_list("merge sort", k=5, mode="must")
    # a query with results is returned untouched
    rows2, corr2 = idx.search_split("merge sort", k=5, mode="must")
    assert corr2 is None and rows2 == rows
    # an unknown, unsplittable term stays zero-result, no correction
    rows3, corr3 = idx.search_split("zzqqzzqq", k=5, mode="must")
    assert corr3 is None and rows3 == []


# ------------------------------------------------------------- facets


def _facet_expected(index, rows, terms, field, mode="must",
                    exclude=(), filt=None):
    from stractt_spark.functions.tokenizer import get_analyzer

    tok = get_analyzer(index.analyzer)
    out = {}
    for i, r in enumerate(rows):
        toks = set(tok(r["content"]))
        ok = (all(t in toks for t in terms) if mode == "must"
              else any(t in toks for t in terms))
        if ok and not (set(exclude) & toks) and (
            filt is None or r[filt[0]] == filt[1]
        ):
            out[r[field]] = out.get(r[field], 0) + 1
    return out


def test_facet_counts_must(built):
    index, rows = built
    got = {r["facet_value"]: r["match_count"]
           for r in index.facet_counts("buffer stream", "lang").collect()}
    assert got == _facet_expected(index, rows, ["buffer", "stream"], "lang")
    assert got  # non-trivial on this corpus


def test_facet_counts_should_and_neg(built):
    index, rows = built
    got = {r["facet_value"]: r["match_count"]
           for r in index.facet_counts(
               "buffer stream -parse", "repo", mode="should").collect()}
    assert got == _facet_expected(
        index, rows, ["buffer", "stream"], "repo", mode="should",
        exclude=["parse"],
    )


def test_facet_counts_with_attr_filter(built):
    index, rows = built
    got = {r["facet_value"]: r["match_count"]
           for r in index.facet_counts("lang:python buffer", "repo").collect()}
    assert got == _facet_expected(
        index, rows, ["buffer"], "repo", filt=("lang", "python")
    )


def test_facet_counts_respects_deletes(spark, built):
    index, rows = built
    from stractt_spark.operators.deletes import delete_docs as del_idx

    base = {r["facet_value"]: r["match_count"]
            for r in index.facet_counts("buffer", "lang").collect()}
    from stractt_spark.functions.tokenizer import get_analyzer

    tok = get_analyzer(index.analyzer)
    victims = [i for i, r in enumerate(rows)
               if "buffer" in set(tok(r["content"]))
               and r["lang"] == "python"][:2]
    assert victims
    import shutil as _sh

    d2 = IDX + "_facetdel"
    _sh.rmtree(d2, ignore_errors=True)
    _sh.copytree(IDX, d2)
    del_idx(spark, d2, victims)
    idx2 = SegmentIndex(spark, d2)
    got = {r["facet_value"]: r["match_count"]
           for r in idx2.facet_counts("buffer", "lang").collect()}
    expect = dict(base)
    expect["python"] -= len(victims)
    if expect["python"] == 0:
        del expect["python"]
    assert got == expect


def test_facet_counts_guards(built):
    index, _ = built
    with pytest.raises(ValueError, match="not an attr column"):
        index.facet_counts("buffer", "nosuchfield")
    with pytest.raises(ValueError, match="phrase"):
        index.facet_counts("parse.buffer", "lang")
