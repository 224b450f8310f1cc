"""Entity index tests (reference src/entity_index/mod.rs — incl. its
own stopwords_title_ignored test, mod.rs:420-447)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stractt_spark.operators.entity import (
    ENTITY_STOPWORDS,
    EntityIndex,
    build_entity_index,
    synthesize_entities,
)


@pytest.fixture(scope="module")
def ent_idx(spark, tmp_path_factory):
    """Hand-built entity table (titles are NOT just text prefixes so the
    Must-on-title restriction is observable)."""
    rows = [
        # entity_id, title, abstract, info, has_image
        (0, "the ashes", "cricket ashes series england australia",
         {"sport": "cricket"}, True),
        (1, "rust language", "systems programming language focus safety",
         {"paradigm": "systems", "year": "2010"}, True),
        (2, "python language", "programming language focus readability",
         {"paradigm": "scripting"}, False),
        (3, "spark engine", "distributed programming engine language agnostic",
         {"paradigm": "dataflow"}, True),
        (4, "ashes festival", "festival of embers programming",
         {}, False),
    ]
    ents = spark.createDataFrame(
        rows, "entity_id long, title string, abstract string, "
              "info map<string,string>, has_image boolean",
    )
    out = str(tmp_path_factory.mktemp("entidx") / "idx")
    build_entity_index(spark, ents, out, docs_per_segment=4)
    return EntityIndex(spark, out)


def test_stopwords_title_ignored(ent_idx):
    # the reference's own test vector (mod.rs:420-447)
    assert ent_idx.search("the").count() == 0
    top = ent_idx.search("ashes").collect()
    assert top and top[0]["title"] == "the ashes"
    top = ent_idx.search("the ashes").collect()
    assert top and top[0]["title"] == "the ashes"


def test_must_restricted_to_title(ent_idx):
    # "cricket" appears only in entity 0's ABSTRACT — a title-Must query
    # for it matches nothing, though plain MF must would match
    assert ent_idx.search("cricket").count() == 0
    assert ent_idx.mf.search("cricket", mode="must").count() == 1


def test_abstract_still_scores(ent_idx):
    # "language" is in titles 1 and 2 and in abstracts 1,2,3; between
    # entities 1 and 2 the title fields tie, so the ABSTRACT Should
    # contribution must be present (both rank above any non-title match,
    # and both outscore a pure-title-only score of the same tf)
    rows = ent_idx.search("language", k=3).collect()
    assert [r["entity_id"] for r in rows[:2]] in ([1, 2], [2, 1])
    # entity 3 has "language" only in its abstract: excluded by the Must
    assert all(r["entity_id"] != 3 for r in rows)


def test_related_entities_image_and_self(ent_idx):
    # source = python language (2): related must exclude self and every
    # has_image=false entity (4), and rank language-overlapping docs first
    rel = ent_idx.related_entities(2, k=4).collect()
    ids = [r["entity_id"] for r in rel]
    assert 2 not in ids and 4 not in ids
    assert set(ids) <= {0, 1, 3}
    # rust shares "programming language focus" => highest overlap
    assert ids[0] == 1


def test_attribute_occurrences(ent_idx):
    occ = {r["attribute"]: r["occurrences"]
           for r in ent_idx.attribute_occurrences().collect()}
    assert occ == {"sport": 1, "paradigm": 3, "year": 1}


def test_must_fields_validation(ent_idx):
    with pytest.raises(ValueError, match="not in index fields"):
        ent_idx.mf.search("ashes", mode="must", must_fields=["body"])
    with pytest.raises(ValueError, match="mode='must'"):
        ent_idx.mf.search("ashes", mode="should", must_fields=["title"])


def test_synthesize_entities_deterministic(spark):
    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta t{i}") for i in range(10)],
        "doc_id long, text string",
    )
    e = synthesize_entities(docs).orderBy("entity_id").collect()
    assert e[0]["title"] == "alpha beta gamma"
    assert e[0]["has_image"] and not e[1]["has_image"]
    # doc 5: 5 % 3 = 2 => 3 attrs keyed attr(5+j)%7 for j=0..2
    assert sorted(e[5]["info"]) == ["attr5", "attr6", "attr0"] or \
        sorted(e[5]["info"]) == sorted(["attr5", "attr6", "attr0"])
    # stopword list sanity: lowercase, has the classics
    assert {"the", "a", "of"} <= ENTITY_STOPWORDS
