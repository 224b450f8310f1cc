"""Synthetic corpus determinism + shape (FIXTURES.md §1)."""

import hashlib

from stractt_spark.sources.corpus import make_corpus, make_row


def test_row_shape_and_determinism():
    a = make_row(7)
    b = make_row(7)
    assert a == b
    assert set(a) == {"repo", "path", "commit", "lang", "content"}
    assert len(a["commit"]) == 40
    # sha256(content) stable — the per-row invariant of BASELINE.json
    assert (
        hashlib.sha256(a["content"].encode()).hexdigest()
        == hashlib.sha256(b["content"].encode()).hexdigest()
    )


def test_corpus_skew_and_uniqueness():
    rows = make_corpus(400)
    keys = {(r["repo"], r["path"], r["commit"]) for r in rows}
    assert len(keys) == 400  # unique doc identity
    from collections import Counter

    by_repo = Counter(r["repo"] for r in rows)
    top = by_repo.most_common(1)[0][1]
    assert top > 150  # heavy skew: dominant repo holds ~half the files


def test_content_pins_tokenizer_semantics():
    text = "\n".join(r["content"] for r in make_corpus(50))
    assert "." in text and "->" in text and "::" in text and "_" in text
