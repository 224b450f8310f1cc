"""Text analysis + multimodal plumbing."""

import numpy as np
import pytest

from stractt_spark.functions.tokenizer import tokenize_ascii
from stractt_spark.operators.multimodal import (
    FEATURE_DIM,
    DeterministicFakeDecoder,
    LibraryDecoder,
    extract_features,
    frame_sample_plan,
)
from stractt_spark.operators.textstats import (
    LANG_STOPWORDS,
    doc_fingerprint,
    language_id,
    quality_score,
    token_stats,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox and the lazy dog for the win in that case"),
        (1, "el perro y el gato en la casa de los vecinos con una mesa"),
        (2, "der hund und die katze ist von einem haus mit der tür"),
        (3, "x " * 200),  # long, zero diversity, no stopwords
        (4, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string"), rows


def test_token_stats(docs):
    df, rows = docs
    got = {r["doc_id"]: r for r in token_stats(df, "text", "doc_id").collect()}
    for i, text in rows:
        toks = tokenize_ascii(text)
        assert got[i]["n_tokens"] == len(toks)
        assert got[i]["n_distinct"] == len(set(toks))
    assert got[4]["n_tokens"] == 0


def test_quality_score_ordering(docs):
    df, _ = docs
    q = {r["doc_id"]: r["quality"] for r in quality_score(df, "text", "doc_id").collect()}
    # english prose beats the repeated-x doc and the empty doc
    assert q[0] > q[3] > q[4]
    assert 0.0 <= min(q.values()) and max(q.values()) <= 1.0


def test_language_id(docs):
    df, _ = docs
    got = {r["doc_id"]: r["lang_pred"] for r in language_id(df, "text", "doc_id").collect()}
    assert got[0] == "en"
    assert got[1] == "es"
    assert got[2] == "de"


def test_fingerprint_order_sensitive(spark):
    df = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "alpha beta gamma"), (2, "gamma beta alpha"),
         (3, "alpha  beta\tgamma")],
        "doc_id long, text string",
    )
    fp = {r["doc_id"]: r["fingerprint"] for r in
          doc_fingerprint(df, "text", "doc_id").collect()}
    assert fp[0] == fp[1]        # identical
    assert fp[0] != fp[2]        # order-sensitive
    assert fp[0] == fp[3]        # whitespace-insensitive


def test_multimodal_feature_extraction(spark):
    rows = [(i, "image" if i % 2 == 0 else "audio",
             bytes([i] * (10 + i))) for i in range(6)] + [(6, "image", None)]
    media = spark.createDataFrame(rows, "media_id long, media_type string, payload binary")
    out = extract_features(media).toPandas().set_index("media_id")
    assert len(out) == 7
    assert all(len(f) == FEATURE_DIM for f in out["feature"])
    assert out.loc[6, "n_bytes"] == 0
    # deterministic: same payload+type → same feature; type changes feature
    dec = DeterministicFakeDecoder()
    f_img = dec.decode_batch([bytes([0] * 10)], "image")
    assert np.allclose(np.asarray(out.loc[0, "feature"]), f_img[0], atol=1e-6)
    f_aud = dec.decode_batch([bytes([0] * 10)], "audio")
    assert not np.allclose(f_img, f_aud)


def test_library_decoder_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        LibraryDecoder().decode_batch([b"x"], "image")


def test_frame_sample_plan(spark):
    media = spark.createDataFrame([(0, 25), (1, 3), (2, 0)], "media_id long, n_frames long")
    got = {(r["media_id"], r["frame_no"]) for r in
           frame_sample_plan(media, every_n=10).collect()}
    assert got == {(0, 0), (0, 10), (0, 20), (1, 0), (2, 0)}


def test_token_counts_bpe(spark):
    """Whitespace + BPE-ish counts agree with python-re on the same
    pattern (three-engine family: Java regex gated vs RE2 in the entry)."""
    import re

    from stractt_spark.operators.textstats import (
        BPE_TOKEN_PATTERN,
        token_counts,
    )
    from stractt_spark.functions.tokenizer import SQL_TOKEN_PATTERN

    rows = [
        (0, "it's O'Brien can't 3.14 hello-world  foo_bar"),
        (1, "camelCase under_score  tabs\tand\nnewlines"),
        (2, ""),
        (3, "'''"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_tokens_ws"], r["n_tokens_bpe"])
           for r in token_counts(docs, "text", "doc_id").collect()}
    for i, t in rows:
        ws = len(re.findall(SQL_TOKEN_PATTERN, t.lower()))
        bpe = len(re.findall(BPE_TOKEN_PATTERN, t.lower()))
        assert got[i] == (ws, bpe), (i, got[i], ws, bpe)


def test_resize_media_contract(spark):
    """Resize plumbing: output payload length == w·h·3 for every row,
    deterministic per content, dims carried as typed metadata; the
    LibraryResizer integration point raises with instructions."""
    import pytest as _pytest

    from stractt_spark.operators.multimodal import (
        DeterministicFakeResizer,
        LibraryResizer,
        resize_media,
    )

    media = spark.createDataFrame(
        [(0, b"imagebytes-a"), (1, b"imagebytes-b"), (2, None)],
        "media_id long, payload binary",
    )
    out = resize_media(media, width=16, height=8).collect()
    assert len(out) == 3
    for r in out:
        assert (r["width"], r["height"]) == (16, 8)
        assert len(r["payload"]) == 16 * 8 * 3
    # deterministic: same content → same resized bytes
    again = resize_media(media, width=16, height=8).collect()
    assert {r["media_id"]: bytes(r["payload"]) for r in out} == \
           {r["media_id"]: bytes(r["payload"]) for r in again}
    # distinct content → distinct fake pixels
    by_id = {r["media_id"]: bytes(r["payload"]) for r in out}
    assert by_id[0] != by_id[1]
    with _pytest.raises(NotImplementedError, match="PIL"):
        LibraryResizer().resize_batch([b"x"], 4, 4)


def test_heavy_hitters_exact_on_skewed_multipartition(spark):
    """The two-pass protocol must find EXACTLY the > N/k terms even when
    a global heavy hitter is lukewarm in most partitions (the pigeonhole
    superset property), across many partitions."""
    from collections import Counter

    from stractt_spark.operators.textstats import heavy_hitters

    # 400 docs over 16 partitions: 'omega' ~ just above N/k overall but
    # concentrated; fillers unique per doc
    texts = []
    for i in range(400):
        body = f"f{i}a f{i}b f{i}c"
        if i % 7 == 0:
            body += " omega omega"
        if i % 2 == 0:
            body += " common"
        texts.append(body)
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).repartition(16)
    k = 50
    got = {r["term"]: r["n"] for r in
           heavy_hitters(docs, "text", k=k).collect()}
    c = Counter()
    for t in texts:
        c.update(t.split())
    n_total = sum(c.values())
    want = {t: n for t, n in c.items() if n > n_total / k}
    assert got == want and "omega" in got and "common" in got


def test_quality_quantile_cut_exact_threshold(spark):
    """The distributed discrete-quantile threshold equals the sorted
    definition, and exactly the strictly-above docs keep."""
    import math

    from stractt_spark.operators.textstats import (
        quality_quantile_cut,
        quality_score,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = {r["doc_id"]: (r["quality"], r["keep"])
           for r in quality_quantile_cut(docs, "text", "doc_id",
                                         q=0.3).collect()}
    qualities = sorted(q for q, _ in out.values())
    # discrete q-quantile: the value at rank ceil(q*n) (1-based)
    thr = qualities[max(math.ceil(0.3 * len(qualities)) - 1, 0)]
    for d, (q_, keep) in out.items():
        assert keep == (q_ > thr), (d, q_, thr)
    assert 0 < sum(k for _, k in out.values()) < len(out)
