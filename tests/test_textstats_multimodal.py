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


def test_redact_pii_semantics(spark):
    from stractt_spark.operators.textstats import redact_pii

    docs = spark.createDataFrame(
        [
            (0, "mail alice@example.com and bob.smith+x@sub.domain.org now"),
            (1, "host 10.1.2.3 and 255.255.255.255 up"),
            (2, "call 555-123-4567 or 800.555.1212"),
            (3, "user@10.0.0.1 logs in"),  # digit TLD: not an email match
            (4, "no pii at all"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in redact_pii(docs, "text", "doc_id").collect()}
    assert got[0]["n_email"] == 2 and got[0]["clean_text"] == \
        "mail <EMAIL> and <EMAIL> now"
    assert got[1]["n_ipv4"] == 2 and got[1]["clean_text"] == \
        "host <IP> and <IP> up"
    assert got[2]["n_phone"] == 2 and got[2]["clean_text"] == \
        "call <PHONE> or <PHONE>"
    # the email pattern requires a letter TLD, so the dotted quad stays an IP
    assert got[3]["n_email"] == 0 and got[3]["n_ipv4"] == 1
    assert got[3]["clean_text"] == "user@<IP> logs in"
    assert got[4]["clean_text"] == "no pii at all"
    assert all(got[4][c] == 0 for c in ("n_email", "n_ipv4", "n_phone"))


def test_bigram_lm_hand_computed(spark):
    import math

    from stractt_spark.operators.textstats import bigram_lm_score

    # corpus: doc0 = "a b a b", doc1 = "b a"  ->  bigram counts:
    #   (a,b): 2   (b,a): 2   ;  c(a)=2, c(b)=2 ; vocab = {a, b}, V = 3
    docs = spark.createDataFrame(
        [(0, "a b a b"), (1, "b a"), (2, "x")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in bigram_lm_score(docs, "text", "doc_id", alpha=0.5).collect()
    }
    p = (2 + 0.5) / (2 + 0.5 * 4)  # V = |{a,b,x}| + 1 = 4
    nll = -math.log(p)
    assert got[0]["n_bigrams"] == 3
    assert abs(got[0]["avg_nll"] - round(nll, 6)) < 1e-9
    assert abs(got[0]["ppl"] - round(math.exp(nll), 6)) < 1e-9
    assert got[1]["n_bigrams"] == 1
    # single-token doc: defined as (0 bigrams, nll 0, ppl 1)
    assert got[2]["n_bigrams"] == 0
    assert got[2]["avg_nll"] == 0.0 and got[2]["ppl"] == 1.0


def test_bigram_lm_heldout_model(spark):
    from stractt_spark.operators.textstats import bigram_lm_score

    lm = spark.createDataFrame(
        [(0, "the cat sat on the mat " * 5)], "doc_id long, text string"
    )
    docs = spark.createDataFrame(
        [(1, "the cat sat"), (2, "zq qz zq qz")],  # fluent vs OOV gibberish
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in bigram_lm_score(
            docs, "text", "doc_id", lm_docs=lm
        ).collect()
    }
    assert got[2]["ppl"] > got[1]["ppl"] * 3  # gibberish far above fluent


# ------------------------------------------------ Gopher repetition filter


def _py_gopher(text: str) -> dict:
    """Independent pure-Python twin of gopher_repetition for one doc."""
    from collections import Counter

    from stractt_spark.operators.textstats import (
        GOPHER_DUP_NGRAM_MAX,
        GOPHER_TOP_NGRAM_MAX,
    )

    toks = tokenize_ascii(text)
    tot = sum(len(t) for t in toks)
    out = {"n_tokens": len(toks), "tot_chars": tot}
    keep = True
    for n in sorted(GOPHER_TOP_NGRAM_MAX | GOPHER_DUP_NGRAM_MAX):
        grams = [
            "\x01".join(toks[i:i + n]) for i in range(len(toks) - n + 1)
        ]
        cnt = Counter(grams)
        if n in GOPHER_TOP_NGRAM_MAX:
            if cnt:
                # tie rule: max (count, chars, gram) lexicographic
                top = max(
                    cnt.items(),
                    key=lambda kv: (kv[1], len(kv[0]) - (n - 1), kv[0]),
                )
                v = top[1] * (len(top[0]) - (n - 1)) / max(tot, 1)
            else:
                v = 0.0
            out[f"top{n}_frac"] = round(v, 6)
            keep = keep and out[f"top{n}_frac"] <= GOPHER_TOP_NGRAM_MAX[n]
        else:
            dup = sum(
                c * (len(g) - (n - 1)) for g, c in cnt.items() if c >= 2
            )
            out[f"dup{n}_frac"] = round(dup / max(tot, 1), 6)
            keep = keep and out[f"dup{n}_frac"] <= GOPHER_DUP_NGRAM_MAX[n]
    out["keep"] = keep
    return out


def test_gopher_repetition_vs_python_twin(spark):
    from stractt_spark.operators.textstats import gopher_repetition

    rows = [
        (0, "the quick brown fox jumps over the lazy dog near the bank"),
        # looped generation: one 6-token phrase repeated — dup5..8 fire
        (1, "alpha beta gamma delta epsilon zeta " * 8),
        # keyboard mash: single token repeated — top2..4 fire hard
        (2, "spam " * 40),
        # long diverse doc (a 1-gram stream of distinct words): the only
        # shape the thresholds are calibrated FOR — every n-gram occurs
        # once and is a tiny char fraction of the doc
        (3, " ".join(f"w{i}distinct" for i in range(120))),
        (4, ""),
        (5, "solo"),
        # exactly two occurrences of a 5-gram, nothing longer repeated
        (6, "a b c d e XX a b c d e YY unique tail words here now"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r.asDict()
        for r in gopher_repetition(df, "text", "doc_id").collect()
    }
    for i, text in rows:
        exp = _py_gopher(text)
        g = got[i]
        for k, v in exp.items():
            if isinstance(v, float):
                assert abs(g[k] - v) < 1e-9, (i, k, g[k], v)
            else:
                assert g[k] == v, (i, k, g[k], v)
    # the signals actually FIRE on the degenerate docs
    assert not got[1]["keep"] and got[1]["dup6_frac"] > 0.5
    assert not got[2]["keep"] and got[2]["top2_frac"] > 0.9
    # a long diverse doc passes; SHORT docs legitimately fail the top-n
    # char-fraction thresholds (one 3-gram is >18% of a 12-token doc) —
    # Gopher pairs these with a min-length cut for exactly that reason
    assert got[3]["keep"]
    assert got[6]["dup5_frac"] > 0 and got[6]["dup8_frac"] == 0.0


def test_gopher_repetition_zero_shuffle_plan(spark):
    """The op must stay a pure projection: no Exchange in the plan."""
    from stractt_spark.operators.textstats import gopher_repetition

    df = spark.createDataFrame(
        [(0, "a b c")], "doc_id long, text string"
    )
    plan = gopher_repetition(
        df, "text", "doc_id"
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ------------------------------------------------------ perceptual hash


def test_dhash_perceptual_near_dup(spark):
    """A lightly perturbed image lands at SMALL Hamming distance (the
    gradient signs barely move) while an unrelated image lands far —
    and the pairing reuses the text-SimHash banded Hamming join."""
    import numpy as np
    import pandas as pd

    from stractt_spark.functions.png import encode_png
    from stractt_spark.operators.dedup import simhash_near_pairs
    from stractt_spark.operators.multimodal import (
        dhash_from_pixels,
        dhash_images,
    )

    rng = np.random.default_rng(11)
    base = rng.integers(0, 256, (40, 60, 3), dtype=np.uint8)
    # +-1 noise on 2% of pixels: coarse box means barely move
    near = base.astype(np.int16)
    mask = rng.random((40, 60)) < 0.02
    near[mask] += rng.integers(-1, 2, mask.sum()).reshape(-1, 1)
    near = np.clip(near, 0, 255).astype(np.uint8)
    other = rng.integers(0, 256, (40, 60, 3), dtype=np.uint8)

    h_base = dhash_from_pixels(base)
    h_near = dhash_from_pixels(near)
    h_other = dhash_from_pixels(other)
    d_near = bin((h_base ^ h_near) & (2**64 - 1)).count("1")
    d_other = bin((h_base ^ h_other) & (2**64 - 1)).count("1")
    assert d_near <= 3 < d_other

    media = spark.createDataFrame(
        pd.DataFrame({
            "media_id": pd.Series([0, 1, 2], dtype="int64"),
            "payload": pd.Series(
                [encode_png(base), encode_png(near), encode_png(other)],
                dtype=object,
            ),
        })
    )
    hashes = dhash_images(media)
    got = {r["media_id"]: r["dhash"] for r in hashes.collect()}
    assert got == {0: h_base, 1: h_near, 2: h_other}
    pairs = simhash_near_pairs(
        hashes.select(
            hashes["media_id"].alias("doc_id"),
            hashes["dhash"].alias("simhash"),
        ),
        max_hamming=3,
    ).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in pairs} == {(0, 1)}


def test_dhash_grayscale_and_guard():
    import numpy as np
    import pytest

    from stractt_spark.operators.multimodal import dhash_from_pixels

    g = np.arange(8 * 9, dtype=np.uint8).reshape(8, 9)
    rgb = np.stack([g, g, g], axis=2)
    assert dhash_from_pixels(g) == dhash_from_pixels(rgb)
    # monotone-increasing rows → every gradient bit set
    assert dhash_from_pixels(g) == -1  # int64 view of 0xFFFFFFFFFFFFFFFF
    with pytest.raises(ValueError, match="at least 8x9"):
        dhash_from_pixels(np.zeros((4, 4), dtype=np.uint8))


def test_afp_perceptual_near_dup(spark):
    """±1-sample noise barely moves band energies → small Hamming; an
    unrelated clip lands far.  Pairing reuses the banded Hamming join."""
    import numpy as np
    import pandas as pd

    from stractt_spark.functions.wav import encode_wav
    from stractt_spark.operators.dedup import simhash_near_pairs
    from stractt_spark.operators.multimodal import (
        afp_from_raw,
        fingerprint_audio,
    )

    rng = np.random.default_rng(5)
    base = rng.integers(-8000, 8000, 4000).astype(np.int16)
    near = base.astype(np.int32)
    mask = rng.random(4000) < 0.02
    near[mask] += rng.integers(-1, 2, mask.sum())
    near = np.clip(near, -32768, 32767).astype(np.int16)
    other = rng.integers(-8000, 8000, 4000).astype(np.int16)

    h_base = afp_from_raw(base.astype(np.int64), 1)
    h_near = afp_from_raw(near.astype(np.int64), 1)
    h_other = afp_from_raw(other.astype(np.int64), 1)
    d_near = bin((h_base ^ h_near) & (2**64 - 1)).count("1")
    d_other = bin((h_base ^ h_other) & (2**64 - 1)).count("1")
    assert d_near <= 3 < d_other

    media = spark.createDataFrame(
        pd.DataFrame({
            "media_id": pd.Series([0, 1, 2], dtype="int64"),
            "payload": pd.Series(
                [encode_wav(base, 8000), encode_wav(near, 8000),
                 encode_wav(other, 8000)],
                dtype=object,
            ),
        })
    )
    hashes = fingerprint_audio(media)
    got = {r["media_id"]: r["afp"] for r in hashes.collect()}
    assert got == {0: h_base, 1: h_near, 2: h_other}
    pairs = simhash_near_pairs(
        hashes.select(
            hashes["media_id"].alias("doc_id"),
            hashes["afp"].alias("simhash"),
        ),
        max_hamming=3,
    ).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in pairs} == {(0, 1)}


def test_afp_stereo_and_guard():
    import numpy as np
    import pytest

    from stractt_spark.operators.multimodal import afp_from_raw

    mono = np.arange(200, dtype=np.int64) - 100
    # stereo interleave of the same signal: mono fold = 2x samples,
    # energies scale by 4 uniformly -> identical gradient signs
    stereo = np.repeat(mono, 2)
    assert afp_from_raw(mono, 1) == afp_from_raw(stereo, 2)
    with pytest.raises(ValueError, match="frames"):
        afp_from_raw(np.arange(10, dtype=np.int64), 1)


def test_vfp_perceptual_near_dup(spark):
    """Per-frame ±1 noise on a clip's lumas barely moves the temporal
    sum → small Hamming; different content lands far."""
    import numpy as np
    import pandas as pd

    from stractt_spark.functions.y4m import encode_y4m
    from stractt_spark.operators.dedup import simhash_near_pairs
    from stractt_spark.operators.multimodal import (
        fingerprint_video,
        vfp_from_frames,
    )

    rng = np.random.default_rng(3)
    base = [rng.integers(0, 256, (24, 36), dtype=np.uint8)
            for _ in range(6)]
    near = []
    for fr in base:
        f2 = fr.astype(np.int16)
        mask = rng.random(fr.shape) < 0.02
        f2[mask] += rng.integers(-1, 2, mask.sum())
        near.append(np.clip(f2, 0, 255).astype(np.uint8))
    other = [rng.integers(0, 256, (24, 36), dtype=np.uint8)
             for _ in range(6)]

    h_base, h_near, h_other = (
        vfp_from_frames(base), vfp_from_frames(near), vfp_from_frames(other)
    )
    d_near = bin((h_base ^ h_near) & (2**64 - 1)).count("1")
    d_other = bin((h_base ^ h_other) & (2**64 - 1)).count("1")
    assert d_near <= 3 < d_other

    media = spark.createDataFrame(
        pd.DataFrame({
            "media_id": pd.Series([0, 1, 2], dtype="int64"),
            "payload": pd.Series(
                [encode_y4m(base), encode_y4m(near), encode_y4m(other)],
                dtype=object,
            ),
        })
    )
    hashes = fingerprint_video(media)
    got = {r["media_id"]: r["vfp"] for r in hashes.collect()}
    assert got == {0: h_base, 1: h_near, 2: h_other}
    pairs = simhash_near_pairs(
        hashes.select(
            hashes["media_id"].alias("doc_id"),
            hashes["vfp"].alias("simhash"),
        ),
        max_hamming=3,
    ).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in pairs} == {(0, 1)}


def test_vfp_guard():
    import pytest

    from stractt_spark.operators.multimodal import vfp_from_frames

    with pytest.raises(ValueError, match="at least one frame"):
        vfp_from_frames([])


def test_afp_32bit_loud_stereo_exact_no_overflow():
    """Loud 32-bit stereo: band sums exceed int64 — the fallback must
    produce the arbitrary-precision-exact hash, matching a pure-Python
    scalar computation."""
    import numpy as np

    from stractt_spark.operators.multimodal import afp_from_raw

    rng = np.random.default_rng(9)
    raw = rng.integers(-2**31 + 1, 2**31 - 1, 400, dtype=np.int64)
    got = afp_from_raw(raw, 2)
    # independent scalar twin (big ints throughout)
    mono = [int(raw[2 * j]) + int(raw[2 * j + 1]) for j in range(200)]
    n, bands = 200, 65
    es = [sum(v * v for v in mono[k * n // bands:(k + 1) * n // bands])
          for k in range(bands)]
    assert any(e >= 2**63 for e in es)  # the overflow case is real
    bits = 0
    for k in range(bands - 1):
        if es[k] < es[k + 1]:
            bits |= 1 << k
    if bits >= 1 << 63:
        bits -= 1 << 64
    assert got == bits


def test_afp_8bit_gain_invariance_and_parse_guards(spark):
    """8-bit PCM recentred by −128: doubling the gain of the SIGNAL
    leaves the fingerprint bit-identical (energies scale uniformly).
    Unsupported depths / non-RIFF payloads fail with WavError."""
    import numpy as np
    import pandas as pd
    import pytest

    from stractt_spark.functions.wav import WavError, encode_wav
    from stractt_spark.operators.multimodal import (
        _parse_wav_raw,
        fingerprint_audio,
    )

    rng = np.random.default_rng(4)
    sig = rng.integers(-50, 51, 500)
    quiet = (128 + sig).astype(np.uint8)
    loud = (128 + 2 * sig).astype(np.uint8)
    media = spark.createDataFrame(
        pd.DataFrame({
            "media_id": pd.Series([0, 1], dtype="int64"),
            "payload": pd.Series(
                [encode_wav(quiet, 8000, bits=8), encode_wav(loud, 8000, bits=8)],
                dtype=object,
            ),
        })
    )
    got = {r["media_id"]: r["afp"]
           for r in fingerprint_audio(media).collect()}
    assert got[0] == got[1]

    with pytest.raises(WavError, match="RIFF"):
        _parse_wav_raw(b"nope" * 10)
    good = bytes(encode_wav(np.zeros(80, dtype=np.int16), 8000))
    bad_bits = bytearray(good)
    # fmt chunk: bits field at offset 12+8+14 = 34 (little-endian u16)
    bad_bits[34:36] = (24).to_bytes(2, "little")
    with pytest.raises(WavError, match="bit depth"):
        _parse_wav_raw(bytes(bad_bits))
