"""Dedup family: exact, n-gram Jaccard, MinHash+LSH, SimHash."""

import itertools

import pytest

from stractt_spark.functions.tokenizer import tokenize_ascii
from stractt_spark.operators.dedup import (
    exact_dedup_groups,
    lsh_candidate_pairs,
    minhash_dedup_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash64,
    simhash_near_pairs,
)


def _jaccard(a: str, b: str, n: int = 3) -> float:
    ta, tb = tokenize_ascii(a), tokenize_ascii(b)
    sa = {" ".join(ta[i:i + n]) for i in range(len(ta) - n + 1)}
    sb = {" ".join(tb[i:i + n]) for i in range(len(tb) - n + 1)}
    return len(sa & sb) / len(sa | sb) if sa | sb else 0.0


@pytest.fixture(scope="module")
def dup_docs(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    variant = "the quick brown fox jumps over the lazy dog near the river bank tonight"
    other = "completely different content about spark segment posting compression"
    rows = [
        (0, base), (1, base),              # exact dups
        (2, variant),                      # near dup of 0/1
        (3, other), (4, other + " extra"),  # near pair
        (5, "tiny"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string"), rows


def test_exact_dedup(dup_docs):
    docs, _ = dup_docs
    pdf = exact_dedup_groups(docs, "text", "doc_id").toPandas()
    g = pdf.set_index("doc_id")
    assert g.loc[0, "keep_id"] == 0 and g.loc[1, "keep_id"] == 0
    assert g.loc[0, "group_size"] == 2
    assert g.loc[2, "group_size"] == 1


def test_ngram_jaccard_pairs_exact(dup_docs):
    docs, rows = dup_docs
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.3,
                                     max_shingle_freq=10**6).collect()
    }
    expected = {}
    for (i, a), (j, b) in itertools.combinations(rows, 2):
        jac = _jaccard(a, b)
        if jac >= 0.3:
            expected[(i, j)] = round(jac, 6)
    assert got == expected
    assert (0, 1) in got and got[(0, 1)] == 1.0


def test_minhash_lsh_recall_and_verify(dup_docs):
    docs, rows = dup_docs
    verified = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in minhash_dedup_pairs(docs, "text", "doc_id", threshold=0.5).collect()
    }
    # exact-dup and high-sim pairs must be found and exactly verified
    assert verified[(0, 1)] == 1.0
    assert (0, 2) in verified and (1, 2) in verified
    # every reported jaccard is the true one (verification is exact)
    for (a, b), j in verified.items():
        assert abs(_jaccard(rows[a][1], rows[b][1]) - j) < 1e-6


def test_minhash_identical_docs_identical_sigs(dup_docs):
    docs, _ = dup_docs
    sigs = {r["doc_id"]: tuple(r["sig"]) for r in
            minhash_signatures(docs, "text", "doc_id").collect()}
    assert sigs[0] == sigs[1]
    assert len(sigs[0]) == 64
    # LSH candidates include the identical pair
    pairs = {(r["doc_a"], r["doc_b"]) for r in
             lsh_candidate_pairs(minhash_signatures(docs, "text", "doc_id")).collect()}
    assert (0, 1) in pairs


def test_simhash_near_pairs(dup_docs):
    docs, _ = dup_docs
    sim = simhash64(docs, "text", "doc_id")
    h = {r["doc_id"]: r["simhash"] for r in sim.collect()}
    assert h[0] == h[1]  # identical text → identical simhash
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in
             simhash_near_pairs(sim, max_hamming=10).collect()}
    assert pairs[(0, 1)] == 0
    assert (0, 2) in pairs  # one-token change → small hamming
    # exact hamming matches popcount of xor
    for (a, b), ham in pairs.items():
        assert bin((h[a] ^ h[b]) & ((1 << 64) - 1)).count("1") == ham


def test_connected_components_known_graph(spark):
    """Chains and stars collapse to their minimum id; singletons appear
    only through edges (near_dup_components covers edge-free docs)."""
    from stractt_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        # chain 1-2-3-4-5 (propagation needs >1 round), star 10-{11,12},
        # pair 20-21
        [(2, 1), (2, 3), (4, 3), (4, 5), (10, 11), (10, 12), (20, 21)],
        "a long, b long",
    )
    got = {r["doc_id"]: r["component_id"]
           for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
                   10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_near_dup_components_transitive_cluster(spark):
    """A~B and B~C (but A~C below threshold) must still land in ONE
    cluster — the transitivity exact pairs alone cannot express."""
    from stractt_spark.operators.dedup import near_dup_components

    base = [f"tok{i}" for i in range(40)]
    a = " ".join(base)
    b = " ".join(base[:36] + ["xx1", "xx2", "xx3", "xx4"])
    c = " ".join(base[:32] + ["xx1", "xx2", "xx3", "xx4",
                              "yy1", "yy2", "yy3", "yy4"])
    docs = spark.createDataFrame(
        [(0, a), (1, b), (2, c), (3, "totally different content here")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: (r["component_id"], r["keep"])
           for r in near_dup_components(
               docs, "text", "doc_id", n=1, threshold=0.8, bands=32
           ).collect()}
    assert out[0] == (0, True)
    assert out[1] == (0, False)
    assert out[2] == (0, False)   # linked through B only
    assert out[3] == (3, True)    # untouched singleton keeps itself


def test_connected_components_star_equivalence(spark):
    """Large-star/small-star contraction (VERDICT r4 #10) returns the
    SAME (doc_id, component_id) map as min-label propagation on random
    graphs — property-tested over several seeded shapes."""
    import random

    from stractt_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    for seed, n_nodes, n_edges in [(1, 30, 20), (2, 50, 60), (3, 40, 15)]:
        rng = random.Random(seed)
        es = sorted({
            tuple(sorted(rng.sample(range(n_nodes), 2)))
            for _ in range(n_edges)
        })
        edges = spark.createDataFrame(es, "a long, b long")
        want = {r["doc_id"]: r["component_id"]
                for r in connected_components(edges).collect()}
        got = {r["doc_id"]: r["component_id"]
               for r in connected_components_star(edges).collect()}
        assert got == want, f"seed {seed}"


def test_connected_components_chain_guards_and_star_logn(spark):
    """ADVICE r4: exhausting max_iter with labels still moving raises
    (was: silent split components).  The star-contraction variant
    converges on the same pathological chain in O(log n) rounds."""
    import pytest

    from stractt_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    n = 120  # chain 0-1-2-...-119: diameter 119 >> 10 rounds
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "a long, b long"
    )
    with pytest.raises(RuntimeError, match="not converged"):
        connected_components(edges, max_iter=10)
    # star contraction handles the same chain within ~log2(120)+slack
    got = {r["doc_id"]: r["component_id"]
           for r in connected_components_star(edges, max_iter=10).collect()}
    assert got == {i: 0 for i in range(n)}


def test_lsh_bucket_cap_guard(spark):
    """max_bucket_size drops oversized buckets before the pair self-join
    (the f² skew guard); true near-dups sharing a small bucket survive."""
    from stractt_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    # 30 IDENTICAL docs (every band bucket has 30 members) + one
    # near-dup pair with distinct text
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(i, "common " + base) for i in range(30)]
    rows += [(100, base + " tail1 tail2"), (101, base + " tail1 tail3")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = minhash_signatures(docs, "text", "doc_id", n=3, num_perm=64)
    uncapped = lsh_candidate_pairs(sigs, bands=16)
    assert uncapped.count() >= 30 * 29 // 2  # the identical cluster
    capped = lsh_candidate_pairs(sigs, bands=16, max_bucket_size=10)
    got = {(r["doc_a"], r["doc_b"]) for r in capped.collect()}
    # the 30-doc cluster's buckets are all oversized → dropped
    assert all(a >= 100 for a, b in got)
    # the small-bucket near-dup pair survives
    assert (100, 101) in got


def test_duplicated_ngram_stats(spark):
    from stractt_spark.operators.dedup import duplicated_ngram_stats

    docs = spark.createDataFrame(
        [
            # docs 1 and 2 share the 3-gram "a b c" once each; doc 3
            # repeats "x y z" internally but NO OTHER doc has it, so
            # within-doc repetition alone must not count; doc 4 is
            # shorter than n and must report 0/0
            (1, "a b c d e"),
            (2, "q a b c r"),
            (3, "x y z x y z"),
            (4, "s t"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["dup_tokens"], r["dup_frac"])
        for r in duplicated_ngram_stats(docs, "text", "doc_id", n=3).collect()
    }
    assert got[1] == (5, 3, 0.6)       # positions 1-3 covered
    assert got[2] == (5, 3, 0.6)       # positions 2-4 covered
    assert got[3] == (6, 0, 0.0)       # self-repeat only
    assert got[4] == (2, 0, 0.0)       # shorter than n

    # overlapping duplicated windows: coverage is the UNION of positions
    docs2 = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c d")], "doc_id long, text string"
    )
    got2 = {
        r["doc_id"]: (r["n_tokens"], r["dup_tokens"])
        for r in duplicated_ngram_stats(docs2, "text", "doc_id", n=3).collect()
    }
    assert got2[1] == (4, 4) and got2[2] == (4, 4)


def test_strip_duplicated_spans(spark):
    from stractt_spark.operators.dedup import strip_duplicated_spans

    docs = spark.createDataFrame(
        [
            (1, "a b c d e"),   # "a b c" duplicated with doc 2 → keep "d e"
            (2, "q a b c r"),   # → keep "q r"
            (3, "x y z"),       # unique → unchanged
            (4, "a b c"),       # entirely duplicated → empty rewrite
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["clean_text"], r["n_tokens"], r["kept_tokens"])
        for r in strip_duplicated_spans(docs, "text", "doc_id", n=3).collect()
    }
    assert got[1] == ("d e", 5, 2)
    assert got[2] == ("q r", 5, 2)
    assert got[3] == ("x y z", 3, 3)
    assert got[4] == ("", 3, 0)


def test_duplicated_ngram_randomized_vs_python(spark):
    """Randomized (deterministic-seed) cross-check of the interval-union
    coverage against a brute-force python oracle."""
    import random
    import re

    from stractt_spark.functions.tokenizer import SQL_TOKEN_PATTERN
    from stractt_spark.operators.dedup import duplicated_ngram_stats

    rng = random.Random(20260817)
    vocab = [f"w{i}" for i in range(12)]  # small vocab → many collisions
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 12))))
        for i in range(40)
    ]
    n = 4
    tok = {
        i: re.findall(SQL_TOKEN_PATTERN, t.lower()) for i, t in docs
    }
    wins = {}
    for i, ts in tok.items():
        for s in range(len(ts) - n + 1):
            wins.setdefault(tuple(ts[s:s + n]), set()).add(i)
    dup = {ng for ng, ds in wins.items() if len(ds) > 1}
    want = {}
    for i, ts in tok.items():
        cov = set()
        for s in range(len(ts) - n + 1):
            if tuple(ts[s:s + n]) in dup:
                cov.update(range(s, s + n))
        want[i] = (len(ts), len(cov))
    got = {
        r["doc_id"]: (r["n_tokens"], r["dup_tokens"])
        for r in duplicated_ngram_stats(
            spark.createDataFrame(docs, "doc_id long, text string"),
            "text", "doc_id", n=n,
        ).collect()
    }
    assert got == want


def test_deterministic_split(spark):
    from stractt_spark.operators.dedup import deterministic_split

    docs = spark.createDataFrame(
        [(i, f"text {i % 50}") for i in range(400)],
        "doc_id long, text string",
    )
    # content-keyed: identical texts always land in the same split
    by_text = deterministic_split(docs, "doc_id", text_col="text").collect()
    sides = {}
    for r in by_text:
        t = r["doc_id"] % 50
        assert sides.setdefault(t, r["split"]) == r["split"]
    # id-keyed: deterministic across invocations, fraction ≈ 25/256
    a = {r["doc_id"]: r["split"]
         for r in deterministic_split(docs, "doc_id").collect()}
    b = {r["doc_id"]: r["split"]
         for r in deterministic_split(docs, "doc_id").collect()}
    assert a == b
    frac = sum(1 for s in a.values() if s == "test") / len(a)
    assert 0.02 < frac < 0.25
    # salt re-deals the buckets
    c = {r["doc_id"]: r["split"]
         for r in deterministic_split(docs, "doc_id", salt="v2").collect()}
    assert c != a


def test_decontaminate_semantics(spark):
    from stractt_spark.operators.dedup import decontaminate

    phrase = "one two three four five six seven eight"
    train = spark.createDataFrame(
        [
            (0, f"prefix {phrase} suffix words here"),      # leaks phrase
            (1, "totally clean document with other words"), # clean, 8 toks? no: 6
            (2, "short"),                                   # < n tokens
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, f"eval question about {phrase} indeed")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in decontaminate(train, bench, "text", "doc_id", n=8).collect()
    }
    assert set(got) == {0, 1, 2}
    # doc 0: 12 tokens -> 5 windows; exactly one (the phrase itself) leaks
    assert got[0]["n_windows"] == 5
    assert got[0]["hit_windows"] == 1
    assert got[0]["contaminated"] is True
    # doc 1: 6 tokens -> no 8-windows at all
    assert got[1]["n_windows"] == 0 and got[1]["contaminated"] is False
    assert got[2]["n_windows"] == 0 and got[2]["contaminated"] is False
    # a bench window straddling the phrase boundary must not fire on train
    assert got[0]["hit_windows"] < got[0]["n_windows"]


def test_stratified_sample_exact(spark):
    from stractt_spark.operators.sampling import stratified_sample_exact

    docs = spark.createDataFrame(
        [(i, "a" if i < 100 else "b") for i in range(130)],
        "doc_id long, lang string",
    )
    out = stratified_sample_exact(
        docs, "lang", "doc_id", fractions={"a": 0.3}, default_frac=0.5
    ).collect()
    kept = {}
    for r in out:
        kept.setdefault(r["stratum"], set())
        assert 1 <= r["rk"] <= r["n_stratum"]
        if r["keep"]:
            kept[r["stratum"]].add(r["doc_id"])
    # exact counts: ceil(0.3*100)=30, ceil(0.5*30)=15
    assert len(kept["a"]) == 30 and len(kept["b"]) == 15
    # deterministic across invocations
    again = {
        (r["doc_id"], r["keep"])
        for r in stratified_sample_exact(
            docs, "lang", "doc_id", fractions={"a": 0.3}, default_frac=0.5
        ).collect()
    }
    assert again == {(r["doc_id"], r["keep"]) for r in out}
    # prefix-stability: raising a fraction only ADDS docs
    bigger = {
        r["doc_id"]
        for r in stratified_sample_exact(
            docs, "lang", "doc_id", fractions={"a": 0.6}, default_frac=0.5
        ).collect()
        if r["keep"] and r["stratum"] == "a"
    }
    assert kept["a"] <= bigger and len(bigger) == 60


def test_pack_sequences_prefix_sum(spark):
    from stractt_spark.operators.sampling import pack_sequences

    # token counts: doc0=3, doc1=5, doc2=0, doc3=4  (ids deliberately
    # spanning several chunks with chunk_docs=2)
    docs = spark.createDataFrame(
        [(0, "a b c"), (1, "d e f g h"), (2, ""), (3, "i j k l")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in pack_sequences(
            docs, "text", "doc_id", ctx_len=4, chunk_docs=2
        ).collect()
    }
    # offsets: 0, 3, 8, 8 ; ctx 4 -> bins: 0/0..1, 3..7 -> 0..1, 8->2, 8..11 -> 2
    assert (got[0]["offset"], got[0]["bin_first"], got[0]["bin_last"]) == (0, 0, 0)
    assert (got[1]["offset"], got[1]["bin_first"], got[1]["bin_last"]) == (3, 0, 1)
    assert got[2]["n_tokens"] == 0
    assert (got[2]["offset"], got[2]["bin_first"], got[2]["bin_last"]) == (8, 2, 2)
    assert (got[3]["offset"], got[3]["bin_first"], got[3]["bin_last"]) == (8, 2, 2)
    # chunking must not change results
    alt = {
        r["doc_id"]: (r["offset"], r["bin_first"], r["bin_last"])
        for r in pack_sequences(
            docs, "text", "doc_id", ctx_len=4, chunk_docs=100
        ).collect()
    }
    assert alt == {
        d: (r["offset"], r["bin_first"], r["bin_last"])
        for d, r in got.items()
    }


def test_dsir_weights_python_twin(spark):
    """dsir_weights vs an independent pure-Python model, plus the
    direction property: docs drawn from the target domain's vocabulary
    outscore off-domain docs."""
    import math
    from collections import Counter

    from stractt_spark.operators.sampling import dsir_weights

    rows = [
        (0, "alpha beta alpha gamma", "t"),    # target-domain doc
        (1, "alpha beta beta beta", "t"),      # target-domain doc
        (2, "zeta eta theta zeta", "r"),       # off-domain
        (3, "alpha zeta", "r"),                # mixed
        (4, "", "r"),                          # empty
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, d string")
    got = {
        r["doc_id"]: r
        for r in dsir_weights(
            docs, docs.where("d = 't'"), "text", "doc_id", alpha=0.5
        ).collect()
    }

    raw = Counter(t for _, txt, _ in rows for t in txt.split())
    tgt = Counter(t for _, txt, d in rows if d == "t" for t in txt.split())
    v = len(set(raw) | set(tgt)) + 1
    nr, nt = sum(raw.values()), sum(tgt.values())

    def lr(tok):
        return math.log((tgt.get(tok, 0) + 0.5) / (nt + 0.5 * v)) - math.log(
            (raw[tok] + 0.5) / (nr + 0.5 * v)
        )

    for i, txt, _ in rows:
        toks = txt.split()
        exp = sum(lr(t) for t in toks)
        assert abs(got[i]["logratio"] - round(exp, 6)) < 1e-6, i
        assert got[i]["n_tokens"] == len(toks)
        if toks:
            assert abs(got[i]["avg_logratio"] - round(exp / len(toks), 6)) < 1e-6
        else:
            assert got[i]["avg_logratio"] == 0.0
    # direction: in-domain docs outscore off-domain
    assert got[0]["avg_logratio"] > got[3]["avg_logratio"] > got[2]["avg_logratio"]
