"""Text analysis for training-data pipelines: token counts, quality
scoring, language ID, document fingerprints.

All formulas are deterministic and (where oracle-gated) expressible in
both Spark SQL and DuckDB SQL; the heuristics follow the shape of the
reference's text-quality machinery (stopword density / length thresholds
of its JusText boilerplate pass, /root/reference/src/webpage/just_text.rs:
27-32) re-targeted at corpus curation instead of HTML cleaning.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.tokenizer import SQL_TOKEN_PATTERN

# Tiny per-language stopword sets for the n-gram/stopword-ratio language
# heuristic.  Deliberately small + fixed so the same lists inline into SQL.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "in", "that", "for"),
    "es": ("el", "la", "de", "que", "y", "en", "los", "una"),
    "de": ("der", "die", "das", "und", "ist", "von", "ein", "mit"),
    "fr": ("le", "la", "les", "de", "et", "est", "un", "une"),
}

# JusText-inspired quality thresholds (just_text.rs:27-32)
LENGTH_LOW = 70
STOPWORDS_LOW = 0.30


def _tokens_col(text_col: str) -> F.Column:
    return F.expr(f"regexp_extract_all(lower({text_col}), '{SQL_TOKEN_PATTERN}', 0)")


# BPE-ish pre-tokenizer (GPT-2 pattern family), restricted to constructs
# that behave IDENTICALLY in Python re, Java regex and RE2 (leftmost-first
# alternation, NO lookarounds — RE2 has none): contraction suffixes, then
# space-prefixed letter runs, digit runs, punct runs, then whitespace
# runs.  Applied to lower(text); raw control chars for the reasons in
# tokenizer.SQL_TOKEN_PATTERN.  An LLM-pipeline cost estimator: counts
# approximate real BPE token counts to within the merge effect.
BPE_TOKEN_PATTERN = (
    "'(?:s|t|ll|ve|re|d|m)"
    "| ?[a-z]+"
    "| ?[0-9]+"
    "| ?[^a-z0-9 \t\n\r\f\v']+"
    "|[ \t\n\r\f\v]+"
)


def token_counts(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """→ (doc_id, n_tokens_ws, n_tokens_bpe): whitespace-ish token count
    (the engine token pattern) and the BPE-ish pre-token count — the two
    standard LLM-training-data cost denominators.  Pure JVM expressions,
    no UDF; the identical regexes run in the DuckDB oracle."""
    ws = _tokens_col(text_col)
    # F.lit for the regexp: the pattern contains an apostrophe, which a
    # SQL-literal embedding would mis-parse
    bpe = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit(BPE_TOKEN_PATTERN), F.lit(0)
    )
    return docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.size(ws).cast("long").alias("n_tokens_ws"),
        F.size(bpe).cast("long").alias("n_tokens_bpe"),
    )


def token_stats(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """→ (doc_id, n_tokens, n_distinct, distinct_ratio, avg_token_len) —
    pure JVM expressions (no UDF)."""
    toks = _tokens_col(text_col)
    return docs.select(
        F.col(id_col).cast("long").alias("doc_id"), toks.alias("_t")
    ).select(
        "doc_id",
        F.size("_t").cast("long").alias("n_tokens"),
        F.size(F.array_distinct("_t")).cast("long").alias("n_distinct"),
        F.round(
            F.size(F.array_distinct("_t"))
            / F.greatest(F.size("_t"), F.lit(1)).cast("double"),
            6,
        ).alias("distinct_ratio"),
        F.round(
            F.aggregate("_t", F.lit(0.0), lambda acc, t: acc + F.length(t))
            / F.greatest(F.size("_t"), F.lit(1)).cast("double"),
            6,
        ).alias("avg_token_len"),
    )


def quality_score(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Deterministic quality score in [0,1]:
    0.4·min(1, n_tokens/LENGTH_LOW) + 0.3·distinct_ratio +
    0.3·min(1, stopword_ratio/STOPWORDS_LOW) — length, lexical diversity
    and stopword density, the JusText signal triple."""
    stops = F.array(*[F.lit(s) for s in LANG_STOPWORDS["en"]])
    toks = _tokens_col(text_col)
    base = docs.select(F.col(id_col).cast("long").alias("doc_id"), toks.alias("_t"))
    n = F.greatest(F.size("_t"), F.lit(1)).cast("double")
    stop_ratio = F.size(F.filter("_t", lambda t: F.array_contains(stops, t))) / n
    distinct_ratio = F.size(F.array_distinct("_t")) / n
    score = (
        F.lit(0.4) * F.least(F.lit(1.0), F.size("_t") / F.lit(float(LENGTH_LOW)))
        + F.lit(0.3) * distinct_ratio
        + F.lit(0.3) * F.least(F.lit(1.0), stop_ratio / F.lit(STOPWORDS_LOW))
    )
    return base.select(
        "doc_id",
        F.size("_t").cast("long").alias("n_tokens"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(score, 6).alias("quality"),
    )


def language_id(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Stopword-overlap language heuristic: → (doc_id, lang_pred, lang_hits).

    Picks the language whose stopword set has the most token hits
    (ties → lexicographically LARGEST lang code, deterministic — matches
    ``ORDER BY hits DESC, lang DESC LIMIT 1`` in SQL).  The reference used
    whatlang with a 0.95 confidence gate (webpage/mod.rs:286-304); this is
    the dependency-free analogue for corpora without a lang column."""
    toks = _tokens_col(text_col)
    base = docs.select(F.col(id_col).cast("long").alias("doc_id"), toks.alias("_t"))
    hit_cols = []
    for lang in sorted(LANG_STOPWORDS):
        stops = F.array(*[F.lit(s) for s in LANG_STOPWORDS[lang]])
        hit_cols.append(
            F.struct(
                F.size(F.filter("_t", lambda t: F.array_contains(stops, t)))
                .cast("long").alias("hits"),
                F.lit(lang).alias("lang"),
            )
        )
    # array_max on (hits, lang) structs: max hits, then max lang — to keep
    # ties deterministic-lexicographic-SMALLEST we negate via sort instead
    best = F.element_at(
        F.reverse(F.array_sort(F.array(*hit_cols))), 1
    )
    return base.select(
        "doc_id",
        best["lang"].alias("lang_pred"),
        best["hits"].alias("lang_hits"),
    )


def doc_fingerprint(
    docs: DataFrame, text_col: str, id_col: str, analyzer: str = "ascii"
) -> DataFrame:
    """→ (doc_id, fingerprint long): polynomial rolling hash over the token
    stream (order-sensitive, whitespace-insensitive) — the cheap
    content-identity for incremental re-crawls.  Vectorized numpy horner
    loop over token hashes."""
    from ..functions.tokenizer import get_analyzer

    from .dedup import _hash64

    tokenize = get_analyzer(analyzer)
    src = docs.select(F.col(id_col).cast("long").alias("doc_id"), F.col(text_col).alias("_t"))
    P = np.uint64(1099511628211)  # FNV prime

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].to_numpy(dtype=np.int64)
            tok_lists = [tokenize(t or "") for t in pdf["_t"].values]
            lens = np.array([len(t) for t in tok_lists], dtype=np.int64)
            flat = (
                _hash64([t for toks in tok_lists for t in toks])
                if lens.sum() else np.zeros(0, dtype=np.uint64)
            )
            offs = np.zeros(len(lens) + 1, dtype=np.int64)
            np.cumsum(lens, out=offs[1:])
            # Horner acc = acc*P ^ h[j], vectorized ACROSS DOCS: step j
            # updates every doc with > j tokens (loop length = max doc
            # tokens, each step one numpy pass — identical per-doc op
            # order to the scalar loop)
            accs = np.full(len(lens), np.uint64(14695981039346656037))
            with np.errstate(over="ignore"):
                for j in range(int(lens.max()) if len(lens) else 0):
                    m = lens > j
                    accs[m] = (accs[m] * P) ^ flat[offs[:-1][m] + np.int64(j)]
            accs[lens == 0] = np.uint64(0)
            yield pd.DataFrame(
                {"doc_id": pd.Series(ids, dtype="int64"),
                 "fingerprint": pd.Series(accs.astype(np.int64), dtype="int64")}
            )

    return src.mapInPandas(emit, "doc_id long, fingerprint long")


def heavy_hitters(
    docs,
    text_col: str = "text",
    k: int = 100,
    analyzer: str = "ascii",
):
    """EXACT frequent terms via a two-pass distributed heavy-hitters
    protocol → (term, n) for every term with global count > N/k.

    Pass 1 finds a PROVABLE candidate superset with bounded per-task
    output: each partition emits only its LOCAL heavy hitters (count_p >
    N_p/k, ≤ k−1 items per partition by definition).  Pigeonhole: if
    count(t) > N/k = Σ_p N_p/k then some partition has count_p(t) >
    N_p/k, so every global heavy hitter appears in some partition's
    emission — the union (≤ (k−1)·partitions tiny rows) is a superset.
    (A Misra–Gries summary gives the same guarantee under adversarial
    memory; per-partition exact counting is the simpler Spark-native
    form since a task's vocabulary fits its executor.)  Pass 2 computes
    exact global counts for the candidates only (`term IN` semi-join —
    never a full-vocabulary shuffle) and keeps those above N/k, making
    the final output EXACT, not approximate."""
    import pandas as pd
    from pyspark.sql import functions as F

    from ..functions.tokenizer import get_analyzer

    tokenize = get_analyzer(analyzer)
    src = docs.select(F.col(text_col).alias("_t"))

    def local_hh(pdfs):
        from collections import Counter

        c: Counter = Counter()
        total = 0
        for pdf in pdfs:
            for t in pdf["_t"]:
                toks = tokenize(t or "")
                total += len(toks)
                c.update(toks)
        thresh = total / k
        items = [(t_, int(n)) for t_, n in c.items() if n > thresh]
        yield pd.DataFrame(
            {"term": pd.Series([t_ for t_, _ in items], dtype="object"),
             "n_local": pd.Series([n for _, n in items], dtype="int64"),
             "n_part": pd.Series([total] * len(items), dtype="int64")}
        )

    partials = src.mapInPandas(
        local_hh, "term string, n_local long, n_part long"
    )
    cand_rows = partials.select("term").distinct().collect()
    candidates = sorted(r["term"] for r in cand_rows)
    if not candidates:
        return docs.sparkSession.createDataFrame([], "term string, n long")
    # pass 2: exact counts of the bounded candidate set + the global N
    def count_cand(pdfs):
        from collections import Counter

        cset = set(candidates)
        c: Counter = Counter()
        total = 0
        for pdf in pdfs:
            for t in pdf["_t"]:
                toks = tokenize(t or "")
                total += len(toks)
                for tok in toks:
                    if tok in cset:
                        c[tok] += 1
        yield pd.DataFrame(
            {"term": pd.Series(
                list(c.keys()) + ["\x00__total__"], dtype="object"),
             "n": pd.Series(
                 list(c.values()) + [total], dtype="int64")}
        )

    counts = (
        src.mapInPandas(count_cand, "term string, n long")
        .groupBy("term").agg(F.sum("n").cast("long").alias("n"))
    )
    total_n = counts.filter(F.col("term") == "\x00__total__").collect()
    N = int(total_n[0]["n"]) if total_n else 0
    return (
        counts.filter(F.col("term") != "\x00__total__")
        .filter(F.col("n") > F.lit(N / k))
        .select("term", "n")
    )


def quality_quantile_cut(
    docs,
    text_col: str = "text",
    id_col: str = "doc_id",
    q: float = 0.2,
):
    """Corpus quality filtering by EXACT quantile threshold →
    (doc_id, quality, keep): keep docs whose quality score is strictly
    above the corpus's q-quantile — the "drop the worst X%" cut every
    training-data pipeline applies before tokenization.

    The threshold definition is PINNED (ADVICE r4: don't rely on two
    engines' quantile conventions coinciding): it is the data value at
    0-based sorted rank ``ceil(q·n) − 1`` — the lower inverse-CDF
    discrete quantile, the rule DuckDB's ``quantile_disc`` implements
    (probed empirically).  Computed distributed and EXACTLY, without a
    global sort: a merge-based quantile summary
    (``percentile_approx(…, 2^31−1)``) proposes a candidate, then a
    bounded rank-verification loop (one narrow aggregation per step,
    stepping one distinct value when the candidate's rank interval
    misses the target) certifies the value that actually holds the
    pinned rank.  ``keep = quality > threshold`` is tie-deterministic:
    every doc AT the threshold value drops."""
    import math

    from pyspark.sql import functions as F

    scored = quality_score(docs, text_col, id_col).cache()
    n = scored.count()
    if n == 0:
        return scored.select(
            id_col, "quality", F.lit(False).alias("keep")
        )
    r = max(int(math.ceil(float(q) * n)) - 1, 0)  # pinned 0-based rank
    thr = scored.agg(
        F.expr(f"percentile_approx(quality, {float(q)}, 2147483647)")
    ).collect()[0][0]
    qc = F.col("quality")
    for _ in range(64):
        cnt_lt, cnt_le, max_below, min_above = scored.agg(
            F.sum((qc < F.lit(thr)).cast("long")),
            F.sum((qc <= F.lit(thr)).cast("long")),
            F.max(F.when(qc < F.lit(thr), qc)),
            F.min(F.when(qc > F.lit(thr), qc)),
        ).collect()[0]
        if (cnt_lt or 0) <= r < (cnt_le or 0):
            break  # thr occupies ranks [cnt_lt, cnt_le) ∋ r — certified
        thr = max_below if r < (cnt_lt or 0) else min_above
    else:
        raise RuntimeError(
            "quality_quantile_cut: rank verification did not converge"
        )
    return scored.select(
        id_col, "quality",
        (F.col("quality") > F.lit(float(thr))).alias("keep"),
    )


# --------------------------------------------------------------- PII scrub

# Redaction patterns restricted to constructs with IDENTICAL semantics in
# Java regex (Spark) and RE2 (DuckDB): character classes, bounded repeats,
# non-capturing groups, \b word boundaries — no lookarounds (RE2 has none),
# no backreferences.  Order matters: emails are redacted FIRST so an
# address whose domain is a dotted quad ("user@10.0.0.1") never leaves a
# half-redacted IP behind.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b", "<PHONE>"),
)


def redact_pii(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """→ (doc_id, clean_text, n_email, n_ipv4, n_phone): the corpus with
    emails / IPv4 addresses / phone-shaped numbers replaced by typed
    placeholder tokens, plus per-category match counts — the standard
    PII scrub a web-scale training pipeline runs before anything else
    (C4/Dolma-style rule-based redaction; ML-based NER scrubbing would
    sit behind the same column contract).

    Pure map-side JVM expressions (``regexp_count`` + chained
    ``regexp_replace``): zero shuffle, zero Python — the op is
    bandwidth-bound on corpus bytes, the best possible 100-TB shape.
    Counts are computed on the ORIGINAL text per category (before any
    replacement) so categories never shadow each other's counts, while
    replacements chain in the declared priority order."""
    txt = F.col(text_col)
    counts = [
        F.regexp_count(txt, F.lit(pat)).cast("long").alias(f"n_{name}")
        for name, pat, _tok in PII_PATTERNS
    ]
    clean = txt
    for _name, pat, tok in PII_PATTERNS:
        clean = F.regexp_replace(clean, pat, tok)
    return docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        clean.alias("clean_text"),
        *counts,
    )


# ------------------------------------------------- bigram LM quality score


def bigram_lm_score(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    alpha: float = 0.5,
    lm_docs: DataFrame | None = None,
) -> DataFrame:
    """→ (doc_id, n_bigrams, avg_nll, ppl): per-doc perplexity under an
    add-α-smoothed bigram language model trained on ``lm_docs`` (default:
    the corpus itself) — the CCNet-style LM quality signal: gibberish,
    mojibake and key-mash documents sit far above the corpus's natural
    perplexity band and are cut or bucketed by ``ppl``.

    Model: P(w|v) = (c(v,w) + α) / (c(v) + α·V) with c(v) = Σ_w c(v,w)
    (so the conditional sums to 1 over the vocab exactly), V = |vocab| + 1
    (one unseen-word slot; with the LM trained on the scored corpus every
    token is in-vocab, and a held-out LM backs off through the same α
    mass).  ``avg_nll`` = −(Σ ln P)/max(n_bigrams, 1); ``ppl`` =
    exp(avg_nll); both rounded 6dp (the gate contract for float columns).

    100-TB shape: bigram extraction is one map-side pass
    (``arrays_zip(slice, slice)`` — no UDF); the count table is one
    groupBy shuffle with map-side partial aggregation absorbing hot
    bigrams; scoring is one shuffle join of doc-bigram occurrences
    against the count table keyed by the bigram.  Nothing pair-joins and
    nothing collects: vocab size and α enter as scalar literals after
    two tiny aggregates."""
    toks = _tokens_col(text_col)
    src = (lm_docs if lm_docs is not None else docs).select(toks.alias("_t"))

    def _bigrams(df: DataFrame, *keep: str) -> DataFrame:
        pairs = F.arrays_zip(
            F.slice("_t", 1, F.greatest(F.size("_t") - 1, F.lit(0))).alias("v"),
            F.slice("_t", 2, F.greatest(F.size("_t") - 1, F.lit(0))).alias("w"),
        )
        return df.select(*keep, F.explode(pairs).alias("bg")).select(
            *keep, F.col("bg.v").alias("v"), F.col("bg.w").alias("w")
        )

    counts = _bigrams(src).groupBy("v", "w").agg(
        F.count("*").cast("long").alias("c_vw")
    )
    ctx = counts.groupBy("v").agg(F.sum("c_vw").alias("c_v"))
    vocab = int(
        src.select(F.explode("_t").alias("tok"))
        .agg(F.countDistinct("tok"))
        .collect()[0][0]
    ) + 1
    scored_src = docs.select(
        F.col(id_col).cast("long").alias("doc_id"), toks.alias("_t")
    )
    occ = _bigrams(scored_src, "doc_id")
    a = float(alpha)
    lp = F.log(
        (F.coalesce("c_vw", F.lit(0)) + F.lit(a))
        / (F.coalesce("c_v", F.lit(0)) + F.lit(a * vocab))
    )
    per_doc = (
        occ.join(counts, ["v", "w"], "left")
        .join(ctx, "v", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.sum(lp).alias("_sum_lp"),
        )
    )
    # explicit zero for bigram-less docs: -coalesce(NULL)/1 would produce
    # IEEE -0.0, which hash-compares unequal to the oracle's 0.0
    avg_nll = F.when(
        F.coalesce("n_bigrams", F.lit(0)) == 0, F.lit(0.0)
    ).otherwise(-F.col("_sum_lp") / F.col("n_bigrams").cast("double"))
    return (
        scored_src.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.round(avg_nll, 6).alias("avg_nll"),
            F.round(F.exp(avg_nll), 6).alias("ppl"),
        )
    )

# ---------------------------------------- Gopher within-doc repetition


# (n-gram size → max allowed fraction) — the Gopher repetition-removal
# thresholds (Rae et al. 2021, "Scaling Language Models: ... Gopher",
# table A1): docs above ANY threshold are cut.
GOPHER_TOP_NGRAM_MAX: dict[int, float] = {2: 0.20, 3: 0.18, 4: 0.16}
GOPHER_DUP_NGRAM_MAX: dict[int, float] = {5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12}


def _ngram_run_expr(n: int) -> str:
    """SQL for struct(top_cnt, top_chars, dup_chars) of the doc's
    ``n``-grams, computed WITHOUT exploding: grams are materialized per
    row, sorted, and counted as runs of equal neighbors — a pure
    projection (`_t` is the token array; grams join tokens on chr(1), so
    a gram's character length is length(gram) − (n−1) separators).
    Intermediate values are let-bound with the ``transform(array(X),
    x -> body)[1]`` idiom (Spark projections admit no correlated
    subqueries; lambda binders are the expression-level `let`).
    Tie rule for the top gram: max (count, chars, gram) lexicographic —
    the same rule the DuckDB oracle's struct max applies."""
    grams = (
        f"CASE WHEN size(_t) >= {n} THEN "
        f"array_sort(transform(sequence(1, size(_t) - {n} + 1), "
        f"i -> array_join(slice(_t, i, {n}), chr(1)))) "
        "ELSE array(CAST(NULL AS STRING)) END"
    )
    # boundary positions of equal-neighbor runs in the sorted gram array;
    # size(_t) < n leaves _g = [NULL] and the n_grams guard below returns
    # the zero struct (sequence(1, 0) would be DESCENDING in Spark — the
    # guard must fire before any sequence over an empty gram list)
    bounds = (
        "filter(sequence(1, size(_g)), "
        "i -> i = 1 OR element_at(_g, i) != element_at(_g, i - 1))"
    )
    run_structs = (
        "transform(_b, (b, j) -> named_struct("
        "'cnt', CAST((IF(j + 2 <= size(_b), element_at(_b, j + 2), "
        "size(_g) + 1) - b) AS BIGINT), "
        f"'chars', CAST(length(element_at(_g, b)) - {n - 1} AS BIGINT), "
        "'gram', element_at(_g, b)))"
    )
    fold = (
        "named_struct("
        "'top_cnt', array_max(_r).cnt, "
        "'top_chars', array_max(_r).chars, "
        "'dup_chars', aggregate(_r, 0L, "
        "(a, r) -> a + IF(r.cnt >= 2, r.cnt * r.chars, 0L)))"
    )
    zero = (
        "named_struct('top_cnt', 0L, 'top_chars', 0L, 'dup_chars', 0L)"
    )
    return (
        f"element_at(transform(array({grams}), _g -> "
        f"IF(element_at(_g, 1) IS NULL, {zero}, "
        f"element_at(transform(array({bounds}), _b -> "
        f"element_at(transform(array({run_structs}), _r -> {fold}), 1)"
        "), 1))), 1)"
    )


def gopher_repetition(
    docs: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """→ (doc_id, n_tokens, tot_chars, top2_frac..top4_frac,
    dup5_frac..dup8_frac, keep): the Gopher within-doc repetition
    signals (Rae et al. 2021) — for n in {2,3,4} the fraction of token
    characters inside the MOST FREQUENT n-gram (count × gram chars /
    total token chars), for n in {5..8} the fraction inside ANY n-gram
    occurring ≥ 2 times in the doc (occurrence-counted, as the paper
    does for dup n-grams); ``keep`` = every fraction within its Gopher
    threshold.  Catches the within-doc degeneracy (looped generations,
    keyboard mash, templated filler) that the CROSS-doc operators
    (`duplicated_ngram_stats`, MinHash) structurally cannot see.

    100-TB shape: ZERO shuffle — every signal is a per-row projection
    over the token array (gram build → sort → run-length fold via
    higher-order functions), so the op streams at parquet-scan
    bandwidth with no explode and no groupBy; 7 n-gram sizes cost 7
    array passes over each row, not 7 shuffles of the corpus.  Fraction
    comparisons use the 6dp-rounded values (the gate contract), so the
    keep bit is engine-stable."""
    toks = _tokens_col(text_col)
    base = docs.select(
        F.col(id_col).cast("long").alias("doc_id"), toks.alias("_t")
    ).withColumn("_tot", F.length(F.concat_ws("", F.col("_t"))).cast("long"))
    fracs: list[F.Column] = []
    keep = F.lit(True)
    for n, thr in sorted(GOPHER_TOP_NGRAM_MAX.items()):
        c = F.round(
            F.expr(_ngram_run_expr(n)).getField("top_cnt")
            * F.expr(_ngram_run_expr(n)).getField("top_chars")
            / F.greatest(F.col("_tot"), F.lit(1)).cast("double"),
            6,
        ).alias(f"top{n}_frac")
        fracs.append(c)
        keep = keep & (F.col(f"top{n}_frac") <= F.lit(thr))
    for n, thr in sorted(GOPHER_DUP_NGRAM_MAX.items()):
        c = F.round(
            F.expr(_ngram_run_expr(n)).getField("dup_chars")
            / F.greatest(F.col("_tot"), F.lit(1)).cast("double"),
            6,
        ).alias(f"dup{n}_frac")
        fracs.append(c)
        keep = keep & (F.col(f"dup{n}_frac") <= F.lit(thr))
    return base.select(
        "doc_id",
        F.size("_t").cast("long").alias("n_tokens"),
        F.col("_tot").alias("tot_chars"),
        *fracs,
    ).withColumn("keep", keep)
