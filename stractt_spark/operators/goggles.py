"""Goggle program application: pattern/site instructions reranking a
base query — Boost/Downrank as Should const-boosts (±n·SCALE), Discard as
MustNot, bare ``$discard`` restricting results to docs matched by some
other instruction, and ``@signal`` alterations as coefficient overrides.

Reference lowering: /root/reference/src/ranking/goggles/mod.rs:150-312.

Spark shape (all distributed, no driver-side doc sets):

* each instruction's match set is a DataFrame — the conjunction of its
  ``site=`` predicate (an equality on the attr column, the analogue of
  the reference's Site/Domain no-tokenizer term queries) and its token
  pattern (:func:`pattern_match_docs`, an Arrow scan evaluating the
  pattern automaton per doc);
* the base query scores WITHOUT a top-k cut (every matching doc keeps
  its exact BM25 score), instruction sets join in: left joins add the
  const bonuses, anti joins apply discards, a semi join against the
  union of non-discard sets applies the bare-``$discard`` restriction;
* the final ``orderBy(score desc, doc_id).limit(k)`` is the same
  TakeOrderedAndProject bounded merge as every other query path.

Instruction match-set joins are left to AQE (a popular ``site=`` rule can
match an unbounded corpus share — forcing a broadcast there is the
over-broadcast a large cluster dies on); the pattern scan reads only
(id, text).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.goggles import (
    SCALE,
    Goggle,
    Instruction,
    compile_pattern,
    parse_goggle,
    pattern_phrase_count,
)


def pattern_match_docs(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    patterns: list[str],
    analyzer: str = "ascii",
) -> DataFrame:
    """→ (doc_id, phrase_count) for docs matching the token pattern
    (phrase_count > 0), evaluated per doc over the tokenized text — the
    PatternQuery scorer (pattern_query.rs:271-342) as an Arrow scan.

    Scale note: the reference evaluates patterns inside tantivy's
    per-segment collection; here the automaton runs in a column-pruned
    (id, text) scan.  For selective patterns, narrow ``docs`` first with
    an index semi-join on the pattern's rarest term."""
    from ..functions.tokenizer import get_analyzer

    terms, ops = compile_pattern(patterns, analyzer)
    tokenize = get_analyzer(analyzer)
    term_set = set(terms)
    src = docs.select(
        F.col(id_col).cast("long").alias("doc_id"), F.col(text_col).alias("_t")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids_out, counts = [], []
            for doc_id, text in zip(pdf["doc_id"].values, pdf["_t"].values):
                toks = tokenize(text or "")
                pos: dict[str, list[int]] = {}
                for i, t in enumerate(toks):
                    if t in term_set:
                        pos.setdefault(t, []).append(i)
                c = pattern_phrase_count(
                    {t: np.asarray(p) for t, p in pos.items()}, ops, len(toks)
                )
                if c > 0:
                    ids_out.append(doc_id)
                    counts.append(c)
            yield pd.DataFrame(
                {"doc_id": pd.Series(ids_out, dtype="int64"),
                 "phrase_count": pd.Series(counts, dtype="int64")}
            )

    return src.mapInPandas(run, "doc_id long, phrase_count long")


def instruction_match_set(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    inst: Instruction,
    site_col: str | None = None,
    analyzer: str = "ascii",
    field_cols: dict[str, str] | None = None,
) -> DataFrame | None:
    """One instruction's matching doc set (doc_id) — site predicate AND
    pattern, both Must within the instruction (mod.rs:274-287).  None for
    a bare action with nothing to match (e.g. the empty ``$discard``).

    ``field_cols``: maps goggle field selectors (``inurl``→"url",
    ``intitle``→"title", ``incontent``→"content", …) to document columns;
    an instruction with a field selector pattern-matches THAT column
    (mod.rs:231-262).  Unmapped selectors fall back to ``text_col``."""
    scoped = docs
    if inst.site is not None:
        if site_col is None:
            raise ValueError("goggle uses site= but no site_col given")
        scoped = scoped.filter(F.col(site_col) == inst.site)
    if inst.patterns:
        col = text_col
        if inst.field_sel and field_cols and inst.field_sel in field_cols:
            col = field_cols[inst.field_sel]
        return pattern_match_docs(
            scoped, col, id_col, inst.patterns, analyzer
        ).select(F.col("doc_id"))
    if inst.site is not None:
        return scoped.select(F.col(id_col).cast("long").alias("doc_id"))
    return None


def lower_goggle(
    goggle: Goggle | str,
    analyzer: str = "ascii",
    site_col: str | None = None,
    field_map: dict[str, str] | None = None,
    default_field: str | None = None,
) -> tuple[list[dict], list[str], float | None, bool]:
    """Lower a goggle program into the index query tree (the reference's
    as_searchable lowering, goggles/mod.rs:166-260):

    * site-only Discard → a MustNot attr term (``\\x01site_col:value``) —
      excluded by the kernel BEFORE scoring, like any ``-site:`` filter;
    * every other instruction → a const clause dict the per-segment kernel
      evaluates over the PERSISTED index (site attr-term lookups +
      pattern-automaton runs over stored positions — never the doc text);
    * ``@bm25 = c`` → a score coefficient on the relevance signal.

    ``default_field`` switches the lowering to MULTI-FIELD mode (the
    reference's own shape — patterns compile against a specific field's
    postings, mod.rs:231-262): pattern terms become field-namespaced
    physical terms for ``default_field``, and an instruction with a field
    selector (``inurl``/``intitle``/…) targets ``field_map[selector]``
    instead.  Each pattern clause then carries ``pattern_field`` so the
    kernel reads THAT field's positions and exact doc lengths.  In
    single-field mode (default_field None) a field selector raises, as
    before.

    → (const_clauses, neg_site_terms, bm25_coeff, has_empty_discard)."""
    from ..operators.segments import attr_term

    g = parse_goggle(goggle) if isinstance(goggle, str) else goggle
    clauses: list[dict] = []
    neg_terms: list[str] = []
    for inst in g.instructions:
        if inst.is_empty_discard:
            continue
        if inst.site is not None and site_col is None:
            raise ValueError("goggle uses site= but no site_col given")
        pattern_field: str | None = None
        if inst.field_sel is not None:
            if default_field is None:
                raise ValueError(
                    "field-selector patterns need the multi-field index "
                    "path; use apply_goggle(field_cols=...) for the scan "
                    "fallback"
                )
            pattern_field = (field_map or {}).get(inst.field_sel)
            if pattern_field is None:
                raise ValueError(
                    f"goggle field selector {inst.field_sel!r} has no "
                    f"index field mapping (field_map={sorted(field_map or {})})"
                )
        elif default_field is not None:
            pattern_field = default_field
        site_term = (
            attr_term(site_col, inst.site) if inst.site is not None else None
        )
        if inst.action == "discard" and not inst.patterns:
            if site_term is not None:
                neg_terms.append(site_term)
            continue
        if not inst.patterns and site_term is None:
            continue
        terms, ops = (
            compile_pattern(inst.patterns, analyzer)
            if inst.patterns else ([], [])
        )
        if terms and default_field is not None:
            # namespace BOTH the term list and the ops' term references —
            # pattern_phrase_count looks positions up by op[1]
            from .multifield import mf_term

            terms = [mf_term(pattern_field, t) for t in terms]
            ops = [
                ("term", mf_term(pattern_field, op[1]))
                if op[0] == "term" else op
                for op in ops
            ]
        clauses.append({
            "action": inst.action,
            "bonus": (
                0.0 if inst.action == "discard"
                else float(inst.value)
                * (SCALE if inst.action == "boost" else -SCALE)
            ),
            "site_term": site_term,
            "pattern_terms": terms or None,
            "pattern_ops": ops or None,
            "pattern_field": pattern_field if terms else None,
        })
    return clauses, neg_terms, g.alterations.get("bm25"), g.has_empty_discard


def apply_goggle(
    base_scores: DataFrame,
    docs: DataFrame,
    text_col: str,
    id_col: str,
    goggle: Goggle | str,
    k: int = 10,
    site_col: str | None = None,
    analyzer: str = "ascii",
    field_cols: dict[str, str] | None = None,
    broadcast_hint: bool = False,
) -> DataFrame:
    """Rerank ``base_scores`` (doc_id, score — UNCUT) by a goggle program:

        score' = score + Σ_boost n·SCALE − Σ_downrank n·SCALE
        discard instructions remove their docs entirely
        a bare ``$discard`` keeps only docs matching ≥1 other instruction

    NOTE: the ENGINE path for goggles is ``SegmentIndex.search_goggle``
    (instructions lowered into the per-segment kernel — no corpus scan at
    all); this DataFrame-level fallback exists for ad-hoc reranks over
    arbitrary score frames.  Match-set joins are left to AQE by default —
    a popular ``site=`` rule can match an unbounded share of the corpus,
    and an unconditional broadcast of that set is exactly the
    over-broadcast a 1000-executor cluster dies on.  Pass
    ``broadcast_hint=True`` only when every instruction is known
    selective."""
    g = parse_goggle(goggle) if isinstance(goggle, str) else goggle
    out = base_scores
    # @bm25 = c alteration scales the base relevance signal before the
    # const bonuses land (the SignalAggregator coefficient override,
    # signal.rs:343-387; other signals join in via
    # operators.signals.aggregate_signals with g.alterations as coeffs)
    bm25_coeff = g.alterations.get("bm25")
    if bm25_coeff is not None:
        out = out.withColumn(
            "score", F.col("score") * F.lit(float(bm25_coeff))
        )
    keep_union: DataFrame | None = None
    for inst in g.instructions:
        if inst.is_empty_discard:
            continue
        mset = instruction_match_set(
            docs, text_col, id_col, inst, site_col, analyzer, field_cols
        )
        if mset is None:
            continue
        if broadcast_hint:
            mset = F.broadcast(mset)
        if inst.action == "discard":
            out = out.join(mset, "doc_id", "left_anti")
            continue
        bonus = float(inst.value) * (SCALE if inst.action == "boost" else -SCALE)
        out = out.join(
            mset.withColumn("_b", F.lit(bonus)), "doc_id", "left"
        ).withColumn(
            "score", F.col("score") + F.coalesce(F.col("_b"), F.lit(0.0))
        ).drop("_b")
        if g.has_empty_discard:
            keep_union = (
                mset if keep_union is None else keep_union.unionByName(mset)
            )
    if g.has_empty_discard:
        if keep_union is None:
            return out.limit(0)
        ku = keep_union.distinct()
        if broadcast_hint:
            ku = F.broadcast(ku)
        out = out.join(ku, "doc_id", "left_semi")
    return out.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
