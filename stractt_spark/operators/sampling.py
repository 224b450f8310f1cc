"""Deterministic corpus sampling for training-data mixing.

A training run mixes sources at target weights (code 30%, web 50%, ...).
``sampleBy``/``rand()`` give Bernoulli draws — per-run nondeterminism and
only EXPECTED counts; a 100 TB pipeline wants the same property set the
deterministic split has (:func:`stractt_spark.operators.dedup.
deterministic_split`): reproducible across runs, engines and cluster
sizes, and EXACT per-stratum counts.

:func:`stratified_sample_exact` ranks docs inside each stratum by a
salted content-free hash (``md5(salt ‖ id)``) and keeps the first
``ceil(frac_s · n_s)``.  The hash order is a fixed random permutation of
every stratum, so the kept set is an exact-size uniform sample that is
STABLE under re-runs and prefix-stable in ``frac`` (raising a stratum's
weight only ADDS docs — the property that lets a mixing sweep reuse
shards).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def stratified_sample_exact(
    docs: DataFrame,
    strata_col: str,
    id_col: str,
    fractions: dict[str, float] | None = None,
    default_frac: float = 1.0,
    salt: str = "mix-v1",
) -> DataFrame:
    """→ (doc_id, stratum, rk, n_stratum, keep): exact deterministic
    stratified sampling — within each stratum, docs are ranked by
    ``md5(salt ‖ id)`` (ties broken by id; ranks are therefore unique
    and engine-independent) and ``keep = rk ≤ ceil(frac · n_stratum)``
    with ``frac`` looked up per stratum in ``fractions`` (falling back
    to ``default_frac``).  Filter on ``keep`` for the mixed corpus; the
    full assignment is returned so the cut is auditable.

    Scale shape: ONE shuffle keyed by the stratum (window rank +
    windowed count — no joins, no collects).  A pathologically hot
    stratum concentrates its sort in few partitions; the standard
    mitigation at 100 TB is a two-phase cut (approximate hash-threshold
    prefilter per stratum, then exact rank over the ~frac·n survivors),
    which composes from this same operator applied after a cheap
    hash-range filter — the semantics here stay the exact contract.
    """
    strat = F.col(strata_col).cast("string")
    h = F.md5(
        F.concat(F.lit(salt), F.col(id_col).cast("string"))
    )
    w = Window.partitionBy(strat).orderBy(h, F.col(id_col).cast("long"))
    wn = Window.partitionBy(strat)
    frac = F.lit(float(default_frac))
    for k, v in sorted((fractions or {}).items()):
        frac = F.when(strat == k, F.lit(float(v))).otherwise(frac)
    return docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        strat.alias("stratum"),
        F.row_number().over(w).cast("long").alias("rk"),
        F.count("*").over(wn).cast("long").alias("n_stratum"),
        (
            F.row_number().over(w)
            <= F.ceil(frac * F.count("*").over(wn))
        ).alias("keep"),
    )
