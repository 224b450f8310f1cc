"""Signal aggregation: final score = Σ coefficient × signal.

Reference (src/ranking/signal.rs:36-131,266-294): the final rank score is
a fixed linear combination over 8 signals (bm25 1.0, host_centrality 2048,
page_centrality 4096, is_homepage 0.1, fetch_time 0.1, update_timestamp
80, num_trackers 20, region 60); the query-independent part is
precomputed at index time and stored (``pre_computed_score``,
signal.rs:296-333) — it also drives the index sort order used for early
termination.

Spark shape: one ``withColumn`` linear expression over doc-signal columns
(SURVEY.md §2.5) — Catalyst folds the constants; coefficients are
per-query overridable (the goggles ``@signal = coeff`` mechanism,
signal.rs:343-387)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# reference coefficients (signal.rs:36-131), minus the web-only signals
# that have no analogue in a code corpus
DEFAULT_COEFFS: dict[str, float] = {
    "bm25": 1.0,
    "centrality": 2048.0,
}


def precompute_score(
    docs: DataFrame, signal_coeffs: dict[str, float], id_col: str = "doc_id"
) -> DataFrame:
    """Query-independent score per doc: Σ coeff × signal column
    (signal.rs:296-333). → (doc_id, pre_score)."""
    expr = F.lit(0.0)
    for col, coeff in sorted(signal_coeffs.items()):
        expr = expr + F.lit(float(coeff)) * F.coalesce(
            F.col(col).cast("double"), F.lit(0.0)
        )
    return docs.select(
        F.col(id_col).cast("long").alias("doc_id"), expr.alias("pre_score")
    )


def aggregate_signals(
    bm25_topk: DataFrame,
    doc_signals: DataFrame,
    coeffs: dict[str, float] | None = None,
    bm25_coeff: float = 1.0,
) -> DataFrame:
    """(doc_id, score=bm25) ⋈ signal columns → re-ranked
    (doc_id, score = bm25_coeff·bm25 + Σ coeff·signal).

    ``doc_signals`` carries one row per candidate doc (broadcast when the
    signal table is a small dimension, as centrality KV stores are in the
    reference — SURVEY.md §2.7 'centrality lookup join')."""
    coeffs = coeffs or {}
    joined = bm25_topk.join(F.broadcast(doc_signals), "doc_id", "left")
    expr = F.lit(float(bm25_coeff)) * F.col("score")
    for col, coeff in sorted(coeffs.items()):
        expr = expr + F.lit(float(coeff)) * F.coalesce(
            F.col(col).cast("double"), F.lit(0.0)
        )
    return joined.select("doc_id", expr.alias("score")).orderBy(
        F.desc("score"), F.asc("doc_id")
    )


# ------------------------------------------------- full 8-signal vector

# the COMPLETE reference coefficient vector (signal.rs:122-131)
FULL_COEFFS: dict[str, float] = {
    "bm25": 1.0,
    "host_centrality": 2048.0,
    "page_centrality": 4096.0,
    "is_homepage": 0.1,
    "fetch_time_ms": 0.1,
    "update_timestamp": 80.0,
    "num_trackers": 20.0,
    "region": 60.0,
}

# fix-point scaling of centrality fastfields (schema.rs:23)
CENTRALITY_SCALING = 1e9

# cache sizes (signal.rs:220-221,247-251): fetch times ≥ 1000 ms and
# updates older than 3 years score 0
_FETCH_CACHE_LEN = 1000
_UPDATE_CACHE_HOURS = 3 * 365 * 24


def region_fractions(docs: DataFrame, region_col: str = "region") -> dict:
    """RegionCount.score (webpage/region.rs:203-211): per-region fraction
    of the corpus — a tiny driver-side dict (regions are an enum)."""
    total = docs.count()
    rows = docs.groupBy(region_col).count().collect()
    return {int(r[region_col]): r["count"] / total for r in rows}


def full_signal_values(
    docs: DataFrame,
    current_timestamp: int,
    selected_region: int | None = None,
    region_fracs: dict | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply the reference's per-signal VALUE transforms
    (signal.rs:62-120) to raw fastfield columns → one column per signal,
    ready for the coefficient dot product (:data:`FULL_COEFFS`):

    * ``host_centrality`` / ``page_centrality``: u64 fix-point / 1e9
    * ``is_homepage``: 0/1 as double
    * ``fetch_time_ms``: 1/(t+1) for t < 1000 ms, else 0
    * ``update_timestamp``: 1/log2(hours_since_update + 1) for updates
      within 3 years, else 0 (dt ≤ 0 → 0).  log2 is computed as
      ln(2)/ln(h+1) so Spark and any ln-based oracle share bit-exact
      arithmetic.  Reference quirk reproduced faithfully: an update
      < 1 hour old gives hours = 0 → 1/log2(1) = +inf in the reference
      too (f64 division by zero) — synthesize timestamps ≥ 1 h old.
    * ``num_trackers``: 1/(n+1)
    * ``region``: 50·[region == selected] + corpus fraction of the
      doc's region (RegionCount.score)

    All pure Catalyst expressions — no UDFs, whole-stage codegen."""
    import math

    c = F.col
    dt = (F.lit(int(current_timestamp)) - c("update_timestamp")).cast("long")
    hours = F.floor(F.greatest(dt, F.lit(1)) / F.lit(3600)).cast("long")
    upd = (
        F.when(dt <= 0, F.lit(0.0))
        .when(
            hours < F.lit(_UPDATE_CACHE_HOURS),
            F.lit(math.log(2.0)) / F.log(hours.cast("double") + F.lit(1.0)),
        )
        .otherwise(F.lit(0.0))
    )
    fetch = F.when(
        c("fetch_time_ms") < F.lit(_FETCH_CACHE_LEN),
        F.lit(1.0) / (c("fetch_time_ms").cast("double") + F.lit(1.0)),
    ).otherwise(F.lit(0.0))
    frac_items = []
    for rid, fr in sorted((region_fracs or {}).items()):
        frac_items += [F.lit(int(rid)), F.lit(float(fr))]
    frac_map = F.create_map(*frac_items) if frac_items else None
    region_val = (
        F.when(
            c("region") == F.lit(int(selected_region)), F.lit(50.0)
        ).otherwise(F.lit(0.0))
        if selected_region is not None
        else F.lit(0.0)
    )
    if frac_map is not None:
        region_val = region_val + F.coalesce(
            F.element_at(frac_map, c("region").cast("int")), F.lit(0.0)
        )
    return docs.select(
        F.col(id_col).cast("long").alias(id_col),
        (c("host_centrality").cast("double") / F.lit(CENTRALITY_SCALING)
         ).alias("host_centrality"),
        (c("page_centrality").cast("double") / F.lit(CENTRALITY_SCALING)
         ).alias("page_centrality"),
        c("is_homepage").cast("double").alias("is_homepage"),
        fetch.alias("fetch_time_ms"),
        upd.alias("update_timestamp"),
        (F.lit(1.0) / (c("num_trackers").cast("double") + F.lit(1.0))
         ).alias("num_trackers"),
        region_val.alias("region"),
    )
