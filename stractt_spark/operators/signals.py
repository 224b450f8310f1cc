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
