"""BM25 math, bit-identical to the reference formulas.

Reference (``/root/reference/src/ranking/bm25.rs``):

* ``K1 = 1.2``, ``B = 0.75``                      (:9-10)
* ``idf(n, N) = ln(1 + (N - n + 0.5) / (n + 0.5))``   (:12-16)
* ``weight = idf * (K1 + 1)``                      (:109-117)
* ``tf_part = tf / (tf + K1 * (1 - B + B * dl / avgdl))``  (:18-29,119-129)
  where ``dl`` is the byte-quantized fieldnorm decoded back
  (see :mod:`stractt_spark.functions.fieldnorm`) and
  ``avgdl = total_num_tokens / total_num_docs`` over *exact* lengths (:66-73).
* multi-term score = Σ per-term scores (BooleanQuery Should/Must sum).

These scalar/numpy forms are shared by the pure-Python oracle, the Arrow
WAND kernel, and the tests; the DataFrame path re-states the same formula
as a Spark SQL column expression (see ``operators/score.py``) so Catalyst
constant-folds ``weight`` exactly like the reference precomputes it.
"""

from __future__ import annotations

import math

import numpy as np

K1 = 1.2
B = 0.75


def idf(doc_freq: float, num_docs: float) -> float:
    return math.log(1.0 + (num_docs - doc_freq + 0.5) / (doc_freq + 0.5))


def weight(doc_freq: float, num_docs: float) -> float:
    return idf(doc_freq, num_docs) * (K1 + 1.0)


def tf_component(
    tf: np.ndarray | float, dl: np.ndarray | float, avgdl: float
) -> np.ndarray | float:
    """``tf / (tf + K1*(1 - B + B*dl/avgdl))``; dl must already be the
    quantized fieldnorm."""
    norm = K1 * (1.0 - B + B * (np.asarray(dl, dtype=np.float64) / avgdl))
    tf = np.asarray(tf, dtype=np.float64)
    out = tf / (tf + norm)
    return float(out) if out.ndim == 0 else out


def score_term(
    tf: np.ndarray | float,
    dl: np.ndarray | float,
    avgdl: float,
    doc_freq: float,
    num_docs: float,
) -> np.ndarray | float:
    return weight(doc_freq, num_docs) * tf_component(tf, dl, avgdl)


def max_impact(max_tf: float, min_dl: float, avgdl: float, w: float) -> float:
    """Upper bound of a term's contribution over a posting block, for
    block-max WAND: tf_part is increasing in tf and decreasing in dl, so
    ``w * tf_part(max_tf, min_dl)`` dominates every doc in the block.

    The reference relies on the analogous per-block max-tf skip data of its
    posting format ([tantivy contract], SURVEY.md §2.3)."""
    return w * float(tf_component(max_tf, min_dl, avgdl))
