"""Collector-layer behaviors: paging, diversity re-rank.

The reference's BucketCollector caps a MinMaxHeap at ``top_n = page_size +
offset`` and pages by skipping ``offset`` after the final sort
(src/collector.rs:280-343, src/searcher/local.rs:113-115); result
diversity is a multiplicative penalty per already-taken site/title/url
hash — ``scale/(scale+count)`` with SITE=14, TITLE=6, URL=0.1 — applied in
a lazy pop-max fixpoint loop (src/collector.rs:33-36,247-343).

Both run on ≤ k+offset rows on the driver — deliberately NOT Spark ops
(the reference likewise does this on the collected pointers).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

# reference penalty scales (collector.rs:33-36); ours keyed on repo/path
DEFAULT_SCALES: tuple[float, ...] = (14.0, 6.0)


def page(rows: Sequence[tuple], k: int, offset: int = 0) -> list[tuple]:
    """Slice a (k+offset)-sized collected result into the requested page."""
    return list(rows[offset:offset + k])


def rerank_diverse(
    rows: Sequence[tuple[int, float]],
    key_fns: Sequence[Callable[[int], object]],
    scales: Sequence[float] = DEFAULT_SCALES,
    k: int | None = None,
) -> list[tuple[int, float]]:
    """Greedy diversity re-rank of (doc_id, score) rows.

    Each selection multiplies later scores by ``scale/(scale+count)`` per
    key already taken (count = times that key value was already selected).
    Greedy max-adjusted-score selection is equivalent to the reference's
    lazy-heap fixpoint (both always emit the currently-best adjusted row).
    Ties: higher raw score, then lower doc_id.
    """
    k = k if k is not None else len(rows)
    remaining = list(rows)
    taken_counts: list[dict[object, int]] = [dict() for _ in key_fns]
    out: list[tuple[int, float]] = []
    while remaining and len(out) < k:
        best_i = -1
        best = None
        for i, (doc, score) in enumerate(remaining):
            adj = score
            for kf, counts, scale in zip(key_fns, taken_counts, scales):
                c = counts.get(kf(doc), 0)
                if c:
                    adj *= scale / (scale + c)
            cand = (adj, score, -doc)
            if best is None or cand > best:
                best = cand
                best_i = i
        doc, score = remaining.pop(best_i)
        out.append((doc, best[0]))
        for kf, counts in zip(key_fns, taken_counts):
            v = kf(doc)
            counts[v] = counts.get(v, 0) + 1
    return out
