"""Plain-Python scalar oracles for the hash-family operators.

The Spark operators (operators/dedup.py simhash64, operators/textstats.py
doc_fingerprint) are vectorized numpy kernels; these are independent
scalar re-derivations from the same DOCUMENTED definitions (64-bit
blake2b token hashes, bit-vote SimHash, FNV-primed Horner fingerprint) —
pure ints, no numpy, no shared kernel code.  pytest compares the two
implementations element-wise (tests/test_pyoracle.py); the driver gates
replay these oracles over the raw parquet (read via pyarrow, never
Spark) into expected-result tables DuckDB then compares against.
"""

from __future__ import annotations

import hashlib
from collections import Counter

_U64 = (1 << 64) - 1
_FNV_PRIME = 1099511628211
_FNV_BASIS = 14695981039346656037


def hash64_py(s: str, seed: int = 0) -> int:
    """64-bit token hash: blake2b(s, digest_size=8, salt=seed) little —
    the same published definition as operators/dedup._hash64."""
    return int.from_bytes(
        hashlib.blake2b(
            s.encode(), digest_size=8, salt=seed.to_bytes(8, "little")
        ).digest(),
        "little",
    )


def _signed64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def simhash64_py(text: str, analyzer: str = "ascii") -> int | None:
    """SimHash64 of one document (None for token-less docs, which the
    Spark operator omits): per unique token, tf-weighted ±1 votes on each
    bit of its 64-bit hash; the result sets bits with positive votes."""
    from .functions.tokenizer import get_analyzer

    toks = get_analyzer(analyzer)(text or "")
    if not toks:
        return None
    votes = [0] * 64
    for t, c in Counter(toks).items():
        h = hash64_py(t)
        for b in range(64):
            votes[b] += c if (h >> b) & 1 else -c
    val = 0
    for b in range(64):
        if votes[b] > 0:
            val |= 1 << b
    return _signed64(val)


def fingerprint_py(text: str, analyzer: str = "ascii") -> int:
    """Order-sensitive polynomial rolling hash over the token stream:
    acc = FNV_BASIS, then acc = (acc · FNV_PRIME mod 2^64) xor hash(tok);
    0 for token-less docs."""
    from .functions.tokenizer import get_analyzer

    toks = get_analyzer(analyzer)(text or "")
    if not toks:
        return 0
    acc = _FNV_BASIS
    for t in toks:
        acc = ((acc * _FNV_PRIME) & _U64) ^ hash64_py(t)
    return _signed64(acc)


# ------------------------------------------------------------ BPE twin


def _apply_merge_py(syms: list[str], left: str, right: str) -> list[str]:
    """Left-to-right greedy single-merge application (the documented
    fold contract of operators/bpe.py)."""
    out: list[str] = []
    for x in syms:
        if out and out[-1] == left and x == right:
            out[-1] = left + right
        else:
            out.append(x)
    return out


def bpe_train_py(
    word_counts: dict[str, int], n_merges: int
) -> list[tuple[int, str, str, str]]:
    """Independent scalar BPE trainer (Sennrich et al. 2016): per round,
    the max-(count, left, right) adjacent pair is merged everywhere;
    stops when the best pair count < 2.  Same DOCUMENTED rule as
    operators/bpe.learn_bpe, dict/Counter re-derivation — no shared
    code."""
    seqs = {w: list(w) for w in word_counts if w}
    merges: list[tuple[int, str, str, str]] = []
    for rank in range(int(n_merges)):
        pc: Counter = Counter()
        for w, c in word_counts.items():
            s = seqs.get(w)
            if not s:
                continue
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += c
        if not pc:
            break
        (left, right), total = max(
            pc.items(), key=lambda kv: (kv[1], kv[0])
        )
        if total < 2:
            break
        merges.append((rank, left, right, left + right))
        for w in seqs:
            seqs[w] = _apply_merge_py(seqs[w], left, right)
    return merges


def bpe_count_py(word: str, merges: list[tuple[str, str]]) -> int:
    """Token count of one word under learned merges, applied
    EXHAUSTIVELY IN RANK ORDER — provably equivalent to the engine's
    lowest-rank-first greedy scan (a rank-k pair can never be created
    by a rank->k merge, since rank-k's parts predate every later
    symbol), but a genuinely different algorithm."""
    syms = list(word)
    for left, right in merges:
        if len(syms) < 2:
            break
        syms = _apply_merge_py(syms, left, right)
    return len(syms)
