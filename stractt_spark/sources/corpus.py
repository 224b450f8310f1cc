"""Deterministic synthetic source-code corpus (FIXTURES.md §1).

Generates the exact input shape mandated by BASELINE.json ``input_hint``:
``(repo:string, path:string, commit:string, lang:string, content:string)``.

Determinism rules (FIXTURES.md): everything is a pure function of
``(seed, row index)`` — no wall clock, no RNG state shared across rows —
so ``sha256(content)`` per row and golden top-k results are stable across
runs, partition counts, and cluster sizes.  Repo sizes follow a Zipf-ish
distribution (repo 0 owns ~50% of files) to exercise skew handling/salting
(north rule).  Content is code-like: camelCase + snake_case identifiers,
keywords, punctuation runs (``foo.bar()``, ``c++``, ``a->b``), string
literals and comments, pinning the punctuation-as-token semantics of the
reference tokenizer (``/root/reference/src/tokenizer.rs:294-324``).
"""

from __future__ import annotations

import hashlib

LANGS = ["python", "rust", "java", "js", "go", "c"]
_EXT = {"python": "py", "rust": "rs", "java": "java", "js": "js", "go": "go", "c": "c"}

_KEYWORDS = {
    "python": ["def", "return", "import", "class", "for", "if", "yield", "with"],
    "rust": ["fn", "let", "mut", "impl", "match", "pub", "use", "struct"],
    "java": ["public", "static", "void", "class", "return", "final", "new", "import"],
    "js": ["function", "const", "let", "return", "export", "async", "await", "new"],
    "go": ["func", "return", "package", "import", "type", "struct", "range", "defer"],
    "c": ["int", "void", "return", "static", "struct", "sizeof", "char", "const"],
}

_STEMS = [
    "parse", "read", "write", "merge", "sort", "scan", "index", "query", "token",
    "buffer", "stream", "batch", "shard", "block", "cache", "hash", "score", "rank",
    "fetch", "split", "pack", "flush", "seek", "count", "filter", "join", "group",
    "map", "reduce", "emit", "load", "store", "sync", "spawn", "retry", "config",
]
_NOUNS = [
    "File", "Doc", "Term", "Posting", "Segment", "Table", "Row", "Column", "Page",
    "Node", "Tree", "List", "Heap", "Queue", "Graph", "Record", "Field", "Chunk",
]
# a handful of deliberately rare identifiers (single-digit doc freq — the
# "dtu"-like rare-term query class of FIXTURES.md §3)
_RARE = ["dtu", "quuxotic", "zylophant", "brontide", "kakapo", "smaragdine"]


def _h(*parts: object) -> int:
    raw = "|".join(str(p) for p in parts).encode()
    return int.from_bytes(hashlib.sha256(raw).digest()[:8], "big")


def _pick(seq, *key):
    return seq[_h(*key) % len(seq)]


def _repo_of(i: int, n_repos: int, seed: int) -> int:
    """Zipf-ish assignment: half the rows land in repo 0, then half the
    remainder in repo 1, etc. — deterministic per row index."""
    r = _h(seed, "repo", i) % (1 << 30) / float(1 << 30)
    repo, mass = 0, 0.5
    while repo < n_repos - 1:
        if r < mass:
            return repo
        r -= mass
        mass /= 2.0
        repo += 1
    return n_repos - 1


def make_row(i: int, seed: int = 42, n_repos: int = 20) -> dict[str, str]:
    repo_id = _repo_of(i, n_repos, seed)
    lang = _pick(LANGS, seed, "lang", i)
    repo = f"org{repo_id % 7}/repo{repo_id}"
    path = f"src/mod{_h(seed, 'm', i) % 13}/{_pick(_STEMS, seed, 'pf', i)}_{i}.{_EXT[lang]}"
    commit = hashlib.sha256(f"{seed}|{repo}|{path}".encode()).hexdigest()[:40]

    kws = _KEYWORDS[lang]
    lines: list[str] = []
    n_stmts = 4 + _h(seed, "len", i) % 28
    for s in range(n_stmts):
        k = _h(seed, "stmt", i, s)
        stem = _STEMS[k % len(_STEMS)]
        noun = _NOUNS[(k >> 8) % len(_NOUNS)]
        kw = kws[(k >> 16) % len(kws)]
        style = (k >> 24) % 6
        if style == 0:  # camelCase call: parseFileBuffer(docTable)
            lines.append(f"{kw} {stem}{noun}Buffer({stem}Table) {{")
        elif style == 1:  # snake_case assignment with arrow
            lines.append(f"{stem}_{noun.lower()}_ptr -> {stem}_count += 1;")
        elif style == 2:  # method chain: obj.method().field
            lines.append(f"result = {stem}.{_STEMS[(k >> 32) % len(_STEMS)]}().{noun.lower()};")
        elif style == 3:  # string literal + comment
            lines.append(f'log("{stem} {noun.lower()} done") // {kw} path')
        elif style == 4:  # operators: c++ style increment
            lines.append(f"for (i = 0; i < {noun.lower()}_len; i++) {stem}_acc += i;")
        else:  # generic call with ::
            lines.append(f"{noun}::{stem}({stem}_{noun.lower()}, {k % 97})")
        # sprinkle rare identifiers into ~0.5% of statements
        if _h(seed, "rare", i, s) % 200 == 0:
            lines.append(f"{_pick(_RARE, seed, 'rw', i, s)}_marker = true;")
    content = "\n".join(lines)
    return {"repo": repo, "path": path, "commit": commit, "lang": lang, "content": content}


def make_corpus(n: int, seed: int = 42, n_repos: int = 20) -> list[dict[str, str]]:
    return [make_row(i, seed, n_repos) for i in range(n)]


def corpus_spark_df(
    spark,
    n: int,
    seed: int = 42,
    n_repos: int = 20,
    partitions: int = 8,
    align: int | None = None,
):
    """Distributed generation: rows are a pure function of the index, so we
    parallelize the index range and map partitions — no driver-side
    materialization at scale.  ``doc_id`` = generation index: dense,
    deterministic, partition-count-independent (for external corpora
    without stable ids, use ``operators.postings.assign_doc_ids``).

    ``align``: make every partition boundary a multiple of this (e.g. the
    index's docs_per_segment) — the layout contract of the ZERO-SHUFFLE
    build path (``build_index_fused(aligned_input=True)``): each partition
    then contains only whole segments.  Mirrors an Iceberg table sorted
    and split on the id column."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    schema = StructType(
        [StructField("doc_id", LongType(), False)]
        + [StructField(c, StringType(), False)
           for c in ("repo", "path", "commit", "lang", "content")]
    )

    def gen(idx_iter):
        for i in idx_iter:
            r = make_row(i, seed, n_repos)
            yield (i, r["repo"], r["path"], r["commit"], r["lang"], r["content"])

    if align:
        per = max(align, (((n + partitions - 1) // partitions + align - 1)
                          // align) * align)
        bounds = list(range(0, n, per)) + [n]
        slices = [range(lo, hi) for lo, hi in zip(bounds, bounds[1:])]
        rdd = spark.sparkContext.parallelize(
            slices, len(slices)
        ).flatMap(lambda rng: gen(rng))
    else:
        rdd = spark.sparkContext.parallelize(range(n), partitions).mapPartitions(
            lambda it: gen(it)
        )
    return spark.createDataFrame(rdd, schema)
