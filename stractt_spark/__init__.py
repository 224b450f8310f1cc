"""stractt_spark — a PySpark-native inverted-index build + BM25 query engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference engine (Stract/Cuely 2022 snapshot, Rust + tantivy): posting-list
construction, hierarchical segment merge, delta+varint compression with
per-block max-impact metadata, and BM25 top-k retrieval with block-max WAND
— all as DataFrame programs with vectorized Arrow/pandas UDFs in the hot
loops (no per-row Python).

Layout
------
functions/   scalar + vectorized kernels: tokenizer, fieldnorm codec,
             varint/delta codec, BM25 math
operators/   DataFrame-level operators: postings build, segment build,
             merge, WAND search, top-k, dedup
sources/     corpus generators / readers (synthetic code corpus, parquet)
plans/       end-to-end build + query pipelines, lineage, checkpointing
streaming/   (reserved) structured-streaming ingest surface

The reference has no SQL surface, no streaming and no optimizer — its query
plan is a fixed boolean tree over posting lists (SURVEY.md §4).  Everything
non-built-in here lives in vectorized UDFs + explicit DataFrame structure;
zero custom Catalyst rules are required.
"""

__version__ = "0.1.0"
