"""End-to-end pipelines: index build, query serving, lineage, checkpoints."""
