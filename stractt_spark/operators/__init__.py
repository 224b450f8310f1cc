"""DataFrame-level operators: postings build, segments, merge, search, dedup."""
