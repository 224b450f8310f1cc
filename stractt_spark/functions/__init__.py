"""Vectorized kernels: tokenizer, fieldnorm codec, varint codec, BM25 math."""
