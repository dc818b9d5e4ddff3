"""Scalar / vectorized function families: text analysis, token-array ops
(Arrow pandas UDFs), similarity & dedup signatures."""
