"""Scalar/vectorized kernels (pure numpy/pandas — no Spark imports)."""
