"""Vectorized scalar-function layer (pyarrow.compute / numpy kernels)."""
