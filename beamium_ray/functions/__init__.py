"""Vectorized scalar-function kernels (Arrow-buffer-level numpy)."""
