"""Pallas TPU kernels and fast-path ops for the hot compute stages."""
from .rasterize_fast import rasterize_fast  # noqa: F401
