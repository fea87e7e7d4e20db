"""Matmul-precision control for geometry math.

TPU matmuls default to bf16-input precision ('default'), which is the right
trade for the conv stack but corrupts pose math: composing 3×3 rotations
through bf16 matmuls leaves ~2.5e-3 orthonormality error per composition
(measured on-device), which compounds over the 8-iteration refinement loop
and shifts ADD errors. Geometry therefore runs under a float32 matmul
precision scope; the conv/matmul stack keeps the fast default (and uses
explicit bfloat16 params/activations where configured).
"""
from __future__ import annotations

import functools

import jax


def f32_matmuls(fn):
    """Decorator: trace ``fn`` with float32 matmul precision."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.default_matmul_precision("float32"):
            return fn(*args, **kwargs)

    return wrapper
