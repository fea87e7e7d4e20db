"""Fused instance-norm Pallas kernel.

The RAFT encoders use InstanceNorm after nearly every conv
(reference models/encoder/raft_encoder.py; our ConvBlock norm='in').
XLA lowers each as separate stat-reduce + normalize passes — ~4 HBM
round-trips of the full activation per norm layer, which made the
encoders bandwidth-bound (~10 ms/step of the batch-32 profile was IN).

This kernel processes one sample per program: the (H·W, C) activation is
DMA'd to VMEM once, mean/var computed in f32 on-chip (matching flax
GroupNorm's f32 stat computation), normalized with the learned
scale/bias, and written once — 1 read + 1 write of HBM total.

Backward runs in plain XLA via ``jax.custom_vjp`` (training steps are
compile-bound elsewhere; eval/refinement is where IN dominated).
"""
from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# rows per in-kernel chunk: bounds Mosaic's f32 stack temporaries
_CHUNK_ROWS = 4096

# DEFAULT OFF since round 4: with bf16 compute dtypes XLA now fuses the IN
# stat/normalize passes into the surrounding convs, while the custom-call
# forces layout copies at its boundary — measured 518 fps (kernel) vs
# 642 fps (XLA) on the batch-32 eval step, encoders 29.8→18.4 ms.
# SCFLOW_FUSED_IN=1 re-enables the kernel (kept as the f32/legacy path and
# for kernel-level regression tests).
_ENABLED = os.environ.get("SCFLOW_FUSED_IN", "0") == "1"


def _in_kernel(chunks: int, rows: int, eps: float):
    def kernel(x_ref, g_ref, b_ref, o_ref):
        c = x_ref.shape[-1]
        s = jnp.zeros((1, c), jnp.float32)
        ss = jnp.zeros((1, c), jnp.float32)
        for j in range(chunks):
            xb = x_ref[0, j].astype(jnp.float32)          # (rows, C)
            s += jnp.sum(xb, axis=0, keepdims=True)
            ss += jnp.sum(xb * xb, axis=0, keepdims=True)
        n = float(chunks * rows)
        mu = s / n
        var = jnp.maximum(ss / n - mu * mu, 0.0)
        inv = jax.lax.rsqrt(var + eps) * g_ref[0].astype(jnp.float32)
        shift = b_ref[0].astype(jnp.float32) - mu * inv
        for j in range(chunks):
            y = x_ref[0, j].astype(jnp.float32) * inv + shift
            o_ref[0, j] = y.astype(o_ref.dtype)

    return kernel


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def instance_norm(x: jax.Array, scale: jax.Array, bias: jax.Array,
                  eps: float = 1e-5) -> jax.Array:
    """Per-(sample, channel) normalization over H·W, NHWC.

    Equivalent to ``flax.linen.GroupNorm(num_groups=C)`` (biased variance,
    f32 statistics, eps inside the sqrt), returned in ``x.dtype``.
    """
    return _instance_norm_fwd_impl(x, scale, bias, eps)


def _reference_in(x, scale, bias, eps):
    xf = x.astype(jnp.float32)
    mu = xf.mean(axis=(1, 2), keepdims=True)
    var = xf.var(axis=(1, 2), keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def _vmem_budget_bytes() -> int:
    """Physical VMEM of the attached TPU generation (conservative).

    v5e/v5p/v6e cores carry 128 MiB of VMEM; v4 only ~32 MiB (its 128 MiB
    is CMEM, not VMEM) and v2/v3 ~16 MiB — on those the raised scoped-vmem
    cap below would lie to the compiler, so the kernel is disabled entirely
    (XLA fallback).
    """
    global _VMEM_BYTES
    if _VMEM_BYTES is None:
        try:
            kind = jax.devices()[0].device_kind.lower()
        except Exception:  # pragma: no cover - no backend
            kind = ""
        if any(g in kind for g in ("v5", "v6", "v7", "7x")):
            _VMEM_BYTES = 128 * 2 ** 20
        elif "v4" in kind:
            _VMEM_BYTES = 32 * 2 ** 20
        else:
            _VMEM_BYTES = 16 * 2 ** 20
    return _VMEM_BYTES


_VMEM_BYTES = None


def _instance_norm_fwd_impl(x, scale, bias, eps):
    n, h, w, c = x.shape
    hw = h * w
    if (not _ENABLED or jax.default_backend() != "tpu" or hw % 8 != 0
            or hw * c * (x.dtype.itemsize + 6) > 12 * 2 ** 20
            or _vmem_budget_bytes() < 128 * 2 ** 20):
        return _reference_in(x, scale, bias, eps)
    chunks = 1
    rows = hw
    while rows > _CHUNK_ROWS and rows % 2 == 0:
        chunks *= 2
        rows //= 2
    xr = x.reshape(n, chunks, rows, c)
    out = pl.pallas_call(
        _in_kernel(chunks, rows, eps),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, chunks, rows, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, chunks, rows, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, chunks, rows, c), x.dtype),
        # the default 16 MiB scoped-vmem budget rejects the stem shape
        # (128·128·64 f32 ≈ 4 MiB block, double-buffered in+out ≈ 16 MiB);
        # the generation gate above guarantees 128 MiB physical VMEM, so
        # raise the cap instead of shrinking the block — the 12 MiB size
        # guard bounds the actual footprint.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
    )(xr, scale.reshape(1, c), bias.reshape(1, c))
    return out.reshape(n, h, w, c)


def _fwd(x, scale, bias, eps):
    return _instance_norm_fwd_impl(x, scale, bias, eps), (x, scale)


def _bwd(eps, res, g):
    x, scale = res
    xf = x.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    mu = xf.mean(axis=(1, 2), keepdims=True)
    var = xf.var(axis=(1, 2), keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xhat = (xf - mu) * inv
    dscale = jnp.sum(gf * xhat, axis=(0, 1, 2))
    dbias = jnp.sum(gf, axis=(0, 1, 2))
    gs = gf * scale.astype(jnp.float32)
    m1 = gs.mean(axis=(1, 2), keepdims=True)
    m2 = (gs * xhat).mean(axis=(1, 2), keepdims=True)
    dx = inv * (gs - m1 - xhat * m2)
    return (dx.astype(x.dtype), dscale.astype(scale.dtype),
            dbias.astype(scale.dtype))


instance_norm.defvjp(_fwd, _bwd)
