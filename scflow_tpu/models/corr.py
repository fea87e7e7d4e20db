"""All-pairs correlation pyramid + lookup (XLA reference implementation).

RAFT-style 4D correlation (reference models/decoder/raft_decoder.py:19-58
``CorrelationPyramid`` and models/utils/corr_lookup.py:71-136 ``CorrLookup``),
laid out TPU-natively: the volume is (N, H, W, H_l, W_l) with the *target*
dims pooled per level, built by one MXU matmul. A fused Pallas kernel that
never materializes the volume lives in ``scflow_tpu.ops`` (the XLA version
here is the correctness twin).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def correlation_pyramid(feat_render: jax.Array, feat_real: jax.Array,
                        num_levels: int = 4) -> list[jax.Array]:
    """Build the all-pairs correlation pyramid.

    Args:
      feat_render: (N, H, W, C) source-image features (the query image).
      feat_real: (N, H, W, C) target-image features.

    Returns list of ``num_levels`` arrays, level l: (N, H, W, H/2^l, W/2^l);
    values = <f1[h,w], f2[i,j]> / sqrt(C) avg-pooled over (i, j).
    """
    n, h, w, c = feat_render.shape
    corr = jnp.einsum("nhwc,nijc->nhwij", feat_render, feat_real,
                      preferred_element_type=jnp.float32)
    corr = corr / jnp.sqrt(jnp.asarray(c, corr.dtype))
    pyramid = [corr]
    for _ in range(num_levels - 1):
        prev = pyramid[-1]
        hi, wi = prev.shape[-2] // 2, prev.shape[-1] // 2
        pooled = prev.reshape(n, h, w, hi, 2, wi, 2).mean(axis=(4, 6))
        pyramid.append(pooled)
    return pyramid


def _bilinear_gather(vol: jax.Array, coords: jax.Array) -> jax.Array:
    """Sample vol (..., Hl, Wl) at coords (..., K, 2) xy, zero padding,
    align_corners=True pixel-center convention (matches torch grid_sample
    as used by the reference CorrLookup)."""
    hl, wl = vol.shape[-2], vol.shape[-1]
    x, y = coords[..., 0], coords[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    flat = vol.reshape(vol.shape[:-2] + (hl * wl,))

    def at(yi, xi):
        inb = (yi >= 0) & (yi <= hl - 1) & (xi >= 0) & (xi <= wl - 1)
        idx = jnp.clip(yi, 0, hl - 1) * wl + jnp.clip(xi, 0, wl - 1)
        val = jnp.take_along_axis(flat, idx, axis=-1)
        return jnp.where(inb, val, 0.0)

    v00 = at(y0i, x0i)
    v01 = at(y0i, x0i + 1)
    v10 = at(y0i + 1, x0i)
    v11 = at(y0i + 1, x0i + 1)
    return ((1 - wy) * ((1 - wx) * v00 + wx * v01)
            + wy * ((1 - wx) * v10 + wx * v11))


@partial(jax.jit, static_argnames=("radius",))
def corr_lookup(pyramid: list[jax.Array], flow: jax.Array,
                radius: int = 4) -> jax.Array:
    """Sample a (2r+1)² neighborhood from every pyramid level at flow targets.

    Args:
      pyramid: list of (N, H, W, Hl, Wl) correlation levels.
      flow: (N, H, W, 2) current flow at feature resolution.

    Returns (N, H, W, L*(2r+1)²) lookup features.
    """
    n, h, w, _ = flow.shape
    r = radius
    k = 2 * r + 1
    xs = jnp.arange(w, dtype=flow.dtype)
    ys = jnp.arange(h, dtype=flow.dtype)
    gx, gy = jnp.meshgrid(xs, ys)
    centroid = jnp.stack([gx, gy], axis=-1)[None] + flow  # (N, H, W, 2)

    dx = jnp.linspace(-r, r, k, dtype=flow.dtype)
    delta = jnp.stack(jnp.meshgrid(dx, dx, indexing="ij"), axis=-1)  # (k,k,2) yx
    # reference builds delta via meshgrid(dy, dx) stacked (dy, dx) last —
    # offsets are added to (x, y) coords as (x+dx, y+dy); a symmetric grid
    # makes the order immaterial, but keep xy explicit here:
    delta_xy = jnp.stack([delta[..., 1], delta[..., 0]], axis=-1).reshape(-1, 2)

    out = []
    for lvl, corr in enumerate(pyramid):
        coords = centroid[..., None, :] / (2.0 ** lvl) + delta_xy  # (N,H,W,K²,2)
        out.append(_bilinear_gather(corr, coords))
    return jnp.concatenate(out, axis=-1)
