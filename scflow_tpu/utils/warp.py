"""Flow-based image warping (pure JAX, batched, gather-free backward warp).

Covers the reference's ``Warp`` module (models/utils/warp.py:32-105) and
``simple_forward_warp`` splatting (models/utils/utils.py:81-97) used for
visualization/debugging.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geometry.projection import bilinear_sample, pixel_grid


def backward_warp(image: jax.Array, flow: jax.Array,
                  return_mask: bool = False):
    """Warp target ``image`` back to the source frame with source→target flow.

    image: (..., H, W, C); flow: (..., H, W, 2).
    out[p] = image[p + flow[p]] (bilinear, zeros outside).
    """
    h, w = image.shape[-3], image.shape[-2]
    coords = pixel_grid(h, w, flow.dtype) + flow            # (..., H, W, 2)
    flat = coords.reshape(coords.shape[:-3] + (h * w, 2))

    if image.ndim == 3:
        out = bilinear_sample(image, flat).reshape(image.shape)
        valid = ((flat[..., 0] >= 0) & (flat[..., 0] <= w - 1)
                 & (flat[..., 1] >= 0) & (flat[..., 1] <= h - 1))
    else:
        out = jax.vmap(bilinear_sample)(image.reshape((-1, h, w, image.shape[-1])),
                                        flat.reshape((-1, h * w, 2)))
        out = out.reshape(image.shape)
        valid = ((flat[..., 0] >= 0) & (flat[..., 0] <= w - 1)
                 & (flat[..., 1] >= 0) & (flat[..., 1] <= h - 1))
    if return_mask:
        return out, valid.reshape(image.shape[:-1])
    return out


def forward_warp_splat(image: jax.Array, flow: jax.Array,
                       mask: jax.Array | None = None) -> jax.Array:
    """Nearest-pixel forward splatting (reference simple_forward_warp).

    image: (N, H, W, C); flow: (N, H, W, 2); mask: (N, H, W) source validity.
    Later pixels overwrite earlier ones on collision (like the reference's
    scatter).
    """
    n, h, w, c = image.shape
    coords = pixel_grid(h, w, flow.dtype) + flow
    tx = jnp.round(coords[..., 0]).astype(jnp.int32)
    ty = jnp.round(coords[..., 1]).astype(jnp.int32)
    inb = (tx >= 0) & (tx < w) & (ty >= 0) & (ty < h)
    if mask is not None:
        inb = inb & (mask > 0.5)
    idx = jnp.where(inb, ty * w + tx, h * w)  # out-of-range → dropped slot

    def splat(img, indices, valid):
        flat = jnp.zeros((h * w + 1, c), img.dtype)
        flat = flat.at[indices.reshape(-1)].set(
            img.reshape(-1, c) * valid.reshape(-1, 1))
        return flat[:h * w].reshape(h, w, c)

    return jax.vmap(splat)(image, idx, inb.astype(image.dtype))
