"""Shared NN building blocks (flax.linen, NHWC).

TPU-first translations of the mmcv building blocks the reference model is
made of: ConvModule (conv + optional norm + act), ResNet BasicBlock, and an
align_corners=True bilinear resize (torch ``F.interpolate`` semantics used
throughout the reference decoder, e.g. models/decoder/scflow_decoder.py:197).

Layout is NHWC (channels-last) everywhere — the native layout for XLA:TPU
convolutions; the reference's NCHW is a CUDA convention we do not carry over.
"""
from __future__ import annotations

from collections.abc import Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def instance_norm(channels: int, name: str | None = None) -> nn.Module:
    """InstanceNorm as GroupNorm with one channel per group.

    Stands in for the reference's IN feature-encoder norm
    (configs/refine_models/scflow_ycbv_pbr.py:181). Affine params included.
    """
    return nn.GroupNorm(num_groups=channels, epsilon=1e-5, name=name)


class FusedInstanceNorm(nn.Module):
    """InstanceNorm with the same params/semantics as
    ``nn.GroupNorm(num_groups=C)`` (checkpoint-layout compatible).
    Dispatches through ops/fused_norm.instance_norm: plain XLA by default
    (with bf16 compute XLA fuses IN into the conv pipeline; the Pallas
    kernel's custom-call boundary forced layout copies — 642 vs 518 fps
    on the batch-32 eval step), Pallas via SCFLOW_FUSED_IN=1."""
    epsilon: float = 1e-5
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        from ..ops.fused_norm import instance_norm

        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        y = instance_norm(x, scale, bias, self.epsilon)
        if self.dtype is not None:
            y = y.astype(self.dtype)
        return y


class ConvBlock(nn.Module):
    """conv → (norm) → (act): the mmcv ``ConvModule`` equivalent.

    ``dtype`` is the compute dtype (bf16 for the TPU fast path); params and
    norm statistics stay float32.
    """
    features: int
    kernel: tuple[int, int] = (3, 3)
    stride: int = 1
    norm: str | None = None          # None | 'in' | 'bn' | 'gn'
    act: Callable | None = nn.relu   # None for linear
    gn_groups: int = 32
    use_bias: bool = True
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool = False, sample_mask=None):
        pad = ((self.kernel[0] // 2,) * 2, (self.kernel[1] // 2,) * 2)
        x = nn.Conv(self.features, self.kernel, strides=self.stride,
                    padding=pad, use_bias=self.use_bias, dtype=self.dtype,
                    name="conv")(x)
        # norm eps/momentum match torch defaults (numerical parity with the
        # reference and its published checkpoints: torch eps=1e-5, BN
        # momentum=0.1 ⇒ flax momentum=0.9)
        # norms carry the compute dtype too: without it flax returns f32
        # and every inter-layer activation round-trips HBM at 2x width
        # (the encoders were bandwidth-bound at f32). Statistics are still
        # computed in f32 internally (flax _compute_stats), so this only
        # changes the output cast.
        if self.norm == "in":
            x = FusedInstanceNorm(epsilon=1e-5, dtype=self.dtype,
                                  name="norm")(x)
        elif self.norm == "bn":
            # sample_mask (N,) excludes padded batch slots from the batch
            # statistics so padded training batches reproduce the unpadded
            # computation exactly (variable object counts per scene)
            mask = None
            if sample_mask is not None:
                mask = (sample_mask > 0.5).reshape(
                    (-1,) + (1,) * (x.ndim - 1))
                mask = jnp.broadcast_to(mask, x.shape)
            x = nn.BatchNorm(use_running_average=not train, epsilon=1e-5,
                             momentum=0.9, dtype=self.dtype,
                             name="norm")(x, mask=mask)
        elif self.norm == "gn":
            x = nn.GroupNorm(num_groups=self.gn_groups, epsilon=1e-5,
                             dtype=self.dtype, name="norm")(x)
        if self.act is not None:
            x = self.act(x)
        return x


class BasicBlock(nn.Module):
    """ResNet BasicBlock (reference models/backbone/resnet.py:12-92)."""
    features: int
    stride: int = 1
    norm: str = "in"
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool = False, sample_mask=None):
        identity = x
        out = ConvBlock(self.features, (3, 3), self.stride, norm=self.norm,
                        dtype=self.dtype, name="conv1")(x, train, sample_mask)
        out = ConvBlock(self.features, (3, 3), 1, norm=self.norm, act=None,
                        dtype=self.dtype, name="conv2")(out, train, sample_mask)
        if self.stride != 1 or x.shape[-1] != self.features:
            identity = ConvBlock(self.features, (1, 1), self.stride,
                                 norm=self.norm, act=None, dtype=self.dtype,
                                 name="downsample")(x, train, sample_mask)
        return nn.relu(out + identity)


def resize_bilinear_align_corners(x: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """Bilinear resize with torch align_corners=True semantics, NHWC.

    Output pixel i samples input coordinate i * (H_in - 1) / (H_out - 1).
    """
    h_in, w_in = x.shape[-3], x.shape[-2]
    h_out, w_out = out_hw
    if (h_in, w_in) == (h_out, w_out):
        return x

    def scale(n_out, n_in):
        if n_out == 1:
            return jnp.zeros((1,), x.dtype)
        return jnp.arange(n_out, dtype=x.dtype) * ((n_in - 1) / (n_out - 1))

    ys = scale(h_out, h_in)
    xs = scale(w_out, w_in)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h_in - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w_in - 1)
    y1 = jnp.minimum(y0 + 1, h_in - 1)
    x1 = jnp.minimum(x0 + 1, w_in - 1)
    wy = (ys - y0.astype(x.dtype))[:, None, None]
    wx = (xs - x0.astype(x.dtype))[None, :, None]

    rows0 = jnp.take(x, y0, axis=-3)
    rows1 = jnp.take(x, y1, axis=-3)

    def cols(rows):
        c0 = jnp.take(rows, x0, axis=-2)
        c1 = jnp.take(rows, x1, axis=-2)
        return c0 * (1 - wx) + c1 * wx

    return cols(rows0) * (1 - wy) + cols(rows1) * wy


def downsample_flow(flow: jax.Array, scale: int) -> jax.Array:
    """Downsample full-res flow to 1/scale and divide values by scale.

    Matches reference SCFlowDecoder's per-iteration pose-flow downsampling
    (models/decoder/scflow_decoder.py:197-198): bilinear, align_corners=True.
    flow: (..., H, W, 2).
    """
    h, w = flow.shape[-3] // scale, flow.shape[-2] // scale
    return resize_bilinear_align_corners(flow, (h, w)) / scale


def upsample_flow(flow: jax.Array, scale: int) -> jax.Array:
    """Upsample 1/scale-res flow to full res and multiply values by scale."""
    h, w = flow.shape[-3] * scale, flow.shape[-2] * scale
    return resize_bilinear_align_corners(flow, (h, w)) * scale
