"""Prediction heads: motion encoder, flow/mask heads, pose heads.

References:
- MotionEncoder: models/decoder/raft_decoder.py:61-166.
- XHead:         models/decoder/raft_decoder.py:256-294.
- Pose heads:    models/head/pose_head.py:12-211 (identity-initialized
  delta-pose regression; MultiClass emits per-class outputs selected by
  label).
"""
from __future__ import annotations

from collections.abc import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import ConvBlock

_MOTION = {
    # net_type: (corr_channels, corr_kernels, flow_channels, flow_kernels,
    #            out_channels)
    "Basic": ((256, 192), (1, 3), (128, 64), (7, 3), 126),
    "Large": ((256, 192), (1, 3), (128, 64), (7, 3), 126),
    "Small": ((96,), (1,), (64, 32), (7, 3), 80),
}


class MotionEncoder(nn.Module):
    """corr + flow → motion features; output concatenates raw flow."""
    net_type: str = "Basic"
    dtype: object = None

    @nn.compact
    def __call__(self, corr, flow):
        corr_ch, corr_k, flow_ch, flow_k, out_ch = _MOTION[self.net_type]
        if self.dtype is not None:
            corr = corr.astype(self.dtype)
            flow = flow.astype(self.dtype)
        c = corr
        for i, (ch, k) in enumerate(zip(corr_ch, corr_k)):
            c = ConvBlock(ch, (k, k), dtype=self.dtype, name=f"corr_conv{i}")(c)
        f = flow
        for i, (ch, k) in enumerate(zip(flow_ch, flow_k)):
            f = ConvBlock(ch, (k, k), dtype=self.dtype, name=f"flow_conv{i}")(f)
        out = ConvBlock(out_ch, (3, 3), dtype=self.dtype, name="out_conv")(
            jnp.concatenate([c, f], axis=-1))
        return jnp.concatenate([out, flow], axis=-1)

    @property
    def out_channels(self) -> int:
        return _MOTION[self.net_type][4] + 2


class XHead(nn.Module):
    """Conv head for flow (2ch) / mask (1ch) / upsample-mask predictions.

    The predict conv always emits float32 (flow/mask values feed geometry)."""
    feat_channels: Sequence[int] = (256,)
    out_channels: int = 2
    kind: str = "flow"  # 'flow' | 'mask' (mask uses a 1×1 predict conv)
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        for i, ch in enumerate(self.feat_channels):
            x = ConvBlock(ch, (3, 3), dtype=self.dtype, name=f"conv{i}")(x)
        k = (1, 1) if self.kind == "mask" else (3, 3)
        pad = ((k[0] // 2,) * 2, (k[1] // 2,) * 2)
        return nn.Conv(self.out_channels, k, padding=pad,
                       name="predict")(x.astype(jnp.float32))


def _identity_rotation_bias(rotation_mode: str, num_class: int = 1):
    if rotation_mode == "quaternion":
        base = jnp.asarray([0.0, 0.0, 0.0, 1.0])
    elif rotation_mode == "ortho6d":
        base = jnp.asarray([1.0, 0.0, 0.0, 0.0, 1.0, 0.0])
    else:
        raise ValueError(f"unsupported rotation mode {rotation_mode!r}")
    return jnp.tile(base, (num_class,))


class PoseHead(nn.Module):
    """Delta-pose regression head.

    Three stride-2 GN+ReLU convs over the 32² feature map, two FC layers,
    then identity-initialized rotation/translation linears. With
    ``num_class > 1``, per-class outputs are predicted and the ``label``
    row is selected (reference MultiClassPoseHead, pose_head.py:110-211).
    """
    num_class: int = 1
    rotation_mode: str = "ortho6d"
    conv_channels: Sequence[int] = (128, 128, 128)
    fc_channels: Sequence[int] = (1024, 256)
    dtype: object = None

    @nn.compact
    def __call__(self, x, label):
        for i, ch in enumerate(self.conv_channels):
            x = ConvBlock(ch, (3, 3), stride=2, norm="gn", dtype=self.dtype,
                          name=f"conv{i}")(x)
        x = x.reshape(x.shape[0], -1)
        for i, ch in enumerate(self.fc_channels):
            x = nn.relu(nn.Dense(ch, dtype=self.dtype, name=f"fc{i}")(x))
        x = x.astype(jnp.float32)  # pose deltas feed SE(3) math in f32

        rot_dim = 4 if self.rotation_mode == "quaternion" else 6
        rot = nn.Dense(
            rot_dim * self.num_class, name="rotation_pred",
            kernel_init=nn.initializers.zeros,
            bias_init=lambda key, shape, dtype=jnp.float32:
                _identity_rotation_bias(self.rotation_mode, self.num_class)
                .astype(dtype))(x)
        trans = nn.Dense(
            3 * self.num_class, name="translation_pred",
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros)(x)

        if self.num_class > 1:
            rot = rot.reshape(-1, self.num_class, rot_dim)
            trans = trans.reshape(-1, self.num_class, 3)
            rot = jnp.take_along_axis(
                rot, label[:, None, None].astype(jnp.int32), axis=1)[:, 0]
            trans = jnp.take_along_axis(
                trans, label[:, None, None].astype(jnp.int32), axis=1)[:, 0]
        return rot, trans


class FlowMaskEmbed(nn.Module):
    """Conv embeddings of delta-flow and mask fed to the pose head
    (reference scflow_decoder.py:103-106 delta_flow_encoder/mask_encoder)."""
    channels: Sequence[int] = (128, 64)
    kernels: Sequence[int] = (7, 3)
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        for i, (ch, k) in enumerate(zip(self.channels, self.kernels)):
            x = ConvBlock(ch, (k, k), dtype=self.dtype, name=f"conv{i}")(x)
        return x
