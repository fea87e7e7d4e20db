"""General ResNet backbone (flax.linen, NHWC).

Parity module for the reference's full ResNet family
(models/backbone/resnet.py:95-674: Bottleneck, ResNet, ResNetV1d) — the
shipped SCFlow configs only use BasicBlock via RAFTEncoder, but the
backbone surface exists in the reference, so it exists here: depths
18/34/50/101/152, optional deep (V1d) stem, configurable out indices.
"""
from __future__ import annotations

from collections.abc import Sequence

from flax import linen as nn

from .layers import BasicBlock, ConvBlock


class Bottleneck(nn.Module):
    """ResNet Bottleneck 1-3-1 block (reference resnet.py:95-300).

    ``features`` is the bottleneck width; the block outputs 4×features.
    """
    features: int
    stride: int = 1
    norm: str = "bn"
    dtype: object = None
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        out_ch = self.features * self.expansion
        identity = x
        out = ConvBlock(self.features, (1, 1), 1, norm=self.norm,
                        dtype=self.dtype, name="conv1")(x, train)
        out = ConvBlock(self.features, (3, 3), self.stride, norm=self.norm,
                        dtype=self.dtype, name="conv2")(out, train)
        out = ConvBlock(out_ch, (1, 1), 1, norm=self.norm, act=None,
                        dtype=self.dtype, name="conv3")(out, train)
        if self.stride != 1 or x.shape[-1] != out_ch:
            identity = ConvBlock(out_ch, (1, 1), self.stride, norm=self.norm,
                                 act=None, dtype=self.dtype,
                                 name="downsample")(x, train)
        return nn.relu(out + identity)


_ARCH = {
    # depth: (block, stage sizes)
    18: (BasicBlock, (2, 2, 2, 2)),
    34: (BasicBlock, (3, 4, 6, 3)),
    50: (Bottleneck, (3, 4, 6, 3)),
    101: (Bottleneck, (3, 4, 23, 3)),
    152: (Bottleneck, (3, 8, 36, 3)),
}


class ResNet(nn.Module):
    """Configurable ResNet (reference resnet.py:303-674).

    Attributes:
      depth: 18 | 34 | 50 | 101 | 152.
      base_channels: stage-1 width (64 in the reference).
      out_indices: which stage outputs to return (0-based).
      deep_stem: V1d three-3×3-conv stem instead of one 7×7
        (reference ResNetV1d, resnet.py:657-674).
      norm: 'bn' | 'in'.
    """
    depth: int = 18
    base_channels: int = 64
    out_indices: Sequence[int] = (3,)
    deep_stem: bool = False
    norm: str = "bn"
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        block, stages = _ARCH[self.depth]
        if self.deep_stem:
            for i, (ch, s) in enumerate([(self.base_channels // 2, 2),
                                         (self.base_channels // 2, 1),
                                         (self.base_channels, 1)]):
                x = ConvBlock(ch, (3, 3), s, norm=self.norm,
                              dtype=self.dtype, name=f"stem{i}")(x, train)
        else:
            x = ConvBlock(self.base_channels, (7, 7), 2, norm=self.norm,
                          dtype=self.dtype, name="stem")(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        outs = []
        for si, num_blocks in enumerate(stages):
            features = self.base_channels * (2 ** si)
            for bi in range(num_blocks):
                stride = 2 if (bi == 0 and si > 0) else 1
                x = block(features, stride, norm=self.norm, dtype=self.dtype,
                          name=f"layer{si + 1}_block{bi}")(x, train)
            if si in self.out_indices:
                outs.append(x)
        return outs[0] if len(outs) == 1 else tuple(outs)
