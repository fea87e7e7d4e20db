"""RAFT feature/context encoder (flax.linen, NHWC).

Re-implementation of the reference ``RAFTEncoder``
(models/encoder/raft_encoder.py:14-314), 'Basic' arch: 7×7/2 stem + three
2-block ResLayers (channels 64/96/128, strides 1/2/2) + 1×1 output conv,
giving stride-8 features. Norm selects IN (feature encoders) or BN (context
encoder), per the shipped SCFlow config
(configs/refine_models/scflow_ycbv_pbr.py:176-203).
"""
from __future__ import annotations

from flax import linen as nn

from .layers import BasicBlock, ConvBlock

_ARCH = {
    # net_type: (stem_channels, base_channels, blocks per stage, strides)
    "Basic": (64, (64, 96, 128), (2, 2, 2), (1, 2, 2)),
    "Small": (32, (8, 16, 24), (2, 2, 2), (1, 2, 2)),
    "Large": (64, (64, 96), (2, 2), (1, 2)),
}


class RAFTEncoder(nn.Module):
    """Stride-8 (or -4) CNN encoder.

    Attributes:
      out_channels: output feature channels (reference uses 256).
      net_type: 'Basic' | 'Small' | 'Large'.
      norm: 'in' | 'bn' — IN for feature encoders, BN for context.
      stride4: if True, stem stride 1 → overall stride 4
        (reference scale=1/4 path, raft_encoder.py:172-175).
    """
    out_channels: int = 256
    net_type: str = "Basic"
    norm: str = "in"
    stride4: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool = False, sample_mask=None):
        stem_ch, base_ch, blocks, strides = _ARCH[self.net_type]
        if self.dtype is not None:
            x = x.astype(self.dtype)
        x = ConvBlock(stem_ch, (7, 7), 1 if self.stride4 else 2,
                      norm=self.norm, dtype=self.dtype,
                      name="stem")(x, train, sample_mask)
        for i, (ch, nb, st) in enumerate(zip(base_ch, blocks, strides)):
            for b in range(nb):
                x = BasicBlock(ch, stride=st if b == 0 else 1, norm=self.norm,
                               dtype=self.dtype,
                               name=f"layer{i + 1}_block{b}")(
                                   x, train, sample_mask)
        x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    name="conv_out")(x)
        return x
