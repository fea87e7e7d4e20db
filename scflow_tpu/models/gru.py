"""Convolutional GRU cell (flax.linen, NHWC).

Reference models/decoder/raft_decoder.py:168-253 ``ConvGRU``: 'SeqConv'
variant runs two chained GRU passes with (1,5) then (5,1) kernels; 'Conv'
is a single 3×3 pass. Orthogonal conv init like the reference's
``init_weights`` (raft_decoder.py:226-233).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

_KERNELS = {"Conv": [(3, 3)], "SeqConv": [(1, 5), (5, 1)]}


class ConvGRU(nn.Module):
    h_channels: int = 128
    net_type: str = "SeqConv"
    dtype: object = None

    @nn.compact
    def __call__(self, h, x):
        """h: (N, H, W, Ch) hidden; x: (N, H, W, Cx) input. Returns new h."""
        init = nn.initializers.orthogonal()
        for i, kern in enumerate(_KERNELS[self.net_type]):
            pad = ((kern[0] // 2,) * 2, (kern[1] // 2,) * 2)

            def conv(name, inp):
                return nn.Conv(self.h_channels, kern, padding=pad,
                               kernel_init=init, dtype=self.dtype,
                               name=f"{name}_{i}")(inp)

            hx = jnp.concatenate([h, x], axis=-1)
            z = nn.sigmoid(conv("conv_z", hx))
            r = nn.sigmoid(conv("conv_r", hx))
            q = nn.tanh(conv("conv_q", jnp.concatenate([r * h, x], axis=-1)))
            h = (1 - z) * h + z * q
        return h
