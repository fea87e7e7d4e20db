"""Refiner networks: SCFlow (flow + mask + direct pose) and RAFT (flow→PnP).

The flax modules here cover the network part of the reference refiners
(models/refiner/scflow_refiner.py, raft_refiner_flow{_mask}.py); rendering,
data formatting, losses and test-time pose remapping are pure functions in
``scflow_tpu.training`` / ``scflow_tpu.losses`` — in JAX the "model" is just
the learnable computation.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .decoder import RAFTDecoder, SCFlowDecoder, SCFlowOutputs
from .encoder import RAFTEncoder


class SCFlowRefiner(nn.Module):
    """SCFlow: three encoders + shape-constrained recurrent decoder.

    Mirrors the reference SCFlowRefiner wiring
    (models/refiner/scflow_refiner.py:84-138): render/real feature encoders
    (shared unless ``separate_encoder``), a BN context encoder whose output
    splits into tanh'd GRU hidden state and relu'd context, then the
    SCFlowDecoder loop.
    """
    num_class: int = 21
    separate_encoder: bool = False
    h_channels: int = 128
    cxt_channels: int = 128
    feat_channels: int = 256
    net_type: str = "Basic"
    num_levels: int = 4
    radius: int = 4
    iters: int = 8
    rotation_mode: str = "ortho6d"
    depth_transform: str = "exp"
    detach_depth_for_xy: bool = True
    mask_flow: bool = False
    mask_corr: bool = False
    remat: bool = False
    dtype: object = None       # bf16 compute fast path (params stay f32)

    def setup(self):
        self.render_encoder = RAFTEncoder(self.feat_channels, self.net_type,
                                          norm="in", dtype=self.dtype,
                                          name="render_encoder")
        if self.separate_encoder:
            self.real_encoder = RAFTEncoder(self.feat_channels, self.net_type,
                                            norm="in", dtype=self.dtype,
                                            name="real_encoder")
        else:
            self.real_encoder = self.render_encoder
        self.context = RAFTEncoder(self.h_channels + self.cxt_channels,
                                   self.net_type, norm="bn", dtype=self.dtype,
                                   name="context")
        self.decoder = SCFlowDecoder(
            net_type=self.net_type, num_levels=self.num_levels,
            radius=self.radius, iters=self.iters, num_class=self.num_class,
            rotation_mode=self.rotation_mode,
            depth_transform=self.depth_transform,
            detach_depth_for_xy=self.detach_depth_for_xy,
            mask_flow=self.mask_flow, mask_corr=self.mask_corr,
            remat=self.remat, dtype=self.dtype, name="decoder")

    def extract_feat(self, render_images, real_images, train: bool = False,
                     sample_valid=None):
        """(render feat, real feat, GRU h, context) — scflow_refiner.py:84-106.

        ``sample_valid`` (N,) excludes padded batch slots from the context
        encoder's BN statistics (feature encoders use IN — per-sample).

        Note: batching render+real through ONE (2N, ...) shared-encoder
        apply was measured 12% SLOWER end-to-end on TPU v5e (518→462 fps,
        batch 32) — the 2N apply alone is the same speed, but it degrades
        XLA's full-graph schedule/layouts downstream. Two N-sized applies
        are kept deliberately."""
        feat_render = self.render_encoder(render_images, train)
        feat_real = self.real_encoder(real_images, train)
        cxt = self.context(render_images, train, sample_valid)
        h_feat, cxt_feat = jnp.split(cxt, [self.h_channels], axis=-1)
        return feat_render, feat_real, jnp.tanh(h_feat), nn.relu(cxt_feat)

    def __call__(self, render_images, real_images, ref_rotation,
                 ref_translation, depth, k, label, train: bool = False,
                 iters: int | None = None, lowres: bool = False,
                 sample_valid=None) -> SCFlowOutputs:
        """Full refinement forward pass.

        Args:
          render_images/real_images: (N, H, W, 3) normalized images.
          ref_rotation/(N,3,3), ref_translation/(N,3): rendered (initial) pose.
          depth: (N, H, W) rendered depth.
          k: (N, 3, 3) intrinsics; label: (N,) class ids.
          sample_valid: optional (N,) 0/1 — padded-slot mask for BN stats.

        Returns SCFlowOutputs with (T, N, ...) sequences.
        """
        feat_render, feat_real, h_feat, cxt_feat = self.extract_feat(
            render_images, real_images, train, sample_valid)
        return self.decoder(feat_render, feat_real, h_feat, cxt_feat,
                            ref_rotation, ref_translation, depth, k, label,
                            invalid_flow_num=0.0, iters=iters, lowres=lowres)


class RAFTRefiner(nn.Module):
    """RAFT flow(+occlusion) refiner network; pose comes from PnP at test
    time (reference models/refiner/raft_refiner_flow.py / _flow_mask.py)."""
    separate_encoder: bool = False
    h_channels: int = 128
    cxt_channels: int = 128
    feat_channels: int = 256
    net_type: str = "Basic"
    num_levels: int = 4
    radius: int = 4
    iters: int = 12
    predict_mask: bool = True

    def setup(self):
        self.render_encoder = RAFTEncoder(self.feat_channels, self.net_type,
                                          norm="in", name="render_encoder")
        if self.separate_encoder:
            self.real_encoder = RAFTEncoder(self.feat_channels, self.net_type,
                                            norm="in", name="real_encoder")
        else:
            self.real_encoder = self.render_encoder
        self.context = RAFTEncoder(self.h_channels + self.cxt_channels,
                                   self.net_type, norm="bn", name="context")
        self.decoder = RAFTDecoder(
            net_type=self.net_type, num_levels=self.num_levels,
            radius=self.radius, iters=self.iters,
            predict_mask=self.predict_mask, name="decoder")

    def __call__(self, render_images, real_images, train: bool = False,
                 iters: int | None = None, sample_valid=None):
        """Returns (flows (T, N, H, W, 2), occlusion masks (T, N, H, W, 1)).

        Multiview broadcast (reference RAFTRefinerFlowMask.extract_feat,
        raft_refiner_flow_mask.py:86-116): either input may be a single
        unbatched (H, W, 3) image — it is encoded ONCE and its features
        broadcast against the other side's batch (one real image vs N
        candidate renders, or one render vs N frames), so the encoder cost
        is paid once per shared view instead of per pair.
        """
        multiview_real = real_images.ndim == 3
        multiview_render = render_images.ndim == 3
        assert not (multiview_real and multiview_render), \
            "at most one side may be unbatched (multiview broadcast)"
        if multiview_render:
            n = real_images.shape[0]
            feat_render = self.render_encoder(render_images[None], train)
            cxt = self.context(render_images[None], train)
            feat_render = jnp.broadcast_to(
                feat_render, (n,) + feat_render.shape[1:])
            cxt = jnp.broadcast_to(cxt, (n,) + cxt.shape[1:])
        else:
            feat_render = self.render_encoder(render_images, train)
            cxt = self.context(render_images, train, sample_valid)
        if multiview_real:
            n = render_images.shape[0]
            feat_real = self.real_encoder(real_images[None], train)
            feat_real = jnp.broadcast_to(
                feat_real, (n,) + feat_real.shape[1:])
        else:
            feat_real = self.real_encoder(real_images, train)
        h_feat, cxt_feat = jnp.split(cxt, [self.h_channels], axis=-1)
        h_feat = jnp.tanh(h_feat)
        cxt_feat = nn.relu(cxt_feat)
        return self.decoder(feat_render, feat_real, h_feat, cxt_feat,
                            iters=iters)
