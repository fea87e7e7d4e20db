"""SCFlow decoder: recurrent GRU updates with a pose-induced-flow constraint.

Re-design of the reference ``SCFlowDecoder``
(models/decoder/scflow_decoder.py:151-252) as a ``flax.linen.scan`` loop:
the carry is (hidden state, full-res pose flow, occlusion mask, running
pose), per-iteration outputs are stacked along a leading sequence axis, and
everything — including the dense correspondence grids replacing the
reference's per-sample ``cal_3d_2d_corr`` Python loop — is fixed-shape.

Also provides ``RAFTDecoder`` (plain RAFT iteration with convex upsampling,
reference models/decoder/raft_decoder.py:299-456) for the flow-only refiner
family.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from ..geometry.flow import flow_from_pose_and_points
from ..geometry.projection import depth_to_correspondences
from ..geometry.se3 import compose_delta_pose
from .corr import corr_lookup_pm, correlation_pyramid_pm
from .gru import ConvGRU
from .heads import FlowMaskEmbed, MotionEncoder, PoseHead, XHead
from .layers import downsample_flow, resize_bilinear_align_corners, upsample_flow

_H_CHANNELS = {"Basic": 128, "Small": 96}
_CXT_CHANNELS = {"Basic": 128, "Small": 64}


class SCFlowOutputs(struct.PyTreeNode):
    """Per-iteration stacked sequences, leading axis = iteration."""
    flow_from_pose: jax.Array    # (T, N, H, W, 2)
    flow_from_pred: jax.Array    # (T, N, H, W, 2)
    rotations: jax.Array         # (T, N, 3, 3)
    translations: jax.Array      # (T, N, 3)
    masks: jax.Array             # (T, N, H, W, 1) upsampled occlusion masks
    delta_rotations: jax.Array   # (T, N, rot_dim)
    delta_translations: jax.Array  # (T, N, 3)


class _SCFlowIteration(nn.Module):
    """One GRU + delta-pose update step (scanned over iterations)."""
    net_type: str
    num_levels: int
    radius: int
    detach_flow: bool
    detach_mask: bool
    detach_pose: bool
    mask_flow: bool
    mask_corr: bool
    num_class: int
    rotation_mode: str
    depth_transform: str
    detach_depth_for_xy: bool
    invalid_flow_num: float
    dtype: object = None
    # eval fast path: the pose-flow carry lives at feature resolution and is
    # computed directly from 4-tap-resampled "effective points" — numerically
    # the bilinear downsample of the full-res pose flow up to sub-pixel
    # linearization of the projection (<0.01 px). Train keeps the exact path.
    lowres: bool = False
    upsample_factor: int = 8

    @nn.compact
    def __call__(self, carry, pyramid, cxt_feat, label, k, geom):
        h_feat, flow, mask, rot, trans = carry
        n, hf, wf, _ = cxt_feat.shape
        scale = self.upsample_factor

        if self.detach_flow:
            flow = jax.lax.stop_gradient(flow)
        if self.detach_mask:
            mask = jax.lax.stop_gradient(mask)

        if self.lowres:
            flow_small = flow                                # already 1/scale
        else:
            h_img, w_img = flow.shape[1], flow.shape[2]
            flow_small = downsample_flow(flow, scale)        # (N, hf, wf, 2)
        corr = corr_lookup_pm(pyramid, flow_small, radius=self.radius)
        if self.mask_corr:
            corr = corr * mask
        motion_in_flow = flow_small * mask if self.mask_flow else flow_small
        motion = MotionEncoder(self.net_type, dtype=self.dtype,
                               name="motion")(corr, motion_in_flow)
        x = jnp.concatenate([cxt_feat, motion], axis=-1)
        h_feat = ConvGRU(h_feat.shape[-1], dtype=self.dtype,
                         name="gru")(h_feat, x)

        delta_flow = XHead((256,), 2, "flow", dtype=self.dtype,
                           name="flow_head")(h_feat)
        mask = nn.sigmoid(XHead((256,), 1, "mask", dtype=self.dtype,
                                name="mask_head")(h_feat))

        dflow_feat = FlowMaskEmbed((128, 64), (7, 3), dtype=self.dtype,
                                   name="dflow_embed")(delta_flow)
        mask_feat = FlowMaskEmbed((64, 32), (3, 3), dtype=self.dtype,
                                  name="mask_embed")(mask)
        drot, dtrans = PoseHead(self.num_class, self.rotation_mode,
                                dtype=self.dtype, name="pose_head")(
            jnp.concatenate([h_feat.astype(dflow_feat.dtype), dflow_feat,
                             mask_feat], axis=-1), label)

        if not self.lowres:
            flow_pred = upsample_flow(flow_small + delta_flow, scale)
            up_mask = resize_bilinear_align_corners(mask, (h_img, w_img))

        rot_src = jax.lax.stop_gradient(rot) if self.detach_pose else rot
        trans_src = jax.lax.stop_gradient(trans) if self.detach_pose else trans
        rot_new, trans_new = compose_delta_pose(
            drot, dtrans, rot_src, trans_src,
            depth_transform=self.depth_transform,
            detach_depth_for_xy=self.detach_depth_for_xy)

        if self.lowres:
            p_eff, w_eff, x_eff = geom
            from ..geometry.projection import project_points

            proj, _ = project_points(
                p_eff.reshape(n, hf * wf, 3), k, rot_new, trans_new)
            proj = proj.reshape(n, hf, wf, 2)
            pose_flow = (w_eff[..., None] * proj - x_eff) / scale
            carry = (h_feat, pose_flow, mask, rot_new, trans_new)
            outs = (pose_flow, flow_small + delta_flow, rot_new, trans_new,
                    mask, drot, dtrans)
            return carry, outs

        points_3d, valid = geom
        pose_flow = flow_from_pose_and_points(
            rot_new, trans_new, k, points_3d, valid,
            invalid_num=self.invalid_flow_num)

        carry = (h_feat, pose_flow, mask, rot_new, trans_new)
        outs = (pose_flow, flow_pred, rot_new, trans_new, up_mask, drot, dtrans)
        return carry, outs


class SCFlowDecoder(nn.Module):
    """Shape-constrained recurrent decoder.

    Config mirrors the shipped SCFlow recipe
    (configs/refine_models/scflow_ycbv_pbr.py:204-227): Basic net, 4 levels,
    radius 4, 8 iterations, all detach flags on, ortho6d rotations.
    """
    net_type: str = "Basic"
    num_levels: int = 4
    radius: int = 4
    iters: int = 8
    detach_flow: bool = True
    detach_mask: bool = True
    detach_pose: bool = True
    mask_flow: bool = False
    mask_corr: bool = False
    num_class: int = 21
    rotation_mode: str = "ortho6d"
    depth_transform: str = "exp"
    detach_depth_for_xy: bool = True
    dtype: object = None
    # rematerialize each scan iteration's activations in the backward pass
    # (trade recompute FLOPs for HBM traffic across the 8-iteration loop)
    remat: bool = False

    @nn.compact
    def __call__(self, feat_render, feat_real, h_feat, cxt_feat,
                 ref_rotation, ref_translation, depth, k, label,
                 init_flow=None, invalid_flow_num: float = 0.0,
                 iters: int | None = None,
                 lowres: bool = False) -> SCFlowOutputs:
        """Run the recurrent refinement.

        Args:
          feat_render/feat_real: (N, hf, wf, C) stride-8 features.
          h_feat: (N, hf, wf, 128) initial GRU hidden (tanh of context split).
          cxt_feat: (N, hf, wf, 128) context features (relu split).
          ref_rotation/(N,3,3), ref_translation/(N,3): rendering pose.
          depth: (N, H, W) rendered depth at image resolution.
          k: (N, 3, 3) intrinsics.
          label: (N,) int class ids.
          init_flow: optional (N, H, W, 2) initial flow (default zeros).
          invalid_flow_num: value for background flow pixels (reference
            passes 0. from SCFlowRefiner.get_pose, scflow_refiner.py:138).
          iters: optional override of scan length (test-time iters).
        """
        n, h_img, w_img = depth.shape
        hf, wf = feat_render.shape[1], feat_render.shape[2]
        scale = h_img // hf
        num_iters = self.iters if iters is None else iters

        pyramid = correlation_pyramid_pm(feat_render, feat_real, self.num_levels)
        if self.dtype is not None:
            # bf16 fast path: store the volume (the dominant HBM array —
            # level 0 is (N, H, W, H·W)) at half width. Stats/accumulation
            # stay f32 (correlation_pyramid_pm accumulates f32; the lookup
            # contractions promote to f32), so only the stored values round.
            pyramid = [p.astype(self.dtype) for p in pyramid]

        # Dense 2D-3D correspondences from the rendered depth (the shape
        # constraint's geometry, computed once per forward).
        _, points_3d, valid = depth_to_correspondences(
            depth, k, ref_rotation, ref_translation)

        if lowres:
            # 4-tap effective points at feature resolution: the bilinear
            # align-corners downsample operator applied to (valid-masked)
            # points / pixel grid — per iteration the pose flow becomes a
            # 1/64-size projection instead of a full-res map + downsample.
            from ..geometry.projection import pixel_grid

            vf = valid.astype(jnp.float32)[..., None]
            w_eff = resize_bilinear_align_corners(vf, (hf, wf))[..., 0]
            p_w = resize_bilinear_align_corners(points_3d * vf, (hf, wf))
            p_eff = p_w / jnp.maximum(w_eff[..., None], 1e-12)
            grid = pixel_grid(h_img, w_img, jnp.float32)
            x_eff = resize_bilinear_align_corners(grid[None] * vf, (hf, wf))
            geom = (p_eff, w_eff, x_eff)
            init_flow = jnp.zeros((n, hf, wf, 2), jnp.float32)
        else:
            geom = (points_3d, valid)
            if init_flow is None:
                init_flow = jnp.zeros((n, h_img, w_img, 2), jnp.float32)
        init_mask = jnp.ones((n, hf, wf, 1), jnp.float32)
        if self.dtype is not None:
            h_feat = h_feat.astype(self.dtype)

        carry = (h_feat, init_flow, init_mask, ref_rotation, ref_translation)

        body = nn.remat(_SCFlowIteration) if self.remat else _SCFlowIteration
        scan = nn.scan(
            body,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=nn.broadcast,
            out_axes=0,
            length=num_iters,
        )(self.net_type, self.num_levels, self.radius, self.detach_flow,
          self.detach_mask, self.detach_pose, self.mask_flow, self.mask_corr,
          self.num_class, self.rotation_mode, self.depth_transform,
          self.detach_depth_for_xy, invalid_flow_num, self.dtype,
          lowres, scale, name="iteration")

        _, outs = scan(carry, pyramid, cxt_feat, label, k, geom)
        if not lowres:
            return SCFlowOutputs(*outs)

        # lowres eval: reconstruct full-res outputs for the FINAL iteration
        (pose_flow_lr, flow_pred_sm, rots, transs, masks_lr, drots,
         dtranss) = outs
        final_pose_flow = flow_from_pose_and_points(
            rots[-1], transs[-1], k, points_3d, valid,
            invalid_num=invalid_flow_num)[None]
        final_flow_pred = upsample_flow(flow_pred_sm[-1], scale)[None]
        final_mask = resize_bilinear_align_corners(
            masks_lr[-1], (h_img, w_img))[None]
        return SCFlowOutputs(
            flow_from_pose=final_pose_flow, flow_from_pred=final_flow_pred,
            rotations=rots, translations=transs, masks=final_mask,
            delta_rotations=drots, delta_translations=dtranss)


class _RAFTIteration(nn.Module):
    """One plain-RAFT update step (flow only + optional occlusion mask)."""
    net_type: str
    num_levels: int
    radius: int
    predict_mask: bool
    convex_upsample: bool
    upsample_factor: int = 8  # encoder stride (raft_encoder.py:172-175)

    @nn.compact
    def __call__(self, carry, pyramid, cxt_feat):
        h_feat, flow = carry  # flow at feature resolution
        scale = self.upsample_factor
        flow = jax.lax.stop_gradient(flow)
        corr = corr_lookup_pm(pyramid, flow, radius=self.radius)
        motion = MotionEncoder(self.net_type, name="motion")(corr, flow)
        x = jnp.concatenate([cxt_feat, motion], axis=-1)
        h_feat = ConvGRU(h_feat.shape[-1], name="gru")(h_feat, x)
        delta_flow = XHead((256,), 2, "flow", name="flow_head")(h_feat)
        flow = flow + delta_flow

        up_weights = None
        if self.convex_upsample and self.net_type == "Basic":
            # 9-way convex combination per upsampled pixel: 9·scale² weights
            up_weights = 0.25 * XHead((256,), 9 * scale * scale, "mask",
                                      name="up_mask_head")(h_feat)
            upflow = convex_upsample(flow, up_weights, scale)
        else:
            upflow = upsample_flow(flow, scale)

        if self.predict_mask:
            occ_small = nn.sigmoid(XHead((256,), 1, "mask",
                                         name="occ_head")(h_feat))
            if up_weights is not None:
                # reference upsamples occlusion with the same convex weights
                # (raft_decoder_mask.py:141-161, upsample_mask)
                occ = convex_upsample(occ_small, up_weights, scale,
                                      multiplier=1.0)
            else:
                occ = resize_bilinear_align_corners(
                    occ_small, (flow.shape[1] * scale, flow.shape[2] * scale))
        else:
            occ = jnp.zeros(upflow.shape[:-1] + (1,), upflow.dtype)

        carry = (h_feat, flow)
        return carry, (upflow, occ)


def convex_upsample(x: jax.Array, weights: jax.Array, scale: int,
                    multiplier: float | None = None) -> jax.Array:
    """RAFT convex upsampling ×scale with learned 9-way weights.

    x: (N, h, w, C); weights: (N, h, w, 9·scale²); values are multiplied by
    ``multiplier`` (default: ``scale`` — the flow-magnitude rescale; pass 1.0
    for non-flow fields like occlusion masks, which the reference upsamples
    with the same weights, raft_decoder_mask.py:141-161).
    Semantics of reference RAFTDecoder._upsample (raft_decoder.py:381-416).
    """
    n, h, w, c = x.shape
    mult = float(scale) if multiplier is None else multiplier
    win = weights.reshape(n, h, w, 9, scale, scale)
    win = jax.nn.softmax(win, axis=3)
    # 3×3 neighborhoods of mult*x (zero padded)
    fpad = jnp.pad(x * mult, ((0, 0), (1, 1), (1, 1), (0, 0)))
    patches = jnp.stack([
        fpad[:, dy:dy + h, dx:dx + w] for dy in range(3) for dx in range(3)
    ], axis=3)  # (N, h, w, 9, C)
    up = jnp.einsum("nhwkab,nhwkc->nhwabc", win, patches)  # (N,h,w,s,s,C)
    return up.transpose(0, 1, 3, 2, 4, 5).reshape(n, h * scale, w * scale, c)


class RAFTDecoder(nn.Module):
    """Plain RAFT decoder (+ optional per-iteration occlusion masks).

    Covers the reference's ``RAFTDecoder`` and ``RAFTDecoderMask`` families
    (models/decoder/raft_decoder.py:299-456, raft_decoder_mask.py).
    """
    net_type: str = "Basic"
    num_levels: int = 4
    radius: int = 4
    iters: int = 12
    predict_mask: bool = False
    convex_upsample: bool = True
    upsample_factor: int = 8  # encoder stride

    @nn.compact
    def __call__(self, feat1, feat2, h_feat, cxt_feat, init_flow=None,
                 iters: int | None = None):
        """Returns (upsampled flows (T, N, H, W, 2), occlusions (T, N, H, W, 1))."""
        n, hf, wf, _ = feat1.shape
        num_iters = self.iters if iters is None else iters
        pyramid = correlation_pyramid_pm(feat1, feat2, self.num_levels)
        if init_flow is None:
            init_flow = jnp.zeros((n, hf, wf, 2), feat1.dtype)
        carry = (h_feat, init_flow)
        scan = nn.scan(
            _RAFTIteration,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=nn.broadcast,
            out_axes=0,
            length=num_iters,
        )(self.net_type, self.num_levels, self.radius, self.predict_mask,
          self.convex_upsample, self.upsample_factor, name="iteration")
        _, (flows, occs) = scan(carry, pyramid, cxt_feat)
        return flows, occs
