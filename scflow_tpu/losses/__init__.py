"""Training losses: sequence weighting, RAFT flow L1, mask L1, point matching.

References:
- SequenceLoss / RAFTLoss / L1Loss: models/loss/sequence_loss.py.
- (Disentangle)PointMatchingLoss: models/loss/point_matching_loss.py
  (symmetric classes matched by nearest neighbor — here a dense MXU
  distance argmin instead of pytorch3d CUDA knn_points).

All functions are pure and batched; per-class mesh points come from a
static (C, P, 3) points bank with validity masks so shapes stay fixed.
"""
from __future__ import annotations

from collections.abc import Callable

import jax
import jax.numpy as jnp

from ..geometry.se3 import transform_points

from ..utils.precision import f32_matmuls

_EPS = 1e-10


def sequence_loss(per_iter_loss: jax.Array, gamma: float = 0.8):
    """Exponentially weighted sum over a (T,) per-iteration loss vector.

    weight_i = gamma^(T-1-i) (reference models/loss/sequence_loss.py:75-79).
    Returns (total, per_iter_loss).
    """
    t = per_iter_loss.shape[0]
    weights = gamma ** jnp.arange(t - 1, -1, -1, dtype=per_iter_loss.dtype)
    return jnp.sum(weights * per_iter_loss), per_iter_loss


def raft_flow_loss(pred_flow: jax.Array, gt_flow: jax.Array,
                   valid: jax.Array | None = None,
                   max_flow: float = 400.0,
                   sample_weight: jax.Array | None = None) -> jax.Array:
    """Masked L1 flow loss (reference RAFTLoss, sequence_loss.py:8-23).

    pred_flow/gt_flow: (..., H, W, 2); valid: (..., H, W) or None;
    sample_weight: (N,) 0/1 per-sample weight (padded batch slots).
    """
    mag = jnp.linalg.norm(gt_flow, axis=-1)
    v = mag < max_flow
    if valid is not None:
        v = v & (valid >= 0.5)
    v = v.astype(gt_flow.dtype)
    if sample_weight is not None:
        v = v * sample_weight.astype(v.dtype)[:, None, None]
    l1 = jnp.abs(pred_flow - gt_flow)
    return jnp.sum(v[..., None] * l1) / (jnp.sum(v) + _EPS)


def mask_l1_loss(pred_mask: jax.Array, gt_mask: jax.Array,
                 sample_weight: jax.Array | None = None) -> jax.Array:
    """Mean L1 (reference L1Loss, sequence_loss.py:28-36); with
    ``sample_weight`` (N,), a per-sample weighted mean over (N, H, W)."""
    if sample_weight is None:
        return jnp.mean(jnp.abs(pred_mask - gt_mask))
    w = sample_weight.astype(pred_mask.dtype)
    per_sample = jnp.mean(jnp.abs(pred_mask - gt_mask), axis=(-2, -1))
    return jnp.sum(per_sample * w) / (jnp.sum(w) + _EPS)


def _nearest_match(target: jax.Array, pred: jax.Array,
                   point_valid: jax.Array) -> jax.Array:
    """For each target point, the nearest pred point (dense MXU distances).

    target/pred: (P, 3); point_valid: (P,). Returns matched pred (P, 3).
    """
    d2 = (jnp.sum(target * target, -1)[:, None]
          + jnp.sum(pred * pred, -1)[None, :]
          - 2.0 * target @ pred.T)
    d2 = jnp.where(point_valid[None, :], d2, jnp.inf)
    idx = jnp.argmin(d2, axis=-1)
    return pred[idx]


@f32_matmuls
def point_matching_loss(pred_r, pred_t, gt_r, gt_t, points, point_valid,
                        symmetric, diameters, loss_type: str = "l2"):
    """ADD-style pose loss, batched (reference PointMatchingLoss).

    Args:
      pred_r/(N,3,3), pred_t/(N,3), gt_r, gt_t: poses.
      points: (N, P, 3) per-sample mesh points (gathered by label).
      point_valid: (N, P) validity of padded points.
      symmetric: (N,) bool — closest-point matching for these samples.
      diameters: (N,) mesh diameters for normalization.

    Returns (N,) per-sample normalized loss.
    """
    ord_ = 1 if loss_type == "l1" else 2
    pred = transform_points(pred_r, pred_t, points)
    target = transform_points(gt_r, gt_t, points)
    matched = jax.vmap(_nearest_match)(target, pred, point_valid)
    pred_use = jnp.where(symmetric[:, None, None], matched, pred)
    dist = jnp.linalg.norm(pred_use - target, ord=ord_, axis=-1)
    w = point_valid.astype(dist.dtype)
    mean = jnp.sum(dist * w, axis=-1) / jnp.maximum(jnp.sum(w, axis=-1), 1.0)
    return mean / diameters


@f32_matmuls
def disentangled_point_matching_loss(pred_r, pred_t, gt_r, gt_t, points,
                                     point_valid, symmetric, diameters,
                                     loss_type: str = "l1",
                                     disentangle_z: bool = True):
    """GDR-Net-style disentangled point matching, batched.

    Separate rotation / xy / z terms, each against the gt-composed
    counterpart (reference DisentanglePointMatchingLoss,
    point_matching_loss.py:107-218). Returns (N,) per-sample loss.
    """
    ord_ = 1 if loss_type == "l1" else 2
    w = point_valid.astype(points.dtype)
    wsum = jnp.maximum(jnp.sum(w, axis=-1), 1.0)

    def wmean(d):  # (N, P) → (N,)
        return jnp.sum(d * w, axis=-1) / wsum

    pts_gt_rot = jnp.einsum("nij,npj->npi", gt_r, points)
    pts_gt_rt = pts_gt_rot + gt_t[:, None, :]

    # rotation term: pred rotation, gt translation (+ symmetric matching)
    pts_pred_rot = jnp.einsum("nij,npj->npi", pred_r, points) + gt_t[:, None, :]
    matched = jax.vmap(_nearest_match)(pts_gt_rt, pts_pred_rot, point_valid)
    pts_pred_rot = jnp.where(symmetric[:, None, None], matched, pts_pred_rot)
    loss_rot = wmean(jnp.linalg.norm(pts_pred_rot - pts_gt_rt, ord=ord_, axis=-1))

    if disentangle_z:
        t_z = gt_t.at[:, 2].set(pred_t[:, 2])
        loss_z = wmean(jnp.linalg.norm(
            pts_gt_rot + t_z[:, None, :] - pts_gt_rt, ord=ord_, axis=-1))
        t_xy = pred_t.at[:, 2].set(gt_t[:, 2])
        loss_xy = wmean(jnp.linalg.norm(
            pts_gt_rot + t_xy[:, None, :] - pts_gt_rt, ord=ord_, axis=-1))
        loss_trans = loss_z + loss_xy
    else:
        loss_trans = wmean(jnp.linalg.norm(
            pts_gt_rot + pred_t[:, None, :] - pts_gt_rt, ord=ord_, axis=-1))

    return (loss_rot + loss_trans) / diameters


@f32_matmuls
def rot_point_matching_loss(pred_r, gt_r, points, point_valid, symmetric,
                            diameters, loss_type: str = "l1"):
    """Rotation-only point matching (reference RotPointMatchingLoss,
    point_matching_loss.py:222-291): compare rotated point clouds with no
    translation; symmetric classes use closest-point matching.
    Returns (N,) per-sample normalized loss."""
    ord_ = 1 if loss_type == "l1" else 2
    pred = jnp.einsum("nij,npj->npi", pred_r, points)
    target = jnp.einsum("nij,npj->npi", gt_r, points)
    matched = jax.vmap(_nearest_match)(target, pred, point_valid)
    pred_use = jnp.where(symmetric[:, None, None], matched, pred)
    dist = jnp.linalg.norm(pred_use - target, ord=ord_, axis=-1)
    w = point_valid.astype(dist.dtype)
    mean = jnp.sum(dist * w, axis=-1) / jnp.maximum(jnp.sum(w, axis=-1), 1.0)
    return mean / diameters


def sequence_pose_loss(seq_r, seq_t, gt_r, gt_t, points, point_valid,
                       symmetric, diameters, gamma: float = 0.8,
                       loss_weight: float = 10.0, loss_type: str = "l1",
                       disentangled: bool = True, disentangle_z: bool = True,
                       sample_weight=None):
    """Sequence-weighted pose loss over (T, N, ...) pose predictions.

    ``sample_weight`` (N,) turns the per-iteration batch mean into a
    weighted mean so padded slots contribute nothing."""
    def per_iter(r, t):
        if disentangled:
            l = disentangled_point_matching_loss(
                r, t, gt_r, gt_t, points, point_valid, symmetric, diameters,
                loss_type=loss_type, disentangle_z=disentangle_z)
        else:
            l = point_matching_loss(r, t, gt_r, gt_t, points, point_valid,
                                    symmetric, diameters, loss_type=loss_type)
        if sample_weight is None:
            return jnp.mean(l)
        w = sample_weight.astype(l.dtype)
        return jnp.sum(l * w) / (jnp.sum(w) + _EPS)

    losses = jax.vmap(per_iter)(seq_r, seq_t)
    total, per = sequence_loss(losses, gamma)
    return loss_weight * total, loss_weight * per


def sequence_flow_loss(seq_flow, gt_flow, valid, gamma: float = 0.8,
                       loss_weight: float = 0.1, max_flow: float = 400.0,
                       sample_weight=None):
    """Sequence-weighted RAFT flow loss over (T, N, H, W, 2)."""
    losses = jax.vmap(lambda f: raft_flow_loss(
        f, gt_flow, valid, max_flow, sample_weight))(seq_flow)
    total, per = sequence_loss(losses, gamma)
    return loss_weight * total, loss_weight * per


def sequence_mask_loss(seq_mask, gt_mask, gamma: float = 0.8,
                       loss_weight: float = 10.0, sample_weight=None):
    """Sequence-weighted mask L1 over (T, N, H, W)."""
    losses = jax.vmap(lambda m: mask_l1_loss(m, gt_mask, sample_weight))(
        seq_mask)
    total, per = sequence_loss(losses, gamma)
    return loss_weight * total, loss_weight * per
