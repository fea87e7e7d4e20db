"""Batched PnP in pure JAX: EPnP + Gauss-Newton refinement + RANSAC.

TPU-native replacement for the reference's OpenCV C++ solvers:
- ``cv2.solvePnP(..., SOLVEPNP_EPNP)`` used by pose remapping in the data
  pipeline (reference datasets/pose.py:80-104) → :func:`solve_pnp`.
- ``cv2.solvePnPRansac`` used for flow→pose at test time
  (reference models/utils/pose.py:203-249) → :func:`ransac_pnp`.

Everything is fixed-shape and vmappable: variable point counts are handled
with weight masks, and RANSAC runs a fixed number of hypotheses scored in
parallel (one batched computation instead of a sequential loop).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .rotation import axis_angle_to_matrix, matrix_to_axis_angle
from ..utils.precision import f32_matmuls

_EPS = 1e-9


def _weighted_mean(x: jax.Array, w: jax.Array, axis=-2) -> jax.Array:
    wsum = jnp.sum(w, axis=axis, keepdims=True)
    return jnp.sum(x * w, axis=axis, keepdims=True) / jnp.maximum(wsum, _EPS)


def _kabsch(src: jax.Array, dst: jax.Array, w: jax.Array):
    """Weighted rigid alignment: find R, t with dst ≈ R @ src + t.

    src, dst: (N, 3); w: (N, 1) nonneg weights. Returns R (3,3), t (3,).
    """
    mu_s = _weighted_mean(src, w)
    mu_d = _weighted_mean(dst, w)
    cs = (src - mu_s) * w
    cd = dst - mu_d
    h = cs.T @ cd  # (3, 3)
    u, _, vt = jnp.linalg.svd(h)
    d = jnp.sign(jnp.linalg.det(vt.T @ u.T))
    s = jnp.diag(jnp.array([1.0, 1.0, 1.0])).at[2, 2].set(d)
    r = vt.T @ s @ u.T
    t = mu_d[0] - r @ mu_s[0]
    return r, t


def _control_points(points_3d: jax.Array, w: jax.Array) -> jax.Array:
    """EPnP control points: centroid + principal axes (4, 3)."""
    c0 = _weighted_mean(points_3d, w)  # (1, 3)
    centered = (points_3d - c0) * jnp.sqrt(jnp.maximum(w, 0.0))
    cov = centered.T @ centered / jnp.maximum(jnp.sum(w), _EPS)
    eigval, eigvec = jnp.linalg.eigh(cov)
    # scale axes by sqrt of eigenvalues; floor for degenerate (planar) sets
    scale = jnp.sqrt(jnp.maximum(eigval, 1e-6))
    axes = eigvec * scale[None, :]
    return jnp.concatenate([c0, c0 + axes.T], axis=0)  # (4, 3)


def _barycentric(points_3d: jax.Array, ctrl: jax.Array) -> jax.Array:
    """Barycentric coordinates (N, 4) of points w.r.t. 4 control points."""
    # Solve [ctrl^T; 1] @ alpha = [p; 1]
    a = jnp.concatenate([ctrl.T, jnp.ones((1, 4), ctrl.dtype)], axis=0)  # (4,4)
    b = jnp.concatenate([points_3d.T, jnp.ones((1, points_3d.shape[0]),
                                               points_3d.dtype)], axis=0)
    alpha = jnp.linalg.solve(a, b)  # (4, N)
    return alpha.T


@f32_matmuls
def epnp(points_3d: jax.Array, points_2d: jax.Array, k: jax.Array,
         weights: jax.Array | None = None):
    """Single-sample EPnP (N=1 kernel) with Kabsch closure.

    Args:
      points_3d: (N, 3) object-frame points.
      points_2d: (N, 2) pixel observations.
      k: (3, 3) intrinsics.
      weights: optional (N,) nonneg weights (0 disables a correspondence).

    Returns (R (3,3), t (3,)). vmap over a leading batch axis for batching.
    """
    n = points_3d.shape[0]
    w = jnp.ones((n, 1), points_3d.dtype) if weights is None else weights[:, None]
    ctrl_w = _control_points(points_3d, w)
    alpha = _barycentric(points_3d, ctrl_w)  # (N, 4)

    fu, fv = k[0, 0], k[1, 1]
    uc, vc = k[0, 2], k[1, 2]
    u, v = points_2d[:, 0], points_2d[:, 1]

    # M rows: for each point, two equations over the 12 control-point coords.
    # x-row blocks: [a_j fu, 0, a_j (uc - u)] ; y-row: [0, a_j fv, a_j (vc - v)]
    zeros = jnp.zeros_like(alpha)
    mx = jnp.stack([alpha * fu, zeros, alpha * (uc - u)[:, None]], axis=-1)  # (N,4,3)
    my = jnp.stack([zeros, alpha * fv, alpha * (vc - v)[:, None]], axis=-1)
    m = jnp.concatenate([mx.reshape(n, 12), my.reshape(n, 12)], axis=0)  # (2N,12)
    wm = jnp.concatenate([w, w], axis=0)
    mtm = (m * wm).T @ m  # (12, 12)

    _, eigvec = jnp.linalg.eigh(mtm)
    vkernel = eigvec[:, 0].reshape(4, 3)  # control points in camera frame, up to scale

    # Fix scale + sign: match inter-control-point distances, then positive depth.
    def pdist(c):
        diff = c[:, None, :] - c[None, :, :]
        return jnp.sqrt(jnp.sum(diff * diff, axis=-1) + _EPS)

    dist_w = pdist(ctrl_w)
    dist_c = pdist(vkernel)
    beta = jnp.sum(dist_c * dist_w) / jnp.maximum(jnp.sum(dist_c * dist_c), _EPS)
    ctrl_c = vkernel * beta
    # points' camera z = alpha @ ctrl_c z; flip if net depth negative
    z_mean = jnp.sum((alpha @ ctrl_c)[:, 2] * w[:, 0])
    ctrl_c = jnp.where(z_mean < 0, -ctrl_c, ctrl_c)

    pts_cam = alpha @ ctrl_c  # (N, 3)
    return _kabsch(points_3d, pts_cam, w)


def reprojection_residual(r, t, points_3d, points_2d, k, eps=1e-8):
    """Per-point 2D residual (N, 2) = projection(R p + t) - observation."""
    p_cam = points_3d @ r.T + t
    uvw = p_cam @ k.T
    xy = uvw[:, :2] / (uvw[:, 2:3] + eps)
    return xy - points_2d


@partial(jax.jit, static_argnames=("iters",))
@f32_matmuls
def refine_pose_gn(r, t, points_3d, points_2d, k, weights=None, iters: int = 5,
                   damping: float = 1e-6):
    """Gauss-Newton (Levenberg-ish damped) refinement of a pose on
    reprojection error, fixed iteration count (jit/scan friendly).

    Parameterization: left-multiplied axis-angle delta on R, additive t.
    """
    n = points_3d.shape[0]
    w = jnp.ones((n,), points_3d.dtype) if weights is None else weights

    def step(carry, _):
        r, t = carry
        p_cam = points_3d @ r.T + t  # (N, 3)
        x, y, z = p_cam[:, 0], p_cam[:, 1], p_cam[:, 2]
        zi = 1.0 / jnp.maximum(z, 1e-6)
        fu, fv = k[0, 0], k[1, 1]
        # d(u)/d(p_cam) rows
        du = jnp.stack([fu * zi, jnp.zeros_like(zi), -fu * x * zi * zi], axis=-1)
        dv = jnp.stack([jnp.zeros_like(zi), fv * zi, -fv * y * zi * zi], axis=-1)
        # d p_cam / d(omega) = -[p_cam]_x (left perturbation), d p_cam / dt = I
        px = jnp.stack([
            jnp.zeros_like(x), -z, y,
            z, jnp.zeros_like(x), -x,
            -y, x, jnp.zeros_like(x)], axis=-1).reshape(-1, 3, 3)
        j_rot_u = -jnp.einsum("ni,nij->nj", du, px)
        j_rot_v = -jnp.einsum("ni,nij->nj", dv, px)
        j_u = jnp.concatenate([j_rot_u, du], axis=-1)  # (N, 6)
        j_v = jnp.concatenate([j_rot_v, dv], axis=-1)
        res = reprojection_residual(r, t, points_3d, points_2d, k)  # (N, 2)
        jac = jnp.concatenate([j_u, j_v], axis=0)  # (2N, 6)
        rvec = jnp.concatenate([res[:, 0], res[:, 1]], axis=0)  # (2N,)
        ww = jnp.concatenate([w, w], axis=0)[:, None]
        jtj = (jac * ww).T @ jac + damping * jnp.eye(6, dtype=jac.dtype)
        jtr = (jac * ww).T @ rvec
        delta = -jnp.linalg.solve(jtj, jtr)
        r_new = axis_angle_to_matrix(delta[:3]) @ r
        t_new = t + delta[3:]
        return (r_new, t_new), None

    (r, t), _ = jax.lax.scan(step, (r, t), None, length=iters)
    return r, t


def solve_pnp(points_3d, points_2d, k, weights=None, refine_iters: int = 5):
    """EPnP + GN refinement — the ``cv2.solvePnP(EPNP)`` replacement.

    Single sample; vmap for batches. Returns (R, t).
    """
    r, t = epnp(points_3d, points_2d, k, weights)
    if refine_iters > 0:
        r, t = refine_pose_gn(r, t, points_3d, points_2d, k, weights,
                              iters=refine_iters)
    return r, t


@partial(jax.jit, static_argnames=("num_hypotheses", "sample_size", "refine_iters"))
@f32_matmuls
def ransac_pnp(key: jax.Array, points_3d: jax.Array, points_2d: jax.Array,
               k: jax.Array, weights: jax.Array | None = None,
               num_hypotheses: int = 64, sample_size: int = 6,
               inlier_threshold: float = 3.0, refine_iters: int = 5):
    """Fixed-budget parallel RANSAC-EPnP.

    Replaces cv2.solvePnPRansac (reference models/utils/pose.py:217-223):
    instead of a sequential adaptive loop, draw ``num_hypotheses`` minimal
    samples, solve EPnP for all via vmap, score inliers in parallel, take the
    best hypothesis and refine with inlier-weighted Gauss-Newton.

    Args:
      key: PRNG key.
      points_3d/(N,3), points_2d/(N,2), k/(3,3), weights/(N,) 0-1 validity.

    Returns dict(rotation, translation, inliers (N,), num_inliers).
    """
    n = points_3d.shape[0]
    w = jnp.ones((n,), points_3d.dtype) if weights is None else weights

    # Draw minimal samples, biased to valid points via Gumbel-top-k on weights.
    gumbel = jax.random.gumbel(key, (num_hypotheses, n))
    scores = jnp.log(jnp.maximum(w, 1e-12))[None, :] + gumbel
    _, sample_idx = jax.lax.top_k(scores, sample_size)  # (H, S)

    p3 = points_3d[sample_idx]  # (H, S, 3)
    p2 = points_2d[sample_idx]

    solve = jax.vmap(lambda a, b: epnp(a, b, k))
    r_h, t_h = solve(p3, p2)  # (H,3,3), (H,3)

    def residuals(r, t):
        return jnp.linalg.norm(
            reprojection_residual(r, t, points_3d, points_2d, k), axis=-1)

    res_h = jax.vmap(residuals)(r_h, t_h)  # (H, N)
    inl_h = (res_h < inlier_threshold) & (w > 0)
    counts = jnp.sum(inl_h, axis=-1)
    # guard against degenerate NaN hypotheses
    bad = jnp.any(~jnp.isfinite(res_h), axis=-1)
    counts = jnp.where(bad, -1, counts)
    best = jnp.argmax(counts)

    r_best, t_best = r_h[best], t_h[best]
    inl = inl_h[best].astype(points_3d.dtype)
    r_fin, t_fin = refine_pose_gn(r_best, t_best, points_3d, points_2d, k,
                                  weights=inl * w, iters=refine_iters)
    # final inlier set under the refined pose
    res_fin = residuals(r_fin, t_fin)
    inl_fin = (res_fin < inlier_threshold) & (w > 0)
    return {
        "rotation": r_fin,
        "translation": t_fin,
        "inliers": inl_fin,
        "num_inliers": jnp.sum(inl_fin),
    }
