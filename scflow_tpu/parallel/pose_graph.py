"""Distributed pose-graph refinement over multi-object scenes.

BASELINE extension (no reference counterpart — SURVEY.md §2.10): after
per-object refinement, objects observed in the same image share a rigid
scene: jointly optimizing all object poses plus a per-scene camera
correction tightens poses using cross-object consistency.

Structure: a camera correction is gauge-equivalent to composing every
object pose, so the joint (δc, δp_i) Gauss-Newton system is singular; we
solve it as the regularized limit — alternating block descent:

  1. **camera step**: the reduced camera system (the Schur complement with
     objects held at their prior) — normal-equation blocks summed over all
     objects,  (Σ_i H_i + λI) δc = Σ_i b_i;
  2. **object step**: independent local GN solves per object at the
     corrected camera.

The camera-step Σ_i reductions are plain sums over the object axis, so the
distributed variant shards objects over a mesh and reduces with one
``psum`` per term (:func:`solve_pose_graph_sharded`); object solves stay
shard-local. Shared scene error flows into the consensus camera block,
idiosyncratic error into the per-object blocks.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..geometry.projection import depth_to_correspondences, pixel_grid
from ..geometry.rotation import axis_angle_to_matrix
from ..utils.precision import f32_matmuls


def _object_jacobian(points, r, t, k, weights, eps=1e-2):
    # eps clamps 1/z: with eps=1e-6 a point driven to z≈0 mid-iteration
    # gives J entries ~1e18 whose normal equations overflow f32 to inf
    # (observed on a real eval group); 1e-2 bounds JᵀJ safely and such
    # points carry no useful signal anyway.
    """Per-object GN blocks for reprojection residuals w.r.t. the object
    pose (left-multiplied axis-angle + translation) AND a shared camera
    correction applied on the camera side.

    points: (P, 3) object-frame; observations come from ``target_2d``.
    Returns per-point jacobians j_obj (2P, 6), j_cam (2P, 6).
    """
    p_cam = points @ r.T + t
    x, y, z = p_cam[:, 0], p_cam[:, 1], p_cam[:, 2]
    zi = 1.0 / jnp.maximum(z, eps)
    fu, fv = k[0, 0], k[1, 1]
    du = jnp.stack([fu * zi, jnp.zeros_like(zi), -fu * x * zi * zi], axis=-1)
    dv = jnp.stack([jnp.zeros_like(zi), fv * zi, -fv * y * zi * zi], axis=-1)
    px = jnp.stack([
        jnp.zeros_like(x), -z, y,
        z, jnp.zeros_like(x), -x,
        -y, x, jnp.zeros_like(x)], axis=-1).reshape(-1, 3, 3)
    # object pose perturbation: p_cam' = exp(ω)ₗ (R p + t_obj-part...) — both
    # the object pose and camera correction act on camera-frame points, so
    # their point jacobians coincide; they are distinguished by sharing: the
    # camera block is common to all objects of the scene.
    j_rot_u = -jnp.einsum("ni,nij->nj", du, px)
    j_rot_v = -jnp.einsum("ni,nij->nj", dv, px)
    j_u = jnp.concatenate([j_rot_u, du], axis=-1)
    j_v = jnp.concatenate([j_rot_v, dv], axis=-1)
    j = jnp.concatenate([j_u, j_v], axis=0)          # (2P, 6)
    w = jnp.concatenate([weights, weights], axis=0)[:, None]
    return j * jnp.sqrt(jnp.maximum(w, 0.0))


def _residuals(points, target_2d, r, t, k, weights, eps=1e-8):
    p_cam = points @ r.T + t
    uvw = p_cam @ k.T
    xy = uvw[:, :2] / (uvw[:, 2:3] + eps)
    res = xy - target_2d
    w = jnp.sqrt(jnp.maximum(weights, 0.0))[:, None]
    return (res * w).T.reshape(-1)                    # (2P,) [all-u, all-v]


def _gn_blocks(points, target_2d, r, t, k, weights, damping):
    """One object's GN blocks: H_ii, H_ic (=H_ii by shared jacobian), b_i."""
    j = _object_jacobian(points, r, t, k, weights)
    res = _residuals(points, target_2d, r, t, k, weights)
    h = j.T @ j
    b = -(j.T @ res)
    h_damped = h + damping * jnp.eye(6, dtype=h.dtype)
    return h_damped, h, b


def _precond_solve(h, b, damping):
    """Jacobi-preconditioned damped solve of the 6×6 normal equations.

    The raw system mixes rotation columns (~f·|p_cam|) with translation
    columns (~f/z): condition numbers reach ~1e8, where an f32 solve is
    pure noise once residuals are small (measured: an exactly-converged
    camera step then *diverged* by 0.5° per iteration). Normalizing by
    sqrt(diag H) drops the condition to the geometry's intrinsic ratio and
    makes the damping λ relative (Levenberg-Marquardt style).
    Supports leading batch dims on (..., 6, 6) / (..., 6).
    """
    d = jnp.sqrt(jnp.clip(jnp.diagonal(h, axis1=-2, axis2=-1), 1e-12))
    hn = h / (d[..., :, None] * d[..., None, :])
    bn = b / d
    eye = jnp.eye(6, dtype=h.dtype)
    x = jnp.linalg.solve(hn + damping * eye, bn[..., None])[..., 0]
    return x / d


@partial(jax.jit, static_argnames=("iterations", "camera_only"))
@f32_matmuls
def solve_pose_graph(points, target_2d, rotations, translations, k, weights,
                     object_valid=None, damping: float = 1e-3,
                     iterations: int = 3, camera_only: bool = False):
    """Joint scene refinement: shared camera correction + per-object poses.

    Args:
      points: (N, P, 3) object-frame points per object.
      target_2d: (N, P, 2) observed pixel targets (e.g. flow-displaced).
      rotations/(N,3,3), translations/(N,3): current object poses.
      k: (3, 3) shared intrinsics, or (N, 3, 3) per-object intrinsics —
        test-time objects of one image are cropped independently, so each
        carries its own ``adapt_intrinsic`` K (data/loader.py); the camera
        correction acts in camera frame (before K) and stays shared.
      weights: (N, P) per-point confidence (0 disables).
      object_valid: (N,) 0/1 mask for padded object slots.
      camera_only: apply ONLY the shared camera correction, skipping the
        per-object local solves. The camera block aggregates thousands of
        points across all objects so target noise averages out; per-object
        re-solves inherit the targets' noise floor — when the targets are
        flow-derived and the per-object refiner (direct pose regression)
        is already more accurate than flow+PnP, the object step DEGRADES
        poses (measured: synthetic-BOP ADD-AUC 0.60 → 0.25 full graph vs
        held at pose-head quality camera-only; POSE_GRAPH_ABLATION.md).

    Returns dict(rotations, translations, camera_rotation,
    camera_translation): refined object poses with the shared camera
    correction folded in.
    """
    n = points.shape[0]
    ov = jnp.ones((n,)) if object_valid is None else object_valid
    k_b = jnp.broadcast_to(k, (n, 3, 3))

    def apply_cam(dc, r, t):
        dr = axis_angle_to_matrix(dc[:3])
        return (jnp.einsum("ij,njk->nik", dr, r),
                jnp.einsum("ij,nj->ni", dr, t) + dc[3:])

    def blocks(r, t):
        return jax.vmap(
            lambda p, o, rr, tt, kk, w: _gn_blocks(p, o, rr, tt, kk, w,
                                                   damping)
        )(points, target_2d, r, t, k_b, weights)

    def camera_step(carry, _):
        # reduced camera system summed over all objects. All matmuls in
        # this module run at f32 precision (f32_matmuls): the TPU's default
        # bf16 matmul datapath corrupts the ~1e8-condition normal equations
        # (measured divergence that vanished once traced f32).
        r, t, cam_r, cam_t = carry
        h_ii, _, b_i = blocks(r, t)
        h_c = jnp.sum(h_ii * ov[:, None, None], axis=0)
        b_c = jnp.sum(b_i * ov[:, None], axis=0)
        delta_c = jnp.linalg.solve(h_c + damping * jnp.eye(6), b_c)
        # a non-finite camera solve would poison every object — skip it
        delta_c = jnp.where(jnp.all(jnp.isfinite(delta_c)), delta_c, 0.0)
        r, t = apply_cam(delta_c, r, t)
        cam_r = axis_angle_to_matrix(delta_c[:3]) @ cam_r
        cam_t = axis_angle_to_matrix(delta_c[:3]) @ cam_t + delta_c[3:]
        return (r, t, cam_r, cam_t), None

    def object_step(carry, _):
        # independent local GN solves at the corrected camera (raw damped
        # solve: measured 1e-3 relative accuracy vs f64 on these systems)
        r, t, cam_r, cam_t = carry
        h_ii, _, b_i = blocks(r, t)
        delta_p = jnp.linalg.solve(h_ii, b_i[..., None])[..., 0]
        delta_p = delta_p * ov[:, None]
        # per-object guard: a non-finite local solve freezes the object
        delta_p = jnp.where(
            jnp.all(jnp.isfinite(delta_p), axis=-1, keepdims=True),
            delta_p, 0.0)
        dr = axis_angle_to_matrix(delta_p[:, :3])
        r = jnp.einsum("nij,njk->nik", dr, r)
        t = jnp.einsum("nij,nj->ni", dr, t) + delta_p[:, 3:]
        return (r, t, cam_r, cam_t), None

    carry = (rotations, translations, jnp.eye(3), jnp.zeros(3))
    if camera_only:
        # camera block alone, iterated
        carry, _ = jax.lax.scan(camera_step, carry, None, length=iterations)
    else:
        # alternating block descent (the regularized limit of the
        # gauge-singular joint system): camera consensus, object polish
        def both(carry, _):
            carry, _ = camera_step(carry, None)
            return object_step(carry, None)

        carry, _ = jax.lax.scan(both, carry, None, length=iterations)
    r, t, cam_r, cam_t = carry
    return {"rotations": r, "translations": t,
            "camera_rotation": cam_r, "camera_translation": cam_t}


@partial(jax.jit, static_argnames=("max_points", "iterations", "camera_only"))
@f32_matmuls
def pose_graph_from_flow(flow, occlusion, depth, ref_rotations,
                         ref_translations, pred_rotations, pred_translations,
                         k, object_valid, occlusion_threshold: float = 0.5,
                         max_points: int = 512, iterations: int = 3,
                         damping: float = 1e-3, camera_only: bool = True):
    """Scene pose-graph refinement from refiner outputs (one image's objects).

    Builds flow-derived 2D targets for every object of a scene — the
    object-frame 3D point rendered at each foreground pixel of the
    reference render (``depth``), displaced by the network's predicted
    flow (*image evidence*, ``flow_from_pred``, not the pose-induced
    flow) — then jointly refines all object poses plus the shared
    per-scene camera correction with :func:`solve_pose_graph`, starting
    from the per-object refined poses.

    BASELINE extension (SURVEY §2.10): no reference counterpart — the
    reference refines every object independently.

    Args:
      flow: (N, H, W, 2) predicted forward flow on the reference render.
      occlusion: (N, H, W) visibility confidence in [0, 1], or None.
      depth: (N, H, W) rendered depth at the reference pose.
      ref_rotations/(N,3,3), ref_translations/(N,3): rendering pose.
      pred_rotations/(N,3,3), pred_translations/(N,3): per-object refined
        poses (the pose-graph initialization).
      k: (3, 3) shared scene intrinsics, or (N, 3, 3) per-object crop
        intrinsics (the real eval path: each object's crop folds its own
        transform into K via adapt_intrinsic, data/loader.py).
      object_valid: (N,) 0/1 mask for padded object slots.
      camera_only: default True — apply only the shared camera correction
        (see solve_pose_graph: per-object re-solves against flow targets
        degrade direct-pose-head accuracy; measured in
        POSE_GRAPH_ABLATION.md).

    Returns dict(rotations, translations, camera_rotation,
    camera_translation), padded slots carrying their input poses.
    """
    flow = flow.astype(jnp.float32)
    depth = depth.astype(jnp.float32)
    n, h, w, _ = flow.shape
    k_b = jnp.broadcast_to(k.astype(jnp.float32), (n, 3, 3))
    _, points_3d, fg = depth_to_correspondences(depth, k_b, ref_rotations,
                                                ref_translations)
    target_2d = pixel_grid(h, w, flow.dtype)[None] + flow

    valid = fg
    if occlusion is not None:
        valid = valid & (occlusion > occlusion_threshold)
    vflat = valid.reshape(n, h * w).astype(flow.dtype)

    # deterministic fixed-budget subsample of valid pixels (Gumbel top-k
    # with a fixed key — eval must be reproducible)
    gumbel = jax.random.gumbel(jax.random.PRNGKey(0), (n, h * w))
    scores = jnp.where(vflat > 0, gumbel, -jnp.inf)
    _, idx = jax.lax.top_k(scores, max_points)
    p3 = jnp.take_along_axis(points_3d.reshape(n, h * w, 3),
                             idx[..., None], axis=1)
    p2 = jnp.take_along_axis(target_2d.reshape(n, h * w, 2),
                             idx[..., None], axis=1)
    weights = jnp.take_along_axis(vflat, idx, axis=1)

    # an object with too few valid points cannot anchor the shared camera;
    # freeze it (weights 0 + object_valid 0 keeps its pose at the input)
    enough = (jnp.sum(vflat, axis=-1) >= 16).astype(flow.dtype)
    ov = object_valid.astype(flow.dtype) * enough
    weights = weights * ov[:, None]

    out = solve_pose_graph(p3, p2, pred_rotations, pred_translations, k_b,
                           weights, object_valid=ov, damping=damping,
                           iterations=iterations, camera_only=camera_only)
    finite = (jnp.all(jnp.isfinite(out["rotations"]), axis=(-2, -1))
              & jnp.all(jnp.isfinite(out["translations"]), axis=-1))
    keep = (ov > 0) & finite
    keep = keep[:, None, None]
    return {
        "rotations": jnp.where(keep, out["rotations"], pred_rotations),
        "translations": jnp.where(keep[..., 0], out["translations"],
                                  pred_translations),
        "camera_rotation": out["camera_rotation"],
        "camera_translation": out["camera_translation"],
    }


@f32_matmuls
def solve_pose_graph_sharded(points, target_2d, rotations, translations, k,
                             weights, mesh, axis_name: str = "data",
                             damping: float = 1e-3, iterations: int = 3):
    """Distributed variant: objects sharded over the mesh's data axis; the
    Schur reductions become psums, back-substitution stays shard-local.
    ``k`` may be (3, 3) shared or (N, 3, 3) per-object (sharded with the
    objects)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    n = points.shape[0]
    k_b = jnp.broadcast_to(k, (n, 3, 3))

    def local(pts, tgt, r, t, kk, w):
        def apply_cam(dc, rr, tt):
            dr = axis_angle_to_matrix(dc[:3])
            return (jnp.einsum("ij,njk->nik", dr, rr),
                    jnp.einsum("ij,nj->ni", dr, tt) + dc[3:])

        def blocks(rr, tt):
            return jax.vmap(
                lambda p, o, a, b, kx, ww: _gn_blocks(p, o, a, b, kx, ww,
                                                      damping)
            )(pts, tgt, rr, tt, kk, w)

        # same alternating sequence as solve_pose_graph full mode; the
        # camera reductions are the only cross-shard part (two psums)
        def step(carry, _):
            rr, tt = carry
            h_ii, _, b_i = blocks(rr, tt)
            h_c = jax.lax.psum(jnp.sum(h_ii, axis=0), axis_name)
            b_c = jax.lax.psum(jnp.sum(b_i, axis=0), axis_name)
            delta_c = jnp.linalg.solve(h_c + damping * jnp.eye(6), b_c)
            rr, tt = apply_cam(delta_c, rr, tt)

            h_ii, _, b_i = blocks(rr, tt)
            delta_p = jnp.linalg.solve(h_ii, b_i[..., None])[..., 0]
            dr = axis_angle_to_matrix(delta_p[:, :3])
            rr = jnp.einsum("nij,njk->nik", dr, rr)
            tt = jnp.einsum("nij,nj->ni", dr, tt) + delta_p[:, 3:]
            return (rr, tt), None

        (rr, tt), _ = jax.lax.scan(step, (r, t), None, length=iterations)
        return rr, tt

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P(axis_name), P(axis_name), P(axis_name),
                             P(axis_name), P(axis_name), P(axis_name)),
                   out_specs=(P(axis_name), P(axis_name)))
    r_out, t_out = fn(points, target_2d, rotations, translations, k_b,
                      weights)
    return {"rotations": r_out, "translations": t_out}
