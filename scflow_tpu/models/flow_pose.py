"""Flow → pose solving for the RAFT refiner family (test-time PnP).

Functional re-design of the reference ``BaseFlowRefiner.solve_pose``
(models/refiner/base_flow_refiner.py:99-155): build 2D-3D correspondences
from predicted forward flow + rendered depth, filter by occlusion
confidence, subsample to a fixed budget, and solve batched RANSAC-EPnP —
falling back to the reference pose when too few valid points survive.

Everything is fixed-shape and jit/vmap friendly (weighted points replace
the reference's variable-length lists).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..geometry.pnp import ransac_pnp
from ..geometry.projection import depth_to_correspondences, pixel_grid


@partial(jax.jit, static_argnames=("max_points", "num_hypotheses"))
def solve_pose_from_flow(key, flow, occlusion, depth, ref_rotations,
                         ref_translations, k, occlusion_threshold: float = 0.5,
                         max_points: int = 1024, num_hypotheses: int = 64,
                         inlier_threshold: float = 3.0,
                         min_valid_points: int = 16):
    """Batched flow→pose.

    Args:
      key: PRNG key.
      flow: (N, H, W, 2) predicted forward flow (render → real).
      occlusion: (N, H, W) occlusion confidence in [0, 1] (1 = visible) or
        None to skip the filter.
      depth: (N, H, W) rendered depth at the reference pose.
      ref_rotations/(N,3,3), ref_translations/(N,3): rendering pose
        (fallback when PnP is under-determined).
      k: (N, 3, 3) intrinsics.

    Returns dict(rotations (N,3,3), translations (N,3), valid (N,) bool).
    """
    n, h, w, _ = flow.shape
    _, points_3d, fg = depth_to_correspondences(depth, k, ref_rotations,
                                                ref_translations)
    grid = pixel_grid(h, w, flow.dtype)
    target_2d = grid[None] + flow                     # (N, H, W, 2)

    valid = fg
    if occlusion is not None:
        valid = valid & (occlusion > occlusion_threshold)
    valid_f = valid.astype(flow.dtype)

    p3 = points_3d.reshape(n, h * w, 3)
    p2 = target_2d.reshape(n, h * w, 2)
    vflat = valid_f.reshape(n, h * w)

    # fixed-budget random subsample of valid points (Gumbel top-k)
    key, sub = jax.random.split(key)
    gumbel = jax.random.gumbel(sub, (n, h * w))
    scores = jnp.where(vflat > 0, gumbel, -jnp.inf)
    _, idx = jax.lax.top_k(scores, max_points)        # (N, P)
    p3s = jnp.take_along_axis(p3, idx[..., None], axis=1)
    p2s = jnp.take_along_axis(p2, idx[..., None], axis=1)
    ws = jnp.take_along_axis(vflat, idx, axis=1)

    keys = jax.random.split(key, n)

    def solve_one(kk, pts3, pts2, wts, kcam):
        return ransac_pnp(kk, pts3, pts2, kcam, weights=wts,
                          num_hypotheses=num_hypotheses,
                          inlier_threshold=inlier_threshold)

    out = jax.vmap(solve_one)(keys, p3s, p2s, ws, k)

    enough = jnp.sum(vflat, axis=-1) >= min_valid_points
    finite = (jnp.all(jnp.isfinite(out["rotation"]), axis=(-2, -1))
              & jnp.all(jnp.isfinite(out["translation"]), axis=-1))
    ok = enough & finite & (out["num_inliers"] >= 4)
    rotations = jnp.where(ok[:, None, None], out["rotation"], ref_rotations)
    translations = jnp.where(ok[:, None], out["translation"], ref_translations)
    return {"rotations": rotations, "translations": translations, "valid": ok}
