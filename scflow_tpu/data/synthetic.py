"""On-device synthetic pose-refinement data.

Self-contained scene generator used by tests, benchmarks and the smoke
trainer: the "real" image is a render at the GT pose, the reference pose is
an SE(3)-jittered GT (the JAX analogue of the reference ``PoseJitter``
pipeline stage, datasets/pipelines/jitter.py:51-109 — clipped Gaussian
instead of rejection sampling so shapes stay static).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..geometry.rotation import axis_angle_to_matrix, random_rotation
from ..rendering.renderer import Renderer
from ..training.config import JitterConfig

from ..utils.precision import f32_matmuls


def default_intrinsics(image_size: tuple[int, int], focal: float = 500.0):
    h, w = image_size
    return jnp.asarray([[focal, 0.0, w / 2.0], [0.0, focal, h / 2.0],
                        [0.0, 0.0, 1.0]], jnp.float32)


@f32_matmuls
def jitter_pose(key, rotations, translations, cfg: JitterConfig):
    """Gaussian SE(3) jitter, batched: random-axis rotation with clipped
    Gaussian angle, clipped Gaussian xyz translation offsets."""
    n = rotations.shape[0]
    k1, k2, k3 = jax.random.split(key, 3)
    axis = jax.random.normal(k1, (n, 3))
    axis = axis / jnp.maximum(jnp.linalg.norm(axis, axis=-1, keepdims=True), 1e-8)
    angle = jax.random.normal(k2, (n,)) * jnp.deg2rad(cfg.angle_std_deg)
    limit = jnp.deg2rad(cfg.angle_limit_deg)
    angle = jnp.clip(angle, -limit, limit)
    r_delta = axis_angle_to_matrix(axis * angle[:, None])

    t_noise = jax.random.normal(k3, (n, 3)) * jnp.asarray(
        [cfg.xy_std_mm, cfg.xy_std_mm, cfg.z_std_mm])
    t_norm = jnp.linalg.norm(t_noise, axis=-1, keepdims=True)
    scale = jnp.minimum(1.0, cfg.translation_limit_mm / jnp.maximum(t_norm, 1e-8))
    t_noise = t_noise * scale
    return jnp.matmul(r_delta, rotations), translations + t_noise


@partial(jax.jit, static_argnames=("renderer", "batch_size", "jitter_cfg"))
def _synthetic_batch_impl(key, renderer: Renderer, batch_size: int,
                          jitter_cfg: JitterConfig, depth_range: tuple,
                          mesh_bank):
    h, w = renderer.image_size
    num_class = renderer.mesh_bank.num_classes
    k_pose, k_label, k_depth, k_xy, k_jit = jax.random.split(key, 5)

    labels = jax.random.randint(k_label, (batch_size,), 0, num_class)
    gt_r = random_rotation(k_pose, (batch_size,))
    z = jax.random.uniform(k_depth, (batch_size,), minval=depth_range[0],
                           maxval=depth_range[1])
    # keep the object near the principal axis so it stays in frame
    xy = jax.random.uniform(k_xy, (batch_size, 2), minval=-30.0, maxval=30.0)
    gt_t = jnp.concatenate([xy, z[:, None]], axis=-1)

    k_intr = jnp.tile(default_intrinsics((h, w)), (batch_size, 1, 1))
    real = renderer(gt_r, gt_t, k_intr, labels, mesh_bank=mesh_bank)
    ref_r, ref_t = jitter_pose(k_jit, gt_r, gt_t, jitter_cfg)

    return {
        "real_images": real["images"],
        "gt_masks": real["mask"].astype(jnp.float32),
        "gt_rotations": gt_r,
        "gt_translations": gt_t,
        "ref_rotations": ref_r,
        "ref_translations": ref_t,
        "k": k_intr,
        "labels": labels,
    }


def synthetic_batch(key, renderer: Renderer, batch_size: int,
                    jitter_cfg: JitterConfig = JitterConfig(),
                    depth_range: tuple = (500.0, 900.0)):
    """Generate one training batch entirely on device.

    Returns the train-step batch dict: real_images (normalized to [0,1]
    with the default 0/255 normalization), gt/ref poses, gt_masks, k,
    labels. The mesh bank enters the jitted program as an argument (not as
    baked constants — see Renderer.__call__).
    """
    return _synthetic_batch_impl(key, renderer, batch_size, jitter_cfg,
                                 depth_range,
                                 renderer.mesh_bank.with_tri_tables())
