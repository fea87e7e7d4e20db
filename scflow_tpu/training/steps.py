"""Train / eval step construction: render → forward → losses → update.

The functional equivalent of the reference's
``BaseRefiner.format_data_train_sup`` + ``SCFlowRefiner.loss`` +
optim-wrapper step (models/refiner/base_refiner.py:154-225,
scflow_refiner.py:182-256) as one jittable function. Device placement is
declared through shardings (params replicated, batch sharded on the mesh's
``data`` axis); XLA inserts the gradient all-reduce.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..geometry.flow import filter_flow_by_mask, flow_from_pose_and_depth
from ..losses import sequence_flow_loss, sequence_mask_loss, sequence_pose_loss
from ..models.refiner import RAFTRefiner, SCFlowRefiner
from ..rendering.renderer import Renderer
from .config import Config
from .points_bank import PointsBank


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any


def make_optimizer(cfg: Config):
    """AdamW + linear OneCycle + global-norm clip (reference recipe
    configs/refine_models/scflow_ycbv_pbr.py:282-303)."""
    # floor the horizon: degenerate schedules (< ~20 steps) produce NaN lrs
    schedule = optax.linear_onecycle_schedule(
        transition_steps=max(cfg.optim.total_steps, 100),
        peak_value=cfg.optim.lr,
        pct_start=cfg.optim.pct_start,
        pct_final=1.0 - cfg.optim.pct_start,
        div_factor=cfg.optim.div_factor,
        final_div_factor=cfg.optim.final_div_factor,
    )
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.optim.grad_clip_norm),
        optax.adamw(schedule, b1=cfg.optim.betas[0], b2=cfg.optim.betas[1],
                    eps=cfg.optim.eps, weight_decay=cfg.optim.weight_decay),
    )
    return tx, schedule


def build_model(cfg: Config):
    """Model-family dispatch (the reference selects the refiner class by
    config ``type=``, configs/refine_models/*.py): 'scflow' → SCFlowRefiner,
    'raft_flow'/'raft_flow_mask' → RAFTRefiner (pose via PnP at test)."""
    m = cfg.model
    dtype = jnp.bfloat16 if m.dtype == "bfloat16" else None
    if m.family in ("raft_flow", "raft_flow_mask"):
        return RAFTRefiner(
            separate_encoder=m.separate_encoder,
            h_channels=m.h_channels, cxt_channels=m.cxt_channels,
            feat_channels=m.feat_channels, net_type=m.net_type,
            num_levels=m.num_levels, radius=m.radius, iters=m.iters,
            predict_mask=(m.family == "raft_flow_mask"))
    if m.family != "scflow":
        raise ValueError(f"unknown model family {m.family!r}")
    return SCFlowRefiner(
        num_class=m.num_class, separate_encoder=m.separate_encoder,
        h_channels=m.h_channels, cxt_channels=m.cxt_channels,
        feat_channels=m.feat_channels, net_type=m.net_type,
        num_levels=m.num_levels, radius=m.radius, iters=m.iters,
        rotation_mode=m.rotation_mode, depth_transform=m.depth_transform,
        detach_depth_for_xy=m.detach_depth_for_xy,
        mask_flow=m.mask_flow, mask_corr=m.mask_corr, remat=m.remat,
        dtype=dtype)


def init_train_state(cfg: Config, model, tx, rng, sample_batch) -> TrainState:
    # always jit init: eager op-by-op dispatch is pathologically slow on TPU
    if isinstance(model, RAFTRefiner):
        variables = jax.jit(model.init)(
            rng, sample_batch["rendered_images"], sample_batch["real_images"])
    else:
        variables = jax.jit(model.init)(
            rng, sample_batch["rendered_images"], sample_batch["real_images"],
            sample_batch["ref_rotations"], sample_batch["ref_translations"],
            sample_batch["rendered_depths"], sample_batch["k"],
            sample_batch["labels"])
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats=batch_stats, opt_state=tx.init(params))


def render_at_pose(renderer: Renderer, rotations, translations, k, labels,
                   normalize_mean, normalize_std, mesh_bank=None):
    """Render + normalize, returning model-ready inputs.

    Equivalent of format_data's render step (base_refiner.py:186-199):
    rendered RGB normalized with the dataset's mean/std (in 0-255 scale,
    applied to [0,1] images), depth, and mask = depth > 0.

    ``mesh_bank``: pass the bank as a traced argument from enclosing jits
    (keeps mesh data out of the program constants — see Renderer.__call__).
    """
    out = renderer(rotations, translations, k, labels, mesh_bank=mesh_bank)
    mean = jnp.asarray(normalize_mean, jnp.float32) / 255.0
    std = jnp.asarray(normalize_std, jnp.float32) / 255.0
    images = (out["images"] - mean) / std
    return images, out["depth"], out["mask"].astype(jnp.float32)


def device_normalize_images(images, cfg: Config):
    """Normalize uint8 image batches ON DEVICE.

    Loaders ship raw uint8 crops (4× fewer host→device bytes than f32, 2×
    vs bf16 — the image upload bounds the eval pipeline on tunnel-attached
    chips); the math matches the host ``normalize_image``
    (data/pipeline.py:176: (u8 − mean)/std on the 0-255 scale). Float
    inputs pass through unchanged (already normalized on host).
    """
    if images.dtype == jnp.uint8:
        mean = jnp.asarray(cfg.data.normalize_mean, jnp.float32)
        std = jnp.asarray(cfg.data.normalize_std, jnp.float32)
        return (images.astype(jnp.float32) - mean) / std
    return images


def _normalize_batch(batch, cfg: Config):
    """Device-side normalization of uint8-shipped batch fields."""
    out = dict(batch)
    out["real_images"] = device_normalize_images(batch["real_images"], cfg)
    if "gt_masks" in batch and batch["gt_masks"].dtype == jnp.uint8:
        out["gt_masks"] = batch["gt_masks"].astype(jnp.float32)
    return out


def scflow_loss(params, batch_stats, batch, *, model: SCFlowRefiner,
                points_bank: PointsBank, cfg: Config, train: bool = True):
    """Full SCFlow training loss (scflow_refiner.py:182-256 semantics).

    batch keys: real_images, rendered_images, rendered_depths,
    rendered_masks, ref_rotations, ref_translations, gt_rotations,
    gt_translations, gt_masks, k, labels, sample_valid (optional per-sample
    0/1 weight for padded batch entries).
    """
    max_flow = cfg.model.max_flow
    batch = _normalize_batch(batch, cfg)
    sample_valid = batch.get("sample_valid")
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    mutable = ["batch_stats"] if (train and batch_stats) else False
    out = model.apply(variables, batch["rendered_images"],
                      batch["real_images"], batch["ref_rotations"],
                      batch["ref_translations"], batch["rendered_depths"],
                      batch["k"], batch["labels"], train=train,
                      sample_valid=sample_valid, mutable=mutable)
    if mutable:
        outputs, updates = out
        new_stats = updates.get("batch_stats", batch_stats)
    else:
        outputs, new_stats = out, batch_stats

    gt_flow = flow_from_pose_and_depth(
        batch["ref_rotations"], batch["ref_translations"],
        batch["gt_rotations"], batch["gt_translations"],
        batch["rendered_depths"], batch["k"], invalid_num=max_flow)
    if cfg.model.filter_invalid_flow and "gt_masks" in batch:
        gt_flow = filter_flow_by_mask(gt_flow, batch["gt_masks"],
                                      invalid_num=max_flow)

    points, point_valid, symmetric, diameters = points_bank.gather(
        batch["labels"])
    loss_pose, seq_pose = sequence_pose_loss(
        outputs.rotations, outputs.translations,
        batch["gt_rotations"], batch["gt_translations"],
        points, point_valid, symmetric, diameters,
        gamma=cfg.loss.gamma, loss_weight=cfg.loss.pose_weight,
        loss_type=cfg.loss.pose_loss_type,
        disentangled=cfg.loss.pose_disentangled,
        disentangle_z=cfg.loss.pose_disentangle_z,
        sample_weight=sample_valid)

    loss_flow, seq_flow = sequence_flow_loss(
        outputs.flow_from_pred, gt_flow, batch["rendered_masks"],
        gamma=cfg.loss.gamma, loss_weight=cfg.loss.flow_weight,
        max_flow=max_flow, sample_weight=sample_valid)

    # occlusion target: rendered pixels whose gt flow is valid
    # (scflow_refiner.py:228 uses a raw channel sum vs max_flow)
    gt_occ = (jnp.sum(gt_flow, axis=-1) < max_flow).astype(jnp.float32)
    loss_mask, seq_mask = sequence_mask_loss(
        outputs.masks[..., 0], gt_occ, gamma=cfg.loss.gamma,
        loss_weight=cfg.loss.mask_weight, sample_weight=sample_valid)

    loss = loss_pose + loss_flow + loss_mask
    metrics = {
        "loss": loss, "loss_pose": loss_pose, "loss_flow": loss_flow,
        "loss_mask": loss_mask,
        "seq_pose_loss": seq_pose, "seq_flow_loss": seq_flow,
        "seq_mask_loss": seq_mask,
    }
    return loss, (new_stats, metrics, outputs)


def raft_loss(params, batch_stats, batch, *, model: RAFTRefiner,
              points_bank: PointsBank, cfg: Config, train: bool = True):
    """RAFT refiner training loss: sequence flow L1 (+ occlusion-mask L1)
    against pose-derived GT flow (reference RAFTRefinerFlowMask.loss,
    raft_refiner_flow_mask.py:167-220). ``points_bank`` is unused (kept for
    signature parity with scflow_loss)."""
    max_flow = cfg.model.max_flow
    batch = _normalize_batch(batch, cfg)
    sample_valid = batch.get("sample_valid")
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    mutable = ["batch_stats"] if (train and batch_stats) else False
    out = model.apply(variables, batch["rendered_images"],
                      batch["real_images"], train=train,
                      sample_valid=sample_valid, mutable=mutable)
    if mutable:
        (flows, masks), updates = out
        new_stats = updates.get("batch_stats", batch_stats)
    else:
        (flows, masks), new_stats = out, batch_stats

    gt_flow = flow_from_pose_and_depth(
        batch["ref_rotations"], batch["ref_translations"],
        batch["gt_rotations"], batch["gt_translations"],
        batch["rendered_depths"], batch["k"], invalid_num=max_flow)
    if cfg.model.filter_invalid_flow and "gt_masks" in batch:
        gt_flow = filter_flow_by_mask(gt_flow, batch["gt_masks"],
                                      invalid_num=max_flow)

    loss_flow, seq_flow = sequence_flow_loss(
        flows, gt_flow, batch["rendered_masks"], gamma=cfg.loss.gamma,
        loss_weight=cfg.loss.flow_weight, max_flow=max_flow,
        sample_weight=sample_valid)
    metrics = {"loss_flow": loss_flow, "seq_flow_loss": seq_flow,
               "loss_pose": jnp.zeros(())}
    loss = loss_flow
    if masks is not None:
        gt_occ = (jnp.sum(gt_flow, axis=-1) < max_flow).astype(jnp.float32)
        loss_mask, seq_mask = sequence_mask_loss(
            masks[..., 0], gt_occ, gamma=cfg.loss.gamma,
            loss_weight=cfg.loss.mask_weight, sample_weight=sample_valid)
        loss = loss + loss_mask
        metrics.update(loss_mask=loss_mask, seq_mask_loss=seq_mask)
    metrics["loss"] = loss
    return loss, (new_stats, metrics, (flows, masks))


def _loss_fn_for(model):
    return raft_loss if isinstance(model, RAFTRefiner) else scflow_loss


def make_train_step(model: SCFlowRefiner, renderer: Renderer,
                    points_bank: PointsBank, cfg: Config, tx,
                    donate: bool = False):
    """Build the jittable train step: batch carries raw poses; rendering
    happens on device inside the step. ``donate=True`` donates the input
    state buffers (use in the real training loop; keep False when the same
    state object is reused, e.g. in tests).

    The mesh bank rides as a jit ARGUMENT (closed over by the returned
    wrapper, not by the traced program) — constant-free programs compile
    orders of magnitude faster on the remote-compile TPU path."""
    bank = renderer.mesh_bank.with_tri_tables()

    def train_step(state: TrainState, batch, mesh_bank):
        rendered, depth, mask = render_at_pose(
            renderer, batch["ref_rotations"], batch["ref_translations"],
            batch["k"], batch["labels"],
            cfg.data.normalize_mean, cfg.data.normalize_std,
            mesh_bank=mesh_bank)
        full_batch = dict(batch, rendered_images=rendered,
                          rendered_depths=depth, rendered_masks=mask)

        grad_fn = jax.value_and_grad(_loss_fn_for(model), has_aux=True)
        (loss, (new_stats, metrics, _)), grads = grad_fn(
            state.params, state.batch_stats, full_batch, model=model,
            points_bank=points_bank, cfg=cfg, train=True)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=new_stats, opt_state=new_opt)
        return new_state, metrics

    jitted = jax.jit(train_step, donate_argnums=(0,) if donate else ())

    def step(state, batch):
        return jitted(state, batch, bank)

    return step


def make_multi_cycle_train_step(model: SCFlowRefiner, renderer: Renderer,
                                points_bank: PointsBank, cfg: Config, tx,
                                cycles: int = 2):
    """Multi-cycle training: loss/step, then re-render at the refined pose
    and repeat (reference train_multiple_iterations,
    base_refiner.py:254-281). The optimizer steps after every cycle; the
    next cycle's reference pose is the detached last-iteration prediction.
    """
    assert not isinstance(model, RAFTRefiner), \
        "multi-cycle training needs in-loop poses (SCFlow family only)"
    bank = renderer.mesh_bank.with_tri_tables()

    def one_cycle(state: TrainState, batch, mesh_bank):
        rendered, depth, mask = render_at_pose(
            renderer, batch["ref_rotations"], batch["ref_translations"],
            batch["k"], batch["labels"],
            cfg.data.normalize_mean, cfg.data.normalize_std,
            mesh_bank=mesh_bank)
        full = dict(batch, rendered_images=rendered, rendered_depths=depth,
                    rendered_masks=mask)
        grad_fn = jax.value_and_grad(scflow_loss, has_aux=True)
        (loss, (new_stats, metrics, outputs)), grads = grad_fn(
            state.params, state.batch_stats, full, model=model,
            points_bank=points_bank, cfg=cfg, train=True)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        state = state.replace(step=state.step + 1, params=new_params,
                              batch_stats=new_stats, opt_state=new_opt)
        new_ref_r = jax.lax.stop_gradient(outputs.rotations[-1])
        new_ref_t = jax.lax.stop_gradient(outputs.translations[-1])
        return state, metrics, new_ref_r, new_ref_t

    def train_step(state: TrainState, batch, mesh_bank):
        all_metrics = []
        for _ in range(cycles):
            state, metrics, ref_r, ref_t = one_cycle(state, batch, mesh_bank)
            batch = dict(batch, ref_rotations=ref_r, ref_translations=ref_t)
            all_metrics.append(metrics)
        merged = {f"cycle{i}_loss": m["loss"]
                  for i, m in enumerate(all_metrics)}
        merged.update(all_metrics[-1])
        return state, merged

    jitted = jax.jit(train_step)
    return lambda state, batch: jitted(state, batch, bank)


def make_panel_step(model: SCFlowRefiner, renderer: Renderer, cfg: Config):
    """Jitted observability step: run the refiner on a train batch and
    return sample-0 panel arrays (real | render | gt/pose/pred flow | mask)
    plus the per-iteration EPE vector — the device side of the reference's
    TensorboardImgLoggerHook + eval_seq_epe
    (models/utils/tensorboard_hook.py:87-120, base_refiner.py:464-480).
    """
    assert not isinstance(model, RAFTRefiner), \
        "panels use in-loop poses (SCFlow family)"
    max_flow = cfg.model.max_flow
    mean = jnp.asarray(cfg.data.normalize_mean, jnp.float32) / 255.0
    std = jnp.asarray(cfg.data.normalize_std, jnp.float32) / 255.0
    bank = renderer.mesh_bank.with_tri_tables()

    def panel_step(params, batch_stats, batch, mesh_bank):
        batch = _normalize_batch(batch, cfg)
        rendered, depth, rmask = render_at_pose(
            renderer, batch["ref_rotations"], batch["ref_translations"],
            batch["k"], batch["labels"],
            cfg.data.normalize_mean, cfg.data.normalize_std,
            mesh_bank=mesh_bank)
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        outputs = model.apply(variables, rendered, batch["real_images"],
                              batch["ref_rotations"],
                              batch["ref_translations"], depth, batch["k"],
                              batch["labels"], train=False)
        gt_flow = flow_from_pose_and_depth(
            batch["ref_rotations"], batch["ref_translations"],
            batch["gt_rotations"], batch["gt_translations"], depth,
            batch["k"], invalid_num=max_flow)
        if cfg.model.filter_invalid_flow and "gt_masks" in batch:
            gt_flow = filter_flow_by_mask(gt_flow, batch["gt_masks"],
                                          invalid_num=max_flow)
        valid = (jnp.linalg.norm(gt_flow, axis=-1) < max_flow) & (rmask > 0.5)
        w = valid.astype(jnp.float32)
        err = jnp.linalg.norm(outputs.flow_from_pred - gt_flow[None],
                              axis=-1)  # (T, N, H, W)
        epe = (jnp.sum(err * w[None], axis=(1, 2, 3))
               / jnp.maximum(jnp.sum(w), 1.0))
        return {
            "real": batch["real_images"][0] * std + mean,
            "render": rendered[0] * std + mean,
            "gt_flow": gt_flow[0],
            "pose_flow": outputs.flow_from_pose[-1, 0],
            "pred_flow": outputs.flow_from_pred[-1, 0],
            "mask": outputs.masks[-1, 0, ..., 0],
            "epe_per_iter": epe,
        }

    jitted = jax.jit(panel_step)
    return lambda params, batch_stats, batch: jitted(params, batch_stats,
                                                     batch, bank)


def _eval_step_core(model: SCFlowRefiner, renderer: Renderer, cfg: Config):
    """Unjitted eval-step body taking the mesh bank as an argument
    (compose-able: multi-pass wraps it without re-baking constants)."""

    def eval_step(params, batch_stats, batch, mesh_bank):
        batch = _normalize_batch(batch, cfg)
        rendered, depth, _ = render_at_pose(
            renderer, batch["ref_rotations"], batch["ref_translations"],
            batch["k"], batch["labels"],
            cfg.data.normalize_mean, cfg.data.normalize_std,
            mesh_bank=mesh_bank)
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        if isinstance(model, RAFTRefiner):
            # flow(+occlusion) → batched RANSAC-EPnP, ref-pose fallback
            # (reference raft_refiner_flow_mask.py:133-159)
            from ..models.flow_pose import solve_pose_from_flow

            flows, masks = model.apply(variables, rendered,
                                       batch["real_images"], train=False,
                                       iters=cfg.model.test_iters)
            occ = masks[-1][..., 0] if masks is not None else None
            solved = solve_pose_from_flow(
                jax.random.PRNGKey(0), flows[-1], occ, depth,
                batch["ref_rotations"], batch["ref_translations"],
                batch["k"])
            return {
                "rotations": solved["rotations"],
                "translations": solved["translations"],
                "masks": (masks[-1] if masks is not None
                          else jnp.ones(flows[-1].shape[:-1] + (1,))),
                "flow": flows[-1],
                "depth": depth,
                "ref_rotations": batch["ref_rotations"],
                "ref_translations": batch["ref_translations"],
                "pnp_valid": solved["valid"],
            }
        outputs = model.apply(variables, rendered, batch["real_images"],
                              batch["ref_rotations"], batch["ref_translations"],
                              depth, batch["k"], batch["labels"], train=False,
                              iters=cfg.model.test_iters,
                              lowres=cfg.model.lowres_eval)
        return {
            "rotations": outputs.rotations[-1],
            "translations": outputs.translations[-1],
            "masks": outputs.masks[-1],
            "flow": outputs.flow_from_pred[-1],
            "depth": depth,
            "ref_rotations": batch["ref_rotations"],
            "ref_translations": batch["ref_translations"],
        }

    return eval_step


def make_eval_step(model: SCFlowRefiner, renderer: Renderer, cfg: Config):
    """Inference step: render at ref pose, refine, return last-iter pose.

    (Pose remapping back to the original image happens host-side in the
    eval loop, like the reference's remap_pose_to_origin_resoluaion.)
    """
    core = _eval_step_core(model, renderer, cfg)
    bank = renderer.mesh_bank.with_tri_tables()
    jitted = jax.jit(core)

    def step(params, batch_stats, batch):
        return jitted(params, batch_stats, batch, bank)

    # expose the unjitted body + bank so enclosing jits can inline the step
    # with the bank as an ARGUMENT (constant-free programs — see MeshBank)
    step.core = core
    step.bank = bank
    return step


def make_multi_pass_eval_step(model: SCFlowRefiner, renderer: Renderer,
                              cfg: Config, passes: int = 2):
    """Multi-pass inference: refine, re-render at the refined pose, refine
    again (reference forward_multiple_pass, base_refiner.py:283-294)."""
    core = _eval_step_core(model, renderer, cfg)
    bank = renderer.mesh_bank.with_tri_tables()

    def eval_step(params, batch_stats, batch, mesh_bank):
        out = None
        for _ in range(passes):
            out = core(params, batch_stats, batch, mesh_bank)
            batch = dict(batch, ref_rotations=out["rotations"],
                         ref_translations=out["translations"])
        return out

    jitted = jax.jit(eval_step)
    return lambda params, batch_stats, batch: jitted(params, batch_stats,
                                                     batch, bank)
