"""Training and evaluation loops (the mmengine Runner replacement).

- ``Trainer``: iter-based training (reference IterBasedTrainLoop, 100k
  iters) with periodic logging, checkpointing, and optional eval; batches
  come from any callable iterator (synthetic generator or the BOP loader).
- ``evaluate``: sharded eval driving the ADD metric.
"""
from __future__ import annotations

import dataclasses
import json
import os
import time
from collections.abc import Callable, Iterator

import jax
import numpy as np

from ..parallel.mesh import make_mesh, shard_batch
from ..rendering.renderer import Renderer
from .checkpoint import restore_checkpoint, save_checkpoint
from .config import Config
from .points_bank import PointsBank
from .steps import (TrainState, build_model, init_train_state, make_eval_step,
                    make_optimizer, make_train_step)


@dataclasses.dataclass
class Trainer:
    cfg: Config
    renderer: Renderer
    points_bank: PointsBank
    use_mesh: bool = True

    def __post_init__(self):
        self.model = build_model(self.cfg)
        self.tx, self.schedule = make_optimizer(self.cfg)
        self.mesh = make_mesh() if self.use_mesh else None
        if self.cfg.model.train_cycles > 1:
            from .steps import make_multi_cycle_train_step

            self.train_step = make_multi_cycle_train_step(
                self.model, self.renderer, self.points_bank, self.cfg,
                self.tx, cycles=self.cfg.model.train_cycles)
        else:
            self.train_step = make_train_step(self.model, self.renderer,
                                              self.points_bank, self.cfg,
                                              self.tx, donate=True)
        if self.cfg.model.test_passes > 1:
            from .steps import make_multi_pass_eval_step

            self.eval_step = make_multi_pass_eval_step(
                self.model, self.renderer, self.cfg,
                passes=self.cfg.model.test_passes)
        else:
            self.eval_step = make_eval_step(self.model, self.renderer,
                                            self.cfg)
        self.state: TrainState | None = None
        self._log_file = None

    # -- state ------------------------------------------------------------
    def init_state(self, sample_batch, rng=None):
        rng = rng if rng is not None else jax.random.PRNGKey(self.cfg.seed)
        self.state = init_train_state(self.cfg, self.model, self.tx, rng,
                                      sample_batch)
        return self.state

    def init_eval_state(self, batch_size: int = 16, rng=None):
        """Initialize state for evaluation without any dataset sample (and
        without fabricated GT): shapes come from the config, inputs from a
        render at a canonical in-frame pose."""
        import jax.numpy as jnp

        from ..data.synthetic import default_intrinsics
        from .steps import render_at_pose

        h, w = self.renderer.image_size
        n = batch_size
        batch = {
            "ref_rotations": jnp.tile(jnp.eye(3), (n, 1, 1)),
            "ref_translations": jnp.tile(jnp.asarray([0.0, 0.0, 600.0]),
                                         (n, 1)),
            "k": jnp.tile(default_intrinsics((h, w)), (n, 1, 1)),
            "labels": jnp.zeros((n,), jnp.int32),
        }
        rendered, depth, mask = render_at_pose(
            self.renderer, batch["ref_rotations"], batch["ref_translations"],
            batch["k"], batch["labels"], self.cfg.data.normalize_mean,
            self.cfg.data.normalize_std)
        sample = dict(batch, real_images=rendered, rendered_images=rendered,
                      rendered_depths=depth, rendered_masks=mask)
        return self.init_state(sample, rng)

    def load_torch_checkpoint(self, path: str) -> dict:
        """Load a reference torch ``.pth`` into the live state (the
        reference ``load_checkpoint=`` eval entry,
        configs/refine_models/scflow_ycbv_pbr.py:276-279). Returns the
        coverage report (covered/missing/unused leaf lists)."""
        from .checkpoint import load_torch_checkpoint

        assert self.state is not None, \
            "call init_state/init_eval_state first (for the pytree shape)"
        family = "raft" if self.cfg.model.family.startswith("raft") \
            else "scflow"
        variables = {"params": self.state.params}
        if self.state.batch_stats:
            variables["batch_stats"] = self.state.batch_stats
        merged, report = load_torch_checkpoint(
            path, variables,
            separate_encoder=self.cfg.model.separate_encoder, family=family)
        self.state = self.state.replace(
            params=merged["params"],
            batch_stats=merged.get("batch_stats", self.state.batch_stats))
        return report

    def resume(self, ckpt_dir: str | None = None, step: int | None = None):
        assert self.state is not None, "call init_state first (for the pytree shape)"
        ckpt_dir = ckpt_dir or os.path.join(self.cfg.work_dir, "checkpoints")
        self.state = restore_checkpoint(ckpt_dir, self.state, step)
        return self.state

    # -- logging ----------------------------------------------------------
    @property
    def tb_writer(self):
        """Lazy TensorBoard event writer (None when cfg.tensorboard=False)."""
        if not self.cfg.tensorboard:
            return None
        if getattr(self, "_tb_writer", None) is None:
            from ..utils.tb_writer import TBEventWriter

            self._tb_writer = TBEventWriter(
                os.path.join(self.cfg.work_dir, "tb"))
        return self._tb_writer

    def _log(self, record: dict):
        os.makedirs(self.cfg.work_dir, exist_ok=True)
        if self._log_file is None:
            self._log_file = open(
                os.path.join(self.cfg.work_dir, "train_log.jsonl"), "a")
        self._log_file.write(json.dumps(record) + "\n")
        self._log_file.flush()
        tb = self.tb_writer
        if tb is not None and "step" in record:
            tb.add_scalars({k: v for k, v in record.items()
                            if k != "step" and isinstance(v, (int, float))},
                           int(record["step"]))
            tb.flush()
        msg = " ".join(f"{k}={v:.4g}" if isinstance(v, float) else f"{k}={v}"
                       for k, v in record.items())
        print(msg, flush=True)

    # -- training ---------------------------------------------------------
    def fit(self, batch_iterator: Iterator | Callable[[int], dict],
            num_steps: int | None = None,
            eval_every: int | None = None,
            eval_fn: Callable | None = None,
            panel_every: int | None = None):
        """Run the training loop.

        batch_iterator: an iterator of batch dicts, or a callable
        ``step -> batch``.
        eval_every/eval_fn: run ``eval_fn(self) -> dict`` every N steps and
        log the returned scalars under ``eval/``.
        panel_every: dump [real|render|gt/pose/pred flow|mask] image panels
        and per-iteration EPE to work_dir every N steps (the reference's
        TensorboardImgLoggerHook interval, configs/..._pbr.py:328).
        """
        num_steps = num_steps or self.cfg.optim.total_steps
        assert self.state is not None
        get_batch = (batch_iterator if callable(batch_iterator)
                     else lambda _s, _it=iter(batch_iterator): next(_it))
        ckpt_dir = os.path.join(self.cfg.work_dir, "checkpoints")

        panel_step = image_logger = None
        if panel_every:
            from ..models.refiner import RAFTRefiner
            from .logging import ImageLogger
            from .steps import make_panel_step

            if not isinstance(self.model, RAFTRefiner):
                panel_step = make_panel_step(self.model, self.renderer,
                                             self.cfg)
                image_logger = ImageLogger(self.cfg.work_dir,
                                           interval=panel_every)

        t_last = time.perf_counter()
        start = int(self.state.step)
        last_logged = start
        for step in range(start, num_steps):
            batch = get_batch(step)
            if self.mesh is not None:
                batch = shard_batch(batch, self.mesh)
            self.state, metrics = self.train_step(self.state, batch)

            if step == start or (step + 1) % self.cfg.log_interval == 0:
                now = time.perf_counter()
                scalars = {k: float(v) for k, v in metrics.items()
                           if np.ndim(v) == 0}
                scalars.update(step=step + 1,
                               steps_per_s=(step + 1 - last_logged)
                               / max(now - t_last, 1e-9),
                               lr=float(self.schedule(step)))
                self._log(scalars)
                t_last = now
                last_logged = step + 1

            if panel_step is not None and (step + 1) % panel_every == 0 \
                    and "gt_rotations" in batch:
                from .logging import make_train_panel

                p = {k: np.asarray(v) for k, v in panel_step(
                    self.state.params, self.state.batch_stats, batch).items()}
                panel = make_train_panel(p["real"], p["render"], p["gt_flow"],
                                         p["pose_flow"], p["pred_flow"],
                                         mask=p["mask"],
                                         max_flow=self.cfg.model.max_flow)
                image_logger.log_panel(step + 1, "train_panel", panel)
                self._log({"step": step + 1,
                           **{f"epe_iter{i}": float(v)
                              for i, v in enumerate(p["epe_per_iter"])}})

            if (step + 1) % self.cfg.checkpoint_interval == 0:
                save_checkpoint(ckpt_dir, self.state, step + 1)

            if eval_every and eval_fn and (step + 1) % eval_every == 0:
                eval_metrics = eval_fn(self)
                self._log({"step": step + 1,
                           **{f"eval/{k}": v for k, v in eval_metrics.items()}})
        if num_steps > start:
            # always leave a final checkpoint (reference CheckpointHook saves
            # on schedule only; a trailing save makes short runs resumable)
            save_checkpoint(ckpt_dir, self.state, num_steps)
        return self.state

    # -- evaluation -------------------------------------------------------
    def predict(self, batch: dict, keys: tuple | None = None,
                sync: bool = True) -> dict:
        """Run refinement on one batch, returning numpy pose predictions.

        ``keys`` selects which outputs to fetch to the host — by default
        only the poses (+ ``pnp_valid`` when present). The dense outputs
        (flow / masks / depth, ~1 MB/slot) stay on device unless asked
        for: pulling them dominated eval wall-time (device→host transfer
        was ~30× the refinement step itself).

        ``sync=False`` returns the selected outputs as *device* arrays
        without blocking — JAX dispatch is async, so the caller can keep
        doing host work (packing the next batch, metric matching) while
        the step runs, and materialize with ``np.asarray`` later.
        """
        assert self.state is not None
        if (self.cfg.model.dtype == "bfloat16" and "real_images" in batch
                and np.asarray(batch["real_images"]).dtype != np.uint8):
            # float batches: cast ON HOST before the host→device transfer
            # to halve its bytes. uint8 batches ship raw (1 byte/px, the
            # loader default) and normalize on device — the transfer, not
            # the step, bounds eval over the single-chip tunnel.
            import ml_dtypes

            batch = dict(batch, real_images=np.asarray(
                batch["real_images"]).astype(ml_dtypes.bfloat16))
        if self.mesh is not None:
            batch = shard_batch(batch, self.mesh)
        out = self.eval_step(self.state.params, self.state.batch_stats, batch)
        if keys is None:
            keys = ("rotations", "translations", "pnp_valid")
        out = {k: v for k, v in out.items() if k in keys}
        if not sync:
            return out
        return {k: np.asarray(v) for k, v in out.items()}
