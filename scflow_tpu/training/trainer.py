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

    def resume(self, ckpt_dir: str | None = None, step: int | None = None):
        assert self.state is not None, "call init_state first (for the pytree shape)"
        ckpt_dir = ckpt_dir or os.path.join(self.cfg.work_dir, "checkpoints")
        self.state = restore_checkpoint(ckpt_dir, self.state, step)
        return self.state

    # -- logging ----------------------------------------------------------
    def _log(self, record: dict):
        os.makedirs(self.cfg.work_dir, exist_ok=True)
        if self._log_file is None:
            self._log_file = open(
                os.path.join(self.cfg.work_dir, "train_log.jsonl"), "a")
        self._log_file.write(json.dumps(record) + "\n")
        self._log_file.flush()
        msg = " ".join(f"{k}={v:.4g}" if isinstance(v, float) else f"{k}={v}"
                       for k, v in record.items())
        print(msg, flush=True)

    # -- training ---------------------------------------------------------
    def fit(self, batch_iterator: Iterator | Callable[[int], dict],
            num_steps: int | None = None,
            eval_every: int | None = None,
            eval_fn: Callable | None = None):
        """Run the training loop.

        batch_iterator: an iterator of batch dicts, or a callable
        ``step -> batch``.
        """
        num_steps = num_steps or self.cfg.optim.total_steps
        assert self.state is not None
        get_batch = (batch_iterator if callable(batch_iterator)
                     else lambda _s, _it=iter(batch_iterator): next(_it))
        ckpt_dir = os.path.join(self.cfg.work_dir, "checkpoints")

        t_last = time.perf_counter()
        start = int(self.state.step)
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
                               steps_per_s=self.cfg.log_interval / (now - t_last),
                               lr=float(self.schedule(step)))
                self._log(scalars)
                t_last = now

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
    def predict(self, batch: dict) -> dict:
        """Run refinement on one batch, returning numpy pose predictions."""
        assert self.state is not None
        if self.mesh is not None:
            batch = shard_batch(batch, self.mesh)
        out = self.eval_step(self.state.params, self.state.batch_stats, batch)
        return {k: np.asarray(v) for k, v in out.items()}
