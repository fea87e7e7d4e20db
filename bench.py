"""Benchmark: batched pose-refinement throughput on the current device.

Measures end-to-end refinement frames/s (render at initial pose + SCFlow
8-iteration refinement, BASELINE.md config 2 shapes: 256² crops, 4-level
pyramid, radius 4, batched single-host inference at batch 32 — throughput
saturates there; per-call dispatch overhead of the remote-TPU tunnel is
amortized) and prints ONE JSON line.

Baseline: the CUDA reference publishes no numbers (BASELINE.md); the SCFlow
paper reports ~35 ms/frame end-to-end on an RTX 3090 (~28.6 fps). We use
30 fps as the notional reference-per-chip baseline; ``vs_baseline`` is
measured_fps / 30. The driver-set target is ≥ 5×.
"""
import json
import sys
import time

import jax

from scflow_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
import jax.numpy as jnp

REFERENCE_FPS = 30.0


def main(batch=32, iters=8, image_size=(256, 256), num_class=21, steps=10):
    from scflow_tpu.data import synthetic_batch
    from scflow_tpu.rendering import Renderer, make_test_meshes
    from scflow_tpu.training import (Config, ModelConfig, build_model,
                                     make_eval_step)

    cfg = Config(model=ModelConfig(num_class=num_class, iters=iters,
                                   test_iters=iters))
    bank = make_test_meshes(num_classes=num_class, subdivisions=2, radius=60.0)
    renderer = Renderer(bank, image_size=image_size)
    model = build_model(cfg)

    batch_data = synthetic_batch(jax.random.PRNGKey(0), renderer, batch)
    from scflow_tpu.training import render_at_pose

    rendered, depth, _ = render_at_pose(
        renderer, batch_data["ref_rotations"], batch_data["ref_translations"],
        batch_data["k"], batch_data["labels"], cfg.data.normalize_mean,
        cfg.data.normalize_std)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(1), rendered, batch_data["real_images"],
        batch_data["ref_rotations"], batch_data["ref_translations"], depth,
        batch_data["k"], batch_data["labels"])
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    eval_step = make_eval_step(model, renderer, cfg)

    # warmup / compile
    out = eval_step(params, batch_stats, batch_data)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for _ in range(steps):
        out = eval_step(params, batch_stats, batch_data)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    fps = batch * steps / dt
    print(json.dumps({
        "metric": "refinement_throughput",
        "value": round(fps, 2),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / REFERENCE_FPS, 3),
    }))


if __name__ == "__main__":
    kwargs = {}
    if len(sys.argv) > 1:
        kwargs["batch"] = int(sys.argv[1])
    if len(sys.argv) > 2:
        kwargs["iters"] = int(sys.argv[2])
    main(**kwargs)
