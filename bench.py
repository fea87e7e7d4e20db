"""Benchmark: batched pose-refinement throughput with per-phase breakdown.

Measures end-to-end refinement frames/s (render at initial pose + SCFlow
8-iteration refinement, BASELINE.md config 2 shapes: 256² crops, 4-level
pyramid, radius 4, batch 32) on realistic mesh complexity (1280-face
icospheres ≈ the models_1024 eval meshes), in f32 AND bf16, plus:

- per-phase mean ms (render / encoders / correlation-pyramid build /
  GRU-loop remainder) via PhaseTimer (SURVEY.md §3.1 hot-spot map);
- achieved TFLOP/s and MFU from XLA ``cost_analysis`` flops and the chip's
  peak (device-kind table).

Baseline: the CUDA reference publishes no numbers (BASELINE.md) — the
30 fps "baseline" is NOTIONAL, taken from the SCFlow paper's ~35 ms/frame
end-to-end on an RTX 3090 (~28.6 fps). ``vs_baseline`` = headline_fps / 30.
The driver-set target is ≥ 5×.

Prints ONE JSON line (headline = best-precision full-path throughput).
"""
import json
import sys
import time

import jax

from scflow_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
import jax.numpy as jnp

REFERENCE_FPS = 30.0

# peak dense matmul TFLOP/s per chip (bf16; f32 inputs are rounded through
# the MXU's bf16 datapath on TPU, so one table serves both rows)
_PEAK_TFLOPS = {
    "TPU v2": 45.0, "TPU v3": 123.0, "TPU v4": 275.0, "TPU v5e": 197.0,
    "TPU v5 lite": 197.0, "TPU v5p": 459.0, "TPU v6e": 918.0,
    "TPU v6 lite": 918.0, "TPU7x": 2307.0,
}


def _timeit(fn, args, steps, timer=None, phase=None):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / steps


def _flops_of(fn, *args):
    try:
        comp = jax.jit(fn).lower(*args).compile()
        ca = comp.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return float(ca.get("flops", 0.0))
    except Exception:
        return 0.0


def main(batch=32, iters=8, image_size=(256, 256), num_class=21, steps=10):
    from scflow_tpu.data import synthetic_batch
    from scflow_tpu.rendering import Renderer, make_test_meshes
    from scflow_tpu.training import (Config, ModelConfig, build_model,
                                     make_eval_step, render_at_pose)
    from scflow_tpu.models.corr import correlation_pyramid_pm
    from scflow_tpu.utils.profiling import PhaseTimer

    # 1280-face icospheres: the models_1024 mesh-complexity class
    bank = make_test_meshes(num_classes=num_class, subdivisions=3,
                            radius=60.0)
    renderer = Renderer(bank, image_size=image_size)

    rows = {}
    phase_ms = {}
    flops_frame = 0.0
    for dtype in ("float32", "bfloat16"):
        cfg = Config(model=ModelConfig(num_class=num_class, iters=iters,
                                       test_iters=iters, dtype=dtype))
        model = build_model(cfg)
        batch_data = synthetic_batch(jax.random.PRNGKey(0), renderer, batch)
        rendered, depth, _ = render_at_pose(
            renderer, batch_data["ref_rotations"],
            batch_data["ref_translations"], batch_data["k"],
            batch_data["labels"], cfg.data.normalize_mean,
            cfg.data.normalize_std)
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(1), rendered, batch_data["real_images"],
            batch_data["ref_rotations"], batch_data["ref_translations"],
            depth, batch_data["k"], batch_data["labels"])
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})

        eval_step = make_eval_step(model, renderer, cfg)
        dt = _timeit(eval_step, (params, batch_stats, batch_data), steps)
        rows[dtype] = batch / dt

        if dtype == "bfloat16":
            # per-phase breakdown on the fast-path precision
            timer = PhaseTimer()

            render_fn = jax.jit(lambda b: render_at_pose(
                renderer, b["ref_rotations"], b["ref_translations"],
                b["k"], b["labels"], cfg.data.normalize_mean,
                cfg.data.normalize_std))

            def encode_fn(p, bs, rendered, real):
                variables = {"params": p}
                if bs:
                    variables["batch_stats"] = bs
                return model.apply(variables, rendered, real, train=False,
                                   method=model.extract_feat)

            encode_jit = jax.jit(encode_fn)
            feats = encode_jit(params, batch_stats, rendered,
                               batch_data["real_images"])
            corr_fn = jax.jit(lambda fr, fo: correlation_pyramid_pm(
                fr, fo, num_levels=cfg.model.num_levels))

            t_render = _timeit(render_fn, (batch_data,), steps)
            t_encode = _timeit(encode_jit,
                               (params, batch_stats, rendered,
                                batch_data["real_images"]), steps)
            t_corr = _timeit(corr_fn, (feats[0], feats[1]), steps)
            t_full = dt
            phase_ms = {
                "render": round(1e3 * t_render, 3),
                "encoders": round(1e3 * t_encode, 3),
                "corr_pyramid": round(1e3 * t_corr, 3),
                "gru_loop_rest": round(
                    1e3 * max(t_full - t_render - t_encode - t_corr, 0.0), 3),
                "full": round(1e3 * t_full, 3),
            }
            flops_frame = _flops_of(
                lambda p, bs, b: eval_step(p, bs, b), params, batch_stats,
                batch_data) / batch

    headline = max(rows.values())
    dev = jax.devices()[0]
    peak = _PEAK_TFLOPS.get(getattr(dev, "device_kind", ""), None)
    achieved_tflops = (flops_frame * headline) / 1e12 if flops_frame else None
    result = {
        "metric": "refinement_throughput",
        "value": round(headline, 2),
        "unit": "frames/s/chip",
        "vs_baseline": round(headline / REFERENCE_FPS, 3),
        "baseline_note": "notional 30 fps (paper ~35 ms/frame on RTX 3090; "
                         "reference repo publishes no numbers)",
        "fps_f32": round(rows.get("float32", 0.0), 2),
        "fps_bf16": round(rows.get("bfloat16", 0.0), 2),
        "batch": batch, "iters": iters, "mesh_faces": 1280,
        "phases_ms": phase_ms,
        "gflops_per_frame": round(flops_frame / 1e9, 2) if flops_frame else None,
        "achieved_tflops": (round(achieved_tflops, 2)
                            if achieved_tflops else None),
        "device_kind": getattr(dev, "device_kind", "unknown"),
        "mfu": (round(achieved_tflops / peak, 4)
                if (achieved_tflops and peak) else None),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    kwargs = {}
    if len(sys.argv) > 1:
        kwargs["batch"] = int(sys.argv[1])
    if len(sys.argv) > 2:
        kwargs["iters"] = int(sys.argv[2])
    if len(sys.argv) > 3:
        kwargs["steps"] = int(sys.argv[3])
    main(**kwargs)
