"""Per-phase roofline profile of the refinement hot path on the current chip.

For each phase (render / each encoder / corr build / full GRU loop / one GRU
iteration body) this jits the phase in isolation, measures wall time, pulls
``flops`` and ``bytes accessed`` from XLA ``cost_analysis``, and prints a
roofline table: achieved TFLOP/s vs peak, achieved GB/s vs peak HBM
bandwidth, and which limit the phase is near. The phase whose time is far
from BOTH rooflines is the optimization target.

Reference has no profiling at all (SURVEY.md §5.1); the bench's phase split
(bench.py) gives wall times only — this tool adds the hardware ceilings.

Usage:  python tools/profile_roofline.py [--batch 32] [--dtype bfloat16]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
import jax.numpy as jnp

# peak dense-matmul TFLOP/s (bf16) and HBM GB/s per chip kind
_PEAKS = {
    "TPU v2": (45.0, 700.0), "TPU v3": (123.0, 900.0),
    "TPU v4": (275.0, 1228.0), "TPU v5e": (197.0, 819.0),
    "TPU v5 lite": (197.0, 819.0), "TPU v5p": (459.0, 2765.0),
    "TPU v6e": (918.0, 1640.0), "TPU v6 lite": (918.0, 1640.0),
    "TPU7x": (2307.0, 7400.0),
}


def _cost(fn, *args):
    c = jax.jit(fn).lower(*args).compile()
    ca = c.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    ca = ca or {}
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


def _time(fn, *args, steps=20):
    jfn = jax.jit(fn)
    out = jfn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = jfn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / steps


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--subdivisions", type=int, default=3)
    p.add_argument("--steps", type=int, default=20)
    args = p.parse_args()

    from scflow_tpu.data import synthetic_batch
    from scflow_tpu.rendering import Renderer, make_test_meshes
    from scflow_tpu.training import (Config, ModelConfig, build_model,
                                     make_eval_step, render_at_pose)

    dev = jax.devices()[0]
    peak_tf, peak_bw = _PEAKS.get(getattr(dev, "device_kind", ""), (197.0, 819.0))

    cfg = Config(model=ModelConfig(num_class=21, iters=args.iters,
                                   test_iters=args.iters, dtype=args.dtype))
    bank = make_test_meshes(num_classes=21, subdivisions=args.subdivisions,
                            radius=60.0)
    renderer = Renderer(bank, image_size=(256, 256))
    model = build_model(cfg)

    batch = synthetic_batch(jax.random.PRNGKey(0), renderer, args.batch)

    def render_fn(r, t, k, lab):
        return render_at_pose(renderer, r, t, k, lab,
                              cfg.data.normalize_mean, cfg.data.normalize_std)

    rendered, depth, _ = jax.jit(render_fn)(
        batch["ref_rotations"], batch["ref_translations"], batch["k"],
        batch["labels"])
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(1), rendered, batch["real_images"],
        batch["ref_rotations"], batch["ref_translations"], depth,
        batch["k"], batch["labels"])
    params, bstats = variables["params"], variables.get("batch_stats", {})

    bound = model.bind({"params": params, "batch_stats": bstats})

    def enc_render(img):
        return bound.render_encoder(img, False)

    def enc_real(img):
        return bound.real_encoder(img, False)

    def enc_cxt(img):
        return bound.context(img, False)

    def corr_build(img_r, img_t):
        from scflow_tpu.models.corr import correlation_pyramid
        fr = bound.render_encoder(img_r, False)
        ft = bound.real_encoder(img_t, False)
        return correlation_pyramid(fr, ft, cfg.model.num_levels)

    def full_forward(rend, real, r, t, d, k, lab):
        return model.apply({"params": params, "batch_stats": bstats},
                           rend, real, r, t, d, k, lab, train=False)

    eval_step = make_eval_step(model, renderer, cfg)

    phases = []

    def measure(name, fn, *fargs):
        ms = _time(fn, *fargs, steps=args.steps) * 1e3
        fl, by = _cost(fn, *fargs)
        tf = fl / ms * 1e-9   # TFLOP/s = flops / (ms * 1e-3) / 1e12
        gbs = by / ms * 1e-6
        phases.append({
            "phase": name, "ms": round(ms, 3),
            "gflops": round(fl * 1e-9, 2), "gbytes": round(by * 1e-9, 3),
            "tflops": round(tf, 2), "pct_peak_flops": round(100 * tf / peak_tf, 1),
            "gbps": round(gbs, 1), "pct_peak_bw": round(100 * gbs / peak_bw, 1),
            "intensity": round(fl / max(by, 1.0), 1),
        })

    measure("render", render_fn, batch["ref_rotations"],
            batch["ref_translations"], batch["k"], batch["labels"])
    measure("enc_render", enc_render, rendered)
    measure("enc_real", enc_real, batch["real_images"])
    measure("enc_context", enc_cxt, rendered)
    measure("corr_build(+2enc)", corr_build, rendered, batch["real_images"])
    measure("full_forward", full_forward, rendered, batch["real_images"],
            batch["ref_rotations"], batch["ref_translations"], depth,
            batch["k"], batch["labels"])
    measure("eval_step(e2e)", eval_step, params, bstats, batch)

    kind = getattr(dev, "device_kind", "?")
    print(f"# device={kind} peak={peak_tf} TFLOP/s, {peak_bw} GB/s, "
          f"dtype={args.dtype}, batch={args.batch}")
    hdr = ("phase", "ms", "gflops", "gbytes", "tflops", "%flops", "gbps", "%bw",
           "F/B")
    print(("{:<20}" + "{:>9}" * 8).format(*hdr))
    for r in phases:
        print(("{:<20}" + "{:>9}" * 8).format(
            r["phase"], r["ms"], r["gflops"], r["gbytes"], r["tflops"],
            r["pct_peak_flops"], r["gbps"], r["pct_peak_bw"], r["intensity"]))
    print(json.dumps(phases))


if __name__ == "__main__":
    main()
