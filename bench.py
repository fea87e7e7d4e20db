"""Benchmark: batched pose-refinement throughput with per-phase breakdown.

Three sections, one JSON line:

1. **Inference step** (headline, BASELINE.md config 2 shapes): end-to-end
   refinement frames/s (render at initial pose + SCFlow 8-iteration
   refinement, 256² crops, 4-level pyramid, radius 4, batch 32) on
   realistic mesh complexity (1280-face icospheres ≈ the models_1024 eval
   meshes), in f32 AND bf16, with per-phase mean ms (render / encoders /
   correlation-pyramid build / GRU-loop remainder; phases are measured as
   independently jitted subgraphs so they do NOT sum exactly to ``full`` —
   the residual includes dispatch overhead and lost cross-phase fusion)
   and MFU from XLA ``cost_analysis`` flops vs the chip's peak.
2. **Training step** (BASELINE.md config 3 shapes): jitted
   ``make_train_step`` — render + forward + backward through the
   8-iteration scan + AdamW — at the reference recipe's batch 16
   (configs/refine_models/scflow_ycbv_pbr.py:305-320), steps/s, per-phase
   ms (render / forward-loss / backward+optimizer-by-subtraction), and
   train MFU.
3. **Eval pipeline** (BASELINE.md config 2 protocol): the real ``test.py``
   path — BOP readers → crop/resize/pad → packed sharded batches →
   refinement → host ADD(-S) matching — over a generated synthetic BOP
   set, reporting images/s and the host-matching share.

Baseline: the CUDA reference publishes no numbers (BASELINE.md) — the
30 fps "baseline" is NOTIONAL, taken from the SCFlow paper's ~35 ms/frame
end-to-end on an RTX 3090 (~28.6 fps). ``vs_baseline`` = headline_fps / 30.
The driver-set target is ≥ 5×.

Prints ONE JSON line (headline = best-precision full-path throughput).
"""
import json
import os
import subprocess
import sys
import tempfile
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


def _drain(out):
    """Force completion of every dispatched execution.

    Materializes the SMALLEST output leaf to the host: a TPU executes its
    launch queue in order, so one host read of the last execution's output
    proves all prior executions finished. ``jax.block_until_ready`` is NOT
    trusted here — on the remote-relay TPU platform it returns immediately
    (measured 0.7 ms/step for a 51 ms step; the r4 train row's ~20×
    optimism came exactly from a block_until_ready-terminated timing).
    """
    import numpy as np

    leaves = jax.tree_util.tree_leaves(out)
    smallest = min(leaves, key=lambda a: getattr(a, "nbytes", 1 << 60))
    np.asarray(smallest)


def _timeit(fn, args, steps, repeats=2):
    """Per-step time by SLOPE: (T(2n) − T(n)) / n.

    Differencing two queue-drained wall times cancels the fixed
    dispatch + drain-transfer latency (host reads through the relay have
    ~0.1-2 s fixed cost, so neither per-step syncs nor a single
    end-of-loop sync gives an honest mean at small n). Each T is the best
    of ``repeats`` runs.
    """
    out = fn(*args)
    _drain(out)

    def run(n):
        t0 = time.perf_counter()
        o = None
        for _ in range(n):
            o = fn(*args)
        _drain(o)
        return time.perf_counter() - t0

    t1 = min(run(steps) for _ in range(repeats))
    t2 = min(run(2 * steps) for _ in range(repeats))
    return max((t2 - t1) / steps, 1e-9)


def _flops_of(fn, *args):
    try:
        comp = jax.jit(fn).lower(*args).compile()
        ca = comp.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return float(ca.get("flops", 0.0))
    except Exception:
        return 0.0


def _peak_tflops():
    dev = jax.devices()[0]
    return (_PEAK_TFLOPS.get(getattr(dev, "device_kind", ""), None),
            getattr(dev, "device_kind", "unknown"))


def bench_infer(batch=32, iters=8, image_size=(256, 256), num_class=21,
                steps=10):
    from scflow_tpu.data import synthetic_batch
    from scflow_tpu.models.corr import correlation_pyramid_pm
    from scflow_tpu.rendering import Renderer, make_test_meshes
    from scflow_tpu.training import (Config, ModelConfig, build_model,
                                     make_eval_step, render_at_pose)

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
            # per-phase breakdown on the fast-path precision (mesh bank as
            # a jit ARGUMENT — baked-constant programs compile 10-30x
            # slower on the remote-compile TPU path)
            bank_args = renderer.mesh_bank.with_tri_tables()
            render_fn = jax.jit(lambda b, mb: render_at_pose(
                renderer, b["ref_rotations"], b["ref_translations"],
                b["k"], b["labels"], cfg.data.normalize_mean,
                cfg.data.normalize_std, mesh_bank=mb))

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

            t_render = _timeit(render_fn, (batch_data, bank_args), steps)
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
    return rows, phase_ms, flops_frame


def bench_train(batch=16, iters=8, image_size=(256, 256), num_class=21,
                steps=10, dtype="bfloat16"):
    """Training-step throughput at the reference recipe shape (BASELINE
    config 3: batch 16, 8 iters, 100k iters —
    reference configs/refine_models/scflow_ycbv_pbr.py:282-320)."""
    from scflow_tpu.data import synthetic_batch
    from scflow_tpu.rendering import Renderer, make_test_meshes
    from scflow_tpu.training import (Config, ModelConfig, build_model,
                                     build_points_bank, init_train_state,
                                     make_optimizer, make_train_step,
                                     render_at_pose)
    from scflow_tpu.training.steps import _loss_fn_for

    bank = make_test_meshes(num_classes=num_class, subdivisions=3,
                            radius=60.0)
    renderer = Renderer(bank, image_size=image_size)
    cfg = Config(model=ModelConfig(num_class=num_class, iters=iters,
                                   test_iters=iters, dtype=dtype))
    model = build_model(cfg)
    points = build_points_bank(bank, num_points=1000)

    batch_data = synthetic_batch(jax.random.PRNGKey(0), renderer, batch)
    rendered, depth, mask = render_at_pose(
        renderer, batch_data["ref_rotations"], batch_data["ref_translations"],
        batch_data["k"], batch_data["labels"], cfg.data.normalize_mean,
        cfg.data.normalize_std)
    tx, _ = make_optimizer(cfg)
    state = init_train_state(
        cfg, model, tx, jax.random.PRNGKey(1),
        dict(batch_data, rendered_images=rendered, rendered_depths=depth,
             rendered_masks=mask))
    train_batch = dict(batch_data)  # synthetic_batch provides gt_* + ref_*

    import numpy as np

    step = make_train_step(model, renderer, points, cfg, tx, donate=True)

    def time_full():
        """Donated-state full-step SLOPE timing: the state chain serializes
        the steps; each window drains with a host read of the loss scalar
        (block_until_ready is not trusted — see _drain), and
        (T(2n) − T(n)) / n cancels the fixed drain latency."""
        nonlocal state

        def run(n):
            nonlocal state
            t0 = time.perf_counter()
            m = None
            for _ in range(n):
                state, m = step(state, train_batch)
            np.asarray(m["loss"])
            return time.perf_counter() - t0

        t1 = min(run(steps) for _ in range(2))
        t2 = min(run(2 * steps) for _ in range(2))
        return max((t2 - t1) / steps, 1e-9)

    # warm up / compile, then time
    state, m0 = step(state, train_batch)
    np.asarray(m0["loss"])
    t_full = time_full()

    # phase attribution, each phase independently jitted and synced:
    # render / forward-only / forward+backward (direct grad timing — NOT
    # by subtraction), optimizer = full − render − grad.
    bank_args = renderer.mesh_bank.with_tri_tables()
    render_fn = jax.jit(lambda b, mb: render_at_pose(
        renderer, b["ref_rotations"], b["ref_translations"], b["k"],
        b["labels"], cfg.data.normalize_mean, cfg.data.normalize_std,
        mesh_bank=mb))
    full_batch = dict(train_batch, rendered_images=rendered,
                      rendered_depths=depth, rendered_masks=mask)
    loss_fn = _loss_fn_for(model)
    fwd_fn = jax.jit(lambda p, bs, b: loss_fn(
        p, bs, b, model=model, points_bank=points, cfg=cfg, train=True)[0])
    grad_fn = jax.jit(lambda p, bs, b: jax.grad(
        lambda pp: loss_fn(pp, bs, b, model=model, points_bank=points,
                           cfg=cfg, train=True)[0])(p))
    t_render = _timeit(render_fn, (train_batch, bank_args), steps)
    t_fwd = _timeit(fwd_fn, (state.params, state.batch_stats, full_batch),
                    steps)
    t_grad = _timeit(grad_fn, (state.params, state.batch_stats, full_batch),
                     steps)

    # --- self-checks (VERDICT r4: the committed train row was ~20×
    # optimistic with MFU 2.31 — physically impossible; never publish a
    # row that fails these again) ---
    suspect = []
    if t_full < 0.9 * t_grad:
        # a full step cannot beat its own forward+backward; re-measure once
        t_full = time_full()
        if t_full < 0.9 * t_grad:
            suspect.append(
                f"full {1e3 * t_full:.1f} ms < fwd+bwd {1e3 * t_grad:.1f} ms")
    step_nodonate = make_train_step(model, renderer, points, cfg, tx)
    flops_step = _flops_of(lambda s, b: step_nodonate(s, b), state,
                           train_batch)
    peak, _ = _peak_tflops()
    if flops_step and peak:
        mfu = flops_step / 1e12 / t_full / peak
        if mfu >= 1.0:
            raise RuntimeError(
                f"train bench self-check failed: MFU {mfu:.2f} >= 1.0 "
                f"(t_full={1e3 * t_full:.2f} ms) — timing is broken, "
                "refusing to publish")
    if suspect:
        raise RuntimeError("train bench self-check failed: "
                           + "; ".join(suspect))
    return {
        "steps_per_s": round(1.0 / t_full, 3),
        "frames_per_s": round(batch / t_full, 2),
        "batch": batch, "iters": iters, "dtype": dtype,
        "phases_ms": {
            "render": round(1e3 * t_render, 3),
            "forward_loss": round(1e3 * t_fwd, 3),
            "backward": round(1e3 * max(t_grad - t_fwd, 0.0), 3),
            "optimizer_rest": round(
                1e3 * max(t_full - t_render - t_grad, 0.0), 3),
            "full": round(1e3 * t_full, 3),
        },
        "gflops_per_step": round(flops_step / 1e9, 2) if flops_step else None,
        "tflops": flops_step / 1e12 / t_full if flops_step else None,
    }


def bench_eval_pipeline(num_images=96, slot_budget=64, image_size=256,
                        iters=8):
    """The real test.py path end to end (readers → pack → device → host
    ADD matching) over a generated synthetic BOP set: images/s + host
    attribution (BASELINE config 2 protocol shape)."""
    import numpy as np

    from scflow_tpu.data.bop import RefineDataset
    from scflow_tpu.data.loader import TestBatchBuilder
    from scflow_tpu.metrics import ADDMetric
    from scflow_tpu.rendering import Renderer, load_mesh_dir
    from scflow_tpu.training import (Config, DataConfig, ModelConfig,
                                     build_points_bank)
    from scflow_tpu.training.evaluate import evaluate_dataset
    from scflow_tpu.training.trainer import Trainer

    root = tempfile.mkdtemp(prefix="benchbop_")
    gen = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools",
                      "make_synthetic_bop.py"),
         "--out", root, "--num-images", str(num_images),
         "--num-classes", "6", "--max-objects", "4"],
        capture_output=True, text=True)
    if gen.returncode != 0:
        raise RuntimeError(f"make_synthetic_bop failed: {gen.stderr[-500:]}")

    cfg = Config(model=ModelConfig(num_class=6, iters=iters,
                                   test_iters=iters, dtype="bfloat16"),
                 data=DataConfig(image_scale=image_size))
    bank = load_mesh_dir(os.path.join(root, "models"))
    renderer = Renderer(bank, image_size=(image_size, image_size))
    points = build_points_bank(bank, num_points=1000)
    trainer = Trainer(cfg, renderer, points)
    trainer.init_eval_state(batch_size=slot_budget)

    names = tuple(f"obj{i}" for i in range(6))
    ds = RefineDataset(os.path.join(root, "test"),
                       os.path.join(root, "init_poses"),
                       os.path.join(root, "image_lists", "test.txt"),
                       class_names=names)
    mesh_points = [np.asarray(points.points[c]) for c in range(6)]
    builder = TestBatchBuilder(ds, cfg, mesh_points)

    host_ms = {"t": 0.0}
    decode_s = {"t": 0.0}

    class TimedBuilder:
        """Accumulates summed thread-time spent in decode+crop (the item
        reads run in a pool; this is CPU time across threads, not wall)."""

        def __init__(self, inner):
            self._inner = inner

        def __len__(self):
            return len(self._inner)

        def __getitem__(self, i):
            t0 = time.perf_counter()
            out = self._inner[i]
            with _dec_lock:
                decode_s["t"] += time.perf_counter() - t0
            return out

    import threading

    _dec_lock = threading.Lock()
    builder = TimedBuilder(builder)

    def make_metric():
        metric = ADDMetric(points_per_class=mesh_points,
                           diameters=np.asarray(points.diameters),
                           class_names=names)
        orig = metric.process

        def timed(*a, **kw):
            t0 = time.perf_counter()
            out = orig(*a, **kw)
            host_ms["t"] += time.perf_counter() - t0
            return out

        metric.process = timed
        return metric

    # pass 1: compile + page cache warm; pass 2: measured
    evaluate_dataset(trainer, builder, make_metric(),
                     slot_budget=slot_budget, progress_every=0)
    host_ms["t"] = 0.0
    decode_s["t"] = 0.0
    t0 = time.perf_counter()
    evaluate_dataset(trainer, builder, make_metric(),
                     slot_budget=slot_budget, progress_every=0)
    wall = time.perf_counter() - t0
    return {
        "images_per_s": round(num_images / wall, 2),
        "num_images": num_images, "slot_budget": slot_budget,
        "host_match_ms_per_image": round(1e3 * host_ms["t"] / num_images, 3),
        "decode_crop_threadms_per_image": round(
            1e3 * decode_s["t"] / num_images, 3),
        "wall_ms_per_image": round(1e3 * wall / num_images, 3),
    }


def main(batch=32, iters=8, steps=10):
    rows, phase_ms, flops_frame = bench_infer(batch=batch, iters=iters,
                                              steps=steps)
    headline = max(rows.values())
    peak, device_kind = _peak_tflops()
    achieved_tflops = (flops_frame * headline) / 1e12 if flops_frame else None

    # inference-side sanity: MFU must be physically possible
    if achieved_tflops and peak and achieved_tflops / peak >= 1.0:
        raise RuntimeError(
            f"inference bench self-check failed: MFU "
            f"{achieved_tflops / peak:.2f} >= 1.0 — timing is broken")

    try:
        train = bench_train(steps=steps)
        if train.get("tflops") and peak:
            train["achieved_tflops"] = round(train["tflops"], 2)
            train["mfu"] = round(train["tflops"] / peak, 4)
        train.pop("tflops", None)
        # cross-check: the train render phase (batch 16) must be within
        # ~2.5× of the inference render phase (batch 32) per-sample — the
        # r4 bad row claimed 0.067 ms for what inference measured at 12.7
        if phase_ms.get("render") and train.get("phases_ms"):
            infer_per = phase_ms["render"] / batch
            train_per = train["phases_ms"]["render"] / train["batch"]
            lo, hi = infer_per / 2.5, infer_per * 2.5
            if not (lo <= train_per <= hi):
                train["render_crosscheck"] = (
                    f"train render {train_per:.3f} ms/sample vs infer "
                    f"{infer_per:.3f} ms/sample — outside 2.5x band")
    except Exception as e:  # never lose the headline to a train-bench issue
        train = {"error": f"{type(e).__name__}: {e}"[:200]}

    try:
        eval_pipe = bench_eval_pipeline(iters=iters)
    except Exception as e:
        eval_pipe = {"error": f"{type(e).__name__}: {e}"[:200]}

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
        "device_kind": device_kind,
        "mfu": (round(achieved_tflops / peak, 4)
                if (achieved_tflops and peak) else None),
        "train": train,
        "eval_pipeline": eval_pipe,
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
