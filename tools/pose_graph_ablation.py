"""Quantify the pose-graph extension: with/without ADD on a multi-object
synthetic BOP set with a CORRELATED per-image camera error (VERDICT r4 #8).

Protocol:
1. generate a synthetic BOP set (``make_synthetic_bop``) with >=2 objects
   per image and a shared per-image SE(3) error composed onto every init
   pose (``--camera-angle-std/--camera-trans-std``) — the structure the
   scene pose graph models (a shared camera correction);
2. train the flagship SCFlow refiner briefly on on-device synthetic
   batches over the SAME mesh bank (the train_synthetic_demo recipe);
3. run the real eval loop twice-in-one (``evaluate_dataset`` with
   ``pose_graph_metric``): per-object refinement alone vs + scene
   pose-graph refinement on flow-derived targets;
4. print both ADD tables and write POSE_GRAPH_ABLATION.md.

No reference counterpart — the reference refines objects independently
(SURVEY.md §2.10).

  python tools/pose_graph_ablation.py [--steps 2000] [--num-images 48]
"""
import argparse
import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from scflow_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--num-images", type=int, default=48)
    p.add_argument("--num-classes", type=int, default=4)
    p.add_argument("--camera-angle-std", type=float, default=1.5)
    p.add_argument("--camera-trans-std", type=float, default=10.0)
    p.add_argument("--image-scale", type=int, default=128)
    p.add_argument("--out", default="POSE_GRAPH_ABLATION.md")
    p.add_argument("--data-root", default=None,
                   help="reuse an existing generated set")
    args = p.parse_args()

    from scflow_tpu.data import synthetic_batch
    from scflow_tpu.data.bop import RefineDataset
    from scflow_tpu.data.loader import TestBatchBuilder
    from scflow_tpu.metrics import ADDMetric
    from scflow_tpu.rendering import Renderer, load_mesh_dir
    from scflow_tpu.training import (Config, DataConfig, ModelConfig,
                                     OptimConfig, build_points_bank,
                                     render_at_pose)
    from scflow_tpu.training.evaluate import evaluate_dataset
    from scflow_tpu.training.trainer import Trainer

    root = args.data_root or tempfile.mkdtemp(prefix="pgabl_")
    if args.data_root is None:
        gen = subprocess.run(
            [sys.executable,
             os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "make_synthetic_bop.py"),
             "--out", root, "--num-images", str(args.num_images),
             "--num-classes", str(args.num_classes),
             "--min-objects", "3", "--max-objects", "6",
             "--camera-angle-std", str(args.camera_angle_std),
             "--camera-trans-std", str(args.camera_trans_std)],
            capture_output=True, text=True)
        assert gen.returncode == 0, gen.stderr[-2000:]
        print(f"generated set at {root}", flush=True)

    nc = args.num_classes
    cfg = Config(model=ModelConfig(num_class=nc, iters=4, test_iters=4),
                 optim=OptimConfig(lr=2e-4, total_steps=args.steps),
                 data=DataConfig(batch_size=16,
                                 image_scale=args.image_scale),
                 work_dir="work_dirs/pose_graph_ablation")
    bank = load_mesh_dir(os.path.join(root, "models"))
    sz = args.image_scale
    renderer = Renderer(bank, image_size=(sz, sz))
    points = build_points_bank(bank, num_points=512)
    trainer = Trainer(cfg, renderer, points)

    def get_batch(step):
        return synthetic_batch(jax.random.PRNGKey(13_000_017 + step),
                               renderer, 16)

    sample = get_batch(0)
    rendered, depth, mask = render_at_pose(
        renderer, sample["ref_rotations"], sample["ref_translations"],
        sample["k"], sample["labels"], cfg.data.normalize_mean,
        cfg.data.normalize_std)
    trainer.init_state(dict(sample, rendered_images=rendered,
                            rendered_depths=depth, rendered_masks=mask))
    print(f"training {args.steps} steps...", flush=True)
    trainer.fit(get_batch, num_steps=args.steps)

    names = tuple(chr(ord("a") + i) for i in range(nc))
    ds = RefineDataset(os.path.join(root, "test"),
                       os.path.join(root, "init_poses"),
                       os.path.join(root, "image_lists", "test.txt"),
                       class_names=names)
    mesh_points = [np.asarray(points.points[c]) for c in range(nc)]
    builder = TestBatchBuilder(ds, cfg, mesh_points)

    def make_metric():
        return ADDMetric(points_per_class=mesh_points,
                         diameters=np.asarray(points.diameters),
                         class_names=names)

    plain, pg = make_metric(), make_metric()
    metrics, _ = evaluate_dataset(trainer, builder, plain, slot_budget=16,
                                  progress_every=16, pose_graph_metric=pg)
    pg_metrics = pg.compute()

    keys = [k for k in metrics
            if any(t in k for t in ("add_", "auc", "num_instances"))]
    rows = []
    for k in sorted(keys):
        a = metrics.get(k)
        b = pg_metrics.get(k)
        if isinstance(a, (int, float)) and isinstance(b, (int, float)):
            rows.append((k, a, b, b - a))
    print(f"\n{'metric':34s} {'per-object':>12s} {'pose-graph':>12s} "
          f"{'delta':>9s}")
    for k, a, b, d in rows:
        print(f"{k:34s} {a:12.4f} {b:12.4f} {d:+9.4f}")

    lines = [
        "# Pose-graph extension: with/without ADD (synthetic BOP ablation)",
        "",
        "Generated per `tools/pose_graph_ablation.py`: "
        f"{args.num_images} images, {nc} classes, 3-6 objects/image, "
        f"shared per-image camera error (rot std {args.camera_angle_std} deg, "
        f"trans std {args.camera_trans_std} mm) composed onto every init "
        f"pose; SCFlow (4 iters, {sz} px) trained {args.steps} steps on "
        "on-device synthetic batches over the same mesh bank; eval via "
        "`evaluate_dataset(pose_graph_metric=...)` — the real `test.py "
        "--pose-graph` path.",
        "",
        "| metric | per-object refinement | + scene pose-graph | delta |",
        "|---|---|---|---|",
    ]
    for k, a, b, d in rows:
        lines.append(f"| {k} | {a:.4f} | {b:.4f} | {d:+.4f} |")
    lines.append("")
    with open(args.out, "w") as f:
        f.write("\n".join(lines))
    print(f"\nwrote {args.out}")
    with open(os.path.join("work_dirs", "pose_graph_ablation.json"),
              "w") as f:
        json.dump({"plain": {k: float(a) for k, a, _, _ in rows},
                   "pose_graph": {k: float(b) for k, _, b, _ in rows}}, f)


if __name__ == "__main__":
    main()
