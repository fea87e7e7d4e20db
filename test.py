"""Evaluation CLI — the reference ``test.py`` equivalent.

Runs refinement over a RefineDataset (BOP layout + initial-pose annots)
with packed fixed-shape batches sharded over the device mesh (the
reference's ``multi_gpu_test`` analogue, tools/eval.py:84-216), computes
ADD(-S)/AUC/REP via the exact ADDMetric, and optionally writes BOP-format
results (``--format-only``).
"""
import argparse


def parse_args():
    p = argparse.ArgumentParser(description="Evaluate an SCFlow-TPU refiner")
    p.add_argument("--config", default=None,
                   help="named recipe from scflow_tpu.configs; supplies the "
                        "test dataset paths unless overridden")
    p.add_argument("--checkpoint", required=False, default=None)
    p.add_argument("--torch-checkpoint", default=None,
                   help="reference torch .pth (raw state_dict or mmengine "
                        "checkpoint) — converted + merged into the eval "
                        "state (the reference load_checkpoint= entry)")
    p.add_argument("--work-dir", default="work_dirs/scflow")
    p.add_argument("--data-root", default=None)
    p.add_argument("--ref-annots-root", default=None)
    p.add_argument("--image-list", default=None)
    p.add_argument("--mesh-dir", default=None)
    p.add_argument("--mesh-ext", default="ply")
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--passes", type=int, default=1,
                   help="multi-pass refinement (re-render between passes)")
    p.add_argument("--num-classes", type=int, default=21)
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--slot-budget", type=int, default=16,
                   help="object slots per packed device batch (several "
                        "images share one batch; must divide the mesh)")
    p.add_argument("--pose-graph", action="store_true",
                   help="also run the scene pose-graph extension (shared "
                        "per-image camera correction + joint object solves "
                        "on flow-derived targets) and report ADD with and "
                        "without it (BASELINE §2.10; no reference analogue)")
    p.add_argument("--exact-eval", action="store_true",
                   help="disable the low-res pose-flow eval fast path "
                        "(ModelConfig.lowres_eval) for exactness checks")
    p.add_argument("--eval", action="store_true", default=True)
    p.add_argument("--format-only", action="store_true")
    p.add_argument("--save-dir", default=None)
    p.add_argument("--limit", type=int, default=None)
    return p.parse_args()


def main():
    args = parse_args()
    if args.config:
        from scflow_tpu.configs import get_recipe

        spec = get_recipe(args.config).test_data
        args.data_root = args.data_root or spec.data_roots[0]
        args.ref_annots_root = args.ref_annots_root or spec.ref_annots_root
        args.image_list = args.image_list or spec.image_lists[0]
        if args.mesh_dir is None:
            args.mesh_dir, args.mesh_ext = spec.mesh_dir, spec.mesh_ext
    for field in ("data_root", "ref_annots_root", "image_list", "mesh_dir"):
        if getattr(args, field) is None:
            raise SystemExit(f"--{field.replace('_', '-')} is required "
                             "(or pass --config <recipe>)")
    from scflow_tpu.parallel import initialize_distributed

    initialize_distributed()

    from scflow_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import numpy as np

    from scflow_tpu.data.bop import RefineDataset
    from scflow_tpu.data.loader import TestBatchBuilder
    from scflow_tpu.metrics import (ADDMetric, format_metric_table,
                                    write_bop_results)
    from scflow_tpu.rendering import Renderer, load_mesh_dir
    from scflow_tpu.training import (Config, DataConfig, ModelConfig,
                                     YCBV_CLASS_NAMES, YCBV_MESH_DIAMETERS,
                                     YCBV_SYMMETRIC_CLASSES,
                                     build_points_bank)
    from scflow_tpu.training.evaluate import evaluate_dataset
    from scflow_tpu.training.trainer import Trainer

    cfg = Config(model=ModelConfig(num_class=args.num_classes,
                                   iters=args.iters, test_iters=args.iters,
                                   test_passes=args.passes,
                                   lowres_eval=not args.exact_eval),
                 data=DataConfig(image_scale=args.image_size),
                 work_dir=args.work_dir)
    bank = load_mesh_dir(args.mesh_dir, ext=args.mesh_ext)
    symmetric = YCBV_SYMMETRIC_CLASSES if args.num_classes == 21 else ()
    diameters = YCBV_MESH_DIAMETERS if args.num_classes == 21 else None
    renderer = Renderer(bank, image_size=(args.image_size, args.image_size))
    points = build_points_bank(bank, symmetric_classes=symmetric,
                               diameters=diameters, num_points=1000)
    trainer = Trainer(cfg, renderer, points)
    trainer.init_eval_state(batch_size=args.slot_budget)
    if args.checkpoint:
        trainer.resume(args.checkpoint)
    if args.torch_checkpoint:
        report = trainer.load_torch_checkpoint(args.torch_checkpoint)
        print(f"loaded torch checkpoint {args.torch_checkpoint}: "
              f"{len(report['covered'])} leaves converted, "
              f"{len(report['missing'])} kept at init "
              f"(affine-less IN scale/bias etc.)")

    dataset = RefineDataset(args.data_root, args.ref_annots_root,
                            args.image_list, class_names=YCBV_CLASS_NAMES)
    mesh_points = [np.asarray(points.points[c]) for c in range(bank.num_classes)]
    builder = TestBatchBuilder(dataset, cfg, mesh_points)

    metric = ADDMetric(points_per_class=mesh_points,
                       diameters=np.asarray(points.diameters),
                       symmetric_classes=tuple(symmetric),
                       class_names=YCBV_CLASS_NAMES)
    pg_metric = None
    if args.pose_graph:
        pg_metric = ADDMetric(points_per_class=mesh_points,
                              diameters=np.asarray(points.diameters),
                              symmetric_classes=tuple(symmetric),
                              class_names=YCBV_CLASS_NAMES)
    metrics, results = evaluate_dataset(
        trainer, builder, metric, slot_budget=args.slot_budget,
        limit=args.limit,
        collect_results=bool(args.save_dir or args.format_only),
        pose_graph_metric=pg_metric)

    if args.save_dir or args.format_only:
        save_dir = args.save_dir or f"{args.work_dir}/bop_results"
        paths = write_bop_results(results, save_dir)
        print(f"wrote {len(paths)} BOP scene files to {save_dir}")
    if not args.format_only and metrics:
        print(format_metric_table(metrics))
        for k in sorted(metrics):
            if k.startswith(("average/", "instance/")) or k == "num_instances":
                print(f"{k}: {metrics[k]}")
    if pg_metric is not None and not args.format_only:
        pg_metrics = pg_metric.compute()
        if pg_metrics:
            print("\n== with scene pose-graph refinement ==")
            print(format_metric_table(pg_metrics))
            for k in sorted(pg_metrics):
                if k.startswith("average/"):
                    base = metrics.get(k)
                    delta = (f"  (Δ {pg_metrics[k] - base:+.4f})"
                             if isinstance(base, float) else "")
                    print(f"{k}: {pg_metrics[k]}{delta}")


if __name__ == "__main__":
    main()
