"""Training CLI — the reference ``train.py`` equivalent.

Examples:
  # named recipe (the reference `--config configs/...py` analogue)
  python train.py --config scflow_ycbv_pbr

  # synthetic smoke training (no dataset needed)
  python train.py --synthetic --steps 200 --work-dir work_dirs/smoke

  # explicit paths (overrides any recipe)
  python train.py --data-root data/ycbv/train_pbr \
      --image-list data/ycbv/image_lists/train_pbr.txt \
      --mesh-dir data/ycbv/models_1024 --work-dir work_dirs/scflow_ycbv

  # multi-host data parallelism (per host):
  SCFLOW_NUM_PROCESSES=2 SCFLOW_PROCESS_ID=0 \
      SCFLOW_COORDINATOR=host0:9999 python train.py ...
"""
import argparse


def parse_args():
    p = argparse.ArgumentParser(description="Train an SCFlow-TPU refiner")
    p.add_argument("--config", default=None,
                   help="named recipe from scflow_tpu.configs (e.g. "
                        "scflow_ycbv_pbr, raft_ycbv, scflow_track_real)")
    p.add_argument("--work-dir", default=None)
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--iters", type=int, default=None)
    p.add_argument("--cycles", type=int, default=None,
                   help="multi-cycle training (re-render between cycles)")
    p.add_argument("--image-size", type=int, default=None)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--synthetic", action="store_true",
                   help="train on on-device synthetic scenes (no data needed)")
    p.add_argument("--scene", action="store_true",
                   help="multi-object scene batching: every visible object "
                        "of each image shares the batch, padded slots are "
                        "masked via sample_valid (BASELINE config 4)")
    p.add_argument("--scene-images", type=int, default=None)
    p.add_argument("--slots-per-image", type=int, default=None)
    p.add_argument("--eval-every", type=int, default=None,
                   help="run the sharded eval on the recipe's test split "
                        "every N steps (requires --config with test data)")
    p.add_argument("--eval-limit", type=int, default=200,
                   help="max eval images for --eval-every runs")
    p.add_argument("--panel-every", type=int, default=None,
                   help="dump train image panels (real|render|flows|mask) "
                        "every N steps into work_dir/images")
    p.add_argument("--num-classes", type=int, default=None)
    p.add_argument("--data-root", default=None)
    p.add_argument("--image-list", default=None)
    p.add_argument("--mesh-dir", default=None)
    p.add_argument("--mesh-ext", default=None)
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args()


def resolve_config(args):
    """Recipe config (if --config) with explicit CLI flags layered on top."""
    from scflow_tpu.configs import get_recipe

    if args.config:
        recipe = get_recipe(args.config)
        cfg, train_spec = recipe.config, recipe.train_data
        test_spec = recipe.test_data
    else:
        from scflow_tpu.training import Config

        cfg, train_spec, test_spec = Config(), None, None

    m, o, d = cfg.model, cfg.optim, cfg.data
    if args.scene:
        d.scene_mode = True
    if args.scene_images is not None:
        d.scene_images = args.scene_images
    if args.slots_per_image is not None:
        d.slots_per_image = args.slots_per_image
    if d.scene_mode:
        d.batch_size = d.scene_images * d.slots_per_image
    if args.num_classes is not None:
        m.num_class = args.num_classes
    if args.iters is not None:
        m.iters = m.test_iters = args.iters
    if args.cycles is not None:
        m.train_cycles = args.cycles
    if args.lr is not None:
        o.lr = args.lr
    if args.steps is not None:
        o.total_steps = args.steps
    if args.batch_size is not None:
        d.batch_size = args.batch_size
    if args.image_size is not None:
        d.image_scale = args.image_size
    if args.work_dir is not None:
        cfg.work_dir = args.work_dir
    cfg.seed = args.seed
    return cfg, train_spec, test_spec


def main():
    args = parse_args()

    from scflow_tpu.parallel import initialize_distributed

    initialize_distributed()

    import jax

    from scflow_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from scflow_tpu.rendering import Renderer, load_mesh_dir, make_test_meshes
    from scflow_tpu.training import (build_points_bank,
                                     YCBV_SYMMETRIC_CLASSES,
                                     YCBV_MESH_DIAMETERS)
    from scflow_tpu.training.trainer import Trainer

    cfg, train_spec, test_spec = resolve_config(args)
    num_classes = cfg.model.num_class
    image_size = cfg.data.image_scale

    mesh_dir = args.mesh_dir or (train_spec.mesh_dir if train_spec else None)
    mesh_ext = args.mesh_ext or (train_spec.mesh_ext if train_spec else "ply")
    if args.synthetic and mesh_dir and not __import__("os").path.isdir(mesh_dir):
        mesh_dir = None  # smoke mode without the recipe's meshes on disk
    if mesh_dir:
        bank = load_mesh_dir(mesh_dir, ext=mesh_ext)
        if train_spec is not None:
            symmetric = train_spec.symmetric_classes
            diameters = train_spec.diameters
        else:
            symmetric = YCBV_SYMMETRIC_CLASSES if num_classes == 21 else ()
            diameters = YCBV_MESH_DIAMETERS if num_classes == 21 else None
    else:
        bank = make_test_meshes(num_classes=num_classes, subdivisions=2)
        symmetric, diameters = (), None

    renderer = Renderer(bank, image_size=(image_size, image_size))
    points = build_points_bank(bank, symmetric_classes=symmetric,
                               diameters=diameters,
                               num_points=cfg.loss.num_loss_points)
    trainer = Trainer(cfg, renderer, points)

    use_disk_data = (args.data_root is not None or
                     (train_spec is not None and not args.synthetic))
    if not use_disk_data:
        from scflow_tpu.data import synthetic_batch

        def get_batch(step):
            return synthetic_batch(jax.random.PRNGKey(cfg.seed * 1000_003 + step),
                                   renderer, cfg.data.batch_size)

        sample = get_batch(0)
    else:
        import numpy as np

        from scflow_tpu.configs.build import build_dataset
        from scflow_tpu.data.loader import TrainBatchBuilder, prefetch
        from scflow_tpu.training import YCBV_CLASS_NAMES

        sample_num = -1 if cfg.data.scene_mode else 1
        if args.data_root is not None:
            from scflow_tpu.data.bop import SuperviseTrainDataset

            dataset = SuperviseTrainDataset(
                args.data_root, args.image_list,
                class_names=YCBV_CLASS_NAMES, sample_num=sample_num,
                min_visib_fract=cfg.data.min_visib_fract, seed=cfg.seed)
        else:
            dataset = build_dataset(train_spec, seed=cfg.seed,
                                    sample_num=sample_num)
        mesh_points = [np.asarray(points.points[c]) for c in
                       range(bank.num_classes)]
        if cfg.data.scene_mode:
            from scflow_tpu.data.loader import SceneTrainBatchBuilder

            builder = SceneTrainBatchBuilder(
                dataset, cfg, mesh_points,
                list(np.asarray(points.diameters)), seed=cfg.seed,
                num_images=cfg.data.scene_images,
                slots_per_image=cfg.data.slots_per_image)
        else:
            builder = TrainBatchBuilder(dataset, cfg, mesh_points,
                                        list(np.asarray(points.diameters)),
                                        seed=cfg.seed)
        it = prefetch(builder)
        get_batch = lambda step: next(it)  # noqa: E731
        sample = builder()

    from scflow_tpu.training import render_at_pose

    rendered, depth, mask = render_at_pose(
        renderer, sample["ref_rotations"], sample["ref_translations"],
        sample["k"], sample["labels"], cfg.data.normalize_mean,
        cfg.data.normalize_std)
    init_sample = dict(sample, rendered_images=rendered,
                       rendered_depths=depth, rendered_masks=mask)
    trainer.init_state(init_sample)
    if args.resume:
        trainer.resume()

    eval_fn = None
    if args.eval_every:
        import os

        import numpy as np

        mesh_points = [np.asarray(points.points[c])
                       for c in range(bank.num_classes)]
        if (test_spec is not None
                and os.path.isdir(test_spec.data_roots[0])):
            # sharded batched eval over the recipe's test split
            from scflow_tpu.configs.build import build_dataset
            from scflow_tpu.data.loader import TestBatchBuilder
            from scflow_tpu.metrics import ADDMetric
            from scflow_tpu.training.evaluate import evaluate_dataset

            test_ds = build_dataset(test_spec, seed=cfg.seed)
            test_builder = TestBatchBuilder(test_ds, cfg, mesh_points)

            def eval_fn(tr):
                metric = ADDMetric(
                    points_per_class=mesh_points,
                    diameters=np.asarray(points.diameters),
                    symmetric_classes=tuple(symmetric))
                m, _ = evaluate_dataset(tr, test_builder, metric,
                                        limit=args.eval_limit,
                                        progress_every=0)
                return {k: v for k, v in m.items()
                        if k.startswith("average/") or k == "num_instances"}
        else:
            # no test split on disk: masked device-side ADD(-S) over
            # synthetic jittered-GT batches (slot-aligned, no matching)
            from scflow_tpu.data import synthetic_batch
            from scflow_tpu.training.evaluate import \
                evaluate_device_accumulator

            def eval_fn(tr):
                batches = [synthetic_batch(
                    jax.random.PRNGKey(7_777 + i), renderer,
                    cfg.data.batch_size) for i in range(4)]
                return evaluate_device_accumulator(
                    tr, batches, points, num_classes, mesh=tr.mesh)

    trainer.fit(get_batch, num_steps=cfg.optim.total_steps,
                eval_every=args.eval_every, eval_fn=eval_fn,
                panel_every=args.panel_every)


if __name__ == "__main__":
    main()
