"""Training CLI — the reference ``train.py`` equivalent.

Examples:
  # synthetic smoke training (no dataset needed)
  python train.py --synthetic --steps 200 --work-dir work_dirs/smoke

  # YCB-V PBR recipe (BOP layout on disk)
  python train.py --data-root data/ycbv/train_pbr \
      --image-list data/ycbv/image_lists/train_pbr.txt \
      --mesh-dir data/ycbv/models_1024 --work-dir work_dirs/scflow_ycbv

  # multi-host data parallelism (per host):
  SCFLOW_NUM_PROCESSES=2 SCFLOW_PROCESS_ID=0 \
      SCFLOW_COORDINATOR=host0:9999 python train.py ...
"""
import argparse
import os


def parse_args():
    p = argparse.ArgumentParser(description="Train an SCFlow-TPU refiner")
    p.add_argument("--work-dir", default="work_dirs/scflow")
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--lr", type=float, default=4e-4)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--synthetic", action="store_true",
                   help="train on on-device synthetic scenes (no data needed)")
    p.add_argument("--num-classes", type=int, default=21)
    p.add_argument("--data-root", default=None)
    p.add_argument("--image-list", default=None)
    p.add_argument("--mesh-dir", default=None)
    p.add_argument("--mesh-ext", default="ply")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args()


def main():
    args = parse_args()

    from scflow_tpu.parallel import initialize_distributed

    initialize_distributed()

    import jax

    from scflow_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from scflow_tpu.rendering import Renderer, load_mesh_dir, make_test_meshes
    from scflow_tpu.training import (Config, DataConfig, ModelConfig,
                                     OptimConfig, build_points_bank,
                                     YCBV_SYMMETRIC_CLASSES,
                                     YCBV_MESH_DIAMETERS)
    from scflow_tpu.training.trainer import Trainer

    cfg = Config(
        model=ModelConfig(num_class=args.num_classes, iters=args.iters,
                          test_iters=args.iters),
        optim=OptimConfig(lr=args.lr,
                          total_steps=args.steps or 100_000),
        data=DataConfig(batch_size=args.batch_size,
                        image_scale=args.image_size),
        seed=args.seed,
        work_dir=args.work_dir,
    )

    if args.mesh_dir:
        bank = load_mesh_dir(args.mesh_dir, ext=args.mesh_ext)
        symmetric = YCBV_SYMMETRIC_CLASSES if args.num_classes == 21 else ()
        diameters = (YCBV_MESH_DIAMETERS if args.num_classes == 21 else None)
    else:
        bank = make_test_meshes(num_classes=args.num_classes, subdivisions=2)
        symmetric, diameters = (), None

    renderer = Renderer(bank, image_size=(args.image_size, args.image_size))
    points = build_points_bank(bank, symmetric_classes=symmetric,
                               diameters=diameters,
                               num_points=cfg.loss.num_loss_points)
    trainer = Trainer(cfg, renderer, points)

    if args.synthetic or not args.data_root:
        from scflow_tpu.data import synthetic_batch
        from scflow_tpu.training import render_at_pose

        def get_batch(step):
            return synthetic_batch(jax.random.PRNGKey(cfg.seed * 1000_003 + step),
                                   renderer, cfg.data.batch_size)

        sample = get_batch(0)
    else:
        import numpy as np

        from scflow_tpu.data.bop import SuperviseTrainDataset
        from scflow_tpu.data.loader import TrainBatchBuilder, prefetch
        from scflow_tpu.training import YCBV_CLASS_NAMES

        dataset = SuperviseTrainDataset(
            args.data_root, args.image_list,
            class_names=YCBV_CLASS_NAMES,
            min_visib_fract=cfg.data.min_visib_fract, seed=cfg.seed)
        mesh_points = [np.asarray(points.points[c]) for c in
                       range(bank.num_classes)]
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

    trainer.fit(get_batch, num_steps=args.steps)


if __name__ == "__main__":
    main()
