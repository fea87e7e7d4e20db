"""Dataset browser — visual inspection of pipeline output.

The reference tools/browse_dataset.py / browse_dataset_patch.py analogue:
loads samples from a dataset, draws GT / reference-pose overlays (projected
mesh points, 3D bbox, pose axes) on the full image and on the cropped
training patch, and writes PNGs to --out-dir for eyeballing.

Works with BOP or tracking layouts, or --synthetic (renders scenes on
device, no data needed).

Usage:
  python tools/browse_dataset.py --synthetic --out-dir /tmp/browse
  python tools/browse_dataset.py --data-root data/ycbv/train_pbr \
      --image-list data/ycbv/image_lists/train_pbr.txt \
      --mesh-dir data/ycbv/models_1024 --num 10 --out-dir /tmp/browse
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.visualize import draw_pose_axes, draw_projected_points  # noqa: E402


def _imwrite(path, img):
    try:
        import cv2

        cv2.imwrite(path, img[..., ::-1])  # RGB → BGR
    except ImportError:
        from PIL import Image

        Image.fromarray(img).save(path)


def parse_args():
    p = argparse.ArgumentParser(description="Browse dataset pipeline output")
    p.add_argument("--out-dir", default="work_dirs/browse")
    p.add_argument("--num", type=int, default=8)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--patch", action="store_true",
                   help="also dump cropped training patches (the reference "
                        "browse_dataset_patch.py analogue)")
    p.add_argument("--data-root", default=None)
    p.add_argument("--image-list", default=None)
    p.add_argument("--mesh-dir", default=None)
    p.add_argument("--mesh-ext", default="ply")
    p.add_argument("--num-classes", type=int, default=4)
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args()


def browse_synthetic(args):
    import jax

    from scflow_tpu.data import synthetic_batch
    from scflow_tpu.rendering import Renderer, make_test_meshes

    bank = make_test_meshes(num_classes=args.num_classes, subdivisions=2,
                            radius=60.0)
    renderer = Renderer(bank, image_size=(256, 256))
    batch = synthetic_batch(jax.random.PRNGKey(args.seed), renderer,
                            args.num)
    imgs = np.asarray(batch["real_images"])
    # un-normalize [0,1] → uint8
    imgs = np.clip(imgs * 255.0, 0, 255).astype(np.uint8)
    for i in range(args.num):
        img = np.ascontiguousarray(imgs[i])
        k = np.asarray(batch["k"][i])
        label = int(batch["labels"][i])
        verts = np.asarray(bank.verts[label])
        # GT pose in green dots, reference (jittered) pose in red dots
        img = draw_projected_points(img, verts[::7], k,
                                    np.asarray(batch["gt_rotations"][i]),
                                    np.asarray(batch["gt_translations"][i]),
                                    color=(0, 255, 0))
        img = draw_projected_points(img, verts[::7], k,
                                    np.asarray(batch["ref_rotations"][i]),
                                    np.asarray(batch["ref_translations"][i]),
                                    color=(255, 0, 0))
        img = draw_pose_axes(img, k, np.asarray(batch["gt_rotations"][i]),
                             np.asarray(batch["gt_translations"][i]),
                             length=40.0)
        _imwrite(os.path.join(args.out_dir, f"synthetic_{i:03d}.png"), img)
    print(f"wrote {args.num} panels to {args.out_dir}")


def browse_disk(args):
    from scflow_tpu.data.bop import SuperviseTrainDataset
    from scflow_tpu.data.pipeline import (crop_resize_pad, jitter_pose_np,
                                          project_bbox)
    from scflow_tpu.rendering import load_mesh_dir
    from scflow_tpu.training import YCBV_CLASS_NAMES
    from scflow_tpu.training.config import Config

    cfg = Config()
    bank = load_mesh_dir(args.mesh_dir, ext=args.mesh_ext)
    dataset = SuperviseTrainDataset(args.data_root, args.image_list,
                                    class_names=YCBV_CLASS_NAMES,
                                    seed=args.seed)
    rng = np.random.default_rng(args.seed)
    wrote = 0
    for idx in range(len(dataset)):
        if wrote >= args.num:
            break
        item = dataset[idx]
        if item is None:
            continue
        img = np.ascontiguousarray(item["image"])
        for i in range(len(item["labels"])):
            label = int(item["labels"][i])
            k = item["k"][i]
            r, t = item["gt_rotations"][i], item["gt_translations"][i]
            verts = np.asarray(bank.verts[label])
            img = draw_projected_points(img, verts[::17], k, r, t,
                                        color=(0, 255, 0))
            img = draw_pose_axes(img, k, r, t, length=40.0)
            if args.patch:
                ref_r, ref_t, *_ = jitter_pose_np(rng, r, t, cfg.jitter)
                bbox = project_bbox(verts, k, ref_r, ref_t)
                crop = crop_resize_pad(img, bbox, k,
                                       cfg.data.image_scale,
                                       size_ratio=1.1)
                patch = draw_projected_points(
                    np.ascontiguousarray(crop.patch), verts[::17],
                    crop.k_new, r, t, color=(0, 255, 0))
                _imwrite(os.path.join(
                    args.out_dir, f"patch_{wrote:03d}_{i}.png"), patch)
        _imwrite(os.path.join(args.out_dir, f"img_{wrote:03d}.png"), img)
        wrote += 1
    print(f"wrote {wrote} panels to {args.out_dir}")


def main():
    args = parse_args()
    os.makedirs(args.out_dir, exist_ok=True)
    if args.synthetic or not args.data_root:
        browse_synthetic(args)
    else:
        browse_disk(args)


if __name__ == "__main__":
    main()
