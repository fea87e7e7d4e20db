"""Pose visualization: 3D bboxes, pose axes, projected points, render overlay.

Replacement for the reference tools/visualize.py (draw_detections / pose
axes / contour overlays), numpy+cv2 based, with the render overlay driven by
the framework's own JAX renderer instead of pytorch3d/pyrender.
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

_BOX_EDGES = [(0, 1), (0, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 7), (6, 7),
              (0, 4), (1, 5), (2, 6), (3, 7)]


def project(points, k, r, t):
    p = points @ r.T + t
    uvw = p @ k.T
    return uvw[:, :2] / np.maximum(uvw[:, 2:3], 1e-8)


def draw_3d_bbox(image, corners_3d, k, r, t, color=(0, 255, 0), thickness=2):
    """Draw a projected 3D bounding box (8 corners, bbox_corners order)."""
    import cv2

    img = np.ascontiguousarray(image.copy())
    pts = project(corners_3d, k, r, t).astype(int)
    for a, b in _BOX_EDGES:
        cv2.line(img, tuple(pts[a]), tuple(pts[b]), color, thickness)
    return img


def draw_pose_axes(image, k, r, t, length=50.0, thickness=3):
    """Draw RGB xyz axes at the object origin."""
    import cv2

    img = np.ascontiguousarray(image.copy())
    pts = project(np.array([[0, 0, 0], [length, 0, 0], [0, length, 0],
                            [0, 0, length]], np.float32), k, r, t).astype(int)
    for i, color in enumerate([(0, 0, 255), (0, 255, 0), (255, 0, 0)]):
        cv2.line(img, tuple(pts[0]), tuple(pts[i + 1]), color, thickness)
    return img


def draw_projected_points(image, points_3d, k, r, t, color=(255, 0, 0)):
    import cv2

    img = np.ascontiguousarray(image.copy())
    for x, y in project(points_3d, k, r, t).astype(int):
        cv2.circle(img, (int(x), int(y)), 1, color, -1)
    return img


def draw_pose_contour(image, renderer, k, r, t, label, color=(0, 255, 255),
                      thickness=2):
    """Overlay the rendered-mask contour at a pose (reference
    Pytorch3dVisTool equivalent, driven by the JAX renderer)."""
    import cv2
    import jax.numpy as jnp

    out = renderer(jnp.asarray(r)[None], jnp.asarray(t)[None],
                   jnp.asarray(k)[None], jnp.asarray([label]))
    mask = np.asarray(out["mask"][0]).astype(np.uint8) * 255
    contours, _ = cv2.findContours(mask, cv2.RETR_EXTERNAL,
                                   cv2.CHAIN_APPROX_SIMPLE)
    img = np.ascontiguousarray(image.copy())
    cv2.drawContours(img, contours, -1, color, thickness)
    return img


def main():
    p = argparse.ArgumentParser(description="Render pose overlays for a BOP image")
    p.add_argument("--data-root", required=True)
    p.add_argument("--ref-annots-root", required=True)
    p.add_argument("--image-list", required=True)
    p.add_argument("--mesh-dir", required=True)
    p.add_argument("--mesh-ext", default="ply")
    p.add_argument("--index", type=int, default=0)
    p.add_argument("--out", default="vis.png")
    args = p.parse_args()

    import cv2

    from scflow_tpu.data.bop import RefineDataset
    from scflow_tpu.rendering import Renderer, load_mesh_dir
    from scflow_tpu.training import YCBV_CLASS_NAMES

    dataset = RefineDataset(args.data_root, args.ref_annots_root,
                            args.image_list, class_names=YCBV_CLASS_NAMES)
    item = dataset[args.index]
    assert item is not None
    bank = load_mesh_dir(args.mesh_dir, ext=args.mesh_ext)
    img = item["image"]
    h, w = img.shape[:2]
    renderer = Renderer(bank, image_size=(h, w))
    for i in range(len(item["labels"])):
        img = draw_pose_contour(img, renderer, item["ori_k"],
                                item["ref_rotations"][i],
                                item["ref_translations"][i],
                                int(item["labels"][i]))
        img = draw_pose_axes(img, item["ori_k"], item["ref_rotations"][i],
                             item["ref_translations"][i])
    cv2.imwrite(args.out, img[..., ::-1])
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
