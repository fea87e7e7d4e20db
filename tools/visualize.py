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


def _class_color(label: int) -> tuple:
    """Deterministic per-class RGB color (golden-angle hue walk)."""
    import colorsys

    h = (label * 0.61803398875) % 1.0
    r, g, b = colorsys.hsv_to_rgb(h, 0.85, 0.95)
    return (int(r * 255), int(g * 255), int(b * 255))


def draw_detections(image, rotations, translations, model_points, ks,
                    labels=None, scores=None, num_points=512, thickness=2):
    """Class-colored 3D bbox + projected point cloud + score text per
    detection (reference ``draw_detections``, tools/visualize.py:87-156).

    Args:
      image: (H, W, 3) uint8 RGB.
      rotations/(N,3,3), translations/(N,3): predicted poses.
      model_points: (V, 3) mesh points shared by all instances, or a list
        of per-instance (V, 3) arrays.
      ks: (N, 3, 3) per-instance intrinsics (the reference passes one K per
        instance too).
      labels: optional (N,) class ids → per-class colors; default red.
      scores: optional (N,) confidences drawn as text at the bbox top.
    """
    import cv2

    img = np.ascontiguousarray(image.copy())
    rng = np.random.default_rng(0)
    n = len(rotations)
    for i in range(n):
        pts = (model_points[i] if isinstance(model_points, (list, tuple))
               else model_points)
        color = (_class_color(int(labels[i])) if labels is not None
                 else (255, 0, 0))
        lo, hi = pts.min(axis=0), pts.max(axis=0)
        c = pts.mean(axis=0)
        ext = (hi - lo) / 2.0
        corners = np.array([[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1)
                            for sz in (-1, 1)], np.float32) * ext + c
        img = draw_3d_bbox(img, corners, ks[i], rotations[i], translations[i],
                           color=color, thickness=thickness)
        choose = rng.choice(len(pts), min(num_points, len(pts)),
                            replace=False)
        img = draw_projected_points(img, pts[choose], ks[i], rotations[i],
                                    translations[i], color=color)
        if scores is not None:
            uv = project(corners, ks[i], rotations[i],
                         translations[i]).astype(int)
            org = (int(uv[:, 0].min()), max(int(uv[:, 1].min()) - 4, 12))
            cv2.putText(img, f"{float(scores[i]):.2f}", org,
                        cv2.FONT_HERSHEY_SIMPLEX, 0.5, color, 1,
                        cv2.LINE_AA)
    return img


class VisTool:
    """Batch mask/contour overlay at predicted poses (reference
    ``Pytorch3dVisTool``, tools/visualize.py:582-640), driven by the JAX
    renderer in mask-only mode.

    ``vis_mode``: 'mask' (0.5-alpha class-colored masks) or 'contour'.
    """

    def __init__(self, renderer, vis_mode: str = "mask", score_thr: float = 0.0,
                 contour_size: int = 3):
        import dataclasses as _dc

        assert vis_mode in ("mask", "contour")
        self.renderer = _dc.replace(renderer, render_image=False)
        self.vis_mode = vis_mode
        self.score_thr = score_thr
        self.contour_size = contour_size

    def __call__(self, image, rotations, translations, labels, ks,
                 scores=None, out_file=None):
        import cv2
        import jax.numpy as jnp

        if len(rotations) == 0:
            return image
        keep = (np.asarray(scores) > self.score_thr if scores is not None
                else np.ones(len(rotations), bool))
        rotations, translations = rotations[keep], translations[keep]
        labels, ks = labels[keep], ks[keep]
        out = self.renderer(jnp.asarray(rotations), jnp.asarray(translations),
                            jnp.asarray(ks), jnp.asarray(labels, jnp.int32))
        masks = np.asarray(out["mask"])
        img = np.ascontiguousarray(image.copy())   # never mutate the input
        if self.vis_mode == "mask":
            colored = np.zeros_like(img)
            for m, lab in zip(masks, labels):
                colored[m] = _class_color(int(lab))
            img = (img * 0.5 + colored * 0.5).astype(np.uint8)
        else:
            for m, lab in zip(masks, labels):
                contours, _ = cv2.findContours(
                    m.astype(np.uint8), cv2.RETR_EXTERNAL,
                    cv2.CHAIN_APPROX_SIMPLE)
                img = cv2.drawContours(img, contours, -1,
                                       _class_color(int(lab)),
                                       self.contour_size)
        if out_file is not None:
            cv2.imwrite(out_file, img[..., ::-1])
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
