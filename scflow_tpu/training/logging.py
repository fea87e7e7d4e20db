"""Training observability: scalar JSONL + image panel logging.

The reference logs flow/image/mask panels to TensorBoard via a custom hook
(models/utils/tensorboard_hook.py, base_refiner.py:297-357). Here panels are
assembled host-side (flow→RGB with the invalid-sentinel convention) and
written as PNGs under ``work_dir/images``; a TensorBoard writer is used too
when the package is available.
"""
from __future__ import annotations

import os

import numpy as np

from ..utils.flow_vis import flow_to_rgb


def _to_u8(img: np.ndarray) -> np.ndarray:
    return np.clip(img * 255.0, 0, 255).astype(np.uint8)


def make_train_panel(real_image, rendered_image, gt_flow, pose_flow,
                     pred_flow, mask=None, max_flow: float = 400.0):
    """Horizontal panel [real | render | gt flow | pose flow | pred flow
    (| mask)] for one sample; all inputs HWC numpy, flows (H, W, 2)."""
    cols = [
        _to_u8(np.asarray(real_image)),
        _to_u8(np.asarray(rendered_image)),
        _to_u8(flow_to_rgb(np.asarray(gt_flow), unknown_thr=max_flow - 1)),
        _to_u8(flow_to_rgb(np.asarray(pose_flow), unknown_thr=max_flow - 1)),
        _to_u8(flow_to_rgb(np.asarray(pred_flow), unknown_thr=max_flow - 1)),
    ]
    if mask is not None:
        m = np.asarray(mask)
        cols.append(_to_u8(np.repeat(m[..., None], 3, axis=-1)))
    return np.concatenate(cols, axis=1)


class ImageLogger:
    """Periodic image-panel logger (PNG + TensorBoard event file).

    The TB mirror uses the first-party event writer
    (:class:`~scflow_tpu.utils.tb_writer.TBEventWriter`) — the reference's
    TensorboardImgLoggerHook contract without a tensorflow/torch-TB import.
    """

    def __init__(self, work_dir: str, interval: int = 100,
                 tensorboard: bool = True):
        self.image_dir = os.path.join(work_dir, "images")
        self.interval = interval
        self._tb = None
        if tensorboard:
            from ..utils.tb_writer import TBEventWriter

            self._tb = TBEventWriter(os.path.join(work_dir, "tb"),
                                     filename_suffix=".images")

    def should_log(self, step: int) -> bool:
        return (step + 1) % self.interval == 0

    def log_panel(self, step: int, name: str, panel: np.ndarray):
        os.makedirs(self.image_dir, exist_ok=True)
        path = os.path.join(self.image_dir, f"{name}_{step:08d}.png")
        try:
            import cv2

            cv2.imwrite(path, panel[..., ::-1])
        except ImportError:
            from PIL import Image

            Image.fromarray(panel).save(path)
        if self._tb is not None:
            self._tb.add_image(name, panel, step)
            self._tb.flush()

    def log_scalars(self, step: int, scalars: dict):
        if self._tb is not None:
            self._tb.add_scalars({k: float(v) for k, v in scalars.items()},
                                 step)
            self._tb.flush()


def sequence_epe_report(seq_flow, gt_flow, valid=None, max_flow=400.0):
    """Per-iteration EPE / accuracy report for a (T, N, H, W, 2) flow
    sequence (the reference's eval_seq_epe debug eval,
    base_refiner.py:464-480, without the disk dumps).

    Returns a list of T dicts with keys epe/acc1/acc3/acc5.
    """
    import jax.numpy as jnp

    from ..geometry.flow import endpoint_error

    mag_ok = jnp.linalg.norm(gt_flow, axis=-1) < max_flow
    v = mag_ok if valid is None else (mag_ok & (valid >= 0.5))
    out = []
    for t in range(seq_flow.shape[0]):
        r = endpoint_error(seq_flow[t], gt_flow, v)
        out.append({k: float(np.asarray(x)) for k, x in r.items()})
    return out
