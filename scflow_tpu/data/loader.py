"""Host-side batch assembly: dataset + pipeline → fixed-shape train batches.

Replaces the reference's DataLoader + DataContainer/collate machinery
(datasets/pipelines/data_container.py): every batch is a dict of stacked
numpy arrays with static shapes (object slots padded per image and masked
via ``sample_valid``), ready for ``jax.device_put`` with a sharded batch
axis. A simple double-buffered background-thread prefetcher overlaps host
data work with device steps.
"""
from __future__ import annotations

import queue
import threading
from collections.abc import Iterator

import numpy as np

from ..training.config import Config, JitterConfig
from .bop import RefineDataset, SuperviseTrainDataset
from .color_aug import default_train_augs
from .pipeline import (crop_resize_pad, jitter_pose_np, normalize_image,
                       project_bbox)


class TrainBatchBuilder:
    """Build SCFlow train batches from a SuperviseTrainDataset.

    Per object: jitter GT→ref pose, project keypoints for the ref bbox,
    crop/resize/pad around the ref bbox, adapt intrinsics; stack into a
    fixed-size batch (reference train pipeline,
    configs/refine_models/scflow_ycbv_pbr.py:46-89).
    """

    def __init__(self, dataset: SuperviseTrainDataset, cfg: Config,
                 mesh_points_per_class: list[np.ndarray],
                 mesh_diameters: list[float], seed: int = 0):
        self.dataset = dataset
        self.cfg = cfg
        self.mesh_points = mesh_points_per_class
        self.diameters = mesh_diameters
        self.rng = np.random.default_rng(seed)
        from . import native

        native.set_enabled(cfg.data.use_native)  # C++ image decode path
        # background-image list for RandomBackground (reference
        # color_transform.py:176-244; loaded lazily, one decode per use —
        # same as the reference's per-call file_client read)
        self._bg_paths: list[str] = []
        if cfg.data.background_dir:
            import glob
            import os.path as osp

            for ext in ("*.jpg", "*.png"):
                self._bg_paths += glob.glob(
                    osp.join(cfg.data.background_dir, ext))
            self._bg_paths.sort()
        # occluder reservoir for object-paste occlusion (RandomOcclusionV2
        # behavior): recent samples' pre-augmentation (patch, mask) pairs
        # serve as occluders for later samples (the reference draws from a
        # pre-rendered occluder-image list — same behavior class)
        self._occluder_pool: list[tuple[np.ndarray, np.ndarray]] = []
        self._occluder_pool_size = 16

    def _load_background(self) -> np.ndarray | None:
        from .bop import _imread

        path = self._bg_paths[int(self.rng.integers(len(self._bg_paths)))]
        try:
            return _imread(path)
        except Exception:
            return None

    def _one_sample(self) -> dict | None:
        idx = int(self.rng.integers(len(self.dataset)))
        # pass our own RNG: the dataset object is shared across prefetch
        # workers and numpy Generators are not thread-safe
        item = self.dataset.get(idx, self.rng)
        if item is None:
            return None
        # one object per crop (reference sample_num=1 recipe)
        i = int(self.rng.integers(len(item["labels"])))
        return self._prep_object(item, i)

    def _prep_object(self, item: dict, i: int) -> dict:
        """Jitter + crop one object of a loaded image into a train sample."""
        label = int(item["labels"][i])
        gt_r = item["gt_rotations"][i]
        gt_t = item["gt_translations"][i]
        k = item["k"][i]

        ref_r, ref_t, add_err, trans_err, rot_err = jitter_pose_np(
            self.rng, gt_r, gt_t, self.cfg.jitter,
            mesh_points=self.mesh_points[label][:1000],
            mesh_diameter=self.diameters[label])

        bbox = project_bbox(self.mesh_points[label], k, ref_r, ref_t)
        size_ratio = self.rng.uniform(*self.cfg.data.crop_size_range)
        crop = crop_resize_pad(
            item["image"], bbox, k, self.cfg.data.image_scale,
            size_ratio=size_ratio, mask=item["gt_masks"][i])

        patch = crop.patch
        mask_patch = crop.mask_patch
        d = self.cfg.data
        if self._bg_paths and self.rng.uniform() < d.background_p:
            from .color_aug import random_background

            bg = self._load_background()
            if bg is not None:
                patch = random_background(self.rng, patch, mask_patch,
                                          [bg], p=1.1)
        if d.occlusion_v2_p > 0:
            from .color_aug import random_occlusion_v2

            # stash this crop as a future occluder BEFORE occluding it
            # (occluders must be clean object views), then paste one
            if mask_patch.any():
                pool = self._occluder_pool
                entry = (patch.copy(), mask_patch.copy())
                if len(pool) < self._occluder_pool_size:
                    pool.append(entry)
                else:
                    pool[int(self.rng.integers(len(pool)))] = entry
            if self._occluder_pool:
                occ_img, occ_mask = self._occluder_pool[
                    int(self.rng.integers(len(self._occluder_pool)))]
                patch, mask_patch = random_occlusion_v2(
                    self.rng, patch, mask_patch, occ_img, occ_mask,
                    p=d.occlusion_v2_p)
        if d.occlusion_p > 0:
            from .color_aug import random_occlusion

            patch, mask_patch = random_occlusion(self.rng, patch, mask_patch,
                                                 p=d.occlusion_p)
        if d.color_aug:
            patch = default_train_augs(self.rng, patch)
        # ship raw uint8; the jitted steps normalize on device (4x fewer
        # host->device bytes — steps.device_normalize_images)
        return {
            "real_images": np.ascontiguousarray(patch),
            "gt_masks": mask_patch.astype(np.uint8),
            "gt_rotations": gt_r, "gt_translations": gt_t,
            "ref_rotations": ref_r, "ref_translations": ref_t,
            "k": crop.k_new.astype(np.float32),
            "labels": np.int32(label),
            "init_add_error": np.float32(add_err),
            "init_rot_error": np.float32(rot_err),
            "init_trans_error": np.float32(trans_err),
        }

    def spawn(self, worker_id: int) -> "TrainBatchBuilder":
        """Clone with an independent RNG stream (for prefetch workers)."""
        clone = type(self)(self.dataset, self.cfg, self.mesh_points,
                           self.diameters)
        clone.rng = np.random.default_rng(
            [int(self.rng.integers(1 << 31)), worker_id])
        return clone

    def __call__(self) -> dict:
        samples = []
        while len(samples) < self.cfg.data.batch_size:
            s = self._one_sample()
            if s is not None:
                samples.append(s)
        return {k: np.stack([s[k] for s in samples]) for k in samples[0]}


class SceneTrainBatchBuilder(TrainBatchBuilder):
    """Scene-batched training (BASELINE.md config 4): every visible object
    of each sampled image becomes an object slot; images' slots are padded
    to ``slots_per_image`` and masked with ``sample_valid`` so the loss and
    the context encoder's BN statistics ignore the filler slots.

    The flattened batch is (num_images × slots_per_image, ...) — one shared
    jitted train step serves both the single-object and the scene recipes
    (fixed shapes; reference analogue is the ragged ``per_img_patch_num``
    handling in models/refiner/base_refiner.py:95,160-167).

    The dataset should be constructed with ``sample_num=-1`` (all objects).
    """

    def __init__(self, dataset: SuperviseTrainDataset, cfg: Config,
                 mesh_points_per_class: list[np.ndarray],
                 mesh_diameters: list[float], seed: int = 0,
                 num_images: int = 4, slots_per_image: int = 4):
        super().__init__(dataset, cfg, mesh_points_per_class, mesh_diameters,
                         seed)
        self.num_images = num_images
        self.slots_per_image = slots_per_image

    def spawn(self, worker_id: int) -> "SceneTrainBatchBuilder":
        clone = SceneTrainBatchBuilder(
            self.dataset, self.cfg, self.mesh_points, self.diameters,
            num_images=self.num_images, slots_per_image=self.slots_per_image)
        clone.rng = np.random.default_rng(
            [int(self.rng.integers(1 << 31)), worker_id])
        return clone

    def _one_scene(self) -> list[dict] | None:
        idx = int(self.rng.integers(len(self.dataset)))
        item = self.dataset.get(idx, self.rng)
        if item is None:
            return None
        n = len(item["labels"])
        order = (self.rng.permutation(n)[:self.slots_per_image]
                 if n > self.slots_per_image else range(n))
        return [self._prep_object(item, int(i)) for i in order]

    def __call__(self) -> dict:
        scenes = []
        while len(scenes) < self.num_images:
            s = self._one_scene()
            if s:
                scenes.append(s)
        slots, valid = [], []
        for scene in scenes:
            pad = self.slots_per_image - len(scene)
            slots.extend(scene)
            slots.extend([scene[0]] * pad)      # filler: copy of slot 0
            valid.extend([1.0] * len(scene) + [0.0] * pad)
        batch = {k: np.stack([s[k] for s in slots]) for k in slots[0]}
        batch["sample_valid"] = np.asarray(valid, np.float32)
        return batch


class TestBatchBuilder:
    """Build per-image eval batches from a RefineDataset: all objects of an
    image cropped at their ref-pose bboxes (reference test pipeline:
    crop 1.1× at bbox, resize, pad, adapt K).

    With ``cfg.data.use_native`` (default) the per-object crops run through
    the C++ thread-pooled fused crop+resize+pad+normalize
    (native/scflow_native.cpp) — same box shaping (pipeline.expand_bbox),
    identical transforms; falls back to cv2/numpy when the lib is absent.
    """

    def __init__(self, dataset: RefineDataset, cfg: Config,
                 mesh_points_per_class: list[np.ndarray]):
        self.dataset = dataset
        self.cfg = cfg
        self.mesh_points = mesh_points_per_class
        from . import native

        native.set_enabled(cfg.data.use_native)
        if cfg.data.native_crop == "auto":
            try:
                import cv2  # noqa: F401 — SIMD resize beats the C++ crop

                use_crop = False
            except ImportError:
                use_crop = True
        else:
            use_crop = cfg.data.native_crop == "on"
        self._native = (use_crop and cfg.data.use_native
                        and native.get_lib() is not None)

    def __len__(self):
        return len(self.dataset)

    def _crops_native(self, item: dict, n: int):
        from . import native
        from .pipeline import expand_bbox

        boxes = np.empty((n, 4), np.float32)
        for i in range(n):
            label = int(item["labels"][i])
            bbox = project_bbox(self.mesh_points[label], item["k"][i],
                                item["ref_rotations"][i],
                                item["ref_translations"][i])
            boxes[i] = expand_bbox(bbox,
                                   size_ratio=self.cfg.data.test_crop_size)
        imgs, transforms = native.crop_resize_pad_batch(
            [item["image"]] * n, boxes, self.cfg.data.image_scale,
            mean=self.cfg.data.normalize_mean,
            std=self.cfg.data.normalize_std)
        ks = np.einsum("nij,njk->nik", transforms,
                       item["k"].astype(np.float32))
        return list(imgs), list(ks), list(transforms)

    def _crops_python(self, item: dict, n: int):
        imgs, ks, transforms = [], [], []
        for i in range(n):
            label = int(item["labels"][i])
            bbox = project_bbox(self.mesh_points[label], item["k"][i],
                                item["ref_rotations"][i],
                                item["ref_translations"][i])
            crop = crop_resize_pad(item["image"], bbox, item["k"][i],
                                   self.cfg.data.image_scale,
                                   size_ratio=self.cfg.data.test_crop_size)
            # raw uint8 crop: normalized on device (2-4x fewer upload
            # bytes; the image upload bounds tunnel-attached eval)
            imgs.append(np.ascontiguousarray(crop.patch))
            ks.append(crop.k_new.astype(np.float32))
            transforms.append(crop.transform)
        return imgs, ks, transforms

    def __getitem__(self, index: int) -> dict | None:
        item = self.dataset[index]
        if item is None:
            return None
        n = len(item["labels"])
        if self._native:
            imgs, ks, transforms = self._crops_native(item, n)
        else:
            imgs, ks, transforms = self._crops_python(item, n)
        out = {
            # native path yields normalized f32, python path raw uint8 —
            # the device steps handle both (device_normalize_images)
            "real_images": np.stack(imgs),
            "ref_rotations": item["ref_rotations"],
            "ref_translations": item["ref_translations"],
            "k": np.stack(ks),
            "labels": item["labels"].astype(np.int32),
            "transform_matrix": np.stack(transforms),
            "scene_id": item["scene_id"],
            "img_id": item["img_id"],
            "ori_k": item["ori_k"],
        }
        for key in ("gt_rotations", "gt_translations", "gt_labels"):
            if key in item:
                out[key] = item[key]
        return out


def pad_to_batch(batch: dict, batch_size: int) -> dict:
    """Pad an n-object batch to a fixed size with a ``sample_valid`` mask
    (fixed-shape handling of variable object counts — SURVEY.md hard part 5)."""
    n = len(batch["labels"])
    if n > batch_size:
        raise ValueError(f"{n} objects exceed batch budget {batch_size}")
    out = {}
    valid = np.zeros((batch_size,), np.float32)
    valid[:n] = 1.0
    for k, v in batch.items():
        v = np.asarray(v)
        if v.ndim >= 1 and v.shape[0] == n and k not in (
                "scene_id", "img_id", "ori_k"):
            pad_shape = (batch_size - n,) + v.shape[1:]
            filler = (np.tile(v[:1], (batch_size - n,) + (1,) * (v.ndim - 1))
                      if n > 0 else np.zeros(pad_shape, v.dtype))
            out[k] = np.concatenate([v, filler], axis=0)
        else:
            out[k] = v
    out["sample_valid"] = valid
    return out


def prefetch(iterator_fn, num_prefetch: int = 4,
             num_workers: int = 3) -> Iterator[dict]:
    """Run ``iterator_fn()`` in background threads with a small queue.

    The reference uses 8 DataLoader worker *processes*
    (configs/refine_models/scflow_ycbv_pbr.py); here a few threads suffice —
    cv2/libjpeg/numpy release the GIL for the heavy parts, and the builders
    draw independent random samples so concurrent calls are safe as long as
    ``iterator_fn`` tolerates concurrent invocation (TrainBatchBuilder does:
    each worker gets its own RNG via ``iterator_fn.spawn(i)`` when the
    callable provides it — numpy Generators are not thread-safe).
    """
    q: queue.Queue = queue.Queue(maxsize=num_prefetch)
    stop = threading.Event()

    num_workers = max(1, num_workers)
    if hasattr(iterator_fn, "spawn"):
        fns = [iterator_fn.spawn(i) for i in range(num_workers)]
    else:
        fns = [iterator_fn]

    def worker(fn):
        while not stop.is_set():
            batch = fn()
            while not stop.is_set():
                try:
                    q.put(batch, timeout=1.0)
                    break
                except queue.Full:
                    continue

    threads = [threading.Thread(target=worker, args=(fn,), daemon=True)
               for fn in fns]
    for th in threads:
        th.start()

    def _shutdown():
        # stop workers before interpreter teardown — a daemon thread killed
        # mid-C++ (cv2/libjpeg) aborts the process
        stop.set()
        while True:          # drain so put() unblocks
            try:
                q.get_nowait()
            except queue.Empty:
                break
        for th in threads:
            th.join(timeout=2.0)

    import atexit

    atexit.register(_shutdown)
    try:
        while True:
            yield q.get()
    finally:
        stop.set()
