"""Typed configuration tree (dataclasses) — the mmengine-config replacement.

Knob surface mirrors the reference recipes
(configs/refine_models/scflow_ycbv_pbr.py): model family and sizes, GRU
iterations, pyramid levels/radius, loss weights and gamma, jitter
distributions, crop/resize/pad, renderer options, optimizer + OneCycle
schedule, eval metrics.
"""
from __future__ import annotations

import dataclasses
from typing import Sequence


@dataclasses.dataclass
class ModelConfig:
    family: str = "scflow"            # 'scflow' | 'raft_flow' | 'raft_flow_mask'
    num_class: int = 21
    separate_encoder: bool = False
    net_type: str = "Basic"
    feat_channels: int = 256
    h_channels: int = 128
    cxt_channels: int = 128
    num_levels: int = 4
    radius: int = 4
    iters: int = 8
    test_iters: int = 8
    rotation_mode: str = "ortho6d"
    depth_transform: str = "exp"
    detach_depth_for_xy: bool = True
    mask_flow: bool = False
    mask_corr: bool = False
    # remat the decoder scan body in backward (recompute vs HBM traffic)
    remat: bool = False
    max_flow: float = 400.0
    filter_invalid_flow: bool = True
    # compute dtype for the conv/matmul stack: 'float32' | 'bfloat16'
    # (params and all geometry/pose math stay float32)
    dtype: str = "float32"
    # multi-cycle training / multi-pass testing (reference
    # train_cfg.cycles / test_cfg.cycles, base_refiner.py:254-294):
    # re-render at the refined pose between cycles/passes
    train_cycles: int = 1
    test_passes: int = 1
    # eval fast path: carry the pose-induced flow at feature resolution
    # (bilinear-downsample-equivalent up to <0.01px projection
    # linearization); full-res outputs are built for the final iteration
    lowres_eval: bool = True


@dataclasses.dataclass
class LossConfig:
    gamma: float = 0.8
    pose_weight: float = 10.0
    flow_weight: float = 0.1
    mask_weight: float = 10.0
    pose_loss_type: str = "l1"
    pose_disentangled: bool = True
    pose_disentangle_z: bool = True
    num_loss_points: int = 512        # mesh points sampled per class


@dataclasses.dataclass
class OptimConfig:
    lr: float = 4e-4
    total_steps: int = 100_000
    pct_start: float = 0.05
    weight_decay: float = 1e-4
    betas: tuple = (0.9, 0.999)
    eps: float = 1e-8
    grad_clip_norm: float = 10.0
    div_factor: float = 25.0          # torch OneCycleLR defaults
    final_div_factor: float = 1e4


@dataclasses.dataclass(frozen=True)
class JitterConfig:
    """Gaussian SE(3) jitter of GT → reference pose
    (reference datasets/pipelines/jitter.py:51-109)."""
    angle_std_deg: float = 15.0
    xy_std_mm: float = 15.0
    z_std_mm: float = 50.0
    angle_limit_deg: float = 45.0
    translation_limit_mm: float = 200.0
    add_limit: float = 1.0            # × mesh diameter


@dataclasses.dataclass
class RenderConfig:
    image_size: tuple = (256, 256)
    background_color: tuple = (0.5, 0.5, 0.5)
    separate_lights: bool = True
    light_offset: float = 400.0


@dataclasses.dataclass
class DataConfig:
    batch_size: int = 16
    image_scale: int = 256
    crop_size_range: tuple = (1.0, 1.25)
    test_crop_size: float = 1.1
    normalize_mean: tuple = (0.0, 0.0, 0.0)
    normalize_std: tuple = (255.0, 255.0, 255.0)
    min_visib_fract: float = 0.2
    # train-time photometric augmentation of the real-image crop (the
    # shipped recipe applies HSV -> noise -> smooth,
    # configs/refine_models/scflow_ycbv_pbr.py:69-71)
    color_aug: bool = True
    # multi-object scene batching (BASELINE.md config 4): sample every
    # visible object of `scene_images` images into `slots_per_image` padded
    # slots masked by sample_valid (reference ragged analogue:
    # models/refiner/base_refiner.py:95,160-167). The effective batch is
    # scene_images * slots_per_image.
    scene_mode: bool = False
    scene_images: int = 4
    slots_per_image: int = 4
    # C++ data path (native/scflow_native.cpp): bit-exact image decode in
    # every reader (speed-parity with cv2's libjpeg-turbo path, works
    # without cv2), plus a fused batched crop+resize+pad+normalize for the
    # eval builder. Auto-falls back to cv2/numpy when the lib can't build.
    use_native: bool = True
    # crop backend: 'auto' uses cv2's SIMD resize when importable (measured
    # 4.5x the scalar C++ bilinear) and the native path otherwise;
    # 'on'/'off' force it. README "Native data path" records the numbers.
    native_crop: str = "auto"
    # background replacement / occlusion pasting on the cropped patch
    # (reference RandomBackground / RandomOcclusion,
    # datasets/pipelines/color_transform.py:176-403; the mixpbr/mix20real
    # recipes use RandomBackground(background_dir='data/coco', p=0.3))
    background_dir: str | None = None
    background_p: float = 0.3
    occlusion_p: float = 0.0
    # object-paste occlusion (reference RandomOcclusionV2,
    # color_transform.py:329-403): paste another object's warped crop over
    # the target and update visibility; occluders come from a reservoir of
    # recent samples' (patch, mask) pairs in the train builder
    occlusion_v2_p: float = 0.0


@dataclasses.dataclass
class Config:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    loss: LossConfig = dataclasses.field(default_factory=LossConfig)
    optim: OptimConfig = dataclasses.field(default_factory=OptimConfig)
    jitter: JitterConfig = dataclasses.field(default_factory=JitterConfig)
    render: RenderConfig = dataclasses.field(default_factory=RenderConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    seed: int = 0
    checkpoint_interval: int = 10_000
    log_interval: int = 50
    work_dir: str = "work_dirs/scflow"
    # mirror scalar logs + image panels into work_dir/tb as TensorBoard
    # event files (reference TensorboardLoggerHook/TensorboardImgLoggerHook,
    # models/utils/tensorboard_hook.py:87-120; jsonl + PNGs stay the
    # primary contract — this is the drop-in TB view of the same data)
    tensorboard: bool = True


# YCB-V constants (reference configs/refine_models/scflow_ycbv_pbr.py:18-39)
YCBV_SYMMETRIC_CLASSES = (12, 15, 18, 19, 20)  # 0-based: cls 13,16,19,20,21
YCBV_MESH_DIAMETERS = (
    172.16, 269.58, 198.38, 120.66, 199.79, 90.17, 142.58, 114.39, 129.73,
    198.40, 263.60, 260.76, 162.27, 126.86, 230.44, 237.30, 204.11, 121.46,
    183.08, 231.39, 102.92)
YCBV_CLASS_NAMES = (
    "master_chef_can", "cracker_box", "sugar_box", "tomato_soup_can",
    "mustard_bottle", "tuna_fish_can", "pudding_box", "gelatin_box",
    "potted_meat_can", "banana", "pitcher_base", "bleach_cleanser", "bowl",
    "mug", "power_drill", "wood_block", "scissors", "large_marker",
    "large_clamp", "extra_large_clamp", "foam_brick")
