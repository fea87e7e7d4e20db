"""Load the reference's pure-torch modules as a numerical oracle.

The reference (/root/reference) depends on mmcv/mmengine/kornia/trimesh,
which are not installed here. The modules we need for numerical parity
(CorrLookup, RAFTDecoder pieces, SCFlowDecoder, pose math, RAFTEncoder)
only use a thin, well-defined slice of those APIs, so this file installs
*faithful* shims into sys.modules and then imports the real reference
source files. Fidelity notes:

- ``mmcv.cnn.ConvModule``: conv → (norm) → (act); bias='auto' means
  bias = (norm is None); the norm submodule attribute is named by mmcv's
  abbreviation rules ('bn'/'in'/'gn' + postfix) — this is what determines
  the *state_dict key layout of published reference checkpoints*, which
  our converter must consume.
- ``mmcv.cnn.build_norm_layer``: 'IN' → nn.InstanceNorm2d (affine=False,
  torch default — the reference feature encoders have NO norm params),
  'BN' → nn.BatchNorm2d, 'GN' → nn.GroupNorm.
- ``kornia...quaternion_to_rotation_matrix``: legacy xyzw coefficient
  order — the reference pose head identity-initializes its quaternion
  bias to [0,0,0,1] (models/head/pose_head.py:94), which is the identity
  only in xyzw order.

This is TEST-ONLY tooling; nothing in scflow_tpu imports it.
"""
from __future__ import annotations

import importlib.util
import sys
import types

import torch
import torch.nn as nn

_REF = "/root/reference"


# ---------------------------------------------------------------------------
# mmcv / mmengine shims
# ---------------------------------------------------------------------------

def _build_conv_layer(cfg, *args, **kwargs):
    assert cfg is None, f"only default conv supported, got {cfg}"
    return nn.Conv2d(*args, **kwargs)


_NORM_ABBR = {"BN": "bn", "SyncBN": "bn", "IN": "in", "GN": "gn"}


def _build_norm_layer(cfg, num_features, postfix=""):
    cfg = dict(cfg)
    layer_type = cfg.pop("type")
    cfg.pop("requires_grad", None)
    name = _NORM_ABBR[layer_type] + str(postfix)
    if layer_type == "GN":
        layer = nn.GroupNorm(num_channels=num_features, **cfg)
    elif layer_type in ("BN", "SyncBN"):
        layer = nn.BatchNorm2d(num_features, **cfg)
    elif layer_type == "IN":
        layer = nn.InstanceNorm2d(num_features, **cfg)
    return name, layer


_ACT = {"ReLU": nn.ReLU, "Sigmoid": nn.Sigmoid, "Tanh": nn.Tanh,
        "LeakyReLU": nn.LeakyReLU}


class _ConvModule(nn.Module):
    def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                 padding=0, dilation=1, groups=1, bias="auto", conv_cfg=None,
                 norm_cfg=None, act_cfg=dict(type="ReLU"), inplace=True,
                 order=("conv", "norm", "act")):
        super().__init__()
        assert order == ("conv", "norm", "act")
        self.with_norm = norm_cfg is not None
        if bias == "auto":
            bias = not self.with_norm
        self.conv = nn.Conv2d(in_channels, out_channels, kernel_size,
                              stride=stride, padding=padding,
                              dilation=dilation, groups=groups, bias=bias)
        if self.with_norm:
            self.norm_name, norm = _build_norm_layer(norm_cfg, out_channels)
            self.add_module(self.norm_name, norm)
        self.with_activation = act_cfg is not None
        if self.with_activation:
            act_cfg = dict(act_cfg)
            act_type = act_cfg.pop("type")
            act_cfg.pop("inplace", None)
            self.activate = _ACT[act_type](**act_cfg)

    def forward(self, x):
        x = self.conv(x)
        if self.with_norm:
            x = getattr(self, self.norm_name)(x)
        if self.with_activation:
            x = self.activate(x)
        return x


class _BaseModule(nn.Module):
    def __init__(self, init_cfg=None):
        super().__init__()
        self.init_cfg = init_cfg

    def init_weights(self):
        pass


class _Sequential(nn.Sequential):
    def __init__(self, *args, init_cfg=None):
        super().__init__(*args)


class _Registry:
    def __init__(self, name="", parent=None, locations=None, **kwargs):
        self._module_dict = {}

    def register_module(self, name=None, force=False, module=None):
        if module is not None:
            self._module_dict[module.__name__] = module
            return module

        def _register(cls):
            self._module_dict[name or cls.__name__] = cls
            return cls

        return _register

    def get(self, key):
        return self._module_dict.get(key)

    def build(self, cfg, **kwargs):
        cfg = dict(cfg)
        obj_type = cfg.pop("type")
        if isinstance(obj_type, str):
            obj_type = self._module_dict[obj_type]
        return obj_type(**cfg, **kwargs)


def _quaternion_to_rotation_matrix(q: torch.Tensor) -> torch.Tensor:
    """kornia legacy (xyzw) quaternion → rotation matrix."""
    q = q / q.norm(dim=-1, keepdim=True).clamp_min(1e-8)
    x, y, z, w = q.unbind(-1)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = torch.stack([
        1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
        2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
        2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
    ], dim=-1)
    return m.reshape(q.shape[:-1] + (3, 3))


def _install_shims():
    if "mmcv" in sys.modules:
        return
    mmcv = types.ModuleType("mmcv")
    mmcv_cnn = types.ModuleType("mmcv.cnn")
    mmcv_cnn.ConvModule = _ConvModule
    mmcv_cnn.build_conv_layer = _build_conv_layer
    mmcv_cnn.build_norm_layer = _build_norm_layer
    mmcv_cnn.build_plugin_layer = None
    mmcv.cnn = mmcv_cnn
    sys.modules["mmcv"] = mmcv
    sys.modules["mmcv.cnn"] = mmcv_cnn

    mmengine = types.ModuleType("mmengine")
    mmengine_model = types.ModuleType("mmengine.model")
    mmengine_model.BaseModule = _BaseModule
    mmengine_model.Sequential = _Sequential
    mmengine.model = mmengine_model
    mmengine_registry = types.ModuleType("mmengine.registry")
    for reg in ("MODELS", "MODEL_WRAPPERS", "DATASETS", "TRANSFORMS",
                "HOOKS", "METRICS"):
        setattr(mmengine_registry, reg, _Registry(reg))
    mmengine_registry.Registry = _Registry
    mmengine.registry = mmengine_registry
    sys.modules["mmengine"] = mmengine
    sys.modules["mmengine.model"] = mmengine_model
    sys.modules["mmengine.registry"] = mmengine_registry

    kornia = types.ModuleType("kornia")
    kornia_geometry = types.ModuleType("kornia.geometry")
    kornia_conversions = types.ModuleType("kornia.geometry.conversions")
    kornia_conversions.quaternion_to_rotation_matrix = \
        _quaternion_to_rotation_matrix
    kornia_geometry.conversions = kornia_conversions
    kornia.geometry = kornia_geometry
    sys.modules["kornia"] = kornia
    sys.modules["kornia.geometry"] = kornia_geometry
    sys.modules["kornia.geometry.conversions"] = kornia_conversions

    # pytorch3d.ops.knn_points: exact K-nearest-neighbor (the reference uses
    # K=1 for symmetric-class point matching, point_matching_loss.py:94).
    # Dense torch implementation — mathematically identical output.
    pytorch3d = types.ModuleType("pytorch3d")
    pytorch3d_ops = types.ModuleType("pytorch3d.ops")

    def _knn_points(p1, p2, K=1):
        d2 = torch.cdist(p1, p2) ** 2          # (B, N1, N2)
        dists, idx = torch.topk(d2, K, dim=-1, largest=False)
        return types.SimpleNamespace(dists=dists, idx=idx)

    pytorch3d_ops.knn_points = _knn_points
    pytorch3d.ops = pytorch3d_ops
    sys.modules["pytorch3d"] = pytorch3d
    sys.modules["pytorch3d.ops"] = pytorch3d_ops

    if "trimesh" not in sys.modules:
        try:
            import trimesh  # noqa: F401
        except ImportError:
            trimesh = types.ModuleType("trimesh")
            trimesh.load = None
            sys.modules["trimesh"] = trimesh

    # raft_decoder.py has a junk `from turtle import forward` import
    # (SURVEY.md §2.11); avoid requiring tkinter.
    if "turtle" not in sys.modules:
        turtle = types.ModuleType("turtle")
        turtle.forward = None
        sys.modules["turtle"] = turtle


def _load(fullname: str, path: str):
    if fullname in sys.modules:
        return sys.modules[fullname]
    spec = importlib.util.spec_from_file_location(fullname, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[fullname] = mod
    spec.loader.exec_module(mod)
    return mod


def _package(fullname: str):
    if fullname in sys.modules:
        return sys.modules[fullname]
    pkg = types.ModuleType(fullname)
    pkg.__path__ = []
    sys.modules[fullname] = pkg
    return pkg


_loaded = None


def load_reference():
    """Import the reference torch modules; returns a namespace.

    Exposes: corr_lookup (module), pose (module), raft_decoder (module),
    scflow_decoder (module), pose_head (module), raft_encoder (module),
    datasets_pose (module).
    """
    global _loaded
    if _loaded is not None:
        return _loaded
    _install_shims()

    _load("registry", f"{_REF}/registry.py")

    _package("datasets")
    datasets_pose = _load("datasets.pose", f"{_REF}/datasets/pose.py")

    _package("models")
    models_utils = _package("models.utils")
    corr_lookup = _load("models.utils.corr_lookup",
                        f"{_REF}/models/utils/corr_lookup.py")
    pose = _load("models.utils.pose", f"{_REF}/models/utils/pose.py")
    # Populate the attributes scflow_decoder imports from ..utils
    models_utils.CorrLookup = corr_lookup.CorrLookup
    models_utils.coords_grid = corr_lookup.coords_grid
    for fn in ("get_flow_from_delta_pose_and_points",
               "get_flow_from_delta_pose_and_depth",
               "get_pose_from_delta_pose", "cal_3d_2d_corr",
               "get_rotation_matrix_from_ortho6d", "lift_2d_to_3d",
               "interpolate_depth", "get_2d_3d_corr_by_fw_flow",
               "solve_pose_by_pnp"):
        setattr(models_utils, fn, getattr(pose, fn))

    warp = _load("models.utils.warp", f"{_REF}/models/utils/warp.py")
    flow = _load("models.utils.flow", f"{_REF}/models/utils/flow.py")
    models_utils.Warp = warp.Warp

    _package("models.loss")
    sequence_loss = _load("models.loss.sequence_loss",
                          f"{_REF}/models/loss/sequence_loss.py")
    point_matching_loss = _load("models.loss.point_matching_loss",
                                f"{_REF}/models/loss/point_matching_loss.py")

    _package("models.backbone")
    resnet = _load("models.backbone.resnet",
                   f"{_REF}/models/backbone/resnet.py")
    _package("models.encoder")
    raft_encoder = _load("models.encoder.raft_encoder",
                         f"{_REF}/models/encoder/raft_encoder.py")
    _package("models.decoder")
    raft_decoder = _load("models.decoder.raft_decoder",
                         f"{_REF}/models/decoder/raft_decoder.py")
    raft_decoder_mask = _load("models.decoder.raft_decoder_mask",
                              f"{_REF}/models/decoder/raft_decoder_mask.py")
    _package("models.head")
    pose_head = _load("models.head.pose_head",
                      f"{_REF}/models/head/pose_head.py")
    scflow_decoder = _load("models.decoder.scflow_decoder",
                           f"{_REF}/models/decoder/scflow_decoder.py")

    _loaded = types.SimpleNamespace(
        corr_lookup=corr_lookup, pose=pose, raft_decoder=raft_decoder,
        raft_decoder_mask=raft_decoder_mask,
        scflow_decoder=scflow_decoder, pose_head=pose_head,
        raft_encoder=raft_encoder, resnet=resnet,
        datasets_pose=datasets_pose, flow=flow, warp=warp,
        sequence_loss=sequence_loss,
        point_matching_loss=point_matching_loss)
    return _loaded


def build_reference_scflow_model(num_class: int = 21, iters: int = 8,
                                 rotation_mode: str = "ortho6d",
                                 seperate_encoder: bool = False,
                                 feat_size: tuple = (32, 32),
                                 seed: int = 0):
    """Instantiate reference encoders + SCFlowDecoder with the shipped
    recipe's hyperparameters (configs/refine_models/scflow_ycbv_pbr.py:169-283)
    and randomized weights. Returns (module dict, state_dict)."""
    ref = load_reference()
    torch.manual_seed(seed)

    def make_encoder(norm):
        return ref.raft_encoder.RAFTEncoder(
            in_channels=3, out_channels=256, net_type="Basic",
            norm_cfg=dict(type=norm))

    render_encoder = make_encoder("IN")
    real_encoder = make_encoder("IN") if seperate_encoder else render_encoder
    context = make_encoder("BN")
    decoder = ref.scflow_decoder.SCFlowDecoder(
        net_type="Basic", num_levels=4, radius=4, iters=iters,
        detach_flow=True, detach_mask=True, detach_pose=True,
        detach_depth_for_xy=True, mask_flow=False, mask_corr=False,
        pose_head_cfg=dict(
            type=ref.pose_head.MultiClassPoseHead, num_class=num_class,
            in_channels=224, net_type="Basic", rotation_mode=rotation_mode,
            feat_size=tuple(feat_size),
            norm_cfg=dict(type="GN", num_groups=32, requires_grad=True),
            act_cfg=dict(type="ReLU")),
        corr_lookup_cfg=dict(align_corners=True),
        gru_type="SeqConv", act_cfg=dict(type="ReLU"))

    full = nn.Module()
    full.render_encoder = render_encoder
    full.real_encoder = real_encoder
    full.context = context
    full.decoder = decoder

    _randomize(full, seed)
    full.eval()
    return full, full.state_dict()


def build_reference_raft_model(iters: int = 4, seperate_encoder: bool = False,
                               seed: int = 0):
    """Reference encoders + RAFTDecoderMask (flow + occlusion + convex
    upsample), randomized, eval mode. Mirrors the raft recipe
    (configs/refine_models/raft.py)."""
    ref = load_reference()
    torch.manual_seed(seed)

    def make_encoder(norm):
        return ref.raft_encoder.RAFTEncoder(
            in_channels=3, out_channels=256, net_type="Basic",
            norm_cfg=dict(type=norm))

    render_encoder = make_encoder("IN")
    real_encoder = make_encoder("IN") if seperate_encoder else render_encoder
    context = make_encoder("BN")
    decoder = ref.raft_decoder_mask.RAFTDecoderMask(
        net_type="Basic", num_levels=4, radius=4, iters=iters,
        corr_lookup_cfg=dict(align_corners=True),
        gru_type="SeqConv", act_cfg=dict(type="ReLU"))

    full = nn.Module()
    full.render_encoder = render_encoder
    full.real_encoder = real_encoder
    full.context = context
    full.decoder = decoder
    _randomize(full, seed)
    full.eval()
    return full, full.state_dict()


def _randomize(full: nn.Module, seed: int):
    # Randomize: default torch inits give non-trivial weights already, but
    # explicitly perturb biases + BN stats so nothing sits at a fixed point.
    gen = torch.Generator().manual_seed(seed + 1)
    with torch.no_grad():
        for p in full.parameters():
            p.add_(0.02 * torch.randn(p.shape, generator=gen))
        for m in full.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.copy_(
                    0.3 * torch.randn(m.running_mean.shape, generator=gen))
                m.running_var.copy_(
                    (0.5 + torch.rand(m.running_var.shape, generator=gen)))
