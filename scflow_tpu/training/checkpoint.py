"""Checkpointing via orbax + torch-checkpoint conversion.

Replaces the reference's mmengine CheckpointHook / load_from machinery
(SURVEY.md §5.4): periodic orbax checkpoints of the full train state
(params + batch stats + optimizer + step), warm starts, and a converter
from the published SCFlow torch checkpoints into the flax parameter tree
(the analogue of tools/mmflow_ckpt_converter.py, required to reproduce the
reference's YCB-V numbers without retraining).
"""
from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


def save_checkpoint(ckpt_dir: str, state, step: int | None = None,
                    max_to_keep: int = 5) -> str:
    import orbax.checkpoint as ocp

    step = int(state.step) if step is None else step
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step:08d}")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    _prune_checkpoints(ckpt_dir, max_to_keep)
    return path


def restore_checkpoint(ckpt_dir: str, target, step: int | None = None):
    import orbax.checkpoint as ocp

    if step is None:
        steps = list_checkpoint_steps(ckpt_dir)
        if not steps:
            raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
        step = steps[-1]
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step:08d}")
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, target)


def list_checkpoint_steps(ckpt_dir: str) -> list[int]:
    if not os.path.isdir(ckpt_dir):
        return []
    steps = []
    for name in os.listdir(ckpt_dir):
        if name.startswith("step_"):
            try:
                steps.append(int(name.split("_")[1]))
            except (IndexError, ValueError):
                pass
    return sorted(steps)


def _prune_checkpoints(ckpt_dir: str, max_to_keep: int):
    import shutil

    steps = list_checkpoint_steps(ckpt_dir)
    for step in steps[:-max_to_keep]:
        shutil.rmtree(os.path.join(ckpt_dir, f"step_{step:08d}"),
                      ignore_errors=True)


# ---------------------------------------------------------------------------
# torch → flax conversion (published SCFlow checkpoints)
# ---------------------------------------------------------------------------
#
# Key-layout facts (validated against the real reference modules imported
# with faithful mmcv shims in tests/torch_ref.py + tests/test_torch_parity.py):
#   - mmcv names norm submodules by abbreviation + postfix: the encoders'
#     norms are ``bn1``/``bn2`` (context, BatchNorm) and would be ``in1``/
#     ``in2`` for InstanceNorm — but reference IN layers are affine=False
#     (torch default via mmcv build_norm_layer), so feature encoders carry
#     NO norm parameters at all; our GroupNorm(scale=1, bias=0) init is
#     numerically identical.
#   - BatchNorm running statistics (``running_mean``/``running_var``) must
#     land in the flax ``batch_stats`` collection or eval-mode outputs are
#     wrong — the converter returns BOTH collections.
#   - torch flattens NCHW before the pose head's first FC; we flatten NHWC,
#     so fc0's weight needs a (C, H, W) → (H, W, C) permutation.


def _to_numpy(v) -> np.ndarray:
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def _conv_kernel(w) -> np.ndarray:
    """torch OIHW → flax HWIO."""
    return np.transpose(_to_numpy(w), (2, 3, 1, 0))


def normalize_torch_state(torch_state: dict) -> dict:
    """Unwrap mmengine checkpoint dicts and strip DDP prefixes."""
    if "state_dict" in torch_state and isinstance(
            torch_state["state_dict"], dict):
        torch_state = torch_state["state_dict"]
    out = {}
    for k, v in torch_state.items():
        if k.startswith("module."):
            k = k[len("module."):]
        out[k] = v
    return out


class _Converter:
    """Accumulates params/batch_stats trees from a torch state_dict."""

    def __init__(self, torch_state: dict):
        self.ts = normalize_torch_state(torch_state)
        self.params: dict[str, Any] = {}
        self.stats: dict[str, Any] = {}
        self.used: set[str] = set()

    def _put(self, tree, path: str, value):
        parts = path.split("/")
        d = tree
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = _to_numpy(value)

    def take(self, key: str):
        self.used.add(key)
        return self.ts[key]

    def has(self, key: str) -> bool:
        return key in self.ts

    def conv(self, dst: str, src: str):
        """torch Conv2d ``src`` → flax nn.Conv params at ``dst``."""
        self._put(self.params, f"{dst}/kernel", _conv_kernel(self.take(f"{src}.weight")))
        if self.has(f"{src}.bias"):
            self._put(self.params, f"{dst}/bias", self.take(f"{src}.bias"))

    def norm(self, dst: str, src: str):
        """torch norm layer ``src`` → flax norm at ``dst`` (affine params into
        ``params``, running stats into ``batch_stats``)."""
        if self.has(f"{src}.weight"):
            self._put(self.params, f"{dst}/scale", self.take(f"{src}.weight"))
            self._put(self.params, f"{dst}/bias", self.take(f"{src}.bias"))
        if self.has(f"{src}.running_mean"):
            self._put(self.stats, f"{dst}/mean", self.take(f"{src}.running_mean"))
            self._put(self.stats, f"{dst}/var", self.take(f"{src}.running_var"))
        self.used.add(f"{src}.num_batches_tracked")

    def find_norm(self, base: str, postfix: str = "") -> str | None:
        """Resolve mmcv's norm attribute name (bn/in/gn + postfix)."""
        for abbr in ("bn", "in", "gn", "norm"):
            cand = f"{base}.{abbr}{postfix}"
            if (f"{cand}.weight" in self.ts
                    or f"{cand}.running_mean" in self.ts):
                return cand
        return None

    def conv_block(self, dst: str, conv_src: str, norm_src: str | None):
        """ConvModule/conv+norm pair → our ConvBlock {conv, norm} nesting."""
        self.conv(f"{dst}/conv", conv_src)
        if norm_src is not None:
            self.norm(f"{dst}/norm", norm_src)

    def encoder(self, dst: str, src: str):
        """Reference RAFTEncoder → our RAFTEncoder (stem + 3×2 BasicBlocks +
        1×1 out conv). Reference layout: models/encoder/raft_encoder.py
        (conv1/bn1 stem, res_layer{1..3}.{0,1} with conv1/bn1/conv2/bn2 and
        downsample.{0,1}, conv2 out)."""
        self.conv_block(f"{dst}/stem", f"{src}.conv1",
                        self.find_norm(src, "1"))
        for li in range(1, 4):
            for bi in range(2):
                base = f"{src}.res_layer{li}.{bi}"
                blk = f"{dst}/layer{li}_block{bi}"
                self.conv_block(f"{blk}/conv1", f"{base}.conv1",
                                self.find_norm(base, "1"))
                self.conv_block(f"{blk}/conv2", f"{base}.conv2",
                                self.find_norm(base, "2"))
                if self.has(f"{base}.downsample.0.weight"):
                    self.conv_block(f"{blk}/downsample", f"{base}.downsample.0",
                                    f"{base}.downsample.1"
                                    if (self.has(f"{base}.downsample.1.weight")
                                        or self.has(f"{base}.downsample.1.running_mean"))
                                    else None)
        self.conv(f"{dst}/conv_out", f"{src}.conv2")

    def fc(self, dst: str, src: str, nchw_flatten_channels: int | None = None):
        """torch Linear → flax Dense. If ``nchw_flatten_channels`` is given,
        the input came from flattening a (C, H, W) activation that we flatten
        as (H, W, C): permute the input dimension accordingly."""
        w = _to_numpy(self.take(f"{src}.weight"))  # (out, in)
        if nchw_flatten_channels is not None:
            out_f, in_f = w.shape
            c = nchw_flatten_channels
            hw = in_f // c
            s = int(round(hw ** 0.5))
            assert s * s * c == in_f, (in_f, c)
            w = (w.reshape(out_f, c, s, s).transpose(0, 2, 3, 1)
                 .reshape(out_f, in_f))
        self._put(self.params, f"{dst}/kernel", np.transpose(w))
        if self.has(f"{src}.bias"):
            self._put(self.params, f"{dst}/bias", self.take(f"{src}.bias"))

    def xhead(self, dst: str, src: str):
        """Reference XHead (layers.N ConvModules + predict_layer)."""
        i = 0
        while self.has(f"{src}.layers.{i}.conv.weight"):
            self.conv_block(f"{dst}/conv{i}", f"{src}.layers.{i}.conv",
                            self.find_norm(f"{src}.layers.{i}"))
            i += 1
        self.conv(f"{dst}/predict", f"{src}.predict_layer")

    def motion_encoder(self, dst: str, src: str):
        for net, ours in (("corr_net", "corr_conv"), ("flow_net", "flow_conv")):
            i = 0
            while self.has(f"{src}.{net}.{i}.conv.weight"):
                self.conv_block(f"{dst}/{ours}{i}", f"{src}.{net}.{i}.conv",
                                self.find_norm(f"{src}.{net}.{i}"))
                i += 1
        self.conv_block(f"{dst}/out_conv", f"{src}.out_net.0.conv",
                        self.find_norm(f"{src}.out_net.0"))

    def gru(self, dst: str, src: str):
        """ConvGRU: raw nn.Conv params (no ConvBlock nesting on our side)."""
        for g in ("z", "r", "q"):
            i = 0
            while self.has(f"{src}.conv_{g}.{i}.conv.weight"):
                self.conv(f"{dst}/conv_{g}_{i}", f"{src}.conv_{g}.{i}.conv")
                i += 1

    def embed(self, dst: str, src: str):
        i = 0
        while self.has(f"{src}.{i}.conv.weight"):
            self.conv_block(f"{dst}/conv{i}", f"{src}.{i}.conv",
                            self.find_norm(f"{src}.{i}"))
            i += 1

    def pose_head(self, dst: str, src: str):
        i = 0
        while self.has(f"{src}.conv_layers.{i}.conv.weight"):
            self.conv_block(f"{dst}/conv{i}", f"{src}.conv_layers.{i}.conv",
                            self.find_norm(f"{src}.conv_layers.{i}"))
            i += 1
        conv_out_ch = _to_numpy(
            self.ts[f"{src}.conv_layers.{i-1}.conv.weight"]).shape[0]
        self.fc(f"{dst}/fc0", f"{src}.fc_layers.0.0",
                nchw_flatten_channels=conv_out_ch)
        j = 1
        while self.has(f"{src}.fc_layers.{j}.0.weight"):
            self.fc(f"{dst}/fc{j}", f"{src}.fc_layers.{j}.0")
            j += 1
        self.fc(f"{dst}/rotation_pred", f"{src}.rotation_pred")
        self.fc(f"{dst}/translation_pred", f"{src}.translation_pred")


def convert_torch_checkpoint(torch_state: dict, *,
                             separate_encoder: bool = False,
                             family: str = "scflow") -> dict:
    """Convert a reference torch ``state_dict`` into this framework's flax
    variables.

    Args:
      torch_state: raw ``state_dict`` (or a full mmengine checkpoint dict —
        ``state_dict`` is unwrapped, ``module.`` prefixes stripped). Values
        may be torch tensors or numpy arrays.
      separate_encoder: convert ``real_encoder.*`` weights into a separate
        real_encoder tree (reference ``seperate_encoder=True`` layout,
        models/refiner/base_refiner.py:32-40). When the checkpoint has no
        distinct real encoder (e.g. an mmflow warm start), render-encoder
        weights are duplicated — the semantics of
        tools/mmflow_ckpt_converter.py:29-36.
      family: 'scflow' (SCFlowDecoder) or 'raft' (RAFTDecoder/-Mask; the
        576-channel ``mask_pred`` is the convex-upsample weight head there,
        an occlusion head is ``occlusion_pred``).

    Returns ``{"params": tree, "batch_stats": tree}`` (numpy leaves). Use
    :func:`merge_converted` to overlay onto model-initialized variables —
    leaves the checkpoint legitimately lacks (affine-less InstanceNorm
    scale/bias, zero-init conv biases under GN) keep their init values.
    """
    c = _Converter(torch_state)
    ts = c.ts

    def enc_src(name: str) -> str:
        # mmflow-converter input layout has a single 'encoder.*'
        if any(k.startswith(f"{name}.") for k in ts):
            return name
        if any(k.startswith("encoder.") for k in ts):
            return "encoder"
        raise KeyError(f"no '{name}.*' or 'encoder.*' keys in checkpoint")

    c.encoder("render_encoder", enc_src("render_encoder"))
    if separate_encoder:
        c.encoder("real_encoder", enc_src("real_encoder")
                  if any(k.startswith("real_encoder.") for k in ts)
                  else enc_src("render_encoder"))
    c.encoder("context", "context" if any(k.startswith("context.")
                                          for k in ts) else "cxt_encoder")

    it = "decoder/iteration"
    c.motion_encoder(f"{it}/motion", "decoder.encoder")
    c.gru(f"{it}/gru", "decoder.gru")
    c.xhead(f"{it}/flow_head", "decoder.flow_pred")
    if family == "scflow":
        c.xhead(f"{it}/mask_head", "decoder.mask_pred")
        c.embed(f"{it}/dflow_embed", "decoder.delta_flow_encoder")
        c.embed(f"{it}/mask_embed", "decoder.mask_encoder")
        c.pose_head(f"{it}/pose_head", "decoder.pose_pred")
    elif family == "raft":
        if c.has("decoder.mask_pred.predict_layer.weight"):
            c.xhead(f"{it}/up_mask_head", "decoder.mask_pred")
        if c.has("decoder.occlusion_pred.predict_layer.weight"):
            c.xhead(f"{it}/occ_head", "decoder.occlusion_pred")
    else:
        raise ValueError(f"unknown family {family!r}")

    return {"params": c.params, "batch_stats": c.stats}


def load_torch_checkpoint(path: str, variables: dict, *,
                          separate_encoder: bool = False,
                          family: str = "scflow") -> tuple[dict, dict]:
    """Load a reference torch ``.pth`` file and merge it onto
    model-initialized variables (the ``load_checkpoint`` step of the
    reference eval protocol, configs/refine_models/scflow_ycbv_pbr.py:276-279
    → tools/test.py): ``torch.load`` → :func:`convert_torch_checkpoint` →
    :func:`merge_converted`. Returns ``(merged_variables, report)``.

    Works on both raw ``state_dict`` files and full mmengine checkpoints
    (``state_dict`` key unwrapped, ``module.`` prefixes stripped by
    :func:`normalize_torch_state`).
    """
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=False)
    converted = convert_torch_checkpoint(
        normalize_torch_state(raw), separate_encoder=separate_encoder,
        family=family)
    return merge_converted(variables, converted)


def merge_converted(variables: dict, converted: dict,
                    allow_missing: bool = True) -> tuple[dict, dict]:
    """Overlay converted weights onto model-initialized variables.

    Args:
      variables: ``model.init(...)`` output (dict of collections).
      converted: :func:`convert_torch_checkpoint` output.
      allow_missing: if False, raise when the conversion does not cover
        every template leaf (init values would silently remain).

    Returns (merged variables, report) where report has 'covered',
    'missing' (template leaves not in converted — keep init values) and
    'unused' (converted leaves with no template slot — an error).
    """
    from flax.traverse_util import flatten_dict, unflatten_dict

    merged = {}
    covered, missing, unused = [], [], []
    for col in variables:
        tmpl = flatten_dict(variables[col], sep="/")
        conv = flatten_dict(converted.get(col, {}), sep="/")
        out = {}
        for k, v in tmpl.items():
            if k in conv:
                cv = conv.pop(k)
                if tuple(cv.shape) != tuple(v.shape):
                    raise ValueError(
                        f"{col}/{k}: shape {cv.shape} != template {v.shape}")
                out[k] = jax.numpy.asarray(cv, dtype=v.dtype)
                covered.append(f"{col}/{k}")
            else:
                out[k] = v
                missing.append(f"{col}/{k}")
        unused.extend(f"{col}/{k}" for k in conv)
        merged[col] = unflatten_dict(out, sep="/")
    if unused:
        raise ValueError(f"converted weights with no template slot: {unused}")
    if missing and not allow_missing:
        raise ValueError(f"template leaves not covered: {missing}")
    report = {"covered": covered, "missing": missing, "unused": unused}
    return merged, report
