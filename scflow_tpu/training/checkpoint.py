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

def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """torch OIHW → flax HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def convert_torch_checkpoint(torch_state: dict,
                             num_class: int = 21) -> dict:
    """Convert a reference SCFlow torch ``state_dict`` to this framework's
    flax parameter pytree.

    Layer correspondence (reference module → ours):
      render_encoder/real_encoder (RAFTEncoder IN)    → render_encoder
      context (RAFTEncoder BN)                        → context
      decoder.encoder (MotionEncoder)                 → decoder/iteration/motion
      decoder.gru (ConvGRU SeqConv)                   → decoder/iteration/gru
      decoder.flow_pred / mask_pred (XHead)           → .../flow_head, mask_head
      decoder.delta_flow_encoder / mask_encoder       → .../dflow_embed, mask_embed
      decoder.pose_pred (MultiClassPoseHead)          → .../pose_head

    Weights are NCHW→NHWC transposed; the corr-lookup channel ordering is
    identical ((dy, dx) row-major), so no channel permutation is needed.
    Norm layers: torch IN/BN affine → GroupNorm/BatchNorm scale+bias.

    Note: exercised against real published checkpoints only when the
    checkpoint files are available; unit-tested with synthetic state dicts.
    """
    out: dict[str, Any] = {}

    def put(path: str, value: np.ndarray):
        parts = path.split("/")
        d = out
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = np.asarray(value)

    def conv(dst, src, norm_src=None):
        put(f"{dst}/conv/kernel", _conv_kernel(torch_state[f"{src}.weight"]))
        if f"{src}.bias" in torch_state:
            put(f"{dst}/conv/bias", torch_state[f"{src}.bias"])
        if norm_src is not None and f"{norm_src}.weight" in torch_state:
            put(f"{dst}/norm/scale", torch_state[f"{norm_src}.weight"])
            put(f"{dst}/norm/bias", torch_state[f"{norm_src}.bias"])

    def encoder(dst, src):
        conv(f"{dst}/stem", f"{src}.conv1", f"{src}.norm1")
        for li in range(1, 4):
            for bi in range(2):
                base = f"{src}.res_layer{li}.{bi}"
                blk = f"{dst}/layer{li}_block{bi}"
                conv(f"{blk}/conv1", f"{base}.conv1", f"{base}.norm1"
                     if f"{base}.norm1.weight" in torch_state else None)
                conv(f"{blk}/conv2", f"{base}.conv2", f"{base}.norm2"
                     if f"{base}.norm2.weight" in torch_state else None)
                if f"{base}.downsample.0.weight" in torch_state:
                    conv(f"{blk}/downsample", f"{base}.downsample.0",
                         f"{base}.downsample.1"
                         if f"{base}.downsample.1.weight" in torch_state else None)
        put(f"{dst}/conv_out/kernel", _conv_kernel(torch_state[f"{src}.conv2.weight"]))
        if f"{src}.conv2.bias" in torch_state:
            put(f"{dst}/conv_out/bias", torch_state[f"{src}.conv2.bias"])

    encoder("render_encoder", "render_encoder")
    if any(k.startswith("real_encoder.") for k in torch_state):
        # shared-encoder checkpoints duplicate the weights; ours shares the
        # module, so only render_encoder params exist unless separate.
        pass
    encoder("context", "context")

    it = "decoder/iteration"
    # motion encoder
    for i, name in enumerate(["corr_net.0.conv", "corr_net.1.conv"]):
        conv(f"{it}/motion/corr_conv{i}", f"decoder.encoder.{name}")
    for i, name in enumerate(["flow_net.0.conv", "flow_net.1.conv"]):
        conv(f"{it}/motion/flow_conv{i}", f"decoder.encoder.{name}")
    conv(f"{it}/motion/out_conv", "decoder.encoder.out_net.0.conv")
    # GRU (raw nn.Conv modules — no ConvBlock nesting)
    for i in range(2):
        for g in ("z", "r", "q"):
            src = f"decoder.gru.conv_{g}.{i}.conv"
            put(f"{it}/gru/conv_{g}_{i}/kernel",
                _conv_kernel(torch_state[f"{src}.weight"]))
            if f"{src}.bias" in torch_state:
                put(f"{it}/gru/conv_{g}_{i}/bias", torch_state[f"{src}.bias"])
    # flow / mask heads
    conv(f"{it}/flow_head/conv0", "decoder.flow_pred.layers.0.conv")
    put(f"{it}/flow_head/predict/kernel",
        _conv_kernel(torch_state["decoder.flow_pred.predict_layer.weight"]))
    put(f"{it}/flow_head/predict/bias",
        torch_state["decoder.flow_pred.predict_layer.bias"])
    conv(f"{it}/mask_head/conv0", "decoder.mask_pred.layers.0.conv")
    put(f"{it}/mask_head/predict/kernel",
        _conv_kernel(torch_state["decoder.mask_pred.predict_layer.weight"]))
    put(f"{it}/mask_head/predict/bias",
        torch_state["decoder.mask_pred.predict_layer.bias"])
    # embeddings
    for i in range(2):
        conv(f"{it}/dflow_embed/conv{i}", f"decoder.delta_flow_encoder.{i}.conv")
        conv(f"{it}/mask_embed/conv{i}", f"decoder.mask_encoder.{i}.conv")
    # pose head
    for i in range(3):
        base = f"decoder.pose_pred.conv_layers.{i}"
        conv(f"{it}/pose_head/conv{i}", f"{base}.conv", f"{base}.gn"
             if f"{base}.gn.weight" in torch_state else None)
    for i in range(2):
        put(f"{it}/pose_head/fc{i}/kernel",
            np.transpose(torch_state[f"decoder.pose_pred.fc_layers.{i}.0.weight"]))
        put(f"{it}/pose_head/fc{i}/bias",
            torch_state[f"decoder.pose_pred.fc_layers.{i}.0.bias"])
    put(f"{it}/pose_head/rotation_pred/kernel",
        np.transpose(torch_state["decoder.pose_pred.rotation_pred.weight"]))
    put(f"{it}/pose_head/rotation_pred/bias",
        torch_state["decoder.pose_pred.rotation_pred.bias"])
    put(f"{it}/pose_head/translation_pred/kernel",
        np.transpose(torch_state["decoder.pose_pred.translation_pred.weight"]))
    put(f"{it}/pose_head/translation_pred/bias",
        torch_state["decoder.pose_pred.translation_pred.bias"])
    return out
