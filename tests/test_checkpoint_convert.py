"""Torch-checkpoint converter roundtrip: fabricate a reference-layout
state_dict, convert, and verify the result loads into the real model and
runs (tools/mmflow_ckpt_converter.py + published-checkpoint import path,
SURVEY.md §5.4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax.traverse_util import flatten_dict

from scflow_tpu.training import Config, ModelConfig, build_model
from scflow_tpu.training.checkpoint import convert_torch_checkpoint


def _torch_keys_for(flat_params):
    """Map our flat param paths → (torch key, transform) per the reference
    state_dict layout (models/*.py module names)."""

    def conv_src(dst_prefix, src_prefix):
        out = {}
        out[f"{dst_prefix}/conv/kernel"] = (f"{src_prefix}.weight", "conv")
        out[f"{dst_prefix}/conv/bias"] = (f"{src_prefix}.bias", "id")
        return out

    def norm_src(dst_prefix, src_prefix):
        return {f"{dst_prefix}/norm/scale": (f"{src_prefix}.weight", "id"),
                f"{dst_prefix}/norm/bias": (f"{src_prefix}.bias", "id")}

    m = {}
    for enc_dst, enc_src in (("render_encoder", "render_encoder"),
                             ("context", "context")):
        m.update(conv_src(f"{enc_dst}/stem", f"{enc_src}.conv1"))
        m.update(norm_src(f"{enc_dst}/stem", f"{enc_src}.norm1"))
        for li in range(1, 4):
            for bi in range(2):
                base = f"{enc_src}.res_layer{li}.{bi}"
                blk = f"{enc_dst}/layer{li}_block{bi}"
                for ci in (1, 2):
                    m.update(conv_src(f"{blk}/conv{ci}", f"{base}.conv{ci}"))
                    m.update(norm_src(f"{blk}/conv{ci}", f"{base}.norm{ci}"))
                m.update(conv_src(f"{blk}/downsample", f"{base}.downsample.0"))
                m.update(norm_src(f"{blk}/downsample", f"{base}.downsample.1"))
        m[f"{enc_dst}/conv_out/kernel"] = (f"{enc_src}.conv2.weight", "conv")
        m[f"{enc_dst}/conv_out/bias"] = (f"{enc_src}.conv2.bias", "id")

    it = "decoder/iteration"
    for i, name in enumerate(["corr_net.0.conv", "corr_net.1.conv"]):
        m.update(conv_src(f"{it}/motion/corr_conv{i}", f"decoder.encoder.{name}"))
    for i, name in enumerate(["flow_net.0.conv", "flow_net.1.conv"]):
        m.update(conv_src(f"{it}/motion/flow_conv{i}", f"decoder.encoder.{name}"))
    m.update(conv_src(f"{it}/motion/out_conv", "decoder.encoder.out_net.0.conv"))
    for i in range(2):
        for g in ("z", "r", "q"):
            src = f"decoder.gru.conv_{g}.{i}.conv"
            m[f"{it}/gru/conv_{g}_{i}/kernel"] = (f"{src}.weight", "conv")
            m[f"{it}/gru/conv_{g}_{i}/bias"] = (f"{src}.bias", "id")
    m.update(conv_src(f"{it}/flow_head/conv0", "decoder.flow_pred.layers.0.conv"))
    m[f"{it}/flow_head/predict/kernel"] = (
        "decoder.flow_pred.predict_layer.weight", "conv")
    m[f"{it}/flow_head/predict/bias"] = (
        "decoder.flow_pred.predict_layer.bias", "id")
    m.update(conv_src(f"{it}/mask_head/conv0", "decoder.mask_pred.layers.0.conv"))
    m[f"{it}/mask_head/predict/kernel"] = (
        "decoder.mask_pred.predict_layer.weight", "conv")
    m[f"{it}/mask_head/predict/bias"] = (
        "decoder.mask_pred.predict_layer.bias", "id")
    for i in range(2):
        m.update(conv_src(f"{it}/dflow_embed/conv{i}",
                          f"decoder.delta_flow_encoder.{i}.conv"))
        m.update(conv_src(f"{it}/mask_embed/conv{i}",
                          f"decoder.mask_encoder.{i}.conv"))
    for i in range(3):
        base = f"decoder.pose_pred.conv_layers.{i}"
        m.update(conv_src(f"{it}/pose_head/conv{i}", f"{base}.conv"))
        m.update(norm_src(f"{it}/pose_head/conv{i}", f"{base}.gn"))
    for i in range(2):
        m[f"{it}/pose_head/fc{i}/kernel"] = (
            f"decoder.pose_pred.fc_layers.{i}.0.weight", "fc")
        m[f"{it}/pose_head/fc{i}/bias"] = (
            f"decoder.pose_pred.fc_layers.{i}.0.bias", "id")
    for head in ("rotation_pred", "translation_pred"):
        m[f"{it}/pose_head/{head}/kernel"] = (
            f"decoder.pose_pred.{head}.weight", "fc")
        m[f"{it}/pose_head/{head}/bias"] = (
            f"decoder.pose_pred.{head}.bias", "id")
    return m


@pytest.fixture(scope="module")
def model_and_params():
    cfg = Config(model=ModelConfig(num_class=3, iters=2, test_iters=2))
    model = build_model(cfg)
    x = jnp.zeros((1, 64, 64, 3))
    r = jnp.eye(3)[None]
    t = jnp.asarray([[0.0, 0.0, 500.0]])
    depth = jnp.full((1, 64, 64), 500.0)
    k = jnp.asarray([[[60.0, 0, 32], [0, 60.0, 32], [0, 0, 1]]])
    lab = jnp.zeros((1,), jnp.int32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x, x, r, t,
                                    depth, k, lab)
    return model, variables, (x, r, t, depth, k, lab)


def test_converter_roundtrip(model_and_params):
    model, variables, inputs = model_and_params
    flat = {"/".join(k): v for k, v in
            flatten_dict(variables["params"]).items()}
    key_map = _torch_keys_for(flat)

    rng = np.random.default_rng(0)
    torch_state = {}
    covered = set()
    for dst, (src, kind) in key_map.items():
        if dst not in flat:
            continue                      # e.g. downsample absent in a block
        covered.add(dst)
        shape = flat[dst].shape
        if kind == "conv":                # HWIO → OIHW
            val = 0.02 * rng.normal(size=(shape[3], shape[2], shape[0],
                                          shape[1])).astype(np.float32)
        elif kind == "fc":                # (in, out) → (out, in)
            val = 0.02 * rng.normal(size=(shape[1], shape[0])).astype(np.float32)
        else:
            val = 0.02 * rng.normal(size=shape).astype(np.float32)
        torch_state[src] = val

    converted = convert_torch_checkpoint(torch_state, num_class=3)
    conv_flat = {"/".join(k): v for k, v in flatten_dict(converted).items()}

    # every converted leaf must exist in the real model with the same shape
    unknown = [k for k in conv_flat if k not in flat]
    assert not unknown, f"converter emits unknown paths: {unknown[:5]}"
    for k, v in conv_flat.items():
        assert v.shape == flat[k].shape, (k, v.shape, flat[k].shape)
    # and values must round-trip the transposes exactly
    for dst, (src, kind) in key_map.items():
        if dst not in conv_flat or src not in torch_state:
            continue
        got = np.asarray(conv_flat[dst])
        tv = torch_state[src]
        exp = (np.transpose(tv, (2, 3, 1, 0)) if kind == "conv"
               else tv.T if kind == "fc" else tv)
        np.testing.assert_array_equal(got, exp, err_msg=dst)

    # coverage: the conv/fc trunk should be nearly fully converted
    frac = len(conv_flat) / len(flat)
    assert frac > 0.85, f"only {frac:.0%} of params covered by converter"

    # the merged tree must actually run
    merged = jax.tree_util.tree_map(lambda a: a, variables["params"])
    from flax.traverse_util import unflatten_dict

    mflat = flatten_dict(merged)
    for k, v in conv_flat.items():
        mflat[tuple(k.split("/"))] = jnp.asarray(v)
    new_vars = dict(variables)
    new_vars["params"] = unflatten_dict(mflat)
    x, r, t, depth, k_, lab = inputs
    out = model.apply(new_vars, x, x, r, t, depth, k_, lab, train=False)
    assert np.isfinite(np.asarray(out.translations[-1])).all()
