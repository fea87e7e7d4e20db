"""Numerical parity against the reference torch implementation (the oracle).

These tests import the REAL reference modules (/root/reference) via the
faithful mmcv/mmengine shims in tests/torch_ref.py, give them random
weights, convert those weights with ``convert_torch_checkpoint``, and
assert that our JAX modules produce the same numbers. This converts the
"ADD-AUC within 0.5pt of reference checkpoints" target (BASELINE.md) into
a mechanical weight-port problem: if these pass, loading a published
checkpoint reproduces the reference network's function.

Covered oracles:
  - CorrelationPyramid + CorrLookup      (models/utils/corr_lookup.py:102-136)
  - get_pose_from_delta_pose             (models/utils/pose.py:124-149)
  - get_flow_from_delta_pose_and_points/depth (models/utils/pose.py:66-121)
  - RAFTDecoder._upsample (convex upsampling, raft_decoder.py:381-416)
  - RAFTEncoder (IN + BN/eval)           (models/encoder/raft_encoder.py)
  - MultiClassPoseHead                   (models/head/pose_head.py:110-211)
  - full SCFlowDecoder forward, per-iteration (scflow_decoder.py:151-252)
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from torch_ref import load_reference, build_reference_scflow_model

from scflow_tpu.geometry.se3 import compose_delta_pose
from scflow_tpu.geometry.flow import (flow_from_pose_and_points,
                                      flow_from_pose_and_depth)
from scflow_tpu.geometry.projection import depth_to_correspondences
from scflow_tpu.models.corr import (correlation_pyramid,
                                    correlation_pyramid_pm, corr_lookup,
                                    corr_lookup_pm)
from scflow_tpu.models.decoder import convex_upsample
from scflow_tpu.models.refiner import SCFlowRefiner
from scflow_tpu.training.checkpoint import (convert_torch_checkpoint,
                                            merge_converted)


def to_t(x_nhwc: np.ndarray) -> torch.Tensor:
    """NHWC numpy → NCHW torch."""
    return torch.from_numpy(np.ascontiguousarray(
        np.moveaxis(x_nhwc, -1, 1))).float()


def to_np(x_nchw: torch.Tensor) -> np.ndarray:
    """NCHW torch → NHWC numpy."""
    return np.moveaxis(x_nchw.detach().numpy(), 1, -1)


def synthetic_depth(rng, n, h, w, z0=0.5):
    """Blobby foreground depth maps (0 = background), meters."""
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    depth = np.zeros((n, h, w), np.float32)
    for i in range(n):
        cy, cx = rng.uniform(0.35, 0.65, 2) * [h, w]
        r = rng.uniform(0.2, 0.3) * min(h, w)
        d2 = (ys - cy) ** 2 + (xs - cx) ** 2
        inside = d2 < r * r
        bump = np.sqrt(np.maximum(r * r - d2, 0.0)) / max(h, w)
        depth[i] = np.where(inside, z0 + 0.05 * rng.standard_normal()
                            - 0.2 * bump, 0.0)
    return depth


def intrinsics(n, h, w):
    k = np.array([[1.1 * w, 0, w / 2], [0, 1.1 * w, h / 2], [0, 0, 1]],
                 np.float32)
    return np.tile(k, (n, 1, 1))


def random_rotations(rng, n):
    q = rng.standard_normal((n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    x, y, z, w = q.T
    return np.stack([
        1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
        2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
        2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
    ], axis=-1).reshape(n, 3, 3).astype(np.float32)


# ---------------------------------------------------------------------------
# component parity
# ---------------------------------------------------------------------------

def test_corr_pyramid_and_lookup_parity(rng):
    ref = load_reference()
    n, h, w, c = 2, 16, 16, 32
    f1 = rng.standard_normal((n, h, w, c)).astype(np.float32)
    f2 = rng.standard_normal((n, h, w, c)).astype(np.float32)
    # flows include out-of-range targets to exercise zero padding
    flow = (rng.standard_normal((n, h, w, 2)) * 6.0).astype(np.float32)

    t_pyr = ref.raft_decoder.CorrelationPyramid(num_levels=4)(
        to_t(f1), to_t(f2))
    t_out = ref.corr_lookup.CorrLookup(radius=4, align_corners=True)(
        t_pyr, to_t(flow))
    want = to_np(t_out)

    for pyr_fn, look_fn in ((correlation_pyramid, corr_lookup),
                            (correlation_pyramid_pm, corr_lookup_pm)):
        pyr = pyr_fn(jnp.asarray(f1), jnp.asarray(f2), 4)
        got = np.asarray(look_fn(pyr, jnp.asarray(flow), radius=4))
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_compose_delta_pose_parity(rng):
    ref = load_reference()
    n = 16
    r_src = random_rotations(rng, n)
    t_src = np.stack([rng.uniform(-0.1, 0.1, n), rng.uniform(-0.1, 0.1, n),
                      rng.uniform(0.3, 1.2, n)], -1).astype(np.float32)
    d_trans = (rng.standard_normal((n, 3)) * 0.2).astype(np.float32)
    for rot_dim in (4, 6):
        d_rot = rng.standard_normal((n, rot_dim)).astype(np.float32)
        if rot_dim == 4:
            d_rot /= np.linalg.norm(d_rot, axis=-1, keepdims=True)
        for depth_transform in ("exp", "linear"):
            want_r, want_t = ref.pose.get_pose_from_delta_pose(
                torch.from_numpy(d_rot), torch.from_numpy(d_trans),
                torch.from_numpy(r_src), torch.from_numpy(t_src),
                depth_transform=depth_transform)
            got_r, got_t = compose_delta_pose(
                jnp.asarray(d_rot), jnp.asarray(d_trans), jnp.asarray(r_src),
                jnp.asarray(t_src), depth_transform=depth_transform)
            np.testing.assert_allclose(np.asarray(got_r),
                                       want_r.numpy(), atol=1e-5)
            np.testing.assert_allclose(np.asarray(got_t),
                                       want_t.numpy(), atol=1e-5, rtol=1e-5)


def test_pose_induced_flow_parity(rng):
    ref = load_reference()
    n, h, w = 3, 32, 32
    depth = synthetic_depth(rng, n, h, w)
    k = intrinsics(n, h, w)
    r_ref = random_rotations(rng, n)
    t_ref = np.tile(np.array([0.01, -0.02, 0.5], np.float32), (n, 1))
    r_dst = random_rotations(rng, n)
    t_dst = t_ref + rng.standard_normal((n, 3)).astype(np.float32) * 0.02

    # reference path: per-sample point lists + scatter
    p2d, p3d = [], []
    for i in range(n):
        a, b = ref.pose.cal_3d_2d_corr(
            torch.from_numpy(depth[i]), torch.from_numpy(k[i]),
            torch.from_numpy(r_ref[i]), torch.from_numpy(t_ref[i]))
        p2d.append(a)
        p3d.append(b)
    want = to_np(ref.pose.get_flow_from_delta_pose_and_points(
        torch.from_numpy(r_dst), torch.from_numpy(t_dst),
        torch.from_numpy(k), p2d, p3d, h, w, invalid_num=400.0))

    _, pts3d, valid = depth_to_correspondences(
        jnp.asarray(depth), jnp.asarray(k), jnp.asarray(r_ref),
        jnp.asarray(t_ref))
    got = np.asarray(flow_from_pose_and_points(
        jnp.asarray(r_dst), jnp.asarray(t_dst), jnp.asarray(k), pts3d,
        valid, invalid_num=400.0))
    np.testing.assert_allclose(got, want, atol=5e-3)

    want2 = to_np(ref.pose.get_flow_from_delta_pose_and_depth(
        torch.from_numpy(r_ref), torch.from_numpy(t_ref),
        torch.from_numpy(r_dst), torch.from_numpy(t_dst),
        torch.from_numpy(depth), torch.from_numpy(k), invalid_num=400.0))
    got2 = np.asarray(flow_from_pose_and_depth(
        jnp.asarray(r_ref), jnp.asarray(t_ref), jnp.asarray(r_dst),
        jnp.asarray(t_dst), jnp.asarray(depth), jnp.asarray(k),
        invalid_num=400.0))
    np.testing.assert_allclose(got2, want2, atol=5e-3)


def test_convex_upsample_parity(rng):
    ref = load_reference()
    n, h, w, scale = 2, 8, 8, 8
    flow = (rng.standard_normal((n, h, w, 2)) * 3).astype(np.float32)
    weights = rng.standard_normal((n, h, w, 9 * scale * scale)) \
        .astype(np.float32)

    dec = ref.raft_decoder.RAFTDecoder(
        net_type="Basic", num_levels=4, radius=4, iters=1,
        corr_lookup_cfg=dict(align_corners=True), act_cfg=dict(type="ReLU"))
    want = to_np(dec._upsample(to_t(flow), to_t(weights)))
    got = np.asarray(convex_upsample(jnp.asarray(flow), jnp.asarray(weights),
                                     scale))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


# ---------------------------------------------------------------------------
# converted-weight parity (encoders, pose head, full decoder)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def parity_setup():
    """Reference model + converted variables + matching inputs (128², 16²
    features, 3 classes, 3 iterations)."""
    rng = np.random.default_rng(7)
    n, h, w = 2, 128, 128
    iters, num_class = 3, 3
    full, sd = build_reference_scflow_model(
        num_class=num_class, iters=iters, feat_size=(h // 8, w // 8), seed=3)

    model = SCFlowRefiner(num_class=num_class, iters=iters)
    depth = synthetic_depth(rng, n, h, w)
    k = intrinsics(n, h, w)
    r_ref = random_rotations(rng, n)
    t_ref = np.tile(np.array([0.01, -0.02, 0.55], np.float32), (n, 1))
    real = rng.standard_normal((n, h, w, 3)).astype(np.float32)
    render = rng.standard_normal((n, h, w, 3)).astype(np.float32)
    label = np.full((n,), 1, np.int32)  # uniform: reference index_select
    # uses label[0] for the whole batch (latent bug, pose_head.py:209-210)

    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(render), jnp.asarray(real),
        jnp.asarray(r_ref), jnp.asarray(t_ref), jnp.asarray(depth),
        jnp.asarray(k), jnp.asarray(label))
    converted = convert_torch_checkpoint(sd)
    merged, report = merge_converted(variables, converted)
    return dict(full=full, model=model, variables=merged, report=report,
                inputs=dict(real=real, render=render, depth=depth, k=k,
                            r_ref=r_ref, t_ref=t_ref, label=label))


def test_conversion_coverage(parity_setup):
    report = parity_setup["report"]
    assert not report["unused"]
    # every missing template leaf must be an expected init-only leaf:
    # IN scale/bias (affine-less in torch) or conv bias under GN (zeros)
    for leaf in report["missing"]:
        ok = (("norm/scale" in leaf or "norm/bias" in leaf)
              and ("render_encoder" in leaf or "context/stem" not in leaf)
              ) or ("pose_head" in leaf and leaf.endswith("conv/bias"))
        assert ok, f"unexpectedly missing from conversion: {leaf}"
    # all context BN stats must be covered
    assert not any(leaf.startswith("batch_stats/")
                   for leaf in report["missing"])


def test_encoder_parity(parity_setup):
    s = parity_setup
    x = s["inputs"]["real"]
    want_feat = to_np(s["full"].render_encoder(to_t(x)))
    want_cxt = to_np(s["full"].context(to_t(x)))

    feat = s["model"].apply(
        s["variables"], jnp.asarray(x), False,
        method=lambda m, img, train: m.render_encoder(img, train))
    cxt = s["model"].apply(
        s["variables"], jnp.asarray(x), False,
        method=lambda m, img, train: m.context(img, train))
    np.testing.assert_allclose(np.asarray(feat), want_feat,
                               atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(cxt), want_cxt,
                               atol=2e-4, rtol=1e-4)


def test_scflow_decoder_full_parity(parity_setup):
    s = parity_setup
    inp = s["inputs"]
    n, h, w = inp["depth"].shape
    full = s["full"]

    with torch.no_grad():
        real_feat = full.real_encoder(to_t(inp["real"]))
        render_feat = full.render_encoder(to_t(inp["render"]))
        cxt = full.context(to_t(inp["render"]))
        h_feat, cxt_feat = torch.split(cxt, [128, 128], dim=1)
        h_feat, cxt_feat = torch.tanh(h_feat), torch.relu(cxt_feat)
        outs = full.decoder(
            render_feat, real_feat, h_feat, cxt_feat,
            torch.from_numpy(inp["r_ref"]), torch.from_numpy(inp["t_ref"]),
            torch.from_numpy(inp["depth"]), torch.from_numpy(inp["k"]),
            torch.from_numpy(inp["label"]).long(),
            init_flow=torch.zeros((n, 2, h, w)), invalid_flow_num=0.0)
    (want_pose_flow, want_pred_flow, want_r, want_t, want_mask,
     want_dr, want_dt) = [
        np.stack([x.detach().numpy() for x in seq]) for seq in outs]

    got = s["model"].apply(
        s["variables"], jnp.asarray(inp["render"]), jnp.asarray(inp["real"]),
        jnp.asarray(inp["r_ref"]), jnp.asarray(inp["t_ref"]),
        jnp.asarray(inp["depth"]), jnp.asarray(inp["k"]),
        jnp.asarray(inp["label"]), False)

    # pose trajectory: the decisive parity signal
    np.testing.assert_allclose(np.asarray(got.delta_rotations), want_dr,
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(got.delta_translations), want_dt,
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(got.rotations), want_r, atol=2e-3)
    np.testing.assert_allclose(np.asarray(got.translations), want_t,
                               rtol=2e-3, atol=2e-4)
    # dense maps (NHWC vs NCHW)
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(got.masks), -1, 2), want_mask, atol=1e-3)
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(got.flow_from_pred), -1, 2), want_pred_flow,
        atol=5e-3)
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(got.flow_from_pose), -1, 2), want_pose_flow,
        atol=5e-3)


def test_pose_head_parity(parity_setup, rng):
    s = parity_setup
    n, c, hf = 2, 224, 16
    x = rng.standard_normal((n, hf, hf, c)).astype(np.float32)
    label = np.full((n,), 2, np.int32)
    want_r, want_t = s["full"].decoder.pose_pred(
        to_t(x), torch.from_numpy(label).long())

    # apply the scanned iteration's pose head directly via its param subtree
    from scflow_tpu.models.heads import PoseHead
    head = PoseHead(num_class=3, rotation_mode="ortho6d")
    head_vars = {"params":
                 s["variables"]["params"]["decoder"]["iteration"]["pose_head"]}
    got_r, got_t = head.apply(head_vars, jnp.asarray(x), jnp.asarray(label))
    np.testing.assert_allclose(np.asarray(got_r), want_r.detach().numpy(),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_t), want_t.detach().numpy(),
                               atol=1e-4, rtol=1e-4)


def test_raft_decoder_mask_full_parity(rng):
    """RAFTDecoderMask (flow + occlusion, convex upsampling with shared
    weights) with converted weights vs the reference, per-iteration."""
    from torch_ref import build_reference_raft_model
    from scflow_tpu.models.refiner import RAFTRefiner

    n, h, w, iters = 2, 64, 64, 3
    full, sd = build_reference_raft_model(iters=iters, seed=11)
    real = rng.standard_normal((n, h, w, 3)).astype(np.float32)
    render = rng.standard_normal((n, h, w, 3)).astype(np.float32)

    with torch.no_grad():
        real_feat = full.real_encoder(to_t(real))
        render_feat = full.render_encoder(to_t(render))
        cxt = full.context(to_t(render))
        h_feat, cxt_feat = torch.split(cxt, [128, 128], dim=1)
        h_feat, cxt_feat = torch.tanh(h_feat), torch.relu(cxt_feat)
        hf, wf = h // 8, w // 8
        upflows, upoccs = full.decoder(
            render_feat, real_feat, torch.zeros((n, 2, hf, wf)),
            h_feat, cxt_feat)
    want_flows = np.stack([to_np(f) for f in upflows])
    want_occs = np.stack([to_np(o) for o in upoccs])

    model = RAFTRefiner(iters=iters, predict_mask=True)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(render),
                           jnp.asarray(real))
    converted = convert_torch_checkpoint(sd, family="raft")
    merged, report = merge_converted(variables, converted)
    assert not report["unused"]
    got_flows, got_occs = model.apply(merged, jnp.asarray(render),
                                      jnp.asarray(real), False)
    np.testing.assert_allclose(np.asarray(got_flows), want_flows, atol=2e-3)
    np.testing.assert_allclose(np.asarray(got_occs), want_occs, atol=1e-3)


def test_separate_encoder_conversion(rng):
    """seperate_encoder checkpoints convert into a distinct real_encoder
    tree (was silently dropped in round 1 — VERDICT.md Weak #5)."""
    full, sd = build_reference_scflow_model(
        num_class=2, iters=1, feat_size=(8, 8), seperate_encoder=True,
        seed=5)
    converted = convert_torch_checkpoint(sd, separate_encoder=True)
    p = converted["params"]
    assert "real_encoder" in p and "render_encoder" in p
    # truly distinct weights
    a = p["real_encoder"]["stem"]["conv"]["kernel"]
    b = p["render_encoder"]["stem"]["conv"]["kernel"]
    assert not np.allclose(a, b)

    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    want = to_np(full.real_encoder(to_t(x)))
    model = SCFlowRefiner(num_class=2, iters=1, separate_encoder=True)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
        jnp.zeros((1, 64, 64, 3)), jnp.eye(3)[None],
        jnp.asarray([[0.0, 0.0, 0.5]]), jnp.ones((1, 64, 64)),
        jnp.asarray(intrinsics(1, 64, 64)), jnp.zeros((1,), jnp.int32))
    merged, _ = merge_converted(variables, converted)
    got = model.apply(merged, jnp.asarray(x), False,
                      method=lambda m, img, t: m.real_encoder(img, t))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=1e-4)


def test_mmflow_encoder_duplication():
    """'encoder.*' single-encoder checkpoints (mmflow warm start) duplicate
    into render (and real when separate) — semantics of
    tools/mmflow_ckpt_converter.py:29-36."""
    _, sd = build_reference_scflow_model(num_class=2, iters=1,
                                         feat_size=(8, 8), seed=6)
    renamed = {}
    for k, v in sd.items():
        if k.startswith("render_encoder."):
            renamed["encoder." + k[len("render_encoder."):]] = v
        elif k.startswith("real_encoder."):
            continue
        elif k.startswith("context."):
            renamed["cxt_encoder." + k[len("context."):]] = v
        else:
            renamed[k] = v
    converted = convert_torch_checkpoint(renamed, separate_encoder=True)
    p = converted["params"]
    np.testing.assert_array_equal(
        p["real_encoder"]["stem"]["conv"]["kernel"],
        p["render_encoder"]["stem"]["conv"]["kernel"])
    assert "context" in p


def test_merge_converted_rejects_unknown_and_mismatched():
    _, sd = build_reference_scflow_model(num_class=2, iters=1,
                                         feat_size=(8, 8), seed=8)
    converted = convert_torch_checkpoint(sd)
    model = SCFlowRefiner(num_class=2, iters=1)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
        jnp.zeros((1, 64, 64, 3)), jnp.eye(3)[None],
        jnp.asarray([[0.0, 0.0, 0.5]]), jnp.ones((1, 64, 64)),
        jnp.asarray(intrinsics(1, 64, 64)), jnp.zeros((1,), jnp.int32))

    bogus = {"params": {"not_a_module": {"kernel": np.zeros((1,))}},
             "batch_stats": {}}
    with pytest.raises(ValueError, match="no template slot"):
        merge_converted(variables, bogus)

    import copy
    bad = copy.deepcopy(converted)
    bad["params"]["render_encoder"]["stem"]["conv"]["bias"] = np.zeros((7,))
    with pytest.raises(ValueError, match="shape"):
        merge_converted(variables, bad)
