"""Model-layer tests: shapes, parameter counts, correlation semantics,
identity-initialized pose stability, and gradient flow."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scflow_tpu.geometry import random_rotation
from scflow_tpu.models import (
    ConvGRU,
    RAFTEncoder,
    RAFTRefiner,
    SCFlowRefiner,
    corr_lookup,
    correlation_pyramid,
    downsample_flow,
    resize_bilinear_align_corners,
    upsample_flow,
)

# Small scene: 64×64 images → 8×8 features
H = W = 64
HF = WF = 8
N = 2
K_INTR = jnp.tile(jnp.asarray([[300., 0., 32.], [0., 300., 32.], [0., 0., 1.]]),
                  (N, 1, 1))


def small_inputs(key=0):
    rng = np.random.default_rng(key)
    render = jnp.asarray(rng.normal(size=(N, H, W, 3)), jnp.float32)
    real = jnp.asarray(rng.normal(size=(N, H, W, 3)), jnp.float32)
    depth = jnp.zeros((N, H, W)).at[:, 16:48, 16:48].set(600.0)
    r = random_rotation(jax.random.PRNGKey(key), (N,))
    t = jnp.tile(jnp.asarray([0., 0., 600.]), (N, 1))
    label = jnp.asarray([0, 1])
    return render, real, r, t, depth, label


class TestEncoder:
    def test_stride8_shape(self):
        enc = RAFTEncoder(out_channels=256, norm="in")
        x = jnp.zeros((1, 64, 64, 3))
        params = enc.init(jax.random.PRNGKey(0), x)
        y = enc.apply(params, x)
        assert y.shape == (1, 8, 8, 256)

    def test_bn_encoder_has_stats(self):
        enc = RAFTEncoder(out_channels=256, norm="bn")
        x = jnp.zeros((2, 64, 64, 3))
        variables = enc.init(jax.random.PRNGKey(0), x)
        assert "batch_stats" in variables
        y, updates = enc.apply(variables, x, True, mutable=["batch_stats"])
        assert y.shape == (2, 8, 8, 256)

    def test_param_count_order(self):
        # RAFT-Basic encoder ≈ 3.5M params in the reference family
        enc = RAFTEncoder(out_channels=256, norm="in")
        params = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
        n = sum(p.size for p in jax.tree.leaves(params))
        assert 1e6 < n < 6e6


class TestCorrelation:
    def test_pyramid_shapes(self):
        f1 = jnp.ones((N, HF, WF, 32))
        f2 = jnp.ones((N, HF, WF, 32))
        pyr = correlation_pyramid(f1, f2, num_levels=4)
        assert len(pyr) == 4
        assert pyr[0].shape == (N, HF, WF, HF, WF)
        assert pyr[3].shape == (N, HF, WF, HF // 8, WF // 8)

    def test_correlation_values(self):
        # orthogonal one-hot features → corr = identity pattern / sqrt(C)
        c = 16
        f = np.zeros((1, 2, 2, c), np.float32)
        for i in range(4):
            f[0, i // 2, i % 2, i] = 1.0
        pyr = correlation_pyramid(jnp.asarray(f), jnp.asarray(f), 1)
        corr = np.asarray(pyr[0][0])  # (2,2,2,2)
        for i in range(2):
            for j in range(2):
                assert abs(corr[i, j, i, j] - 1 / 4.0) < 1e-5
                assert abs(corr[i, j, (i + 1) % 2, j]) < 1e-6

    def test_zero_flow_lookup_center(self):
        # with zero flow, the center channel of the level-0 lookup window is
        # the self-correlation at each position
        rng = np.random.default_rng(0)
        f = jnp.asarray(rng.normal(size=(1, HF, WF, 16)), jnp.float32)
        pyr = correlation_pyramid(f, f, 4)
        out = corr_lookup(pyr, jnp.zeros((1, HF, WF, 2)), radius=4)
        assert out.shape == (1, HF, WF, 4 * 81)
        center = np.asarray(out[0, :, :, 40])  # (2·4+1)²//2 = 40 center tap
        self_corr = np.asarray(jnp.einsum("hwc,hwc->hw", f[0], f[0]) / 4.0)
        np.testing.assert_allclose(center, self_corr, rtol=1e-4)

    def test_flow_shifts_lookup(self):
        rng = np.random.default_rng(1)
        f1 = jnp.asarray(rng.normal(size=(1, HF, WF, 16)), jnp.float32)
        f2 = jnp.asarray(rng.normal(size=(1, HF, WF, 16)), jnp.float32)
        pyr = correlation_pyramid(f1, f2, 1)
        # flow (1, 0): center tap at x should equal corr with target x+1
        flow = jnp.zeros((1, HF, WF, 2)).at[..., 0].set(1.0)
        out = corr_lookup(pyr, flow, radius=1)
        center = np.asarray(out[0, :, :-1, 4])  # 3×3 window center
        direct = np.asarray(
            jnp.einsum("hwc,hvc->hwv", f1[0], f2[0]) / 4.0)  # (H, W, W)
        for y in range(HF):
            for x in range(WF - 1):
                assert abs(center[y, x] - direct[y, x, x + 1]) < 1e-4


class TestResize:
    def test_align_corners_identity_points(self):
        x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 8, 8, 2)),
                        jnp.float32)
        up = resize_bilinear_align_corners(x, (64, 64))
        # corners preserved exactly with align_corners=True
        np.testing.assert_allclose(np.asarray(up[0, 0, 0]), np.asarray(x[0, 0, 0]),
                                   rtol=1e-5)
        np.testing.assert_allclose(np.asarray(up[0, -1, -1]),
                                   np.asarray(x[0, -1, -1]), rtol=1e-5)

    def test_flow_up_down_roundtrip(self):
        f = jnp.asarray(np.random.default_rng(1).normal(size=(1, 8, 8, 2)),
                        jnp.float32)
        up = upsample_flow(f, 8)
        down = downsample_flow(up, 8)
        np.testing.assert_allclose(np.asarray(down), np.asarray(f), atol=1e-3)


class TestConvGRU:
    def test_hidden_bounded(self):
        gru = ConvGRU(h_channels=16)
        h = jnp.zeros((1, 8, 8, 16))
        x = jnp.ones((1, 8, 8, 24))
        params = gru.init(jax.random.PRNGKey(0), h, x)
        out = gru.apply(params, h, x)
        assert out.shape == h.shape
        assert np.abs(np.asarray(out)).max() <= 1.0 + 1e-5


@pytest.fixture(scope="module")
def scflow_model():
    model = SCFlowRefiner(num_class=2, iters=3)
    render, real, r, t, depth, label = small_inputs()
    variables = model.init(jax.random.PRNGKey(0), render, real, r, t, depth,
                           K_INTR, label)
    return model, variables


class TestSCFlowRefiner:
    def test_output_shapes(self, scflow_model):
        model, variables = scflow_model
        render, real, r, t, depth, label = small_inputs()
        out = model.apply(variables, render, real, r, t, depth, K_INTR, label)
        T = 3
        assert out.rotations.shape == (T, N, 3, 3)
        assert out.translations.shape == (T, N, 3)
        assert out.flow_from_pose.shape == (T, N, H, W, 2)
        assert out.flow_from_pred.shape == (T, N, H, W, 2)
        assert out.masks.shape == (T, N, H, W, 1)
        assert out.delta_rotations.shape == (T, N, 6)

    def test_identity_init_keeps_pose(self, scflow_model):
        # pose head is identity-initialized → all iterations return ~ref pose
        model, variables = scflow_model
        render, real, r, t, depth, label = small_inputs()
        out = model.apply(variables, render, real, r, t, depth, K_INTR, label)
        for i in range(3):
            np.testing.assert_allclose(np.asarray(out.rotations[i]),
                                       np.asarray(r), atol=1e-5)
            np.testing.assert_allclose(np.asarray(out.translations[i]),
                                       np.asarray(t), rtol=1e-4)

    def test_rotations_are_valid(self, scflow_model):
        model, variables = scflow_model
        render, real, r, t, depth, label = small_inputs()
        out = model.apply(variables, render, real, r, t, depth, K_INTR, label)
        rr = np.asarray(out.rotations).reshape(-1, 3, 3)
        np.testing.assert_allclose(rr @ rr.transpose(0, 2, 1),
                                   np.tile(np.eye(3), (len(rr), 1, 1)),
                                   atol=1e-4)

    def test_test_time_iters_override(self, scflow_model):
        model, variables = scflow_model
        render, real, r, t, depth, label = small_inputs()
        out = model.apply(variables, render, real, r, t, depth, K_INTR, label,
                          iters=5)
        assert out.rotations.shape[0] == 5

    @pytest.mark.slow
    def test_gradients_flow(self, scflow_model):
        model, variables = scflow_model
        render, real, r, t, depth, label = small_inputs()

        def loss_fn(params):
            out = model.apply({"params": params,
                               "batch_stats": variables["batch_stats"]},
                              render, real, r, t, depth, K_INTR, label,
                              train=False)
            return (jnp.mean(jnp.abs(out.delta_translations))
                    + jnp.mean(jnp.abs(out.delta_rotations))
                    + jnp.mean(out.masks))

        grads = jax.grad(loss_fn)(variables["params"])
        gnorms = [float(jnp.linalg.norm(g)) for g in jax.tree.leaves(grads)]
        assert all(np.isfinite(g) for g in gnorms)
        assert sum(g > 0 for g in gnorms) > len(gnorms) * 0.5

    def test_param_count(self, scflow_model):
        _, variables = scflow_model
        n = sum(p.size for p in jax.tree.leaves(variables["params"]))
        # reference SCFlow-class model: ~5-20M params (3 encoders + GRU + heads)
        assert 3e6 < n < 4e7


class TestRAFTRefiner:
    def test_forward_shapes(self):
        model = RAFTRefiner(iters=3, predict_mask=True)
        render, real, *_ = small_inputs()
        variables = model.init(jax.random.PRNGKey(0), render, real)
        flows, occs = model.apply(variables, render, real)
        assert flows.shape == (3, N, H, W, 2)
        assert occs.shape == (3, N, H, W, 1)

    def test_multiview_broadcast_matches_tiled(self):
        """One unbatched real image vs N renders == tiling it N times
        (reference RAFTRefinerFlowMask.extract_feat broadcast,
        raft_refiner_flow_mask.py:86-116). IN/BN are per-sample /
        frozen-stats in eval, so encode-once + broadcast is exact."""
        model = RAFTRefiner(iters=2, predict_mask=True)
        render, real, *_ = small_inputs()
        variables = model.init(jax.random.PRNGKey(0), render, real)
        one_real = real[0]
        flows_b, occs_b = model.apply(variables, render, one_real)
        flows_t, occs_t = model.apply(
            variables, render, jnp.tile(one_real[None], (N, 1, 1, 1)))
        np.testing.assert_allclose(np.asarray(flows_b), np.asarray(flows_t),
                                   atol=1e-5)
        # and the mirror: one render vs N real frames
        one_render = render[0]
        flows_r, _ = model.apply(variables, one_render, real)
        flows_rt, _ = model.apply(
            variables, jnp.tile(one_render[None], (N, 1, 1, 1)), real)
        np.testing.assert_allclose(np.asarray(flows_r), np.asarray(flows_rt),
                                   atol=1e-5)


@pytest.mark.slow
class TestBF16Path:
    def test_bf16_forward_close_to_f32(self):
        model32 = SCFlowRefiner(num_class=2, iters=2)
        model16 = SCFlowRefiner(num_class=2, iters=2, dtype=jnp.bfloat16)
        render, real, r, t, depth, label = small_inputs()
        v = model32.init(jax.random.PRNGKey(0), render, real, r, t, depth,
                         K_INTR, label)
        out32 = model32.apply(v, render, real, r, t, depth, K_INTR, label)
        out16 = model16.apply(v, render, real, r, t, depth, K_INTR, label)
        # identity-initialized pose head → poses identical; activations close
        np.testing.assert_allclose(np.asarray(out16.rotations),
                                   np.asarray(out32.rotations), atol=1e-3)
        np.testing.assert_allclose(np.asarray(out16.translations),
                                   np.asarray(out32.translations), rtol=2e-2)
        assert out16.rotations.dtype == jnp.float32
        assert out16.flow_from_pose.dtype == jnp.float32


class TestLocalCorrelation:
    def test_zero_shift_matches_dot(self):
        import jax.numpy as jnp
        import numpy as np

        from scflow_tpu.models.corr import local_correlation

        rng = np.random.default_rng(0)
        f1 = jnp.asarray(rng.normal(size=(2, 8, 8, 16)), jnp.float32)
        f2 = jnp.asarray(rng.normal(size=(2, 8, 8, 16)), jnp.float32)
        out = local_correlation(f1, f2, max_displacement=2, normalize=False)
        assert out.shape == (2, 8, 8, 25)
        # center tap (dy=0, dx=0) == plain dot / sqrt(C)
        center = np.asarray(out[..., 12])
        expect = np.asarray(jnp.sum(f1 * f2, -1) / jnp.sqrt(16.0))
        np.testing.assert_allclose(center, expect, atol=1e-5)

    def test_shift_alignment(self):
        import jax.numpy as jnp
        import numpy as np

        from scflow_tpu.models.corr import local_correlation

        # feat2 = feat1 shifted right by 1 → the (dy=0, dx=1) tap should be
        # the self-correlation peak
        rng = np.random.default_rng(1)
        f1 = jnp.asarray(rng.normal(size=(1, 8, 8, 8)), jnp.float32)
        f2 = jnp.roll(f1, shift=1, axis=2)
        out = np.asarray(local_correlation(f1, f2, max_displacement=1))
        # taps: (dy,dx) row-major over 3x3 → dx=+1, dy=0 is index 5
        interior = out[0, 2:6, 2:6]
        assert (interior.argmax(-1) == 5).mean() > 0.9

    def test_rot_point_matching_loss(self):
        import jax.numpy as jnp
        import numpy as np

        from scflow_tpu.losses import rot_point_matching_loss

        rng = np.random.default_rng(2)
        pts = jnp.asarray(rng.normal(scale=30, size=(2, 64, 3)), jnp.float32)
        eye = jnp.tile(jnp.eye(3)[None], (2, 1, 1))
        a = np.deg2rad(10.0)
        rz = jnp.asarray([[np.cos(a), -np.sin(a), 0],
                          [np.sin(a), np.cos(a), 0], [0, 0, 1]], jnp.float32)
        pred = jnp.stack([jnp.eye(3), rz])
        valid = jnp.ones((2, 64), bool)
        sym = jnp.zeros((2,), bool)
        diam = jnp.full((2,), 100.0)
        loss = rot_point_matching_loss(pred, eye, pts, valid, sym, diam)
        assert float(loss[0]) < 1e-6     # identity → zero
        assert float(loss[1]) > 1e-3     # rotated → positive
        # symmetric matching with pred==gt → ~0 even under z-rotation for a
        # z-symmetric cloud
        ring = jnp.asarray(
            np.stack([np.cos(np.linspace(0, 2 * np.pi, 64, endpoint=False)),
                      np.sin(np.linspace(0, 2 * np.pi, 64, endpoint=False)),
                      np.zeros(64)], -1) * 50, jnp.float32)[None]
        loss_sym = rot_point_matching_loss(
            pred[1:], eye[:1], ring, valid[:1], jnp.ones((1,), bool), diam[:1])
        assert float(loss_sym[0]) < 0.05


class TestPixelsMinorCorr:
    def test_matches_matmul_formulation(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from scflow_tpu.models.corr import (corr_lookup, corr_lookup_pm,
                                            correlation_pyramid,
                                            correlation_pyramid_pm)

        n, h, w, c = 2, 16, 16, 64
        f1 = jax.random.normal(jax.random.PRNGKey(0), (n, h, w, c))
        f2 = jax.random.normal(jax.random.PRNGKey(1), (n, h, w, c))
        flow = 2.0 * jax.random.normal(jax.random.PRNGKey(2), (n, h, w, 2))

        pyr = correlation_pyramid(f1, f2, 3)
        pyr_pm = correlation_pyramid_pm(f1, f2, 3)
        # same values, transposed layout
        for a, b in zip(pyr, pyr_pm):
            at = jnp.transpose(a.reshape(n, h * w, *a.shape[-2:]), (0, 2, 3, 1))
            np.testing.assert_allclose(np.asarray(at), np.asarray(b),
                                       atol=1e-4, rtol=1e-4)

        ref = corr_lookup(pyr, flow, radius=3)
        new = corr_lookup_pm(pyr_pm, flow, radius=3)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(new),
                                   atol=2e-3, rtol=1e-3)


@pytest.mark.slow
class TestResNetBackbone:
    def test_resnet18_shapes(self):
        import jax
        import jax.numpy as jnp

        from scflow_tpu.models import ResNet

        net = ResNet(depth=18, out_indices=(0, 3))
        x = jnp.zeros((1, 64, 64, 3))
        v = jax.jit(lambda: net.init(jax.random.PRNGKey(0), x, False))()
        o1, o4 = net.apply(v, x, False)
        assert o1.shape == (1, 16, 16, 64)      # stride 4
        assert o4.shape == (1, 2, 2, 512)       # stride 32

    def test_resnet50_bottleneck(self):
        import jax
        import jax.numpy as jnp

        from scflow_tpu.models import ResNet

        net = ResNet(depth=50)
        x = jnp.zeros((1, 64, 64, 3))
        v = jax.jit(lambda: net.init(jax.random.PRNGKey(0), x, False))()
        out = net.apply(v, x, False)
        assert out.shape == (1, 2, 2, 2048)     # 4x expansion

    def test_v1d_deep_stem(self):
        import jax
        import jax.numpy as jnp

        from scflow_tpu.models import ResNet

        net = ResNet(depth=18, deep_stem=True)
        x = jnp.zeros((1, 64, 64, 3))
        v = jax.jit(lambda: net.init(jax.random.PRNGKey(0), x, False))()
        out = net.apply(v, x, False)
        assert out.shape == (1, 2, 2, 512)
