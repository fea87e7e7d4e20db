"""End-to-end smoke: synthetic batch → render → loss → gradient update,
plus eval step and data-parallel sharding over the virtual 8-device mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scflow_tpu.data import synthetic_batch
from scflow_tpu.parallel import data_sharding, make_mesh, shard_batch
from scflow_tpu.rendering import Renderer, make_test_meshes
from scflow_tpu.training import (
    Config,
    DataConfig,
    LossConfig,
    ModelConfig,
    OptimConfig,
    build_model,
    build_points_bank,
    init_train_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
    render_at_pose,
    scflow_loss,
)


@pytest.fixture(scope="module")
def setup():
    cfg = Config(
        model=ModelConfig(num_class=2, iters=2, test_iters=2),
        loss=LossConfig(num_loss_points=64),
        optim=OptimConfig(total_steps=100),
        data=DataConfig(batch_size=2),
    )
    bank = make_test_meshes(num_classes=2, subdivisions=1, radius=60.)
    renderer = Renderer(bank, image_size=(64, 64))
    points = build_points_bank(bank, symmetric_classes=(1,), num_points=64)
    model = build_model(cfg)
    tx, _ = make_optimizer(cfg)

    batch = synthetic_batch(jax.random.PRNGKey(0), renderer, 2)
    rendered, depth, mask = render_at_pose(
        renderer, batch["ref_rotations"], batch["ref_translations"],
        batch["k"], batch["labels"], cfg.data.normalize_mean,
        cfg.data.normalize_std)
    sample = dict(batch, rendered_images=rendered, rendered_depths=depth,
                  rendered_masks=mask)
    state = init_train_state(cfg, model, tx, jax.random.PRNGKey(1), sample)
    return cfg, bank, renderer, points, model, tx, state, batch


class TestSyntheticData:
    def test_batch_contents(self, setup):
        *_, batch = setup
        assert batch["real_images"].shape == (2, 64, 64, 3)
        assert batch["gt_masks"].shape == (2, 64, 64)
        # object visible in every sample
        assert np.asarray(batch["gt_masks"]).sum(axis=(1, 2)).min() > 50
        # jitter moved the pose
        assert not np.allclose(np.asarray(batch["ref_rotations"]),
                               np.asarray(batch["gt_rotations"]))


@pytest.mark.slow
class TestLossAndTrainStep:
    def test_loss_finite_and_decomposed(self, setup):
        cfg, bank, renderer, points, model, tx, state, batch = setup
        rendered, depth, mask = render_at_pose(
            renderer, batch["ref_rotations"], batch["ref_translations"],
            batch["k"], batch["labels"], cfg.data.normalize_mean,
            cfg.data.normalize_std)
        full = dict(batch, rendered_images=rendered, rendered_depths=depth,
                    rendered_masks=mask)
        loss, (stats, metrics, outputs) = scflow_loss(
            state.params, state.batch_stats, full, model=model,
            points_bank=points, cfg=cfg, train=False)
        assert np.isfinite(float(loss))
        for k in ("loss_pose", "loss_flow", "loss_mask"):
            assert np.isfinite(float(metrics[k])) and float(metrics[k]) >= 0

    def test_train_step_updates(self, setup):
        cfg, bank, renderer, points, model, tx, state, batch = setup
        step_fn = make_train_step(model, renderer, points, cfg, tx)
        new_state, metrics = step_fn(state, batch)
        assert int(new_state.step) == 1
        assert np.isfinite(float(metrics["loss"]))
        assert float(metrics["grad_norm"]) > 0
        # params actually changed
        diff = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                            state.params, new_state.params)
        assert max(jax.tree.leaves(diff)) > 0

    def test_eval_step(self, setup):
        cfg, bank, renderer, points, model, tx, state, batch = setup
        eval_fn = make_eval_step(model, renderer, cfg)
        out = eval_fn(state.params, state.batch_stats, batch)
        assert out["rotations"].shape == (2, 3, 3)
        r = np.asarray(out["rotations"])
        np.testing.assert_allclose(r @ r.transpose(0, 2, 1),
                                   np.tile(np.eye(3), (2, 1, 1)), atol=1e-4)


@pytest.mark.slow
class TestDataParallel:
    def test_sharded_train_step(self, setup):
        cfg, bank, renderer, points, model, tx, state, _ = setup
        mesh = make_mesh()
        assert mesh.devices.size == 8
        batch = synthetic_batch(jax.random.PRNGKey(3), renderer, 8)
        sharded = shard_batch(batch, mesh)
        assert sharded["real_images"].sharding.is_fully_replicated is False
        step_fn = make_train_step(model, renderer, points, cfg, tx)
        new_state, metrics = step_fn(state, sharded)
        assert np.isfinite(float(metrics["loss"]))
        # params remain replicated (single logical copy)
        leaf = jax.tree.leaves(new_state.params)[0]
        assert leaf.sharding.is_fully_replicated


@pytest.mark.slow
class TestMultiCycleAndMultiPass:
    def test_multi_cycle_train_step(self, setup):
        from scflow_tpu.training.steps import make_multi_cycle_train_step
        cfg, bank, renderer, points, model, tx, state, batch = setup
        step_fn = make_multi_cycle_train_step(model, renderer, points, cfg,
                                              tx, cycles=2)
        new_state, metrics = step_fn(state, batch)
        assert int(new_state.step) == 2  # one optimizer step per cycle
        assert np.isfinite(float(metrics["cycle0_loss"]))
        assert np.isfinite(float(metrics["cycle1_loss"]))

    def test_multi_pass_eval(self, setup):
        from scflow_tpu.training.steps import make_multi_pass_eval_step
        cfg, bank, renderer, points, model, tx, state, batch = setup
        eval_fn = make_multi_pass_eval_step(model, renderer, cfg, passes=2)
        out = eval_fn(state.params, state.batch_stats, batch)
        r = np.asarray(out["rotations"])
        np.testing.assert_allclose(r @ r.transpose(0, 2, 1),
                                   np.tile(np.eye(3), (2, 1, 1)), atol=1e-4)


@pytest.mark.slow
class TestRaftFamily:
    def _cfg(self, family):
        from scflow_tpu.training import Config, ModelConfig

        return Config(model=ModelConfig(family=family, num_class=3, iters=2,
                                        test_iters=2, feat_channels=64,
                                        h_channels=32, cxt_channels=32,
                                        num_levels=2, radius=2))

    def test_raft_flow_mask_train_and_eval(self):
        import jax
        import numpy as np

        from scflow_tpu.data import synthetic_batch
        from scflow_tpu.models.refiner import RAFTRefiner
        from scflow_tpu.rendering import Renderer, make_test_meshes
        from scflow_tpu.training import (build_model, build_points_bank,
                                         render_at_pose)
        from scflow_tpu.training.steps import (init_train_state,
                                               make_eval_step,
                                               make_optimizer,
                                               make_train_step)

        cfg = self._cfg("raft_flow_mask")
        model = build_model(cfg)
        assert isinstance(model, RAFTRefiner)

        bank = make_test_meshes(num_classes=3, subdivisions=1, radius=50.0)
        renderer = Renderer(bank, image_size=(64, 64))
        points = build_points_bank(bank, num_points=64)
        batch = synthetic_batch(jax.random.PRNGKey(0), renderer, 2)
        rendered, depth, mask = render_at_pose(
            renderer, batch["ref_rotations"], batch["ref_translations"],
            batch["k"], batch["labels"], cfg.data.normalize_mean,
            cfg.data.normalize_std)
        sample = dict(batch, rendered_images=rendered,
                      rendered_depths=depth, rendered_masks=mask)

        tx, _ = make_optimizer(cfg)
        state = init_train_state(cfg, model, tx, jax.random.PRNGKey(1), sample)
        step = make_train_step(model, renderer, points, cfg, tx)
        state2, metrics = step(state, batch)
        assert np.isfinite(float(metrics["loss"]))
        assert float(metrics["loss_pose"]) == 0.0
        assert "loss_mask" in metrics

        eval_step = make_eval_step(model, renderer, cfg)
        out = eval_step(state2.params, state2.batch_stats, batch)
        assert out["rotations"].shape == (2, 3, 3)
        assert "pnp_valid" in out
        # returned rotations are valid rotation matrices
        rtr = np.asarray(out["rotations"] @ np.swapaxes(out["rotations"], -1, -2))
        np.testing.assert_allclose(rtr, np.tile(np.eye(3), (2, 1, 1)),
                                   atol=1e-3)

    def test_raft_flow_family_no_mask(self):
        from scflow_tpu.models.refiner import RAFTRefiner
        from scflow_tpu.training import build_model

        model = build_model(self._cfg("raft_flow"))
        assert isinstance(model, RAFTRefiner) and not model.predict_mask

    def test_unknown_family(self):
        import pytest

        from scflow_tpu.training import build_model

        with pytest.raises(ValueError):
            build_model(self._cfg("bogus"))


@pytest.mark.slow
class TestLowresEval:
    def test_lowres_matches_exact(self):
        import jax
        import numpy as np

        from scflow_tpu.data import synthetic_batch
        from scflow_tpu.rendering import Renderer, make_test_meshes
        from scflow_tpu.training import (Config, ModelConfig,
                                         build_model, build_points_bank,
                                         render_at_pose)
        from scflow_tpu.training.steps import (init_train_state,
                                               make_eval_step, make_optimizer)

        bank = make_test_meshes(num_classes=2, subdivisions=1, radius=50.0)
        renderer = Renderer(bank, image_size=(64, 64))
        points = build_points_bank(bank, num_points=64)
        batch = synthetic_batch(jax.random.PRNGKey(0), renderer, 2)
        rendered, depth, mask = render_at_pose(
            renderer, batch["ref_rotations"], batch["ref_translations"],
            batch["k"], batch["labels"], (0., 0., 0.), (255., 255., 255.))
        sample = dict(batch, rendered_images=rendered, rendered_depths=depth,
                      rendered_masks=mask)

        outs = {}
        for lowres in (False, True):
            cfg = Config(model=ModelConfig(num_class=2, iters=2, test_iters=2,
                                           feat_channels=64, h_channels=32,
                                           cxt_channels=32, num_levels=2,
                                           radius=2, lowres_eval=lowres))
            model = build_model(cfg)
            tx, _ = make_optimizer(cfg)
            state = init_train_state(cfg, model, tx, jax.random.PRNGKey(1),
                                     sample)
            ev = make_eval_step(model, renderer, cfg)
            outs[lowres] = ev(state.params, state.batch_stats, batch)

        # identical params (same init key) -> near-identical poses; the only
        # difference is <0.01px linearization in the pose-flow resample
        np.testing.assert_allclose(np.asarray(outs[True]["rotations"]),
                                   np.asarray(outs[False]["rotations"]),
                                   atol=5e-3)
        np.testing.assert_allclose(np.asarray(outs[True]["translations"]),
                                   np.asarray(outs[False]["translations"]),
                                   rtol=2e-3, atol=0.5)
