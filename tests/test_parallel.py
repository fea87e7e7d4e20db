"""Sharding / distributed-eval tests on the virtual 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P
from jax import shard_map

from scflow_tpu.parallel import make_mesh
from scflow_tpu.parallel.collect import (MetricAccumulator, allgather_results,
                                         reduce_metrics)


class TestMeshBasics:
    def test_eight_devices(self):
        mesh = make_mesh()
        assert mesh.devices.size == 8

    def test_psum_metric_reduction(self):
        mesh = make_mesh()

        def per_shard(x):
            local = {"sum": jnp.sum(x), "count": jnp.asarray(x.size)}
            return reduce_metrics(local)

        fn = shard_map(per_shard, mesh=mesh, in_specs=P("data"),
                       out_specs=P())
        x = jnp.arange(64.0)
        out = fn(x)
        assert float(out["sum"]) == float(x.sum())
        assert int(out["count"]) == 64


class TestMetricAccumulator:
    def test_accumulate_and_compute(self):
        acc = MetricAccumulator(num_classes=3)
        state = acc.init()
        labels = jnp.asarray([0, 0, 1, 2])
        errors = jnp.asarray([1.0, 50.0, 4.0, 200.0])
        diam = jnp.asarray([100.0, 100.0, 100.0, 100.0])
        state = acc.update(state, labels, errors, diam)
        out = acc.compute(state)
        assert out["num_instances"] == 4
        # class 0: 1/2 under 0.05d; class 1: 4mm < 5mm → 1; class 2: 0
        assert out["average/add_0.05d"] == (0.5 + 1.0 + 0.0) / 3

    def test_update_respects_valid_mask(self):
        acc = MetricAccumulator(num_classes=2)
        state = acc.init()
        labels = jnp.asarray([0, 1])
        errors = jnp.asarray([1.0, 1.0])
        diam = jnp.asarray([100.0, 100.0])
        state = acc.update(state, labels, errors, diam,
                           valid=jnp.asarray([1.0, 0.0]))
        out = acc.compute(state)
        assert out["num_instances"] == 1

    def test_merge_equals_joint(self):
        acc = MetricAccumulator(num_classes=2)
        rng = np.random.default_rng(0)
        labels = jnp.asarray(rng.integers(0, 2, 20))
        errors = jnp.asarray(rng.uniform(0, 120, 20), jnp.float32)
        diam = jnp.full((20,), 100.0)
        joint = acc.update(acc.init(), labels, errors, diam)
        a = acc.update(acc.init(), labels[:10], errors[:10], diam[:10])
        b = acc.update(acc.init(), labels[10:], errors[10:], diam[10:])
        merged = acc.merge([a, b])
        for k in joint:
            np.testing.assert_array_equal(np.asarray(joint[k]),
                                          np.asarray(merged[k]))

    @pytest.mark.slow
    def test_update_inside_jit_and_shard_map(self):
        mesh = make_mesh()
        acc = MetricAccumulator(num_classes=2)

        def shard_fn(labels, errors, diam):
            state = acc.update(acc.init(), labels, errors, diam)
            return reduce_metrics(state)

        fn = shard_map(shard_fn, mesh=mesh,
                       in_specs=(P("data"), P("data"), P("data")),
                       out_specs=P())
        labels = jnp.zeros((8,), jnp.int32)
        errors = jnp.full((8,), 3.0)
        diam = jnp.full((8,), 100.0)
        state = fn(labels, errors, diam)
        out = acc.compute(state)
        assert out["num_instances"] == 8
        assert out["average/add_0.05d"] == 1.0


class TestAllgather:
    def test_single_process_identity(self):
        tree = {"a": np.arange(5), "b": np.ones((2, 3))}
        out = allgather_results(tree)
        np.testing.assert_array_equal(out["a"], tree["a"])
