"""Checkpoint conversion through the production model-building path.

The heavy numerical validation of ``convert_torch_checkpoint`` lives in
tests/test_torch_parity.py (real reference modules as the oracle). This
file checks the glue: a converted checkpoint loads into the model built by
the *config system* (``build_model``) and runs, with full coverage of all
conv/fc trunk weights.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytest.importorskip("torch")

from torch_ref import build_reference_scflow_model

from scflow_tpu.training import Config, ModelConfig, build_model
from scflow_tpu.training.checkpoint import (convert_torch_checkpoint,
                                            merge_converted)


@pytest.mark.slow
def test_converted_checkpoint_loads_into_built_model(rng):
    n, h, w = 1, 64, 64
    _, sd = build_reference_scflow_model(num_class=3, iters=2,
                                         feat_size=(h // 8, w // 8), seed=2)
    cfg = Config(model=ModelConfig(num_class=3, iters=2))
    model = build_model(cfg)

    k = np.tile(np.array([[70.0, 0, 32], [0, 70.0, 32], [0, 0, 1]],
                         np.float32), (n, 1, 1))
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((n, h, w, 3)),
        jnp.zeros((n, h, w, 3)), jnp.tile(jnp.eye(3), (n, 1, 1)),
        jnp.asarray([[0.0, 0.0, 0.5]]), jnp.ones((n, h, w)),
        jnp.asarray(k), jnp.zeros((n,), jnp.int32))

    converted = convert_torch_checkpoint(sd)
    merged, report = merge_converted(variables, converted)
    assert not report["unused"]
    # conv/fc trunk fully covered (missing = norm-affine/zero-bias leaves)
    n_params = sum(1 for leaf in report["covered"]
                   if leaf.startswith("params/"))
    assert n_params / (n_params + len(
        [m for m in report["missing"] if m.startswith("params/")])) > 0.8

    x = jnp.asarray(rng.standard_normal((n, h, w, 3)).astype(np.float32))
    out = model.apply(merged, x, x, jnp.tile(jnp.eye(3), (n, 1, 1)),
                      jnp.asarray([[0.0, 0.0, 0.5]]), jnp.ones((n, h, w)),
                      jnp.asarray(k), jnp.zeros((n,), jnp.int32), False)
    assert np.isfinite(np.asarray(out.translations[-1])).all()
    assert np.isfinite(np.asarray(out.rotations[-1])).all()
