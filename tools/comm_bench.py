"""Communication-layer microbenchmark (SURVEY.md §2.10).

Measures (a) gradient-allreduce (psum) bandwidth over the mesh and (b)
data-parallel train-step scaling efficiency vs a single-device run — the
telemetry the reference lacks entirely (its DDP is opaque NCCL).

On real multi-chip hardware the mesh spans ICI; here it also runs on the
virtual CPU mesh (`--cpu N`) so the collective path is exercised without a
pod. Prints one JSON line per measurement.

Usage:
  python tools/comm_bench.py --cpu 8        # 8 virtual CPU devices
  python tools/comm_bench.py                # whatever devices exist
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", type=int, default=None,
                   help="force N virtual CPU devices")
    p.add_argument("--sizes-mb", type=float, nargs="+",
                   default=[1.0, 8.0, 64.0])
    p.add_argument("--batch-per-device", type=int, default=2)
    p.add_argument("--image-size", type=int, default=64)
    return p.parse_args()


def main():
    args = parse_args()
    if args.cpu:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + f" --xla_force_host_platform_device_count={args.cpu}").strip()
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from scflow_tpu.parallel import make_mesh, shard_batch

    devices = jax.devices()
    n = len(devices)
    mesh = make_mesh(devices)
    print(json.dumps({"metric": "mesh_devices", "value": n,
                      "unit": "devices", "platform": devices[0].platform}))

    # -- psum allreduce bandwidth ----------------------------------------
    from jax import shard_map

    for size_mb in args.sizes_mb:
        elems = int(size_mb * 1e6 / 4)
        x = jnp.ones((n, elems), jnp.float32)
        x = jax.device_put(x, NamedSharding(mesh, P("data", None)))

        @jax.jit
        def allreduce(x):
            return shard_map(lambda s: jax.lax.psum(s, "data"),
                             mesh=mesh, in_specs=P("data", None),
                             out_specs=P("data", None))(x)

        o = allreduce(x)
        jax.block_until_ready(o)
        reps = 10
        t0 = time.perf_counter()
        for _ in range(reps):
            o = allreduce(x)
        jax.block_until_ready(o)
        dt = (time.perf_counter() - t0) / reps
        # ring-allreduce moves 2(n-1)/n of the payload per device
        algo_bytes = 2 * (n - 1) / n * elems * 4
        print(json.dumps({
            "metric": "psum_allreduce_busbw", "payload_mb": size_mb,
            "value": round(algo_bytes / dt / 1e9, 3), "unit": "GB/s",
            "latency_ms": round(dt * 1e3, 3)}))

    # -- DP train-step scaling efficiency --------------------------------
    from scflow_tpu.data import synthetic_batch
    from scflow_tpu.rendering import Renderer, make_test_meshes
    from scflow_tpu.training import (Config, DataConfig, LossConfig,
                                     ModelConfig, OptimConfig,
                                     build_points_bank, render_at_pose)
    from scflow_tpu.training.steps import (init_train_state, make_optimizer,
                                           make_train_step)

    def step_time(num_devices: int) -> float:
        sub = make_mesh(devices[:num_devices])
        batch = args.batch_per_device * num_devices
        cfg = Config(model=ModelConfig(num_class=2, iters=2, test_iters=2),
                     loss=LossConfig(num_loss_points=64),
                     optim=OptimConfig(total_steps=100),
                     data=DataConfig(batch_size=batch,
                                     image_scale=args.image_size))
        bank = make_test_meshes(num_classes=2, subdivisions=1, radius=60.0)
        renderer = Renderer(bank, image_size=(args.image_size,
                                              args.image_size))
        points = build_points_bank(bank, num_points=64)
        from scflow_tpu.training import build_model

        model = build_model(cfg)
        bd = synthetic_batch(jax.random.PRNGKey(0), renderer, batch)
        rendered, depth, mask = render_at_pose(
            renderer, bd["ref_rotations"], bd["ref_translations"], bd["k"],
            bd["labels"], cfg.data.normalize_mean, cfg.data.normalize_std)
        sample = dict(bd, rendered_images=rendered, rendered_depths=depth,
                      rendered_masks=mask)
        tx, _ = make_optimizer(cfg)
        state = init_train_state(cfg, model, tx, jax.random.PRNGKey(1),
                                 sample)
        stepf = make_train_step(model, renderer, points, cfg, tx)
        with sub:
            sb = shard_batch(bd, sub)
            state, m = stepf(state, sb)
            jax.block_until_ready(m)
            t0 = time.perf_counter()
            for _ in range(5):
                state, m = stepf(state, sb)
            jax.block_until_ready(m)
            return (time.perf_counter() - t0) / 5

    t1 = step_time(1)
    tn = step_time(n) if n > 1 else t1
    # perfect weak scaling: same step time at n× the global batch
    eff = t1 / tn if n > 1 else 1.0
    print(json.dumps({
        "metric": "dp_weak_scaling_efficiency", "devices": n,
        "value": round(min(eff, 1.0), 3), "unit": "ratio",
        "t_1dev_ms": round(t1 * 1e3, 2), "t_ndev_ms": round(tn * 1e3, 2)}))


if __name__ == "__main__":
    main()
