"""Sharded, batched evaluation loops.

TPU-native replacement for the reference's eval machinery
(tools/eval.py:39-216 ``single_gpu_test`` / ``multi_gpu_test`` +
``collect_results_cpu/gpu``):

- :func:`pack_eval_batches` — pack several images' object crops into one
  fixed-shape device batch (``slot_budget`` slots, ``sample_valid`` mask),
  so one device step serves many images instead of one host sync per image.
- :func:`evaluate_dataset` — the full eval loop: background prefetch →
  packed batches sharded over the device mesh → host-side exact ADD(-S)
  matching/AUC per image → cross-process record gather
  (:func:`~scflow_tpu.parallel.collect.allgather_results`).
- :func:`evaluate_device_accumulator` — fully on-device masked ADD(-S)
  accumulation (:class:`~scflow_tpu.parallel.collect.MetricAccumulator`)
  for mid-training eval and multi-object scene batches (BASELINE config 4),
  where predictions are aligned with GT slot-for-slot.
"""
from __future__ import annotations

from collections.abc import Callable, Iterable

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.se3 import add_error, adds_error
from ..parallel.collect import MetricAccumulator, allgather_results
from ..parallel.mesh import shard_batch
from .points_bank import PointsBank


def _pad_slots(arrs: list[np.ndarray], budget: int) -> np.ndarray:
    """Stack per-object arrays and pad the slot axis with copies of slot 0."""
    stacked = np.concatenate(arrs, axis=0)
    n = stacked.shape[0]
    if n < budget:
        filler = np.tile(stacked[:1], (budget - n,) + (1,) * (stacked.ndim - 1))
        stacked = np.concatenate([stacked, filler], axis=0)
    return stacked


def pack_eval_batches(items: Iterable[dict], slot_budget: int):
    """Pack per-image eval items into fixed-shape batches.

    Each yielded value is ``(batch, metas)``: ``batch`` has ``slot_budget``
    object slots (keys real_images/ref_rotations/ref_translations/k/labels
    + sample_valid); ``metas`` is a list of ``(item, start, n)`` locating
    every packed image's slots. Images with more objects than the budget
    are truncated to the budget (reference batches are size-1 images;
    YCB-V never exceeds ~8 objects).
    """
    keys = ("real_images", "ref_rotations", "ref_translations", "k", "labels")
    cur, metas, used = {k: [] for k in keys}, [], 0
    for item in items:
        if item is None:
            continue
        n = min(len(item["labels"]), slot_budget)
        if used + n > slot_budget and used > 0:
            yield _finish_pack(cur, metas, used, slot_budget, keys)
            cur, metas, used = {k: [] for k in keys}, [], 0
        for k in keys:
            v = np.asarray(item[k])
            cur[k].append(v[:n] if k != "labels" else
                          v[:n].astype(np.int32))
        metas.append((item, used, n))
        used += n
    if used > 0:
        yield _finish_pack(cur, metas, used, slot_budget, keys)


def _finish_pack(cur, metas, used, budget, keys):
    batch = {k: _pad_slots(cur[k], budget) for k in keys}
    valid = np.zeros((budget,), np.float32)
    valid[:used] = 1.0
    batch["sample_valid"] = valid
    return batch, metas


def _prefetch_items(builder, indices, depth: int = 16, workers: int = 6):
    """Read builder items through a thread pool, yielding in order.

    Decode + crop dominate eval wall time when serialized (VERDICT r4: the
    single-prefetch-thread loop extracted ~2.7% of device throughput); a
    bounded window of ``depth`` in-flight items across ``workers`` threads
    overlaps many decodes with the device steps while keeping results in
    deterministic dataset order. cv2/libjpeg/numpy release the GIL for the
    heavy parts, and builder reads are independent (no shared RNG), so
    threads scale.
    """
    import itertools
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    it = iter(indices)
    with ThreadPoolExecutor(max_workers=workers) as ex:
        window: deque = deque()
        for i in itertools.islice(it, depth):
            window.append(ex.submit(builder.__getitem__, i))
        while window:
            item = window.popleft().result()
            nxt = next(it, None)
            if nxt is not None:
                window.append(ex.submit(builder.__getitem__, nxt))
            yield item


def _pose_graph_refine(out: dict, batch: dict, start: int, n: int,
                       budget: int, camera_only: bool = True) -> dict:
    """Scene pose-graph pass for one packed image's object group.

    Pads the group to ``budget`` slots (fixed shapes → one compile) and
    jointly refines its poses with a shared camera correction on
    flow-derived targets. Single-object images pass through unchanged —
    with one object the camera block is pure gauge.

    Each slot carries its OWN crop intrinsics (objects of one image are
    cropped independently; adapt_intrinsic folds the crop transform into
    per-object K, data/loader.py) — the pose graph consumes the full
    (N, 3, 3) stack; only the camera-frame correction is shared.
    """
    if n < 2:
        return {}
    from ..parallel.pose_graph import pose_graph_from_flow

    idxs = np.concatenate([np.arange(start, start + n),
                           np.full(budget - n, start, np.int64)])
    valid = np.zeros(budget, np.float32)
    valid[:n] = 1.0
    pg = pose_graph_from_flow(
        jnp.asarray(out["flow"][idxs]),
        jnp.asarray(out["masks"][idxs, ..., 0]),
        jnp.asarray(out["depth"][idxs]),
        jnp.asarray(out["ref_rotations"][idxs]),
        jnp.asarray(out["ref_translations"][idxs]),
        jnp.asarray(out["rotations"][idxs]),
        jnp.asarray(out["translations"][idxs]),
        jnp.asarray(batch["k"][idxs]), jnp.asarray(valid),
        camera_only=camera_only)
    return {"rotations": np.asarray(pg["rotations"][:n]),
            "translations": np.asarray(pg["translations"][:n])}


def evaluate_dataset(trainer, builder, metric, *, slot_budget: int = 16,
                     limit: int | None = None, collect_results: bool = False,
                     progress_every: int = 50,
                     progress: Callable = print,
                     pose_graph_metric=None,
                     pose_graph_camera_only: bool = True) -> tuple[dict, list]:
    """Sharded, batched eval over a TestBatchBuilder.

    Packs images into ``slot_budget``-slot device batches (one compile, one
    host sync per *batch* instead of per image), shards the slot axis over
    the trainer's mesh, matches predictions to GT per image on the host
    (exact ADD(-S)/AUC — reference metrics/add.py semantics), and merges
    records across processes. Returns ``(metric_dict, bop_results)``.

    Multi-host: each process evaluates images ``process_index::count`` and
    the final records are gathered with ``allgather_results`` — replacing
    the reference's pickle funnels (tools/eval.py:143-216).

    ``pose_graph_metric``: when given, images with ≥2 objects additionally
    go through the scene pose-graph (shared camera correction + joint
    object solves on flow-derived targets,
    :func:`~scflow_tpu.parallel.pose_graph.pose_graph_from_flow`) and the
    refined poses are accumulated into this second metric — the BASELINE
    extension's with/without comparison (no reference counterpart).
    """
    total = len(builder) if limit is None else min(limit, len(builder))
    pidx, pcount = jax.process_index(), jax.process_count()
    indices = range(pidx, total, pcount)

    results = []
    n_images = 0
    packed = pack_eval_batches(_prefetch_items(builder, indices), slot_budget)
    fetch = ("rotations", "translations", "pnp_valid")
    if pose_graph_metric is not None:
        fetch += ("flow", "masks", "depth", "ref_rotations",
                  "ref_translations")

    @jax.jit
    def _pack_outputs(out):
        """Concatenate the fetched outputs into at most two device buffers
        (small poses + dense maps): every host read pays the transport's
        fixed latency (~0.1-2 s on relay-attached chips), so one read per
        batch replaces 3-8."""
        n = out["rotations"].shape[0]
        small = [out["rotations"].reshape(n, 9).astype(jnp.float32),
                 out["translations"].astype(jnp.float32)]
        if "pnp_valid" in out:
            small.append(out["pnp_valid"].astype(jnp.float32)[:, None])
        if "ref_rotations" in out:
            small.append(out["ref_rotations"].reshape(n, 9)
                         .astype(jnp.float32))
            small.append(out["ref_translations"].astype(jnp.float32))
        packed = {"small": jnp.concatenate(small, axis=1)}
        if "flow" in out:
            packed["dense"] = jnp.concatenate(
                [out["flow"].astype(jnp.float32),
                 out["masks"].astype(jnp.float32),
                 out["depth"].astype(jnp.float32)[..., None]], axis=-1)
        return packed

    def _unpack_outputs(packed_np, had_pnp, had_ref):
        s = packed_np["small"]
        n = s.shape[0]
        out = {"rotations": s[:, :9].reshape(n, 3, 3),
               "translations": s[:, 9:12]}
        i = 12
        if had_pnp:
            out["pnp_valid"] = s[:, i] > 0.5
            i += 1
        if had_ref:
            out["ref_rotations"] = s[:, i:i + 9].reshape(n, 3, 3)
            out["ref_translations"] = s[:, i + 9:i + 12]
        if "dense" in packed_np:
            d = packed_np["dense"]
            out["flow"] = d[..., :2]
            out["masks"] = d[..., 2:3]
            out["depth"] = d[..., 3]
        return out

    def consume(packed_dev, had_pnp, batch, metas):
        nonlocal n_images
        out = _unpack_outputs(
            {k: np.asarray(v) for k, v in packed_dev.items()},
            had_pnp=had_pnp, had_ref=pose_graph_metric is not None)
        for item, start, n in metas:
            pred = {"labels": np.asarray(item["labels"][:n]),
                    "rotations": out["rotations"][start:start + n],
                    "translations": out["translations"][start:start + n],
                    "scores": np.ones(n, np.float32)}
            if collect_results:
                results.append({"scene_id": item["scene_id"],
                                "img_id": item["img_id"], **pred})
            if "gt_rotations" in item:
                gt = {"labels": item["gt_labels"],
                      "rotations": item["gt_rotations"],
                      "translations": item["gt_translations"]}
                metric.process(pred, gt, k=item["ori_k"])
                if pose_graph_metric is not None:
                    pg = _pose_graph_refine(out, batch, start, n, slot_budget,
                                            camera_only=pose_graph_camera_only)
                    pose_graph_metric.process(dict(pred, **pg), gt,
                                              k=item["ori_k"])
            n_images += 1
            if progress_every and n_images % progress_every == 0:
                progress(f"[{n_images}/{len(indices)}]", flush=True)

    # two-batch lag: keep 2 dispatched batches in flight (async), doing the
    # host work (fetch + exact matching) for the oldest while the device
    # computes — deep enough that neither host nor device ever idles
    from collections import deque

    pending: deque = deque()
    for batch, metas in packed:
        out_dev = trainer.predict({k: batch[k] for k in
                                   ("real_images", "ref_rotations",
                                    "ref_translations", "k", "labels")},
                                  keys=fetch, sync=False)
        had_pnp = "pnp_valid" in out_dev
        pending.append((_pack_outputs(out_dev), had_pnp, batch, metas))
        if len(pending) > 2:
            consume(*pending.popleft())
    while pending:
        consume(*pending.popleft())

    if pcount > 1:
        merged = allgather_results(metric.records_arrays())
        metric.load_arrays(merged)
    return metric.compute(), results


def make_masked_metric_step(eval_step, points_bank: PointsBank,
                            accumulator: MetricAccumulator):
    """Jitted step: refine a padded batch and accumulate masked ADD(-S)
    errors on device (no per-image host sync; cross-device merge is a sum).

    Assumes predictions are aligned with GT slot-for-slot (scene batches /
    jittered-GT eval), i.e. no host-side matching is needed.
    """
    # inline the eval step's unjitted core with the mesh bank as a jit
    # ARGUMENT when available — calling the jitted wrapper inside this jit
    # would bake the bank into the program as multi-MB constants
    core = getattr(eval_step, "core", None)
    bank = getattr(eval_step, "bank", None)

    @jax.jit
    def step(params, batch_stats, batch, acc_state):
        if core is not None:
            out = core(params, batch_stats, batch, bank)
        else:
            out = eval_step(params, batch_stats, batch)
        points, point_valid, symmetric, diameters = points_bank.gather(
            batch["labels"])
        # zero out padded points so they don't perturb the mean: replace
        # invalid points with the first point (valid by construction)
        pts = jnp.where(point_valid[..., None], points, points[:, :1])
        add = add_error(out["rotations"], out["translations"],
                        batch["gt_rotations"], batch["gt_translations"], pts)
        adds = adds_error(out["rotations"], out["translations"],
                          batch["gt_rotations"], batch["gt_translations"], pts)
        err = jnp.where(symmetric, adds, add)
        acc_state = accumulator.update(acc_state, batch["labels"], err,
                                       diameters,
                                       valid=batch.get("sample_valid"))
        return acc_state

    return step


def evaluate_device_accumulator(trainer, batches, points_bank: PointsBank,
                                num_classes: int,
                                mesh=None) -> dict:
    """Masked ADD(-S) eval fully on device over padded (scene) batches.

    ``batches`` is an iterable of batch dicts carrying gt_rotations /
    gt_translations and (optionally) sample_valid. Returns the accumulator's
    metric dict (thresholded accuracies + histogram AUC bracket).
    """
    accumulator = MetricAccumulator(num_classes=num_classes)
    step = make_masked_metric_step(trainer.eval_step, points_bank,
                                   accumulator)
    state = accumulator.init()
    for batch in batches:
        if mesh is not None:
            batch = shard_batch(batch, mesh)
        state = step(trainer.state.params, trainer.state.batch_stats, batch,
                     state)
    return accumulator.compute(state)
