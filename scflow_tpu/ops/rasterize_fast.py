"""Tile-binned triangle rasterizer: Pallas TPU kernel + fused XLA tail.

The TPU answer to pytorch3d's bin-based CUDA rasterizer (SURVEY.md §2.9):
the image is split into (TILE_H × TILE_W) pixel tiles; an XLA pre-pass packs
per-face data and computes which 64-face chunks overlap each tile; the
Pallas kernel then streams only overlapping chunks, evaluating edge
functions for the whole pixel tile per face (VPU) and keeping the packed
(z | face-id) minimum — the z-test is one integer min, no argmin carries.
A fused XLA tail recovers exact depth/barycentrics/attributes with a single
row-gather per pixel from the packed face table.

Speedup vs the plain XLA scan rasterizer comes from predicated chunk
skipping: faces touch few tiles, so ~90% of face×tile work vanishes.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H = 32
TILE_W = 128
CHUNK = 64          # faces per culling granule


def _tile_shape(height: int, width: int) -> tuple[int, int]:
    """Largest (th, tw) ≤ (TILE_H, TILE_W) dividing the image."""
    th = TILE_H
    while height % th:
        th //= 2
    tw = TILE_W
    while width % tw:
        tw //= 2
    return th, tw
_BIG_KEY = np.int32(0x7F7F0000)
ID_BITS = 14


def pack_face_data(verts_xy, verts_z, faces, face_valid):
    """Per-face rasterization data (F, 16):
    [ax, ay, bx, by, cx, cy, az, bz, cz, inv_area, xmin, xmax, ymin, ymax,
     valid, pad]. Invalid faces get empty bboxes so they never overlap."""
    tri_xy = verts_xy[faces]            # (F, 3, 2)
    tri_z = verts_z[faces]              # (F, 3)
    ax, ay = tri_xy[:, 0, 0], tri_xy[:, 0, 1]
    bx, by = tri_xy[:, 1, 0], tri_xy[:, 1, 1]
    cx, cy = tri_xy[:, 2, 0], tri_xy[:, 2, 1]
    area = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
    ok = (face_valid & (jnp.abs(area) > 1e-12)
          & (tri_z > 1e-6).all(axis=-1))
    inv_area = jnp.where(jnp.abs(area) > 1e-12, 1.0 / area, 0.0)
    xmin = jnp.minimum(jnp.minimum(ax, bx), cx)
    xmax = jnp.maximum(jnp.maximum(ax, bx), cx)
    ymin = jnp.minimum(jnp.minimum(ay, by), cy)
    ymax = jnp.maximum(jnp.maximum(ay, by), cy)
    # invalid faces: impossible bbox
    xmin = jnp.where(ok, xmin, 1e9)
    xmax = jnp.where(ok, xmax, -1e9)
    data = jnp.stack([ax, ay, bx, by, cx, cy, tri_z[:, 0], tri_z[:, 1],
                      tri_z[:, 2], inv_area, xmin, xmax, ymin, ymax,
                      ok.astype(jnp.float32), jnp.zeros_like(ax)], axis=-1)
    return data  # (F, 16)


def chunk_tile_overlap(face_data, height, width):
    """(num_tiles, num_chunks) float 0/1: does any face of chunk c overlap
    tile t (conservative bbox test)."""
    f = face_data.shape[0]
    num_chunks = f // CHUNK
    tile_h, tile_w = _tile_shape(height, width)
    ty = height // tile_h
    tx = width // tile_w
    xmin = face_data[:, 10].reshape(num_chunks, CHUNK)
    xmax = face_data[:, 11].reshape(num_chunks, CHUNK)
    ymin = face_data[:, 12].reshape(num_chunks, CHUNK)
    ymax = face_data[:, 13].reshape(num_chunks, CHUNK)

    tile_y0 = (jnp.arange(ty) * tile_h).astype(jnp.float32)[:, None, None, None]
    tile_x0 = (jnp.arange(tx) * tile_w).astype(jnp.float32)[None, :, None, None]
    # face bbox intersects tile rect (broadcast (ty, tx, num_chunks, CHUNK))
    ovx = ((xmax[None, None] >= tile_x0 - 0.5)
           & (xmin[None, None] <= tile_x0 + tile_w - 0.5))
    ovy = ((ymax[None, None] >= tile_y0 - 0.5)
           & (ymin[None, None] <= tile_y0 + tile_h - 0.5))
    ov = (ovx & ovy).any(axis=-1)  # (ty, tx, num_chunks)
    return ov.reshape(ty * tx, num_chunks).astype(jnp.float32)


def _make_kernel(tile_h: int, tile_w: int):
  def _kernel(tri_ref, ov_ref, out_ref):
    """One (sample, tile) program: loop overlapping 64-face chunks, keep the
    packed-key minimum over faces for each pixel of the tile."""
    tile_id = pl.program_id(1) * pl.num_programs(2) + pl.program_id(2)
    y0 = (pl.program_id(1) * tile_h).astype(jnp.float32)
    x0 = (pl.program_id(2) * tile_w).astype(jnp.float32)
    py = y0 + jax.lax.broadcasted_iota(
        jnp.int32, (tile_h, tile_w), 0).astype(jnp.float32)
    px = x0 + jax.lax.broadcasted_iota(
        jnp.int32, (tile_h, tile_w), 1).astype(jnp.float32)

    num_chunks = ov_ref.shape[1]

    def chunk_body(c, keybuf):
        def do_chunk(keybuf):
            def face_body(i, keybuf):
                f = c * CHUNK + i
                ax = tri_ref[f, 0]
                ay = tri_ref[f, 1]
                bx = tri_ref[f, 2]
                by = tri_ref[f, 3]
                cx = tri_ref[f, 4]
                cy = tri_ref[f, 5]
                z0 = tri_ref[f, 6]
                z1 = tri_ref[f, 7]
                z2 = tri_ref[f, 8]
                inv_area = tri_ref[f, 9]
                valid = tri_ref[f, 14]

                e0 = (cx - bx) * (py - by) - (cy - by) * (px - bx)
                e1 = (ax - cx) * (py - cy) - (ay - cy) * (px - cx)
                e2 = (bx - ax) * (py - ay) - (by - ay) * (px - ax)
                w0 = e0 * inv_area
                w1 = e1 * inv_area
                w2 = e2 * inv_area
                inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0) & (valid > 0)
                z = w0 * z0 + w1 * z1 + w2 * z2
                zkey = pltpu.bitcast(jnp.maximum(z, 1e-30), jnp.int32)
                key = ((zkey >> ID_BITS) << ID_BITS) | f
                key = jnp.where(inside, key, _BIG_KEY)
                return jnp.minimum(keybuf, key)

            return jax.lax.fori_loop(0, CHUNK, face_body, keybuf)

        # skip chunks whose faces don't touch this tile
        return jax.lax.cond(ov_ref[tile_id, c] > 0, do_chunk,
                            lambda k: k, keybuf)

    init = jnp.full((tile_h, tile_w), _BIG_KEY, jnp.int32)
    out_ref[0] = jax.lax.fori_loop(0, num_chunks, chunk_body, init)

  return _kernel


@partial(jax.jit, static_argnames=("height", "width", "interpret"))
def rasterize_keys(face_data, overlap, height, width, interpret=False):
    """Run the Pallas kernel for one sample → packed key map (H, W)."""
    f = face_data.shape[0]
    tile_h, tile_w = _tile_shape(height, width)
    ty, tx = height // tile_h, width // tile_w
    grid = (1, ty, tx)
    return pl.pallas_call(
        _make_kernel(tile_h, tile_w),
        grid=grid,
        in_specs=[
            pl.BlockSpec((f, 16), lambda n, i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(overlap.shape, lambda n, i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_h, tile_w),
                               lambda n, i, j: (0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, height, width), jnp.int32),
        interpret=interpret,
    )(face_data, overlap)[0]


@partial(jax.jit, static_argnames=("height", "width", "interpret"))
def rasterize_fast(verts_xy, verts_z, faces, face_valid, height, width,
                   interpret: bool = False):
    """Drop-in replacement for ``rendering.rasterizer.rasterize`` (single
    sample; vmap over a batch): Pallas tile-binned z-test + XLA tail.

    Returns dict(zbuf, face_id, bary) with identical semantics.
    """
    fcount = faces.shape[0]
    pad = (-fcount) % CHUNK
    if pad:
        faces = jnp.concatenate([faces, jnp.zeros((pad, 3), faces.dtype)])
        face_valid = jnp.concatenate([face_valid, jnp.zeros((pad,), bool)])
    assert faces.shape[0] < (1 << ID_BITS), "face budget exceeds packed id bits"

    face_data = pack_face_data(verts_xy, verts_z, faces, face_valid)
    overlap = chunk_tile_overlap(face_data, height, width)
    keys = rasterize_keys(face_data, overlap, height, width,
                          interpret=interpret)

    bg = keys >= _BIG_KEY
    id_mask = (1 << ID_BITS) - 1
    face_id = jnp.where(bg, -1, keys & id_mask)
    safe = jnp.maximum(face_id, 0)

    row = face_data[safe]                     # (H, W, 16) single row-gather
    ys = jnp.arange(height, dtype=verts_xy.dtype)
    xs = jnp.arange(width, dtype=verts_xy.dtype)
    px, py = jnp.meshgrid(xs, ys)
    ax, ay = row[..., 0], row[..., 1]
    bx, by = row[..., 2], row[..., 3]
    cx, cy = row[..., 4], row[..., 5]
    inv_area = row[..., 9]
    e0 = (cx - bx) * (py - by) - (cy - by) * (px - bx)
    e1 = (ax - cx) * (py - cy) - (ay - cy) * (px - cx)
    e2 = (bx - ax) * (py - ay) - (by - ay) * (px - ax)
    bary = jnp.stack([e0, e1, e2], axis=-1) * inv_area[..., None]
    bary = jnp.where(bg[..., None], 0.0, bary)
    zbuf = (bary[..., 0] * row[..., 6] + bary[..., 1] * row[..., 7]
            + bary[..., 2] * row[..., 8])
    zbuf = jnp.where(bg, 0.0, zbuf)
    return {"zbuf": zbuf, "face_id": face_id, "bary": bary}
