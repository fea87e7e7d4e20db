"""Tile-binned triangle rasterizer: Pallas TPU kernel + thin XLA pre/post.

The TPU answer to pytorch3d's bin-based CUDA rasterizer (SURVEY.md §2.9).
An XLA pre-pass projects vertices, computes per-face edge coefficients and
selects the top-K bbox-overlapping faces per 32×32 pixel tile (chunk-
granular top_k, one packed row-gather). The Pallas kernel then runs one
program per tile with the K selected faces on the 128-lane axis:

  - edge functions / z / packed (z | face-id) keys for all (1024 px × K)
    pairs as pure VPU work held in VMEM (the XLA version of this pass
    materializes ~6 (P, K) f32 intermediates in HBM — the kernel keeps
    them on-chip, which is the entire speedup),
  - the z-test is a cross-lane integer min,
  - the winner is recovered as an exact one-hot (`key == min_key`) mask,
  - barycentric-weighted vertex-attribute interpolation happens in-kernel
    as three (P, K) @ (K, 16) MXU matmuls.

Design rules followed from the Pallas TPU guide: faces ride the lane axis
(vector loads of (K,) rows from a channel-major (16, K) coefficient
block — no scalar VMEM loads), ≥2-D iota, `preferred_element_type` on
dots, static shapes everywhere.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 32            # pixel tile edge (tile = TILE×TILE pixels)
CHUNK = 8            # face-selection granularity (top_k runs on chunks)
K_FACES = 256        # per-tile face budget (must be a lane multiple)
ID_BITS = 14
_BIG_KEY = np.int32(0x7F7F0000)
ATTR_PAD = 16        # per-vertex attribute channels padded to this


def _coeff_table(tri_xy, tri_z, face_valid):
    """Per-face channel table (F, 16):
    [a0,b0,c0, a1,b1,c1, a2,b2,c2, zt0,zt1,zt2, inv|area|, fid, valid, pad]
    where edge k is w_k(px,py) = a·px + b·py + c (area-sign folded in, so
    inside ⇔ all w ≥ 0) and zt are z-verts premultiplied by 1/|area| (zi
    needs no per-pixel normalization). Takes per-face vertex coords
    directly — the ``verts[faces]`` gathers this replaced were ~25% of the
    render phase (scattered gathers lower to a scalar path on TPU)."""
    f = tri_xy.shape[0]
    ax, ay = tri_xy[:, 0, 0], tri_xy[:, 0, 1]
    bx, by = tri_xy[:, 1, 0], tri_xy[:, 1, 1]
    cx, cy = tri_xy[:, 2, 0], tri_xy[:, 2, 1]
    area = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
    ok = face_valid & (jnp.abs(area) > 1e-12) & (tri_z > 1e-6).all(axis=-1)
    s = jnp.where(area >= 0, 1.0, -1.0)
    inv_abs = jnp.where(jnp.abs(area) > 1e-12, 1.0 / jnp.abs(area), 0.0)
    a0, b0 = -(cy - by) * s, (cx - bx) * s
    c0 = ((cy - by) * bx - (cx - bx) * by) * s
    a1, b1 = -(ay - cy) * s, (ax - cx) * s
    c1 = ((ay - cy) * cx - (ax - cx) * cy) * s
    a2, b2 = -(by - ay) * s, (bx - ax) * s
    c2 = ((by - ay) * ax - (bx - ax) * ay) * s
    zt = tri_z * inv_abs[:, None]
    fid = jnp.arange(f, dtype=jnp.float32)
    cols = [a0, b0, c0, a1, b1, c1, a2, b2, c2,
            zt[:, 0], zt[:, 1], zt[:, 2], inv_abs, fid,
            ok.astype(jnp.float32), jnp.zeros_like(a0)]
    bbox = (jnp.minimum(jnp.minimum(ax, bx), cx),
            jnp.maximum(jnp.maximum(ax, bx), cx),
            jnp.minimum(jnp.minimum(ay, by), cy),
            jnp.maximum(jnp.maximum(ay, by), cy))
    return jnp.stack(cols, axis=-1), bbox, ok


def _select_tiles(coeff, bbox, ok, height, width, k_faces, attr_rows=None):
    """Chunk-granular top-K face selection per tile.

    Returns sel_coeff (T, 16, K) channel-major for lane-aligned kernel
    loads (plus selected attr rows when given). Selection is gather-free:
    chunk c's slot is its overlap-prefix count, the (T, K8, C) slot one-hot
    is formed by an equality compare, and the chunk tables are *matmul'd*
    through the one-hot on the MXU — the chunk-row gather + (K, 16)
    transpose this replaced was ~25% of the render phase. Unfilled slots
    get all-zero rows (valid channel 0), so no per-slot masking is needed.
    """
    f = coeff.shape[0]
    xmin, xmax, ymin, ymax = bbox
    ty, tx = height // TILE, width // TILE
    t = ty * tx
    t_y0 = (jnp.arange(ty) * TILE).astype(jnp.float32)
    t_x0 = (jnp.arange(tx) * TILE).astype(jnp.float32)
    ovy = ((ymax[None, :] >= t_y0[:, None] - 0.5)
           & (ymin[None, :] <= t_y0[:, None] + TILE - 0.5))
    ovx = ((xmax[None, :] >= t_x0[:, None] - 0.5)
           & (xmin[None, :] <= t_x0[:, None] + TILE - 0.5))
    overlap = (ovy[:, None, :] & ovx[None, :, :] & ok).reshape(t, f)
    ov_chunks = overlap.reshape(t, f // CHUNK, CHUNK).any(-1)  # (T, C)
    # slot assignment WITHOUT lax.top_k (sort-based top_k was ~half the
    # whole render phase on TPU): chunk c gets slot pos = #overlapping
    # chunks before it. Selects the same first-K overlapping chunks in the
    # same order as a top_k, as pure VPU reduce work.
    k8 = k_faces // CHUNK
    pos = jnp.cumsum(ov_chunks, axis=1) - 1                    # (T, C)
    assigned = ov_chunks & (pos < k8)
    onehot = (assigned[:, None, :]
              & (pos[:, None, :] == jnp.arange(k8)[:, None])   # (T, K8, C)
              ).astype(coeff.dtype).reshape(t * k8, f // CHUNK)

    # channel-major chunk table (C, 16·CHUNK): one MXU matmul selects and
    # lays out each tile's coefficients; only a major-axis relayout remains
    cm = jnp.swapaxes(coeff.reshape(f // CHUNK, CHUNK, 16), 1, 2)
    sel = (onehot @ cm.reshape(f // CHUNK, 16 * CHUNK)).reshape(
        t, k8, 16, CHUNK)
    sel = jnp.moveaxis(sel, 2, 1).reshape(t, 16, k_faces)      # (T, 16, K)
    if attr_rows is None:
        return sel, None
    sel_attr = (onehot @ attr_rows.reshape(f // CHUNK, -1)).reshape(
        t, k_faces, attr_rows.shape[-1])
    return sel, sel_attr


def _rasterize_kernel(tx: int, k_faces: int, d_attr: int, tpb: int):
    """``tpb`` horizontally-consecutive tiles per program (static unroll):
    tiny per-tile blocks make the grid huge and per-program DMA/launch
    latency dominates. Outputs are written as (TILE, tpb·TILE) blocks of
    (H, W)-layout arrays — the (T, P) tiled→image untile transpose this
    replaces was ~3 ms/step of pure relayout copies."""
    p = TILE * TILE

    def kernel(coeff_ref, attr_ref, key_ref, z_ref, attr_out_ref):
        i = pl.program_id(0)
        row_blocks = tx // tpb
        y0 = ((i // row_blocks) * TILE).astype(jnp.float32)
        x00 = ((i % row_blocks) * (tpb * TILE)).astype(jnp.float32)
        pix = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
        dx = (pix % TILE).astype(jnp.float32)
        dy = (pix // TILE).astype(jnp.float32)
        py = y0 + dy                                          # (P, 1)

        # static unroll: Mosaic stack-allocates each iteration's (P, K)
        # temporaries, so tpb is capped where ~3.2 MB/iter fits scoped VMEM
        # (tpb=8 OOMs at 25.3 MB; a fori_loop would reuse buffers but its
        # dynamic ref indexing crashes this toolchain's compile helper)
        for j in range(tpb):
            px = x00 + (j * TILE) + dx                        # (P, 1)

            cj = coeff_ref[j]                                 # (16, K)

            def row(i, cj=cj):
                return cj[i][None, :]                         # (1, K)

            w0 = row(0) * px + (row(1) * py + row(2))         # (P, K)
            w1 = row(3) * px + (row(4) * py + row(5))
            w2 = row(6) * px + (row(7) * py + row(8))
            inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0) & (row(14) > 0)
            zi = w0 * row(9) + w1 * row(10) + w2 * row(11)
            zkey = pltpu.bitcast(jnp.maximum(zi, 1e-30), jnp.int32)
            fid = row(13).astype(jnp.int32)
            key = ((zkey >> ID_BITS) << ID_BITS) | fid
            key = jnp.where(inside, key, _BIG_KEY)
            min_key = jnp.min(key, axis=1, keepdims=True)     # (P, 1)
            sl = slice(j * TILE, (j + 1) * TILE)
            key_ref[:, sl] = min_key[:, 0].reshape(TILE, TILE)

            winner = ((key == min_key) & inside).astype(jnp.float32)
            z_ref[:, sl] = jnp.sum(winner * zi, axis=1).reshape(TILE, TILE)
            if d_attr:
                a = attr_ref[j]                               # (K, 3·Dp)
                interp = jnp.dot(winner * w0, a[:, 0:ATTR_PAD],
                                 preferred_element_type=jnp.float32)
                interp += jnp.dot(winner * w1, a[:, ATTR_PAD:2 * ATTR_PAD],
                                  preferred_element_type=jnp.float32)
                interp += jnp.dot(winner * w2, a[:, 2 * ATTR_PAD:3 * ATTR_PAD],
                                  preferred_element_type=jnp.float32)
                attr_out_ref[j] = interp

    return kernel


@partial(jax.jit, static_argnames=("height", "width", "k_faces",
                                   "interpret", "return_bary"))
def rasterize_fast(verts_xy, verts_z, faces, face_valid, height, width,
                   tri_attrs=None, k_faces: int = K_FACES,
                   interpret: bool = False, return_bary: bool = True,
                   tri_xy=None, tri_z=None):
    """Pallas tile-binned rasterizer (single sample; vmap over a batch).

    Same semantics as ``rendering.rasterizer.rasterize_binned``: returns
    dict(zbuf, face_id[, bary][, attrs]). ``tri_attrs`` is (F, 3, D≤16)
    per-face-vertex attributes interpolated in-kernel. Pass precomputed
    per-face vertex coords ``tri_xy (F, 3, 2)`` / ``tri_z (F, 3)`` (e.g.
    projected from a MeshBank tri table) to skip the slow ``verts[faces]``
    gathers; ``verts_xy/verts_z`` may then be None (``faces`` is still
    used for the ``return_bary`` tail).
    """
    assert height % TILE == 0 and width % TILE == 0, (height, width)
    if tri_xy is None:
        tri_xy = verts_xy[faces]                              # (F, 3, 2)
        tri_z = verts_z[faces]                                # (F, 3)
    fcount0 = tri_xy.shape[0]
    pad = (-fcount0) % CHUNK
    if pad:
        if faces is not None:
            faces = jnp.concatenate([faces,
                                     jnp.zeros((pad, 3), faces.dtype)])
        face_valid = jnp.concatenate([face_valid, jnp.zeros((pad,), bool)])
        tri_xy = jnp.concatenate(
            [tri_xy, jnp.zeros((pad, 3, 2), tri_xy.dtype)])
        tri_z = jnp.concatenate([tri_z, jnp.zeros((pad, 3), tri_z.dtype)])
        if tri_attrs is not None:
            tri_attrs = jnp.concatenate(
                [tri_attrs, jnp.zeros((pad,) + tri_attrs.shape[1:],
                                      tri_attrs.dtype)])
    fcount = tri_xy.shape[0]
    assert fcount < (1 << ID_BITS), "face budget exceeds packed id bits"
    k_faces = min(k_faces, max(CHUNK, (fcount // CHUNK) * CHUNK))

    coeff, bbox, ok = _coeff_table(tri_xy, tri_z, face_valid)
    ty, tx = height // TILE, width // TILE
    t = ty * tx
    p = TILE * TILE

    d_attr = 0
    at = None
    if tri_attrs is not None:
        d_attr = tri_attrs.shape[-1]
        assert d_attr <= ATTR_PAD, d_attr
        inv_abs = coeff[:, 12]
        attr_p = tri_attrs * inv_abs[:, None, None]           # premultiplied
        attr_p = jnp.pad(attr_p,
                         ((0, 0), (0, 0), (0, ATTR_PAD - d_attr)))
        at = attr_p.reshape(fcount, 3 * ATTR_PAD)
    sel_coeff, sel_attr = _select_tiles(coeff, bbox, ok, height, width,
                                        k_faces, attr_rows=at)
    if sel_attr is None:
        sel_attr = jnp.zeros((t, k_faces, 3 * ATTR_PAD), jnp.float32)

    tpb = 4 if tx % 4 == 0 else 1           # tiles per program (one block row)
    rb = tx // tpb                          # block columns per tile row
    keys, zbuf, attrs = pl.pallas_call(
        _rasterize_kernel(tx, k_faces, d_attr, tpb),
        grid=(t // tpb,),
        in_specs=[
            pl.BlockSpec((tpb, 16, k_faces), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tpb, k_faces, 3 * ATTR_PAD), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TILE, tpb * TILE),
                         lambda i, rb=rb: (i // rb, i % rb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, tpb * TILE),
                         lambda i, rb=rb: (i // rb, i % rb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tpb, p, ATTR_PAD), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((height, width), jnp.int32),
            jax.ShapeDtypeStruct((height, width), jnp.float32),
            jax.ShapeDtypeStruct((t, p, ATTR_PAD), jnp.float32),
        ],
        interpret=interpret,
    )(sel_coeff, sel_attr)

    bg = keys >= _BIG_KEY
    face_id = jnp.where(bg, -1, keys & ((1 << ID_BITS) - 1))
    zbuf = jnp.where(bg, 0.0, zbuf)
    out = {"zbuf": zbuf, "face_id": face_id}
    if tri_attrs is not None:
        # slice to the live channels BEFORE the tile-major→row-major
        # relayout: the moveaxis is a real HBM copy (~2.4 ms at batch 32),
        # so move 9/16ths of the bytes instead of all of ATTR_PAD
        attrs = attrs.reshape(ty, tx, TILE, TILE, ATTR_PAD)[..., :d_attr]
        attrs = jnp.moveaxis(attrs, 2, 1).reshape(height, width, d_attr)
        out["attrs"] = jnp.where(bg[..., None], 0.0, attrs)
    if return_bary:
        # XLA tail (per-pixel gather) — kept for parity tests; the renderer
        # path requests attrs instead.
        safe = jnp.maximum(face_id, 0)
        tri_xy = tri_xy[safe]                                 # (H, W, 3, 2)
        ys = jnp.arange(height, dtype=tri_xy.dtype)
        xs = jnp.arange(width, dtype=tri_xy.dtype)
        px, py = jnp.meshgrid(xs, ys)
        ax, ay = tri_xy[..., 0, 0], tri_xy[..., 0, 1]
        bx, by = tri_xy[..., 1, 0], tri_xy[..., 1, 1]
        cx, cy = tri_xy[..., 2, 0], tri_xy[..., 2, 1]
        area = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
        inv_area = jnp.where(jnp.abs(area) > 1e-12, 1.0 / area, 0.0)
        e0 = (cx - bx) * (py - by) - (cy - by) * (px - bx)
        e1 = (ax - cx) * (py - cy) - (ay - cy) * (px - cx)
        e2 = (bx - ax) * (py - ay) - (by - ay) * (px - ax)
        bary = jnp.stack([e0, e1, e2], axis=-1) * inv_area[..., None]
        out["bary"] = jnp.where(bg[..., None], 0.0, bary)
    return out
