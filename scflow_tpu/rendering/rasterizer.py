"""Differentiable-enough triangle rasterizer in pure JAX (XLA path).

TPU-first re-design of the pytorch3d CUDA ``MeshRasterizer`` the reference
depends on (models/utils/rendering.py:149-183). Instead of bin-based CUDA
rasterization, we stream faces in fixed-size chunks with ``lax.scan``,
evaluating screen-space edge functions for (chunk_faces × all_pixels) per
step and keeping a per-pixel (z, face_id) winner carry. All shapes static;
the O(F·P) edge-function work is elementwise VPU math that XLA fuses, and
per-image cost at F=1k..4k faces, P=256² is far below MXU-bound stages.

Conventions (match the reference's data, not pytorch3d's internals):
- OpenCV camera: ``p_cam = R p_obj + t``, pixel = K p_cam / z, +z in front.
- Screen-space (non-perspective-correct) barycentric interpolation of depth
  and attributes — pytorch3d's RasterizationSettings default
  (perspective_correct=False), which is what SCFlow trained with.
- zbuf = interpolated camera-space z of the top face; background = 0
  (the reference derives mask = depth > 0, base_refiner.py:111).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_BIG = jnp.float32(1e30)


def project_vertices(verts: jax.Array, rotation: jax.Array, translation: jax.Array,
                     k: jax.Array, eps: float = 1e-8):
    """Object-frame verts (V, 3) → (pixel xy (V, 2), camera z (V,))."""
    p_cam = verts @ rotation.T + translation
    uvw = p_cam @ k.T
    z = uvw[..., 2]
    xy = uvw[..., :2] / (z[..., None] + eps)
    return xy, z


@partial(jax.jit, static_argnames=("height", "width", "chunk"))
def rasterize(verts_xy: jax.Array, verts_z: jax.Array, faces: jax.Array,
              face_valid: jax.Array, height: int, width: int,
              chunk: int = 256):
    """Z-buffer rasterization of one mesh.

    Args:
      verts_xy: (V, 2) pixel-space vertex coords.
      verts_z: (V,) camera-space z.
      faces: (F, 3) int vertex ids.
      face_valid: (F,) bool (padding faces excluded).
      height, width: output resolution.
      chunk: faces per scan step (static).

    Returns dict:
      zbuf:    (H, W) top-face interpolated z, 0 for background.
      face_id: (H, W) int32 winning face index, -1 for background.
      bary:    (H, W, 3) screen-space barycentrics of the winner (0 bg).

    vmap over a leading batch axis for batched meshes.
    """
    f = faces.shape[0]
    pad = (-f) % chunk
    if pad:
        faces = jnp.concatenate([faces, jnp.zeros((pad, 3), faces.dtype)])
        face_valid = jnp.concatenate([face_valid, jnp.zeros((pad,), bool)])
    f_padded = faces.shape[0]
    num_chunks = f_padded // chunk
    # Packed z-test: the (min z, argmin face) pair is carried as ONE int32
    # key = top-18 bits of bitcast(z) | 14-bit face id. Positive-float
    # bitcasts are monotone, so an integer min gives the nearest face with
    # its id in one fully-fused elementwise+reduce chain (no argmin /
    # select bookkeeping in the scan carry). z precision only affects tie
    # ordering (~1e-4 relative); the output zbuf is recomputed exactly for
    # the winning face below.
    id_bits = max(14, (f_padded - 1).bit_length())
    assert id_bits < 24, f"face budget {f_padded} too large for packed keys"
    id_mask = (1 << id_bits) - 1
    faces_c = faces.reshape(num_chunks, chunk, 3)
    valid_c = face_valid.reshape(num_chunks, chunk)
    ids_c = jnp.arange(f_padded, dtype=jnp.int32).reshape(num_chunks, chunk)

    ys = jnp.arange(height, dtype=verts_xy.dtype)
    xs = jnp.arange(width, dtype=verts_xy.dtype)
    px, py = jnp.meshgrid(xs, ys)  # (H, W)

    _BIG_KEY = jnp.int32(0x7F7F0000)  # bitcast-key of a huge positive float

    def step(carry, inp):
        key_buf = carry
        fchunk, fvalid, fids = inp  # (C, 3), (C,), (C,)
        tri_xy = verts_xy[fchunk]        # (C, 3, 2)
        tri_z = verts_z[fchunk]          # (C, 3)

        ax, ay = tri_xy[:, 0, 0], tri_xy[:, 0, 1]
        bx, by = tri_xy[:, 1, 0], tri_xy[:, 1, 1]
        cx, cy = tri_xy[:, 2, 0], tri_xy[:, 2, 1]
        area = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)  # (C,)

        # Edge functions at every pixel: e0 opposite vertex a, etc.
        def edge(x0, y0, x1, y1):
            return ((x1 - x0)[:, None, None] * (py[None] - y0[:, None, None])
                    - (y1 - y0)[:, None, None] * (px[None] - x0[:, None, None]))

        e0 = edge(bx, by, cx, cy)  # (C, H, W)
        e1 = edge(cx, cy, ax, ay)
        e2 = edge(ax, ay, bx, by)

        inv_area = jnp.where(jnp.abs(area) > 1e-12, 1.0 / area, 0.0)
        w0 = e0 * inv_area[:, None, None]
        w1 = e1 * inv_area[:, None, None]
        w2 = e2 * inv_area[:, None, None]
        inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0)  # both windings via |area| sign in inv

        z = (w0 * tri_z[:, 0, None, None] + w1 * tri_z[:, 1, None, None]
             + w2 * tri_z[:, 2, None, None])
        ok = (inside & fvalid[:, None, None]
              & (jnp.abs(area) > 1e-12)[:, None, None]
              & (tri_z > 1e-6).all(axis=-1)[:, None, None])
        zkey = jax.lax.bitcast_convert_type(jnp.maximum(z, 1e-30), jnp.int32)
        key = ((zkey >> id_bits) << id_bits) | fids[:, None, None]
        key = jnp.where(ok, key, _BIG_KEY)
        return jnp.minimum(key_buf, jnp.min(key, axis=0)), None

    init = jnp.full((height, width), _BIG_KEY, jnp.int32)
    key_buf, _ = jax.lax.scan(step, init, (faces_c, valid_c, ids_c))

    bg = key_buf >= _BIG_KEY
    face_id = jnp.where(bg, -1, key_buf & id_mask)

    # Recompute exact z + barycentrics for the winning face only (cheap,
    # avoids a heavy scan carry).
    safe_face = jnp.maximum(face_id, 0)
    fv = faces.reshape(-1, 3)[safe_face]             # (H, W, 3)
    tri = verts_xy[fv]                               # (H, W, 3, 2)
    ax, ay = tri[..., 0, 0], tri[..., 0, 1]
    bx, by = tri[..., 1, 0], tri[..., 1, 1]
    cx, cy = tri[..., 2, 0], tri[..., 2, 1]
    area = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
    inv_area = jnp.where(jnp.abs(area) > 1e-12, 1.0 / area, 0.0)
    e0 = (cx - bx) * (py - by) - (cy - by) * (px - bx)
    e1 = (ax - cx) * (py - cy) - (ay - cy) * (px - cx)
    e2 = (bx - ax) * (py - ay) - (by - ay) * (px - ax)
    bary = jnp.stack([e0, e1, e2], axis=-1) * inv_area[..., None]
    bary = jnp.where(bg[..., None], 0.0, bary)
    tri_z = verts_z[fv]                              # (H, W, 3)
    zbuf = jnp.sum(bary * tri_z, axis=-1)
    zbuf = jnp.where(bg, 0.0, zbuf)
    return {"zbuf": zbuf, "face_id": face_id, "bary": bary}


@partial(jax.jit, static_argnames=("height", "width", "tile", "k_faces",
                                   "return_bary"))
def rasterize_binned(verts_xy: jax.Array, verts_z: jax.Array,
                     faces: jax.Array, face_valid: jax.Array,
                     height: int, width: int, tile: int = 32,
                     k_faces: int = 256, tri_attrs: jax.Array | None = None,
                     return_bary: bool = True):
    """Tile-binned rasterization in pure XLA (single sample; vmap to batch).

    Splits the image into (tile × tile) pixel tiles and rasterizes each
    against only its top-``k_faces`` bbox-overlapping faces (selected with
    one ``top_k`` + row-gather). Work drops from F×H×W to T×K×tile² —
    5-10× for typical meshes — and invalid/backface-culled faces are never
    selected at all, so culling translates into real savings (unlike the
    dense scan path where masked faces still burn vector ops).

    The winner's barycentrics, depth and (optionally) interpolated vertex
    attributes are extracted *inside* the tile pass: the winning face is a
    one-hot ``key == min_key`` mask, so bary/z are masked lane reductions
    and attribute interpolation is a (pixels × K) @ (K × D) MXU matmul per
    tile — no per-pixel gathers anywhere (gathers lower to a scalar path on
    TPU; measured 2× end-to-end on the render stage).

    Args:
      tri_attrs: optional (F, 3, D) per-face-vertex attributes to
        interpolate; returned as ``attrs`` (H, W, D).

    Semantics match :func:`rasterize`; faces beyond the per-tile budget are
    dropped (budget is generous: K=256 faces on a 1024-px tile).
    """
    fcount = faces.shape[0]
    tri_xy = verts_xy[faces]            # (F, 3, 2)
    tri_z = verts_z[faces]              # (F, 3)
    area = ((tri_xy[:, 1, 0] - tri_xy[:, 0, 0])
            * (tri_xy[:, 2, 1] - tri_xy[:, 0, 1])
            - (tri_xy[:, 1, 1] - tri_xy[:, 0, 1])
            * (tri_xy[:, 2, 0] - tri_xy[:, 0, 0]))
    ok = face_valid & (jnp.abs(area) > 1e-12) & (tri_z > 1e-6).all(axis=-1)

    xmin = jnp.min(tri_xy[..., 0], axis=1)
    xmax = jnp.max(tri_xy[..., 0], axis=1)
    ymin = jnp.min(tri_xy[..., 1], axis=1)
    ymax = jnp.max(tri_xy[..., 1], axis=1)

    ty, tx = height // tile, width // tile
    t_y0 = (jnp.arange(ty) * tile).astype(verts_xy.dtype)
    t_x0 = (jnp.arange(tx) * tile).astype(verts_xy.dtype)
    ovy = ((ymax[None, :] >= t_y0[:, None] - 0.5)
           & (ymin[None, :] <= t_y0[:, None] + tile - 0.5))   # (ty, F)
    ovx = ((xmax[None, :] >= t_x0[:, None] - 0.5)
           & (xmin[None, :] <= t_x0[:, None] + tile - 0.5))   # (tx, F)
    overlap = (ovy[:, None, :] & ovx[None, :, :] & ok).reshape(ty * tx, fcount)

    # chunk-level selection: faces are index-coherent on real meshes, so
    # culling at 8-face granularity is nearly as tight while the top_k sort
    # shrinks 8× (sorts are the expensive part on TPU).
    k_faces = min(k_faces, fcount)
    chunk = 8
    d_attr = tri_attrs.shape[-1] if tri_attrs is not None else 0
    # pack all per-face data into one chunk-granular table so per-tile
    # selection is ONE gather with large rows (chunk·row_d floats) — many
    # small scattered gathers lower to a slow scalar path on TPU. The
    # per-face ok flag rides along as column 9 so slot-level selection
    # needs no per-face validity gather.
    pack_cols = [tri_xy.reshape(fcount, 6), tri_z,
                 ok.astype(tri_z.dtype)[:, None]]
    if tri_attrs is not None:
        pack_cols.append(tri_attrs.reshape(fcount, 3 * d_attr))
    face_pack = jnp.concatenate(pack_cols, axis=-1)            # (F, 10+3D)
    row_d = face_pack.shape[-1]
    if fcount % chunk == 0 and k_faces % chunk == 0:
        ov_chunks = overlap.reshape(ty * tx, fcount // chunk, chunk).any(-1)
        # sort-free slot assignment (see ops/rasterize_fast._select_tiles):
        # cumsum positions + exact one-hot argmax select the same first-K
        # overlapping chunks as lax.top_k at a fraction of its TPU cost
        k8 = k_faces // chunk
        pos = jnp.cumsum(ov_chunks, axis=1) - 1
        assigned = ov_chunks & (pos < k8)
        onehot = assigned[..., None] & (pos[..., None] == jnp.arange(k8))
        top_c = jnp.argmax(onehot, axis=1).astype(jnp.int32)
        slot_filled = jnp.any(onehot, axis=1)
        top_idx = (top_c[..., None] * chunk
                   + jnp.arange(chunk)).reshape(ty * tx, k_faces)
        sel_pack = face_pack.reshape(fcount // chunk, chunk * row_d)[
            top_c].reshape(ty * tx, k_faces, row_d)
        # per-slot validity only: a selected face that doesn't overlap this
        # tile fails its edge tests anyway, and per-element gathers are
        # slow on TPU. Globally-invalid faces were excluded from `overlap`,
        # so a filled slot may only contain ok or non-overlapping faces —
        # except the degenerate/behind-camera ones filtered below via area
        # and z guards in the tile pass.
        sel_valid = jnp.repeat(slot_filled, chunk, axis=1)
    else:
        _, top_idx = jax.lax.top_k(overlap.astype(jnp.float32), k_faces)
        sel_pack = face_pack[top_idx]                          # (T, K, row_d)
        sel_valid = jnp.take_along_axis(overlap, top_idx, axis=1)

    sel_xy = sel_pack[..., :6].reshape(ty * tx, k_faces, 3, 2)
    sel_z = sel_pack[..., 6:9]
    sel_valid = sel_valid & (sel_pack[..., 9] > 0.5)           # per-face ok
    sel_area = ((sel_xy[..., 1, 0] - sel_xy[..., 0, 0])
                * (sel_xy[..., 2, 1] - sel_xy[..., 0, 1])
                - (sel_xy[..., 1, 1] - sel_xy[..., 0, 1])
                * (sel_xy[..., 2, 0] - sel_xy[..., 0, 0]))
    if tri_attrs is not None:
        sel_attr = sel_pack[..., 10:].reshape(ty * tx, k_faces, 3, d_attr)
    else:
        sel_attr = jnp.zeros((ty * tx, k_faces, 3, 0), verts_xy.dtype)

    id_bits = max(14, (fcount - 1).bit_length())
    _BIG_KEY = jnp.int32(0x7F7F0000)

    tile_ids = jnp.arange(ty * tx, dtype=jnp.int32)

    def one_tile(xy, z, a, valid, fids, attr, tid):
        # layout: (pixels=tile², faces=K) — faces ride the 128-lane axis so
        # the VPU is fully utilized and the z-test is a lane reduction.
        # Per-face edge coefficients are precomputed (K-sized vectors) so
        # the inner (P, K) work is 2 FMA per edge + 3 FMA for z — the sign
        # test runs on unnormalized edges (area sign folded into the
        # coefficients) and the area normalization is folded into z/attrs.
        y0 = (tid // tx) * tile
        x0 = (tid % tx) * tile
        pyl = (y0 + jnp.arange(tile)).astype(verts_xy.dtype)
        pxl = (x0 + jnp.arange(tile)).astype(verts_xy.dtype)
        pxx, pyy = jnp.meshgrid(pxl, pyl)
        pxf = pxx.reshape(-1, 1)                 # (P, 1)
        pyf = pyy.reshape(-1, 1)

        ax, ay = xy[:, 0, 0], xy[:, 0, 1]        # (K,)
        bx, by = xy[:, 1, 0], xy[:, 1, 1]
        cx, cy = xy[:, 2, 0], xy[:, 2, 1]

        s = jnp.where(a >= 0, 1.0, -1.0)
        inv_abs = jnp.where(jnp.abs(a) > 1e-12, 1.0 / jnp.abs(a), 0.0)  # (K,)
        # edge k: w_k(px, py) = A px + B py + C (unnormalized, sign-fixed)
        a0, b0c = -(cy - by) * s, (cx - bx) * s
        c0 = ((cy - by) * bx - (cx - bx) * by) * s
        a1, b1c = -(ay - cy) * s, (ax - cx) * s
        c1 = ((ay - cy) * cx - (ax - cx) * cy) * s
        a2, b2c = -(by - ay) * s, (bx - ax) * s
        c2 = ((by - ay) * ax - (bx - ax) * ay) * s
        # z premultiplied by 1/|area| → zi needs no per-pixel normalize
        zt = z * inv_abs[:, None]                # (K, 3)

        w0 = a0[None, :] * pxf + (b0c[None, :] * pyf + c0[None, :])
        w1 = a1[None, :] * pxf + (b1c[None, :] * pyf + c1[None, :])
        w2 = a2[None, :] * pxf + (b2c[None, :] * pyf + c2[None, :])
        inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0) & valid[None, :]
        zi = (w0 * zt[None, :, 0] + w1 * zt[None, :, 1] + w2 * zt[None, :, 2])
        zkey = jax.lax.bitcast_convert_type(jnp.maximum(zi, 1e-30), jnp.int32)
        key = ((zkey >> id_bits) << id_bits) | fids[None, :]
        key = jnp.where(inside, key, _BIG_KEY)
        min_key = jnp.min(key, axis=1)                       # (P,)

        # winner extraction: exact one-hot (face-id bits make keys unique)
        winner = (key == min_key[:, None]) & inside           # (P, K)
        wf = winner.astype(zi.dtype)
        ztile = jnp.sum(wf * zi, axis=1)
        if return_bary:
            inv_w = inv_abs[None, :]
            b0 = jnp.sum(wf * w0 * inv_w, axis=1)
            b1 = jnp.sum(wf * w1 * inv_w, axis=1)
            b2 = jnp.sum(wf * w2 * inv_w, axis=1)
            bary_t = jnp.stack([b0, b1, b2], axis=-1)
        else:
            bary_t = jnp.zeros((wf.shape[0], 3), zi.dtype)
        if d_attr:
            # attrs premultiplied by 1/|area| → unnormalized w works
            at = attr * inv_abs[:, None, None]               # (K, 3, D)
            interp = ((wf * w0) @ at[:, 0, :] + (wf * w1) @ at[:, 1, :]
                      + (wf * w2) @ at[:, 2, :])             # (P, D) on MXU
        else:
            interp = jnp.zeros((wf.shape[0], 0), zi.dtype)
        return (min_key.reshape(tile, tile),
                bary_t.reshape(tile, tile, 3),
                ztile.reshape(tile, tile),
                interp.reshape(tile, tile, d_attr))

    with jax.default_matmul_precision("float32"):
        keys, bary, zbuf, attrs = jax.vmap(one_tile)(
            sel_xy, sel_z, sel_area, sel_valid,
            top_idx.astype(jnp.int32), sel_attr, tile_ids)

    def untile(x):
        extra = x.shape[3:]
        x = x.reshape((ty, tx, tile, tile) + extra)
        x = jnp.moveaxis(x, 2, 1)
        return x.reshape((height, width) + extra)

    keys = untile(keys)
    bary = untile(bary)
    zbuf = untile(zbuf)
    attrs = untile(attrs)

    bg = keys >= _BIG_KEY
    face_id = jnp.where(bg, -1, keys & ((1 << id_bits) - 1))
    zbuf = jnp.where(bg, 0.0, zbuf)
    bary = jnp.where(bg[..., None], 0.0, bary)
    out = {"zbuf": zbuf, "face_id": face_id, "bary": bary}
    if tri_attrs is not None:
        out["attrs"] = jnp.where(bg[..., None], 0.0, attrs)
    return out


def interpolate_face_attributes(face_id: jax.Array, bary: jax.Array,
                                faces: jax.Array, vert_attrs: jax.Array):
    """Interpolate per-vertex attributes at rasterized pixels.

    face_id (H, W), bary (H, W, 3), faces (F, 3), vert_attrs (V, D)
    → (H, W, D); background pixels get 0.
    """
    safe = jnp.maximum(face_id, 0)
    fv = faces[safe]                # (H, W, 3)
    attrs = vert_attrs[fv]          # (H, W, 3, D)
    out = jnp.einsum("hwk,hwkd->hwd", bary, attrs)
    return jnp.where((face_id < 0)[..., None], 0.0, out)
