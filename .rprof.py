import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from scflow_tpu.rendering import Renderer, make_test_meshes
from scflow_tpu.data import synthetic_batch
import dataclasses

bank = make_test_meshes(num_classes=21, subdivisions=3, radius=60.0)
H = W = 256; B = 32

def timeit(fn, *args, steps=20):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(steps): out = fn(*args)
    jax.block_until_ready(out)
    return 1e3*(time.perf_counter()-t0)/steps

for kind in ("pallas", "binned"):
    r = Renderer(bank, image_size=(H, W), rasterizer=kind)
    b = synthetic_batch(jax.random.PRNGKey(0), r, B)
    args = (b["ref_rotations"], b["ref_translations"], b["k"], b["labels"])
    print(kind, f"{timeit(lambda *a: r(*a), *args):.2f} ms/batch", flush=True)

# sub-stage profile of the pallas path
from scflow_tpu.rendering.rasterizer import project_vertices
from scflow_tpu.ops.rasterize_fast import _coeff_table, _select_tiles, rasterize_fast
r = Renderer(bank, image_size=(H, W), rasterizer="pallas")
b = synthetic_batch(jax.random.PRNGKey(0), r, B)
labels = b["labels"]
verts, faces, face_valid, vert_normals, vert_colors = bank.gather(labels)

@jax.jit
def proj(verts, rot, t, k):
    return jax.vmap(project_vertices)(verts, rot, t, k)
xy, z = proj(verts, b["ref_rotations"], b["ref_translations"], b["k"])
print("project:", f"{timeit(proj, verts, b['ref_rotations'], b['ref_translations'], b['k']):.2f} ms")

@jax.jit
def coeff(xy, z, faces, fv):
    return jax.vmap(_coeff_table)(xy, z, faces, fv)
c, bbox, ok = coeff(xy, z, faces, face_valid)
print("coeff:", f"{timeit(coeff, xy, z, faces, face_valid):.2f} ms")

@jax.jit
def select(c, bbox, ok):
    return jax.vmap(lambda cc, bb, oo: _select_tiles(cc, bb, oo, H, W, 256))(c, bbox, ok)
print("select:", f"{timeit(select, c, bbox, ok):.2f} ms")

tri_attr = jnp.concatenate([jnp.take_along_axis(verts[:, :, None, :].repeat(3, 2), faces[..., None].repeat(3, -1), axis=1)], axis=-1) if False else None

@jax.jit
def full_raster(xy, z, faces, fv):
    return jax.vmap(lambda a, bz, f, v: rasterize_fast(a, bz, f, v, H, W, return_bary=False))(xy, z, faces, fv)
print("raster(no attrs):", f"{timeit(full_raster, xy, z, faces, face_valid):.2f} ms")

# with attrs (as renderer uses)
def mk_attr(verts_i, faces_i, n_i, c_i):
    return jnp.concatenate([verts_i[faces_i], n_i[faces_i], c_i[faces_i]], axis=-1)
@jax.jit
def full_raster_attr(xy, z, faces, fv, verts, normals, colors):
    ta = jax.vmap(mk_attr)(verts, faces, normals, colors)
    return jax.vmap(lambda a, bz, f, v, t: rasterize_fast(a, bz, f, v, H, W, tri_attrs=t, return_bary=False))(xy, z, faces, fv, ta)
print("raster(attrs):", f"{timeit(full_raster_attr, xy, z, faces, face_valid, verts, vert_normals, vert_colors):.2f} ms")
