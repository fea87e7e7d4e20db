import sys, time, os
sys.path.insert(0, "/root/repo")
import jax
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
import jax.numpy as jnp
from functools import partial
from scflow_tpu.rendering import Renderer, make_test_meshes
from scflow_tpu.rendering.rasterizer import project_vertices
from scflow_tpu.ops.rasterize_fast import rasterize_fast
from scflow_tpu.data import synthetic_batch

B = 32
bank = make_test_meshes(num_classes=21, subdivisions=3, radius=60.0)
r = Renderer(bank, image_size=(256, 256))
batch = synthetic_batch(jax.random.PRNGKey(0), r, B)
rot, tr, k, lab = (batch["ref_rotations"], batch["ref_translations"],
                   batch["k"], batch["labels"])

def timeit(fn, *args, steps=30):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(steps): out = fn(*args)
    jax.block_until_ready(out)
    return 1e3 * (time.perf_counter() - t0) / steps

# full render
print("full render      ", timeit(lambda: r(rot, tr, k, lab)))

verts, faces, fvalid, normals, colors = bank.gather(lab)

@partial(jax.jit, static_argnames=("kf", "attrs"))
def rast_only(verts, faces, fvalid, rot, tr, k, kf=256, attrs=True):
    def one(v, f, fv, r_i, t_i, k_i, nrm, col):
        xy, z = project_vertices(v, r_i, t_i, k_i)
        ta = jnp.concatenate([v[f], nrm[f], col[f]], axis=-1) if attrs else None
        return rasterize_fast(xy, z, f, fv, 256, 256, tri_attrs=ta,
                              k_faces=kf, return_bary=False)
    return jax.vmap(one)(verts, faces, fvalid, rot, tr, k, normals, colors)

for kf in (256, 128, 64):
    print(f"rast k={kf:3d} attrs  ", timeit(lambda kf=kf: rast_only(verts, faces, fvalid, rot, tr, k, kf=kf)))
print("rast k=256 noattr", timeit(lambda: rast_only(verts, faces, fvalid, rot, tr, k, attrs=False)))

# how many faces per tile actually overlap?
import numpy as np
from scflow_tpu.ops.rasterize_fast import _coeff_table, TILE, CHUNK

def overlap_stats(v, f, fv, r_i, t_i, k_i):
    xy, z = project_vertices(v, r_i, t_i, k_i)
    coeff, bbox, ok = _coeff_table(xy, z, f, fv)
    xmin, xmax, ymin, ymax = bbox
    ty = tx = 256 // TILE
    t_y0 = (jnp.arange(ty) * TILE).astype(jnp.float32)
    t_x0 = (jnp.arange(tx) * TILE).astype(jnp.float32)
    ovy = (ymax[None] >= t_y0[:, None] - 0.5) & (ymin[None] <= t_y0[:, None] + TILE - 0.5)
    ovx = (xmax[None] >= t_x0[:, None] - 0.5) & (xmin[None] <= t_x0[:, None] + TILE - 0.5)
    ov = (ovy[:, None, :] & ovx[None, :, :] & ok).reshape(ty * tx, -1)
    return ov.sum(1)

counts = np.asarray(jax.vmap(overlap_stats)(verts, faces, fvalid, rot, tr, k))
print("faces/tile: mean", counts.mean(), "p50", np.percentile(counts, 50),
      "p90", np.percentile(counts, 90), "p99", np.percentile(counts, 99),
      "max", counts.max(), "frac_zero", (counts == 0).mean())
