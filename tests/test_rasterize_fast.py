"""Pallas tile-binned rasterizer vs the XLA reference implementation."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scflow_tpu.geometry import random_rotation
from scflow_tpu.ops.rasterize_fast import rasterize_fast
from scflow_tpu.rendering import make_test_meshes
from scflow_tpu.rendering.rasterizer import project_vertices, rasterize

K = jnp.asarray([[300., 0., 64.], [0., 300., 64.], [0., 0., 1.]])


def scene(label=0, seed=0):
    bank = make_test_meshes(num_classes=2, subdivisions=2, radius=60.)
    verts = bank.verts[label]
    faces = bank.faces[label]
    fvalid = bank.face_valid[label]
    r = random_rotation(jax.random.PRNGKey(seed), ())
    t = jnp.asarray([0., 0., 600.])
    xy, z = project_vertices(verts, r, t, K)
    return xy, z, faces, fvalid


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_matches_xla_reference(seed):
    xy, z, faces, fvalid = scene(seed=seed)
    ref = rasterize(xy, z, faces, fvalid, 128, 128)
    fast = rasterize_fast(xy, z, faces, fvalid, 128, 128, interpret=True)

    m_ref = np.asarray(ref["face_id"]) >= 0
    m_fast = np.asarray(fast["face_id"]) >= 0
    # coverage identical up to packed-key tie-breaks at silhouette edges
    assert (m_ref != m_fast).mean() < 0.002
    both = m_ref & m_fast
    z_ref = np.asarray(ref["zbuf"])
    z_fast = np.asarray(fast["zbuf"])
    # depths agree closely where both cover (ties pick faces within the
    # packed-key quantum of each other)
    assert np.median(np.abs(z_ref[both] - z_fast[both])) < 0.1
    assert np.quantile(np.abs(z_ref[both] - z_fast[both]), 0.99) < 2.0


def test_box_mesh():
    bank = make_test_meshes(num_classes=2, subdivisions=1, radius=60.)
    verts, faces, fvalid = bank.verts[1], bank.faces[1], bank.face_valid[1]
    r = random_rotation(jax.random.PRNGKey(5), ())
    t = jnp.asarray([0., 0., 500.])
    xy, z = project_vertices(verts, r, t, K)
    ref = rasterize(xy, z, faces, fvalid, 128, 128)
    fast = rasterize_fast(xy, z, faces, fvalid, 128, 128, interpret=True)
    m_ref = np.asarray(ref["face_id"]) >= 0
    m_fast = np.asarray(fast["face_id"]) >= 0
    assert (m_ref != m_fast).mean() < 0.002


def test_empty_when_all_invalid():
    xy, z, faces, _ = scene()
    out = rasterize_fast(xy, z, faces, jnp.zeros(faces.shape[0], bool),
                         128, 128, interpret=True)
    assert np.all(np.asarray(out["face_id"]) == -1)
    assert np.all(np.asarray(out["zbuf"]) == 0.0)
