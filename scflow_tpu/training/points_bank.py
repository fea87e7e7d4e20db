"""Static per-class point banks for losses and metrics.

The reference loads ``models_eval`` meshes per loss/metric instance
(models/loss/point_matching_loss.py:51-59, metrics/add.py) and iterates
per-sample in Python; here the points live in one (C, P, 3) array with
validity masks and are gathered by label inside jit.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..rendering.mesh import MeshBank


@dataclasses.dataclass
class PointsBank:
    points: jax.Array        # (C, P, 3)
    valid: jax.Array         # (C, P) bool
    diameters: jax.Array     # (C,)
    symmetric: jax.Array     # (C,) bool

    def gather(self, labels: jax.Array):
        """(points (N,P,3), valid (N,P), symmetric (N,), diameters (N,))."""
        return (self.points[labels], self.valid[labels],
                self.symmetric[labels], self.diameters[labels])


def build_points_bank(mesh_bank: MeshBank, symmetric_classes=(),
                      num_points: int = 512,
                      diameters=None, seed: int = 0) -> PointsBank:
    """Sample a fixed number of vertices per class from a MeshBank."""
    c = mesh_bank.num_classes
    verts = np.asarray(mesh_bank.verts)
    face_valid = np.asarray(mesh_bank.face_valid)
    faces = np.asarray(mesh_bank.faces)
    pts = np.zeros((c, num_points, 3), np.float32)
    valid = np.zeros((c, num_points), bool)
    rng = np.random.default_rng(seed)
    for i in range(c):
        used = np.unique(faces[i][face_valid[i]].ravel())
        if len(used) == 0:
            continue
        take = min(num_points, len(used))
        sel = rng.choice(used, size=take, replace=len(used) < take)
        pts[i, :take] = verts[i][sel]
        valid[i, :take] = True
    sym = np.zeros((c,), bool)
    for s in symmetric_classes:
        sym[s] = True
    diam = (np.asarray(diameters, np.float32) if diameters is not None
            else np.asarray(mesh_bank.diameters))
    return PointsBank(points=jnp.asarray(pts), valid=jnp.asarray(valid),
                      diameters=jnp.asarray(diam), symmetric=jnp.asarray(sym))
