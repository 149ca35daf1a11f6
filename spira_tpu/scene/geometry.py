"""Geometry primitives as SoA pytrees: spheres and triangle soups.

Reference counterparts: `Sphere` (`/root/reference/src/spira-metal-optimized.jl:305-311`,
center/radius/material-index), `Triangle` with precomputed edges + normal
(`/root/reference/examples/spira-metal-raytracer.jl:64-79`) and precomputed
bbox (`/root/reference/examples/julia-raytracer-optimized.jl:146-187`), `Mesh`
(`:274-303`).  Here each primitive *kind* is one SoA pytree over all instances
so intersection is a single vectorized op over rays × primitives.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.types import pytree_dataclass


@pytree_dataclass
class Spheres:
    """SoA over S spheres: centers (S,3), radii (S,), material (S,) int32."""

    centers: jnp.ndarray
    radii: jnp.ndarray
    material: jnp.ndarray

    @property
    def count(self) -> int:
        return self.centers.shape[0]


def make_spheres(records) -> Spheres:
    """records: list of (center, radius, material_index) with 0-based indices."""
    return Spheres(
        centers=jnp.asarray([r[0] for r in records], jnp.float32),
        radii=jnp.asarray([r[1] for r in records], jnp.float32),
        material=jnp.asarray([r[2] for r in records], jnp.int32),
    )


def empty_spheres() -> Spheres:
    return Spheres(
        centers=jnp.zeros((0, 3), jnp.float32),
        radii=jnp.zeros((0,), jnp.float32),
        material=jnp.zeros((0,), jnp.int32),
    )


@pytree_dataclass
class Triangles:
    """SoA over T triangles.

    v0:       (T, 3) first vertex
    e1, e2:   (T, 3) edge vectors v1-v0, v2-v0 (precomputed for
              Möller–Trumbore, as in
              /root/reference/examples/spira-metal-raytracer.jl:64-79)
    normal:   (T, 3) unit geometric normal
    material: (T,)   int32 material index
    """

    v0: jnp.ndarray
    e1: jnp.ndarray
    e2: jnp.ndarray
    normal: jnp.ndarray
    material: jnp.ndarray

    @property
    def count(self) -> int:
        return self.v0.shape[0]

    @property
    def v1(self):
        return self.v0 + self.e1

    @property
    def v2(self):
        return self.v0 + self.e2


def make_triangles(vertices, faces, material) -> Triangles:
    """Build a Triangles SoA from (V,3) vertices and (T,3) int faces.

    ``material`` is a scalar or a (T,) array of material indices.
    """
    vertices = np.asarray(vertices, np.float32)
    faces = np.asarray(faces, np.int64)
    v0 = vertices[faces[:, 0]]
    v1 = vertices[faces[:, 1]]
    v2 = vertices[faces[:, 2]]
    e1 = v1 - v0
    e2 = v2 - v0
    n = np.cross(e1, e2)
    norm = np.linalg.norm(n, axis=-1, keepdims=True)
    n = n / np.maximum(norm, 1e-20)
    mat = np.broadcast_to(np.asarray(material, np.int32), (faces.shape[0],))
    return Triangles(
        v0=jnp.asarray(v0),
        e1=jnp.asarray(e1),
        e2=jnp.asarray(e2),
        normal=jnp.asarray(n),
        material=jnp.asarray(mat),
    )


def empty_triangles() -> Triangles:
    z = jnp.zeros((0, 3), jnp.float32)
    return Triangles(v0=z, e1=z, e2=z, normal=z, material=jnp.zeros((0,), jnp.int32))


def concat_triangles(parts) -> Triangles:
    parts = [p for p in parts if p.count > 0]
    if not parts:
        return empty_triangles()
    return Triangles(
        v0=jnp.concatenate([p.v0 for p in parts]),
        e1=jnp.concatenate([p.e1 for p in parts]),
        e2=jnp.concatenate([p.e2 for p in parts]),
        normal=jnp.concatenate([p.normal for p in parts]),
        material=jnp.concatenate([p.material for p in parts]),
    )


def triangle_bounds(tris: Triangles):
    """Per-triangle AABBs as numpy arrays (for the host-side BVH builder).

    The reference precomputes per-triangle bboxes at construction
    (/root/reference/examples/julia-raytracer-optimized.jl:146-187).
    """
    v0 = np.asarray(tris.v0)
    v1 = v0 + np.asarray(tris.e1)
    v2 = v0 + np.asarray(tris.e2)
    lo = np.minimum(np.minimum(v0, v1), v2)
    hi = np.maximum(np.maximum(v0, v1), v2)
    return lo, hi
