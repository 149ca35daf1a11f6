"""Material model as a structure-of-arrays pytree.

Mirrors the behavior of the reference `Material` struct
(`/root/reference/src/spira-metal-optimized.jl:314-322`: albedo, emission,
metallic, roughness) and its flat GPU layout (`prepare_scene_data`,
`:529-542`), but the SoA pytree *is* the device format — there is no
serialization step.  Extended with dielectric fields (ior/transmission) for
the spectral renderer; RGB scenes leave them at defaults.

All fields are differentiable leaves: gradients w.r.t. albedo and emission are
what the inverse-rendering loop optimizes (BASELINE.json config 4).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.types import pytree_dataclass


@pytree_dataclass
class Materials:
    """SoA over M materials.

    albedo:        (M, 3) base color in [0, 1]
    emission:      (M, 3) radiant emission (can exceed 1)
    metallic:      (M,)   probability of the specular lobe (MSL kernel :225)
    roughness:     (M,)   fuzz radius of the specular lobe
    ior:           (M,)   index of refraction (dielectrics; 1.0 = none)
    transmission:  (M,)   probability the specular lobe refracts (glass)
    """

    albedo: jnp.ndarray
    emission: jnp.ndarray
    metallic: jnp.ndarray
    roughness: jnp.ndarray
    ior: jnp.ndarray
    transmission: jnp.ndarray

    @property
    def count(self) -> int:
        return self.albedo.shape[0]


def make_materials(records) -> Materials:
    """Build Materials from a list of dicts with keys
    albedo, emission, metallic, roughness[, ior, transmission]."""
    f32 = jnp.float32

    def col(name, default, width=None):
        vals = []
        for r in records:
            v = r.get(name, default)
            vals.append(v)
        a = jnp.asarray(vals, f32)
        if width is not None and a.ndim == 1:
            a = jnp.broadcast_to(a[:, None], (len(records), width))
        return a

    return Materials(
        albedo=jnp.asarray([r["albedo"] for r in records], f32),
        emission=col("emission", (0.0, 0.0, 0.0)),
        metallic=col("metallic", 0.0),
        roughness=col("roughness", 0.5),
        ior=col("ior", 1.0),
        transmission=col("transmission", 0.0),
    )
