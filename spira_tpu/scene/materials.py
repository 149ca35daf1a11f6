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
    # Spectral extension (new capability; reference claims spectra in docs
    # only, SURVEY.md §0).  Defaults derive from the RGB fields via Smits
    # upsampling; both tables are differentiable — the "recover albedo SPDs"
    # targets of BASELINE.json config 4.
    albedo_spd: jnp.ndarray = None  # (M, N_SPD_BINS)
    emission_spd: jnp.ndarray = None  # (M, N_SPD_BINS)
    cauchy_b: jnp.ndarray = None  # (M,) dispersion coeff (µm²): n(λ)=ior+B/λ²

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

    from ..core import colorimetry as cl

    albedo = jnp.asarray([r["albedo"] for r in records], f32)
    emission = col("emission", (0.0, 0.0, 0.0))

    # Per-record SPD overrides win; otherwise upsample the RGB fields.
    import numpy as np

    albedo_spd = np.asarray(cl.rgb_to_spd(np.asarray(albedo)))
    emission_spd = np.asarray(cl.rgb_to_spd(np.asarray(emission)))
    for i, r in enumerate(records):
        if "albedo_spd" in r:
            albedo_spd[i] = np.asarray(r["albedo_spd"], np.float32)
        if "emission_spd" in r:
            emission_spd[i] = np.asarray(r["emission_spd"], np.float32)

    return Materials(
        albedo=albedo,
        emission=emission,
        metallic=col("metallic", 0.0),
        roughness=col("roughness", 0.5),
        ior=col("ior", 1.0),
        transmission=col("transmission", 0.0),
        albedo_spd=jnp.asarray(albedo_spd),
        emission_spd=jnp.asarray(emission_spd),
        cauchy_b=col("cauchy_b", 0.0),
    )
