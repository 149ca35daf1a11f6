"""Independent scalar NumPy re-implementation of the reference CPU renderer.

This is a from-the-spec implementation of `render_with_cpu`
(`/root/reference/src/spira-metal-optimized.jl:1346-1450`) used as the golden
oracle for statistical image parity (BASELINE.json config 1).  It is written
recursively and per-pixel, with its own RNG stream, so agreement with the
vectorized JAX estimator is evidence of semantic equivalence, not shared code.
"""

from __future__ import annotations

import numpy as np

INF = 1e20


def _normalize(v):
    n = np.linalg.norm(v)
    return v / n if n > 0 else v


class CPUReferenceRenderer:
    """scene dicts: spheres [(center, radius, mat_idx0)], materials
    [{albedo, emission, metallic, roughness}]."""

    def __init__(self, spheres, materials, rng: np.random.Generator):
        self.spheres = [
            (np.asarray(c, np.float64), float(r), int(m)) for c, r, m in spheres
        ]
        self.materials = materials
        self.rng = rng

    def trace(self, origin, direction, depth):
        if depth <= 0:
            return np.zeros(3)

        closest_t = INF
        hit_normal = None
        hit_mat = -1
        for center, radius, mat in self.spheres:
            oc = origin - center
            half_b = np.dot(oc, direction)
            c = np.dot(oc, oc) - radius * radius
            disc = half_b * half_b - c
            if disc > 0:
                sqrtd = np.sqrt(disc)
                root = -half_b - sqrtd
                if root < 1e-3:
                    root = -half_b + sqrtd
                if 1e-3 < root < closest_t:
                    closest_t = root
                    hit_normal = _normalize(
                        origin + closest_t * direction - center
                    )
                    hit_mat = mat

        if hit_mat >= 0:
            m = self.materials[hit_mat]
            emission = np.asarray(m.get("emission", (0, 0, 0)), np.float64)
            if np.any(emission > 0):
                return emission
            hit_point = origin + closest_t * direction
            albedo = np.asarray(m["albedo"], np.float64)
            if self.rng.random() > m.get("metallic", 0.0):
                # diffuse: target = p + n + normalize(rand3 - 0.5)
                unit = _normalize(self.rng.random(3) - 0.5)
                scattered = _normalize(hit_normal + unit)
                return albedo * self.trace(hit_point, scattered, depth - 1) * 0.5
            else:
                reflected = direction - 2.0 * np.dot(direction, hit_normal) * hit_normal
                fuzz = m.get("roughness", 0.0) * (self.rng.random(3) - 0.5)
                scattered = _normalize(reflected + fuzz)
                return albedo * self.trace(hit_point, scattered, depth - 1)

        t = 0.5 * (direction[1] + 1.0)
        return (1.0 - t) * np.ones(3) + t * np.array([0.5, 0.7, 1.0])

    def render_hdr(self, camera, width, height, spp, max_depth):
        """Returns (H, W, 3) top-down mean radiance (no tone map)."""
        origin = np.asarray(camera["origin"], np.float64)
        llc = np.asarray(camera["lower_left_corner"], np.float64)
        horizontal = np.asarray(camera["horizontal"], np.float64)
        vertical = np.asarray(camera["vertical"], np.float64)

        img = np.zeros((height, width, 3))
        for j in range(height):  # j counts from the bottom
            for i in range(width):
                color = np.zeros(3)
                for _ in range(spp):
                    u = (i + self.rng.random()) / (width - 1)
                    v = (j + self.rng.random()) / (height - 1)
                    d = _normalize(llc + u * horizontal + v * vertical - origin)
                    color += self.trace(origin, d, max_depth)
                img[height - 1 - j, i] = color / spp
        return img


def default_scene():
    """The reference demo scene
    (`/root/reference/src/spira-metal-optimized.jl:429-510`)."""
    materials = [
        dict(albedo=(0.7, 0.3, 0.3), metallic=0.0, roughness=0.5),
        dict(albedo=(0.5, 0.5, 0.5), metallic=0.0, roughness=0.9),
        dict(albedo=(0.8, 0.8, 0.8), metallic=1.0, roughness=0.0),
        dict(albedo=(0.8, 0.8, 1.0), metallic=0.9, roughness=0.0),
        dict(albedo=(1.0, 1.0, 1.0), emission=(5.0, 5.0, 5.0)),
    ]
    spheres = [
        ((0.0, 0.0, 0.0), 0.5, 0),
        ((0.0, -100.5, 0.0), 100.0, 1),
        ((1.0, 0.0, 0.0), 0.5, 2),
        ((-1.0, 0.0, 0.0), 0.5, 3),
        ((0.0, 5.0, 0.0), 1.0, 4),
    ]
    return spheres, materials


def default_camera_dict(aspect):
    """The reference demo camera (lookfrom (0,1,3) → origin, vfov 60,
    `/root/reference/src/spira-metal-optimized.jl:1499-1505`)."""
    lookfrom = np.array([0.0, 1.0, 3.0])
    lookat = np.array([0.0, 0.0, 0.0])
    vup = np.array([0.0, 1.0, 0.0])
    theta = np.deg2rad(60.0)
    h = np.tan(theta / 2)
    viewport_height = 2.0 * h
    viewport_width = aspect * viewport_height
    w = _normalize(lookfrom - lookat)
    u = _normalize(np.cross(vup, w))
    v = np.cross(w, u)
    horizontal = viewport_width * u
    vertical = viewport_height * v
    llc = lookfrom - horizontal / 2 - vertical / 2 - w
    return dict(
        origin=lookfrom,
        lower_left_corner=llc,
        horizontal=horizontal,
        vertical=vertical,
    )
