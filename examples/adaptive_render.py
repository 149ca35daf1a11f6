"""Adaptive progressive render: variance-guided per-row sample allocation
(new-build — the reference samples every pixel uniformly).

Rows retire once the 98th percentile of their pixels' relative luminance
half-CI95 drops below --tol; each round dispatches one dense kernel over
only the surviving rows.  Prints the per-row spp histogram and the samples
saved vs a uniform render at the spp cap.

    python examples/adaptive_render.py [out.png] [tol]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import spira_tpu as st
from spira_tpu.io import image as img_io
from spira_tpu.pipeline import render_adaptive
from spira_tpu.utils.config import RenderConfig

out = sys.argv[1] if len(sys.argv) > 1 else "adaptive.png"
tol = float(sys.argv[2]) if len(sys.argv) > 2 else 0.05

scene = st.create_scene()
camera = st.default_camera(640 / 360)
cfg = RenderConfig(width=640, height=360, spp=64, max_depth=4,
                   progress=False)
img, stats = render_adaptive(scene, camera, cfg, tol=tol, min_spp=8,
                             return_stats=True)

import jax.numpy as jnp

img_io.save_png(out, np.asarray(img_io.to_uint8(img_io.tonemap_gamma(
    jnp.asarray(img)))))
spp = stats["spp_per_row"]
print(f"wrote {out}; saved {100 * stats['savings']:.1f}% of samples "
      f"(cap {cfg.spp} spp)")
for lo in range(0, cfg.spp, 8):
    n = int(((spp > lo) & (spp <= lo + 8)).sum())
    print(f"  spp {lo + 1:3d}-{lo + 8:3d}: {'#' * (n // 4)} {n} rows")
