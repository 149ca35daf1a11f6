"""Bisect the Mosaic ApplyVectorLayout SIGABRT in the MXU superleaf visit.

Compiles (AOT, chipless helper) the tiny-shape pallas_bvh_mxu render with
progressively larger fractions of the leaf-visit body enabled, controlled by
SPIRA_MXU_STUB:
  0 = full visit (the crashing configuration)
  1 = visit body entirely stubbed (no-op)
  2 = dots only (quv/t_num computed, results discarded via writeback of tmin8 stub)
  3 = dots + hit mask + tmin (no payload matmul, no writebacks)
  4 = everything but the payload one-hot matmul
  5 = everything but the (1,SUB)->(8,128) reshapes (writeback via direct 8-row ops)

Usage: SPIRA_MXU_STUB=N python benchmarks/mxu_bisect.py
"""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

stub = os.environ.get("SPIRA_MXU_STUB", "0")
print(f"stub level {stub}", flush=True)

from benchmarks.round3_timings import _mesh_scene  # noqa: E402
from spira_tpu.accel.mxu import attach_superleaf  # noqa: E402
from spira_tpu.kernels.bvh_megakernel import render_flat_bvh_megakernel  # noqa: E402

scene, cam, ntris = _mesh_scene()
scene_sl = attach_superleaf(scene)
t0 = time.time()
img = render_flat_bvh_megakernel(
    scene_sl, cam, width=256, height=128, spp=1, max_depth=2, seed=0,
    mxu_leaf=True)
img.block_until_ready()
print(f"OK in {time.time()-t0:.1f}s mean={float(img.mean()):.4f}", flush=True)
