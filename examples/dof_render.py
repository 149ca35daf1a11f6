"""Depth-of-field render: a thin-lens camera with a wide aperture focused
on the center sphere — the counterpart of the reference's aperture/
focus_dist camera (`/root/reference/examples/julia-raytracer.jl:261-295`).

Since round 3 the fused/Pallas engines sample the lens disk in-kernel
(spare PCG outputs of the raygen draw), so DOF renders run at full
megakernel speed instead of dropping to the wavefront path.

    python examples/dof_render.py [out.png]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import spira_tpu as st

out = sys.argv[1] if len(sys.argv) > 1 else "dof_render.png"
scene = st.create_scene()
camera = st.make_camera(
    lookfrom=(0.0, 1.0, 3.0),
    lookat=(0.0, 0.0, 0.0),
    vfov=60.0,
    aspect_ratio=640 / 360,
    aperture=0.35,           # wide aperture: strong defocus blur
    focus_dist=3.2,          # focal plane on the center sphere
)
img = st.render(
    scene, camera, 640, 360, samples_per_pixel=64, max_depth=4,
    output_path=out,
)
print(f"wrote {out} ({img.shape[1]}x{img.shape[0]})")
