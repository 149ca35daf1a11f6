"""Basic render of the default demo scene — the counterpart of
`/root/reference/examples/basic_render.jl` (640×360, spp=16, depth=4).

    python examples/basic_render.py [out.png]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import spira_tpu as st

out = sys.argv[1] if len(sys.argv) > 1 else "basic_render.png"
scene = st.create_scene()
camera = st.default_camera(640 / 360)
img = st.render(
    scene, camera, 640, 360, samples_per_pixel=16, max_depth=4,
    output_path=out,
)
print(f"wrote {out} ({img.shape[1]}x{img.shape[0]})")
