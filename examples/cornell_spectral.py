"""Spectral Cornell box: hero-wavelength transport, emissive area light,
mirror + dispersive glass spheres (BASELINE config 2).

    python examples/cornell_spectral.py [out.png] [spp]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import spira_tpu as st

out = sys.argv[1] if len(sys.argv) > 1 else "cornell.png"
spp = int(sys.argv[2]) if len(sys.argv) > 2 else 128

scene = st.create_cornell_box()
camera = st.cornell_camera(1.0)
img = st.render(
    scene, camera, 512, 512, samples_per_pixel=spp, max_depth=6,
    spectral=True, tonemap="aces", output_path=out,
)
print(f"wrote {out}")
