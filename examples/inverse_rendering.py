"""Inverse rendering demo (BASELINE config 4): recover perturbed material
albedos + light emission from a rendered target via path-replay gradients
and Adam.

    python examples/inverse_rendering.py [steps]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

import spira_tpu as st
from spira_tpu.diff.inverse import make_inverse_step
from spira_tpu.render import render_flat

steps = int(sys.argv[1]) if len(sys.argv) > 1 else 150
W, H, SPP, DEPTH = 96, 54, 4, 4

scene = st.create_scene()
camera = st.default_camera(W / H)
true_albedo = scene.materials.albedo
true_emission = scene.materials.emission

target = render_flat(
    scene, camera, width=W, height=H, spp=32, max_depth=DEPTH, seed=1234
)

step, init = make_inverse_step(
    width=W, height=H, spp=SPP, max_depth=DEPTH, learning_rate=3e-2
)
params = {
    "albedo": jnp.full_like(true_albedo, 0.5),
    "emission": jnp.zeros_like(true_emission) + 1.0,
}
opt_state = init(params)

for it in range(steps):
    params, opt_state, loss = step(params, opt_state, scene, camera, target, it)
    if it % 10 == 0:
        err = float(jnp.abs(params["albedo"] - true_albedo).mean())
        print(f"step {it:4d}  loss {float(loss):.6f}  albedo err {err:.4f}")

print("\nrecovered albedo vs truth:")
for i, (a, b) in enumerate(
    zip(np.asarray(params["albedo"]), np.asarray(true_albedo))
):
    print(f"  material {i}: {np.round(a, 3)}  vs  {np.round(b, 3)}")
print("recovered emission (light should be ~[5,5,5]):")
print(np.round(np.asarray(params["emission"]), 2))
