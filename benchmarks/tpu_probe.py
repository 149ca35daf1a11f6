"""Probe the axon TPU: exit 0 iff a real device op completes.

Run under ``timeout`` (backend init can hang indefinitely during outages).
"""
import sys
import time

sys.path.insert(0, "/root/repo")
t0 = time.time()
import jax  # noqa: E402

devs = jax.devices()
if devs[0].platform != "tpu":
    print("no TPU platform:", devs)
    sys.exit(1)
import jax.numpy as jnp  # noqa: E402

x = jnp.ones((256, 256))
(x @ x).block_until_ready()
print(f"TPU OK in {time.time() - t0:.1f}s: {devs}")
