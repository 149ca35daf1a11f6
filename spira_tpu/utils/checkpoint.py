"""Sample-granular checkpoint/resume.

The reference has no checkpointing, but its architecture is naturally
checkpointable at sample granularity: persistent accumulation buffer + RNG
state + current sample index (`RenderState`
`/root/reference/src/spira-metal-optimized.jl:403-407`, `RenderParams_msl`
`/root/reference/src/spira_path_trace_kernel.metal:43` — SURVEY.md §5).
Here that becomes explicit: because the RNG is counter-based, (accumulator,
samples_done, seed, config) is a *complete* resume point — no RNG state
buffer needed, sample k is always the same paths.

Inverse-rendering checkpoints additionally hold (params, opt_state, step)
— orbax-style, stored as npz + a JSON manifest.
"""

from __future__ import annotations

import json
import os
import threading

import jax
import numpy as np

MANIFEST = "manifest.json"
ARRAYS = "arrays.npz"


class AsyncSaver:
    """One-deep async checkpoint writer.

    ``submit(fn, ...)`` joins the previous write then runs ``fn`` on a
    fresh thread, so the device→host fetch + file write of chunk k
    overlaps chunk k+1's render (the snapshot-async-then-write-off-thread
    shape).  Atomicity is unchanged: writers still go tmp→os.replace, and
    a SIGKILL mid-write leaves the previous complete checkpoint intact.
    Call ``wait()`` before reading checkpoint files back or exiting.
    """

    def __init__(self):
        self._thread: threading.Thread | None = None
        self._exc: BaseException | None = None

    def submit(self, fn, *args, **kwargs) -> None:
        self.wait()

        def run():
            try:
                fn(*args, **kwargs)
            except BaseException as e:  # surfaced at the next submit/wait
                self._exc = e

        self._thread = threading.Thread(target=run, daemon=True)
        self._thread.start()

    def wait(self) -> None:
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._exc is not None:
            exc, self._exc = self._exc, None
            raise exc


def _flatten_with_paths(tree):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    out = {}
    for path, leaf in flat:
        key = "/".join(str(p) for p in path)
        out[key] = np.asarray(leaf)
    return out, treedef


def save_render_state(
    directory: str,
    *,
    accumulator,
    samples_done: int,
    seed: int,
    config_json: str,
) -> None:
    """Atomically persist a partial render.

    Uncompressed on purpose: the accumulator is Monte-Carlo float noise
    (zlib gains ~nothing) and compressing a config-5 frame (1920x1080x3
    f32, ~25 MB) cost seconds PER CHUNK — the round-4 config-5 wall-time
    regression.  ``accumulator`` may be a live device array; the host
    fetch happens here, so callers can run this off-thread to overlap the
    transfer+write with the next chunk's render.
    """
    os.makedirs(directory, exist_ok=True)
    tmp = os.path.join(directory, ARRAYS + ".tmp.npz")
    np.savez(tmp, accumulator=np.asarray(accumulator))
    os.replace(tmp, os.path.join(directory, ARRAYS))
    manifest = {
        "kind": "render",
        "samples_done": int(samples_done),
        "seed": int(seed),
        "config": config_json,
    }
    tmp = os.path.join(directory, MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(directory, MANIFEST))


def load_render_state(directory: str):
    """Returns (accumulator, samples_done, seed, config_json) or None."""
    mpath = os.path.join(directory, MANIFEST)
    apath = os.path.join(directory, ARRAYS)
    if not (os.path.exists(mpath) and os.path.exists(apath)):
        return None
    with open(mpath) as f:
        manifest = json.load(f)
    if manifest.get("kind") != "render":
        return None
    arrays = np.load(apath)
    return (
        arrays["accumulator"],
        manifest["samples_done"],
        manifest["seed"],
        manifest["config"],
    )


def save_adaptive_state(directory: str, *, arrays: dict, scalars: dict,
                        config_json: str) -> None:
    """Atomically persist an adaptive render round: the full convergence
    ledger (acc/lum/lum2/counts/active) plus the loop scalars — because
    keys derive from the monotone ``sample_base`` counter, resume is
    bit-exact."""
    os.makedirs(directory, exist_ok=True)
    tmp = os.path.join(directory, ARRAYS + ".tmp.npz")
    np.savez_compressed(tmp, **{k: np.asarray(v) for k, v in arrays.items()})
    os.replace(tmp, os.path.join(directory, ARRAYS))
    manifest = {"kind": "adaptive", "scalars": scalars, "config": config_json}
    tmp = os.path.join(directory, MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(directory, MANIFEST))


def load_adaptive_state(directory: str):
    """Returns (arrays dict, scalars dict, config_json) or None."""
    mpath = os.path.join(directory, MANIFEST)
    apath = os.path.join(directory, ARRAYS)
    if not (os.path.exists(mpath) and os.path.exists(apath)):
        return None
    with open(mpath) as f:
        manifest = json.load(f)
    if manifest.get("kind") != "adaptive":
        return None
    arrays = dict(np.load(apath))
    return arrays, manifest["scalars"], manifest["config"]


def save_train_state(
    directory: str, *, params, opt_state, step: int, extra: dict | None = None
) -> None:
    """Persist an inverse-rendering loop (params + Adam moments + step)."""
    os.makedirs(directory, exist_ok=True)
    p_flat, _ = _flatten_with_paths(params)
    o_flat, _ = _flatten_with_paths(opt_state)
    payload = {f"params:{k}": v for k, v in p_flat.items()}
    payload.update({f"opt:{k}": v for k, v in o_flat.items()})
    tmp = os.path.join(directory, ARRAYS + ".tmp.npz")
    np.savez_compressed(tmp, **payload)
    os.replace(tmp, os.path.join(directory, ARRAYS))
    manifest = {"kind": "train", "step": int(step), "extra": extra or {}}
    tmp = os.path.join(directory, MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(directory, MANIFEST))


def load_train_state(directory: str, params_like, opt_state_like):
    """Restore (params, opt_state, step) into the given pytree structures.

    Returns None if no checkpoint exists.
    """
    mpath = os.path.join(directory, MANIFEST)
    apath = os.path.join(directory, ARRAYS)
    if not (os.path.exists(mpath) and os.path.exists(apath)):
        return None
    with open(mpath) as f:
        manifest = json.load(f)
    if manifest.get("kind") != "train":
        return None
    arrays = np.load(apath)

    def restore(prefix, like):
        flat, treedef = jax.tree_util.tree_flatten_with_path(like)
        leaves = []
        for path, leaf in flat:
            key = f"{prefix}:" + "/".join(str(p) for p in path)
            stored = arrays[key]
            leaves.append(jax.numpy.asarray(stored, dtype=leaf.dtype))
        return jax.tree_util.tree_unflatten(treedef, leaves)

    params = restore("params", params_like)
    opt_state = restore("opt", opt_state_like)
    return params, opt_state, manifest["step"]
