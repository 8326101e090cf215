"""Render checkpoint/resume.

The reference renders in one shot; a crash loses everything (SURVEY.md §5:
"Checkpoint / resume: None"). Two mechanisms here:

- ``render_checkpointed``: spp-chunked scan-path render persisting the
  Monte-Carlo accumulator every chunk — resuming continues the EXACT same
  sample sequence (counter-based keys), bitwise-identical to an
  uninterrupted render.
- ``save/load/clear_queue_state``: full lane-state snapshots for the
  chunked queue renderer (integrator/fused_queue.py) — the flagship
  multi-minute renders are resumable at chunk granularity, and a resumed
  render is bitwise-identical because the snapshot IS the loop state.
"""

from __future__ import annotations

import os

import jax
import numpy as np

from tinyraytracing_tpu.config import RenderConfig
from tinyraytracing_tpu.render import render_pass


# bump whenever the queue loop's state tuple layout changes — stale
# snapshots are then rejected by the meta check instead of silently
# rebinding leaves to wrong slots (the treedef signature in the meta
# catches same-version shape changes too)
QUEUE_STATE_VERSION = 3   # v3: image carried as 3 flat planes (round 5)


def scene_checksum(scene) -> float:
    """Scene-identity checksum bound into queue snapshots: covers geometry
    (all three vertex arrays), shading normals, materials and emission, so
    a snapshot cannot resume against a scene that differs only in, say,
    normals or radiance (same triangle count and config repr)."""
    import jax.numpy as jnp

    total = jnp.float64(0.0) if jax.config.jax_enable_x64 else jnp.float32(0.0)
    for a in (scene.v0, scene.v1, scene.v2, scene.n0, scene.kd, scene.ks,
              scene.radiance):
        total = total + jnp.sum(a)
    return float(total)


def _atomic_savez(path: str, **arrays) -> None:
    tmp = path + ".tmp.npz"
    np.savez(tmp, **arrays)
    os.replace(tmp, path)


def save_queue_state(path: str, state, meta: dict) -> None:
    """Snapshot the queue renderer's lane state (a pytree of arrays)."""
    leaves, treedef = jax.tree_util.tree_flatten(state)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    arrays["n_leaves"] = np.int64(len(leaves))
    for k, v in meta.items():
        arrays[f"meta_{k}"] = np.asarray(v)
    _atomic_savez(path, **arrays)


def load_queue_state(path: str, meta: dict):
    """Load a queue-state snapshot; returns the state leaves re-nested by
    position (caller's treedef order), or None if absent/incompatible."""
    if not os.path.exists(path):
        return None
    with np.load(path) as z:
        for k, v in meta.items():
            mk = f"meta_{k}"
            if mk not in z or not np.array_equal(z[mk], np.asarray(v)):
                return None
        n = int(z["n_leaves"])
        leaves = [z[f"leaf_{i}"] for i in range(n)]
    # the queue state is a fixed-shape nested tuple; rebuild by structure
    # of a template at the call site — here we return flat leaves wrapped
    # as jnp arrays in the saved order and let the caller re-tree them.
    return leaves


def clear_queue_state(path: str) -> None:
    if os.path.exists(path):
        os.remove(path)


def render_checkpointed(
    scene,
    cam,
    config: RenderConfig,
    spp: int,
    ckpt_path: str,
    seed: int = 0,
    chunk: int = 16,
    progress=None,
) -> np.ndarray:
    """Render ``spp`` samples, checkpointing every ``chunk`` passes.

    Returns the mean linear image. If ``ckpt_path`` exists, resumes from
    the recorded sample index (validating seed/shape compatibility).
    """
    key = jax.random.PRNGKey(seed)
    H, W = cam.height, cam.width
    acc = np.zeros((H, W, 3), np.float64)
    done = 0

    if os.path.exists(ckpt_path):
        with np.load(ckpt_path) as z:
            if (
                int(z["seed"]) == seed
                and tuple(z["shape"]) == (H, W, 3)
                and int(z["spp_total"]) == spp
            ):
                acc = z["acc"]
                done = int(z["done"])
            # else: incompatible checkpoint -> start over

    pass_fn = jax.jit(
        lambda scene, cam, k: render_pass(scene, cam, k, config)
    )
    while done < spp:
        n = min(chunk, spp - done)
        for s in range(done, done + n):
            acc += np.asarray(pass_fn(scene, cam, jax.random.fold_in(key, s)))
        done += n
        tmp = ckpt_path + ".tmp"
        np.savez(
            tmp if not tmp.endswith(".npz") else tmp,
            acc=acc, done=done, seed=seed, shape=(H, W, 3), spp_total=spp,
        )
        # numpy appends .npz; normalize then atomically replace
        src = tmp if os.path.exists(tmp) else tmp + ".npz"
        os.replace(src, ckpt_path)
        if progress:
            progress(done, spp)
    return (acc / max(done, 1)).astype(np.float32)
