"""Render checkpoint/resume.

The reference renders in one shot; a crash loses everything (SURVEY.md §5:
"Checkpoint / resume: None"). Here long renders are spp-chunked and the
Monte-Carlo accumulator (sum image + sample count + base key) is persisted
every chunk — resuming continues the EXACT same sample sequence because
keys are counter-based (fold_in by global sample index), so a resumed
render is bitwise-identical to an uninterrupted one.
"""

from __future__ import annotations

import os

import jax
import numpy as np

from tinyraytracing_tpu.config import RenderConfig
from tinyraytracing_tpu.render import render_pass


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
