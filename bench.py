"""Benchmark driver — prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric: traced ray segments per second per chip (closest-hit rays
that are actually alive per bounce + NEE shadow rays) on the Cornell-box
scene at 512x512, the wavefront forward path. ``vs_baseline`` is the ratio
against the measured CPU reference baseline (baselines/cpu_baseline.json,
produced by baselines/run_cpu_baseline.py reimplementing the reference
algorithm); falls back to the BASELINE.json north-star target (5e8
rays/s/chip) if no measured baseline exists yet.

Runs on whatever jax.devices() provides (the real TPU under the driver).
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from tinyraytracing_tpu.config import RenderConfig
    from tinyraytracing_tpu.integrator.regen import render_persistent
    from tinyraytracing_tpu.models.procedural import cornell_box

    W = H = int(os.environ.get("BENCH_SIZE", 512))
    spp = int(os.environ.get("BENCH_SPP", 16))
    lanes = int(os.environ.get("BENCH_LANES", 262144))
    config = RenderConfig(intersector="pallas", max_depth=16)
    scene, cam = cornell_box(width=W, height=H)

    # scene closed over as a jit constant: a render job's scene is static,
    # and XLA folds the camera/material tables (~1.4x vs passing as args)
    render = jax.jit(
        lambda key: render_persistent(scene, cam, key, config, spp, lanes)
    )
    key = jax.random.PRNGKey(0)
    # warmup/compile (the first post-compile run also pays one-time buffer
    # setup through the device tunnel — measured ~1.9x; warm up twice)
    for k in range(2):
        img, nrays = render(jax.random.fold_in(key, k))
        jax.block_until_ready(img)

    dt = float("inf")
    for k in range(2, 4):
        t0 = time.perf_counter()
        img, nrays = render(jax.random.fold_in(key, k))
        jax.block_until_ready(img)
        dt = min(dt, time.perf_counter() - t0)

    rays_per_s = int(nrays) / dt

    baseline = None
    bpath = os.path.join(os.path.dirname(__file__), "baselines", "cpu_baseline.json")
    if os.path.exists(bpath):
        with open(bpath) as f:
            b = json.load(f)
        baseline = b.get("rays_per_s")
    if not baseline:
        baseline = 5e8  # BASELINE.json north-star target

    print(
        json.dumps(
            {
                "metric": f"traced_rays_per_s_per_chip_cornell{W}",
                "value": round(rays_per_s, 1),
                "unit": "rays/s",
                "vs_baseline": round(rays_per_s / baseline, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
