"""Per-render observability report.

The reference's observability is printfs (SURVEY.md §5). This emits a
structured report: scene statistics, BVH quality metrics, traced-ray
counts, and throughput — the "rays/s/chip" metric the benchmarks track.
Optionally wraps the render in a ``jax.profiler`` trace for XLA-level
analysis.
"""

from __future__ import annotations

import dataclasses
import json
import time

import jax
import numpy as np


@dataclasses.dataclass
class RenderReport:
    num_triangles: int
    num_materials: int
    num_lights: int
    bvh_nodes: int | None
    bvh_depth: int | None
    width: int
    height: int
    spp: int
    seconds: float
    rays_traced: int
    rays_per_s: float

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self))


def bvh_depth(skip: np.ndarray) -> int:
    """Max depth of the preorder skip-link tree."""
    n = len(skip)
    depth = np.zeros(n, np.int32)
    stack = []
    for i in range(n):
        while stack and stack[-1] <= i:
            stack.pop()
        depth[i] = len(stack)
        if skip[i] > i + 1:
            stack.append(skip[i])
    return int(depth.max()) + 1 if n else 0


def profiled_render(scene, cam, config, spp, seed=0, trace_dir=None):
    """Render with instrumentation; returns (image, RenderReport)."""
    from tinyraytracing_tpu.integrator.wavefront import trace
    from tinyraytracing_tpu.models.camera import generate_rays

    key = jax.random.PRNGKey(seed)

    @jax.jit
    def one_pass(scene, cam, k):
        k1, k2 = jax.random.split(k)
        o, d = generate_rays(cam, k1)
        rad, stats = trace(scene, o, d, k2, config, return_stats=True)
        return (
            rad.reshape(cam.height, cam.width, 3),
            stats["primary"].sum() + stats["shadow"].sum(),
        )

    # warm up compile outside the timed region
    img, nrays = one_pass(scene, cam, jax.random.fold_in(key, 0))
    jax.block_until_ready(img)

    ctx = (
        jax.profiler.trace(trace_dir)
        if trace_dir
        else __import__("contextlib").nullcontext()
    )
    acc = np.zeros((cam.height, cam.width, 3), np.float64)
    total_rays = 0
    t0 = time.perf_counter()
    with ctx:
        for s in range(spp):
            img, nrays = one_pass(scene, cam, jax.random.fold_in(key, s))
            acc += np.asarray(img)
            total_rays += int(nrays)
    dt = time.perf_counter() - t0

    report = RenderReport(
        num_triangles=scene.num_triangles,
        num_materials=scene.num_materials,
        num_lights=scene.num_lights,
        bvh_nodes=scene.bvh.n_nodes if scene.bvh is not None else None,
        bvh_depth=(
            bvh_depth(np.asarray(scene.bvh.skip)) if scene.bvh is not None else None
        ),
        width=cam.width,
        height=cam.height,
        spp=spp,
        seconds=dt,
        rays_traced=total_rays,
        rays_per_s=total_rays / dt if dt > 0 else 0.0,
    )
    return (acc / spp).astype(np.float32), report
