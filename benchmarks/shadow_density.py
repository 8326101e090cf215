"""Probe: live-lane density of the queue loop's shadow dispatches.

The queue body parks zero-contribution shadow lanes (okl false: dead
lane, invalid CDF draw, back-facing cos) at origin _FAR with t_bound 0 —
they cost no node visits, but they still OCCUPY lanes: light l's segment
always dispatches R lanes in R/tile packets. If the live fraction is low,
compacting live shadow lanes into fewer packets saves whole packet walks.
This probe measures that fraction per light over the first iterations of
a real render (the decision input for the compaction lever).

The tunnel backend has no host callbacks, so the density is captured at
TRACE time: the patched fused_trace_planes stashes the traced density
expressions in a cell during tracing of a single-iteration step function,
which then returns them as extra outputs.

Usage: PYTHONPATH=/root/.axon_site:. python benchmarks/shadow_density.py [staircase|veach]
"""

import os
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/jaxcache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from tinyraytracing_tpu.config import RenderConfig
from tinyraytracing_tpu.models.scene import load_scene
from tinyraytracing_tpu.ops import pallas_trace

SCENES = "/root/reference/RayTracingOnCPU/example-scenes-cg22"

name = (sys.argv[1:] or ["staircase"])[0]
full = {"staircase": "staircase", "veach": "veach-mis"}[name]
lanes = {"staircase": 131072, "veach": 65536}[name]
leaf = {"staircase": 16, "veach": 32}[name]
iters = int(os.environ.get("PROBE_ITERS", 40))

cfg = RenderConfig(intersector="auto", max_depth=16, leaf_size=leaf)
scene, cam = load_scene(
    f"{SCENES}/{full}/{full}.xml", f"{SCENES}/{full}/{full}.obj",
    f"{SCENES}/{full}/{full}.mtl", f"{SCENES}/{full}", with_bvh=True,
    leaf_size=leaf,
)

orig = pallas_trace.fused_trace_planes
_cell = []


def probed(scene_, ox, oy, oz, dx, dy, dz, config, **kw):
    tb = kw.get("t_bound")
    if kw.get("query") == "occlusion" and tb is not None:
        live = (tb > 0.0).astype(jnp.float32)
        segs = live.reshape(-1, lanes)
        _cell.append((jnp.mean(segs, axis=1), jnp.mean(live)))
    return orig(scene_, ox, oy, oz, dx, dy, dz, config, **kw)


pallas_trace.fused_trace_planes = probed

from tinyraytracing_tpu.integrator import fused_queue

R, max_iters, init_state, cond, body = fused_queue._queue_setup(
    scene, cam, jax.random.PRNGKey(0), cfg, 8, lanes, 0, None
)


@jax.jit
def step(state):
    del _cell[:]
    new_state = body(state)
    return new_state, _cell[0]


state = init_state()
t0 = time.perf_counter()
per_light_sum = None
tot = []
for i in range(iters):
    state, (per_light, total) = step(state)
    pl_np = jax.device_get(per_light)
    t_np = float(total)
    tot.append(t_np)
    per_light_sum = pl_np if per_light_sum is None else per_light_sum + pl_np
    if i % 5 == 0 or i == iters - 1:
        print(f"it {i:3d}: per-light {[round(float(x), 3) for x in pl_np]} "
              f"total {t_np:.3f}", flush=True)
print(f"\n{full}: mean per-light over {iters} iters: "
      f"{[round(float(x) / iters, 3) for x in per_light_sum]}")
print(f"mean total live fraction: {sum(tot)/len(tot):.3f} "
      f"({time.perf_counter()-t0:.1f}s incl compile)")
