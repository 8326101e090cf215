"""Capture an xprof trace of the queue loop on a real scene and print the
per-op attribution (via benchmarks/xprof_parse.py — no tsl dependency).

Usage: PYTHONPATH=/root/.axon_site:. python benchmarks/profile_queue.py [staircase|veach] [iters]
"""

import glob
import os
import subprocess
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/jaxcache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from tinyraytracing_tpu.config import RenderConfig
from tinyraytracing_tpu.models.scene import load_scene
from tinyraytracing_tpu.integrator import fused_queue

SCENES = "/root/reference/RayTracingOnCPU/example-scenes-cg22"

name = (sys.argv[1:] or ["staircase"])[0]
iters = int(sys.argv[2]) if len(sys.argv) > 2 else 16
full = {"staircase": "staircase", "veach": "veach-mis"}[name]
lanes = {"staircase": 131072, "veach": 65536}[name]
leaf = {"staircase": 16, "veach": 32}[name]

cfg = RenderConfig(intersector="auto", max_depth=16, leaf_size=leaf)
scene, cam = load_scene(
    f"{SCENES}/{full}/{full}.xml", f"{SCENES}/{full}/{full}.obj",
    f"{SCENES}/{full}/{full}.mtl", f"{SCENES}/{full}", with_bvh=True,
    leaf_size=leaf,
)

key = jax.random.PRNGKey(0)
state = fused_queue._queue_init(scene, cam, key, cfg, 8, lanes, None)
# run past the fill-up transient, then profile a steady-state chunk
state = fused_queue._queue_chunk(scene, cam, key, state, jnp.int32(20), 0,
                                 cfg, 8, lanes, None)
jax.block_until_ready(state[0])

trace_dir = f"/tmp/xprof_{name}"
t0 = time.perf_counter()
with jax.profiler.trace(trace_dir):
    state = fused_queue._queue_chunk(scene, cam, key, state,
                                     jnp.int32(20 + iters), 0,
                                     cfg, 8, lanes, None)
    jax.block_until_ready(state[0])
dt = time.perf_counter() - t0
print(f"{full}: {iters} steady-state iterations in {dt:.2f}s "
      f"({dt/iters*1e3:.1f} ms/iter)", flush=True)

pb = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True))[-1]
subprocess.run([sys.executable, "benchmarks/xprof_parse.py", pb, "30"])
