"""A/B of the renderer generations on the real device (cornell 512x512).

Usage: PYTHONPATH=/root/.axon_site:. python benchmarks/renderers_ab.py
"""

import os
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/jaxcache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from tinyraytracing_tpu.config import RenderConfig
from tinyraytracing_tpu.integrator.regen import render_persistent_stats_jit
from tinyraytracing_tpu.integrator.fused import render_fused_stats_jit
from tinyraytracing_tpu.models.procedural import cornell_box
from tinyraytracing_tpu.ops.bvh import attach_bvh

SIZE = int(os.environ.get("BENCH_SIZE", 512))
SPP = int(os.environ.get("BENCH_SPP", 16))
LEAF = int(os.environ.get("BENCH_LEAF", 8))

scene, cam = cornell_box(width=SIZE, height=SIZE)
cfg = RenderConfig(intersector="auto", max_depth=16, leaf_size=LEAF)
scene_bvh = attach_bvh(scene, cfg)
key = jax.random.PRNGKey(0)

for name, fn, sc in [
    ("persistent(pallas brute)", render_persistent_stats_jit, scene),
    ("fused", render_fused_stats_jit, scene_bvh),
]:
    img, rays = fn(sc, cam, key, cfg, SPP)
    jax.block_until_ready(img)   # warmup/compile
    n = 3
    t0 = time.perf_counter()
    for _ in range(n):
        img, rays = fn(sc, cam, key, cfg, SPP)
        jax.block_until_ready(img)
    dt = (time.perf_counter() - t0) / n
    r = float(rays)
    print(f"{name}: {dt*1e3:.1f} ms, rays={r:.0f}, {r/dt/1e6:.2f} Mrays/s, "
          f"mean={float(img.mean()):.4f}")
