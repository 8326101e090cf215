"""Scale benchmark: fused renderers on procedural quad_grid scenes up to 1M
triangles (BASELINE.json configs 3/5 — the scale axis the reference never
had; its largest scene is staircase's 31,407 tris).

The fused trace kernel keeps the leaf payload (PackedLeaves.PS) in ANY/HBM
with a per-visit DMA, so the triangle count is bounded by HBM, not VMEM
(the round-1 packet kernel capped at ~190K VMEM-resident tris).

Usage: PYTHONPATH=/root/repo python benchmarks/million.py [100000 1000000]
"""

import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/jaxcache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from tinyraytracing_tpu.config import RenderConfig
from tinyraytracing_tpu.integrator.fused import render_fused_stats_jit
from tinyraytracing_tpu.integrator.fused_queue import render_fused_queue_chunked
from tinyraytracing_tpu.models.procedural import quad_grid
from tinyraytracing_tpu.ops.bvh import attach_bvh

SPP = int(os.environ.get("BENCH_SPP", 4))
LEAF = int(os.environ.get("BENCH_LEAF", 8))  # round-5 grid sweep: leaf 8 beats 16/32 on flat quad fields (slot-group work ~2.8x lower; grid100K 0.79 -> 0.99 Mrays/s with the auto 2048 packet)
LANES = int(os.environ.get("BENCH_LANES", 262144))
RENDERER = os.environ.get("BENCH_RENDERER", "queue")
def _queue_chunked(scene, cam, key, cfg, spp, lanes):
    # host-chunked: no device program outlives the ~60s TPU watchdog
    img, rays = render_fused_queue_chunked(
        scene, cam, key, cfg, spp, lanes=lanes, target_chunk_s=10.0)
    return img.reshape(cam.height, cam.width, 3), rays


_render = {"fused": render_fused_stats_jit,
           "queue": _queue_chunked}[RENDERER]

sizes = [int(a) for a in sys.argv[1:]] or [100_000, 1_000_000]
cfg = RenderConfig(intersector="auto", max_depth=16, leaf_size=LEAF)

for n in sizes:
    t0 = time.perf_counter()
    scene, cam = quad_grid(n)
    scene = attach_bvh(scene, cfg)
    build_s = time.perf_counter() - t0
    print(f"grid {n}: {scene.num_triangles} tris, BVH {scene.bvh.n_nodes} nodes "
          f"({build_s:.1f}s build)", flush=True)
    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    img, rays = _render(scene, cam, key, cfg, SPP, lanes=LANES)
    jax.block_until_ready(img)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    img, rays = _render(scene, cam, key, cfg, SPP, lanes=LANES)
    jax.block_until_ready(img)
    dt = time.perf_counter() - t0
    r = float(rays)
    print(f"grid {n} [{RENDERER}] {cam.width}x{cam.height}@{SPP}spp: "
          f"{dt*1e3:.1f} ms ({compile_s:.0f}s compile+1st), rays={r:.0f}, "
          f"{r/dt/1e6:.2f} Mrays/s, mean={float(img.mean()):.4f}", flush=True)
