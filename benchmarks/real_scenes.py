"""Fused-renderer throughput on the reference's real scenes (TPU).

Usage: PYTHONPATH=/root/.axon_site:. python benchmarks/real_scenes.py [veach staircase cornell]
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
from tinyraytracing_tpu.models.scene import load_scene
from tinyraytracing_tpu.models.procedural import cornell_box
from tinyraytracing_tpu.ops.bvh import attach_bvh

SCENES = "/root/reference/RayTracingOnCPU/example-scenes-cg22"
SPP = int(os.environ.get("BENCH_SPP", 8))
LEAF = int(os.environ.get("BENCH_LEAF", 8))
LANES = int(os.environ.get("BENCH_LANES", 262144))
RENDERER = os.environ.get("BENCH_RENDERER", "fused")  # fused | queue
def _queue_chunked(scene, cam, key, cfg, spp, lanes):
    # host-chunked: no device program outlives the ~60s TPU watchdog
    img, rays = render_fused_queue_chunked(
        scene, cam, key, cfg, spp, lanes=lanes, target_chunk_s=10.0)
    return img.reshape(cam.height, cam.width, 3), rays


_render = {"fused": render_fused_stats_jit,
           "queue": _queue_chunked}[RENDERER]

which = sys.argv[1:] or ["cornell", "veach", "staircase"]
cfg = RenderConfig(intersector="auto", max_depth=16, leaf_size=LEAF)


def bench(name, scene, cam):
    name = f"{name} [{RENDERER}]"
    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    img, rays = _render(scene, cam, key, cfg, SPP, lanes=LANES)
    jax.block_until_ready(img)
    compile_s = time.perf_counter() - t0
    n = 2
    t0 = time.perf_counter()
    for _ in range(n):
        img, rays = _render(scene, cam, key, cfg, SPP, lanes=LANES)
        jax.block_until_ready(img)
    dt = (time.perf_counter() - t0) / n
    r = float(rays)
    print(f"{name}: {dt*1e3:.1f} ms ({compile_s:.0f}s compile+1st), "
          f"rays={r:.0f}, {r/dt/1e6:.2f} Mrays/s, mean={float(img.mean()):.4f}",
          flush=True)


if "cornell" in which:
    scene, cam = cornell_box(width=512, height=512)
    scene = attach_bvh(scene, cfg)
    bench(f"cornell 512x512@{SPP}spp (32 tris)", scene, cam)

if "veach" in which:
    scene, cam = load_scene(
        f"{SCENES}/veach-mis/veach-mis.xml",
        f"{SCENES}/veach-mis/veach-mis.obj",
        f"{SCENES}/veach-mis/veach-mis.mtl",
        f"{SCENES}/veach-mis", with_bvh=True, leaf_size=LEAF,
    )
    bench(f"veach-mis 1280x720@{SPP}spp (2332 tris, 3 lights)", scene, cam)

if "staircase" in which:
    scene, cam = load_scene(
        f"{SCENES}/staircase/staircase.xml",
        f"{SCENES}/staircase/staircase.obj",
        f"{SCENES}/staircase/staircase.mtl",
        f"{SCENES}/staircase", with_bvh=True, leaf_size=LEAF,
    )
    bench(f"staircase 1280x720@{SPP}spp (31407 tris, 6 lights)", scene, cam)
