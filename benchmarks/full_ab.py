"""Full-render A/B of the queue renderer under walk variants (real chip)."""
import os, sys, time
import jax, numpy as np
jax.config.update("jax_compilation_cache_dir", os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/jaxcache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
from tinyraytracing_tpu.config import RenderConfig
from tinyraytracing_tpu.models.scene import load_scene
from tinyraytracing_tpu.models.procedural import quad_grid
from tinyraytracing_tpu.ops.bvh import attach_bvh
from tinyraytracing_tpu.integrator.fused_queue import render_fused_queue_chunked

SC = "/root/reference/RayTracingOnCPU/example-scenes-cg22"

def run(name, walk, spp=8, lanes=131072, leaf=32):
    if name.startswith("grid"):
        n = int(name[4:])
        scene, cam = quad_grid(n, width=512, height=512)
        scene = attach_bvh(scene, RenderConfig(leaf_size=leaf))
        spp = 4
    else:
        scene, cam = load_scene(f"{SC}/{name}/{name}.xml", f"{SC}/{name}/{name}.obj",
                                f"{SC}/{name}/{name}.mtl", f"{SC}/{name}", with_bvh=True, leaf_size=leaf)
    cfg = RenderConfig(intersector="auto", max_depth=16, leaf_size=leaf, bvh_walk=walk)
    key = jax.random.PRNGKey(0)
    img, rays = render_fused_queue_chunked(scene, cam, key, cfg, spp, lanes=lanes, target_chunk_s=10.0)
    jax.block_until_ready(img)
    best = 0.0
    for _ in range(2):
        t0 = time.perf_counter()
        img, rays = render_fused_queue_chunked(scene, cam, key, cfg, spp, lanes=lanes, target_chunk_s=10.0)
        jax.block_until_ready(img)
        dt = time.perf_counter() - t0
        best = max(best, float(rays)/dt)
    print(f"{name:12s} {walk:6s}: {best/1e6:7.2f} Mrays/s  mean={float(np.asarray(img).mean()):.4f}", flush=True)

if __name__ == "__main__":
    names = sys.argv[1:] or ["staircase"]
    for name in names:
        for walk in os.environ.get("AB_WALKS", "binary wide").split():
            run(name, walk)
