import os, sys, time
import jax, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
from tinyraytracing_tpu.config import RenderConfig
from tinyraytracing_tpu.models.scene import load_scene
from tinyraytracing_tpu.ops.bvh import attach_bvh
from tinyraytracing_tpu.integrator.fused_queue import render_fused_queue_chunked
SC = "/root/reference/RayTracingOnCPU/example-scenes-cg22"
name = os.environ.get("SW_SCENE", "staircase")
leaf = int(os.environ.get("SW_LEAF", 32))
scene, cam = load_scene(f"{SC}/{name}/{name}.xml", f"{SC}/{name}/{name}.obj", f"{SC}/{name}/{name}.mtl", f"{SC}/{name}", with_bvh=True, leaf_size=leaf)
lanes = int(os.environ.get("SW_LANES", 131072))
resort = int(os.environ.get("SW_RESORT", -1))
rkey = os.environ.get("SW_RKEY", "path")
tile = int(os.environ.get("SW_TILE", 0))
mcells = int(os.environ.get("SW_MCELLS", 32))
worder = os.environ.get("SW_ORDER", "pre")
cfg = RenderConfig(intersector="auto", max_depth=16, leaf_size=leaf, queue_resort_every=resort, queue_resort_key=rkey, ray_tile=tile, morton_cells=mcells, walk_order=worder)
key = jax.random.PRNGKey(0)
img, rays = render_fused_queue_chunked(scene, cam, key, cfg, 8, lanes=lanes, target_chunk_s=10.0)
jax.block_until_ready(img)
best = 0.0
for _ in range(2):
    t0 = time.perf_counter()
    img, rays = render_fused_queue_chunked(scene, cam, key, cfg, 8, lanes=lanes, target_chunk_s=10.0)
    jax.block_until_ready(img)
    best = max(best, float(rays)/(time.perf_counter()-t0))
print(f"{name} lanes={lanes} resort={resort} key={rkey} leaf={leaf} tile={tile or 'auto'}: {best/1e6:.2f} Mrays/s mean={float(np.asarray(img).mean()):.4f}", flush=True)
