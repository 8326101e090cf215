"""A/B the wide (8-wide stack) vs binary (skip-link) trace kernels on the
real chip: closest-hit throughput on random and camera-coherent rays for
each reference scene + the procedural grids. Round-4 agenda item 1."""
import os, sys, time
import jax, jax.numpy as jnp, numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/jaxcache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from tinyraytracing_tpu.config import RenderConfig
from tinyraytracing_tpu.models.scene import load_scene
from tinyraytracing_tpu.models.procedural import cornell_box, quad_grid
from tinyraytracing_tpu.ops.bvh import attach_bvh
from tinyraytracing_tpu.ops.pallas_trace import fused_trace_planes

SC = "/root/reference/RayTracingOnCPU/example-scenes-cg22"
R = int(os.environ.get("AB_RAYS", 262144))

def rays_random(scene, rng):
    lo = np.array([np.asarray(scene.v0).min(0), np.asarray(scene.v1).min(0), np.asarray(scene.v2).min(0)]).min(0)
    hi = np.array([np.asarray(scene.v0).max(0), np.asarray(scene.v1).max(0), np.asarray(scene.v2).max(0)]).max(0)
    org = rng.uniform(size=(R, 3)) * (hi - lo) + lo
    d = rng.normal(size=(R, 3)); d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(org, jnp.float32), jnp.asarray(d, jnp.float32)

def bench(scene, cfg, org, d):
    args = (org[:,0], org[:,1], org[:,2], d[:,0], d[:,1], d[:,2])
    f = jax.jit(lambda *a: fused_trace_planes(scene, *a, cfg)[0])
    t0 = time.perf_counter(); out = f(*args); jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    best = 1e30
    for _ in range(3):
        t0 = time.perf_counter(); out = f(*args); jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return R / best / 1e6, compile_s, float(jnp.sum(out < 1e30))

def scene_by_name(name, leaf):
    if name == "cornell":
        s, c = cornell_box(width=512, height=512); return attach_bvh(s, RenderConfig(leaf_size=leaf)), c
    if name.startswith("grid"):
        n = int(name[4:]); s, c = quad_grid(n, width=512, height=512); return attach_bvh(s, RenderConfig(leaf_size=leaf)), c
    s, c = load_scene(f"{SC}/{name}/{name}.xml", f"{SC}/{name}/{name}.obj", f"{SC}/{name}/{name}.mtl", f"{SC}/{name}", with_bvh=True, leaf_size=leaf)
    return s, c

if __name__ == "__main__":
    which = sys.argv[1:] or ["veach-mis", "staircase", "grid100000"]
    rng = np.random.default_rng(0)
    leaf = int(os.environ.get("AB_LEAF", 32))
    for name in which:
        scene, cam = scene_by_name(name, leaf)
        org, d = rays_random(scene, rng)
        for walk in ("binary", "wide"):
            cfg = RenderConfig(leaf_size=leaf, bvh_walk=walk)
            mrps, comp, hits = bench(scene, cfg, org, d)
            pk = scene.bvh.packed
            print(f"{name:12s} {walk:6s} leaf={leaf} n_nodes={pk.n_nodes} n_wide={pk.n_wide} depth={pk.wide_depth}: {mrps:8.2f} Mrays/s  (compile {comp:.1f}s, hits {hits:.0f})", flush=True)
