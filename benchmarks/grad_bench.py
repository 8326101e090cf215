"""First-ever fwd+bwd rays/s on real scenes (BASELINE.json north-star
metric): value_and_grad of the fast-path MSE loss (diff/fast.py), real
chip. Also reports forward-only rays/s of the same renderer for the
fwd:bwd ratio."""
import os, sys, time
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
from tinyraytracing_tpu.config import RenderConfig
from tinyraytracing_tpu.models.scene import load_scene
from tinyraytracing_tpu.models.procedural import cornell_box
from tinyraytracing_tpu.ops.bvh import attach_bvh
from tinyraytracing_tpu.diff.fast import render_diff, render_loss_fast
from tinyraytracing_tpu.diff.inverse import SceneParams

SC = "/root/reference/RayTracingOnCPU/example-scenes-cg22"

def get_scene(name, leaf=32):
    if name == "cornell":
        s, c = cornell_box(width=512, height=512)
        return attach_bvh(s, RenderConfig(leaf_size=leaf)), c
    s, c = load_scene(f"{SC}/{name}/{name}.xml", f"{SC}/{name}/{name}.obj",
                      f"{SC}/{name}/{name}.mtl", f"{SC}/{name}", with_bvh=True, leaf_size=leaf)
    return s, c

def bench(name, spp, fields=("kd",), depth=8):
    # per-scene BVH leaf width, matching bench.py's forward picks
    # (staircase 16 under the occlusion walk; GB_LEAF overrides)
    leaf = int(os.environ.get("GB_LEAF", 16 if name == "staircase" else 32))
    scene, cam = get_scene(name, leaf=leaf)
    cfg = RenderConfig(intersector="auto", max_depth=depth, leaf_size=leaf)
    key = jax.random.PRNGKey(0)
    target = jnp.zeros((cam.height, cam.width, 3), jnp.float32)
    params = SceneParams.init_from(scene, cam, *fields)

    fwd = jax.jit(lambda: render_diff(scene, cam, key, cfg, spp, return_rays=True))
    img, rays = fwd(); jax.block_until_ready(img)
    t0 = time.perf_counter(); img, rays = fwd(); jax.block_until_ready(img)
    fwd_s = time.perf_counter() - t0
    rays = float(rays)

    vg = jax.jit(jax.value_and_grad(
        lambda p: render_loss_fast(p, scene, cam, key, target, cfg, spp)))
    t0 = time.perf_counter(); loss, g = vg(params); jax.block_until_ready(loss)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter(); loss, g = vg(params); jax.block_until_ready(loss)
    fb_s = time.perf_counter() - t0
    gn = sum(float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g))
    print(f"{name} {cam.width}x{cam.height}@{spp}spp depth{depth} fields={fields}: "
          f"fwd {rays/fwd_s/1e6:.2f} Mrays/s ({fwd_s:.2f}s); "
          f"fwd+bwd {rays/fb_s/1e6:.2f} Mrays/s ({fb_s:.2f}s, compile {compile_s:.0f}s, |g|={gn:.3g}, loss={float(loss):.4f})",
          flush=True)

if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "cornell"
    spp = int(os.environ.get("GB_SPP", 4))
    fields = tuple(os.environ.get("GB_FIELDS", "kd").split(","))
    depth = int(os.environ.get("GB_DEPTH", 8))
    bench(which, spp, fields, depth)
