"""A/B the round-5 any-hit occlusion shadow walk against the round-4
closest-hit visibility on the real TPU.

AB_MODE=new : the occlusion-query kernel (2-plane shadow dispatch).
AB_MODE=old : same consumer code, but the occlusion query is emulated with
              the round-4 closest-hit walk (attrs=False) + material test —
              the exact old visibility semantics.

Prints Mrays/s and the image checksum; run both modes in separate
processes (the jit cache keys differ by HLO) and diff the .npy outputs —
they must be BITWISE equal if the decomposition is exact on this scene.

Usage: AB_MODE=new AB_SCENE=veach-mis AB_SPP=4 python benchmarks/ab_shadow.py
"""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

mode = os.environ.get("AB_MODE", "new")
name = os.environ.get("AB_SCENE", "veach-mis")
spp = int(os.environ.get("AB_SPP", 4))
leaf = int(os.environ.get("AB_LEAF", 32))
lanes = int(os.environ.get("AB_LANES", 131072))

import tinyraytracing_tpu.ops.pallas_trace as ptr

# experiment knobs: override packet tile / walk for the SHADOW (occlusion)
# dispatch only, via a config rewrite at the trace boundary
_shtile = int(os.environ.get("AB_SHTILE", 0))
_shwalk = os.environ.get("AB_SHWALK", "")
if _shtile or _shwalk:
    _orig_sh = ptr.fused_trace_planes

    def _sh_patch(scene, *a, **kw):
        if kw.get("query") == "occlusion":
            cfg = a[6] if len(a) > 6 else kw["config"]
            if _shtile:
                cfg = cfg.replace(ray_tile=_shtile)
            if _shwalk:
                cfg = cfg.replace(bvh_walk=_shwalk)
            if len(a) > 6:
                a = a[:6] + (cfg,) + a[7:]
            else:
                kw["config"] = cfg
        return _orig_sh(scene, *a, **kw)

    ptr.fused_trace_planes = _sh_patch

if mode == "old":
    orig = ptr.fused_trace_planes

    def patched(scene, ox, oy, oz, dx, dy, dz, config, force_kernel=False,
                t_bound=None, target_mtl=None, return_tri=False,
                attrs=True, query="closest"):
        if query != "occlusion":
            return orig(scene, ox, oy, oz, dx, dy, dz, config,
                        force_kernel=force_kernel, t_bound=t_bound,
                        target_mtl=target_mtl, return_tri=return_tri,
                        attrs=attrs)
        _, _, _, _, _, _, smtl, _ = orig(
            scene, ox, oy, oz, dx, dy, dz, config,
            force_kernel=force_kernel, t_bound=t_bound,
            target_mtl=target_mtl, attrs=False,
        )
        seen = (smtl >= 0.0) & (jnp.abs(smtl - target_mtl) <= 0.5)
        killed = smtl == -3.0
        return (jnp.where(killed, -1.0, t_bound), seen.astype(jnp.float32))

    ptr.fused_trace_planes = patched

from tinyraytracing_tpu.config import RenderConfig
from tinyraytracing_tpu.models.scene import load_scene
from tinyraytracing_tpu.integrator.fused_queue import render_fused_queue_chunked

SC = "/root/reference/RayTracingOnCPU/example-scenes-cg22"
if name.startswith("grid:"):
    from tinyraytracing_tpu.models.procedural import quad_grid
    from tinyraytracing_tpu.ops.bvh import attach_bvh

    cfgb = RenderConfig(intersector="auto", max_depth=16, leaf_size=leaf)
    scene, cam = quad_grid(int(name.split(":")[1]))
    scene = attach_bvh(scene, cfgb)
else:
    scene, cam = load_scene(f"{SC}/{name}/{name}.xml", f"{SC}/{name}/{name}.obj",
                            f"{SC}/{name}/{name}.mtl", f"{SC}/{name}",
                            with_bvh=True, leaf_size=leaf)
cfg = RenderConfig(intersector="auto", max_depth=16, leaf_size=leaf,
                   walk_order=os.environ.get("AB_ORDER", "preorder"),
                   ray_tile=int(os.environ.get("AB_TILE", 0) or 0),
                   morton_cells=int(os.environ.get("AB_MCELLS", 32)))
key = jax.random.PRNGKey(0)

img, rays = render_fused_queue_chunked(scene, cam, key, cfg, spp, lanes=lanes,
                                       target_chunk_s=10.0)
jax.block_until_ready(img)
best = 0.0
for _ in range(2):
    t0 = time.perf_counter()
    img, rays = render_fused_queue_chunked(scene, cam, key, cfg, spp,
                                           lanes=lanes, target_chunk_s=10.0)
    jax.block_until_ready(img)
    best = max(best, float(rays) / (time.perf_counter() - t0))

arr = np.asarray(img)
out = f"/tmp/ab_{name.replace(':', '_')}_{mode}.npy"
np.save(out, arr)
print(f"{name} spp={spp} mode={mode}: {best/1e6:.2f} Mrays/s "
      f"mean={arr.mean():.6f} sum={arr.sum():.6f} -> {out}", flush=True)
