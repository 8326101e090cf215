"""Quantify packet divergence + the cost/benefit envelope of ray sorting.

Measures on the real device:
1. fused-kernel closest-hit throughput on veach-mis for coherent (tiled
   camera) vs incoherent (random) rays, across leaf sizes;
2. the cost of a sort + state permutation at wavefront scale (the price
   of re-bucketing bounce rays every iteration).
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/jaxcache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from tinyraytracing_tpu.config import RenderConfig
from tinyraytracing_tpu.models.camera import camera_basis
from tinyraytracing_tpu.models.scene import load_scene
from tinyraytracing_tpu.ops.pallas_trace import fused_trace_planes

SCENES = "/root/reference/RayTracingOnCPU/example-scenes-cg22"
R = 262144


def timeit(f, *a, n=3):
    r = f(*a)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n


def coherent_rays(cam):
    """Camera rays in 32x32-tile lane order (the renderer's layout)."""
    from tinyraytracing_tpu.integrator.fused import pixel_tile_order

    W, H = cam.width, cam.height
    order, _ = pixel_tile_order(W, H)
    pix = jnp.asarray(order[:R])
    eye, horizontal, vertical, llc = camera_basis(cam)
    i = (pix // W).astype(jnp.float32)
    j = (pix % W).astype(jnp.float32)
    x = j / (W - 1.0)
    y = (H - i) / (H - 1.0)
    d = (llc[None] + x[:, None] * horizontal[None]
         + y[:, None] * vertical[None] - eye[None])
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    o = jnp.broadcast_to(eye, d.shape)
    return o, d


def random_rays(lo, hi, seed=0):
    rng = np.random.default_rng(seed)
    o = jnp.asarray(rng.uniform(0, 1, (R, 3)) * (hi - lo) + lo, jnp.float32)
    d = rng.normal(size=(R, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return o, jnp.asarray(d, jnp.float32)


def sorted_random_rays(lo, hi, seed=0):
    """Same random rays bucketed by (position cell, direction octant) —
    what a per-iteration wavefront sort would produce."""
    o, d = random_rays(lo, hi, seed)
    on, dn = np.asarray(o), np.asarray(d)
    cell = ((on - lo) / (hi - lo + 1e-9) * 8).astype(np.int64).clip(0, 7)
    octant = (dn[:, 0] > 0) * 4 + (dn[:, 1] > 0) * 2 + (dn[:, 2] > 0)
    key = ((cell[:, 0] * 8 + cell[:, 1]) * 8 + cell[:, 2]) * 8 + octant
    perm = np.argsort(key, kind="stable")
    return jnp.asarray(on[perm]), jnp.asarray(dn[perm])


def main():
    for leaf in (8, 16, 32):
        cfg = RenderConfig(intersector="bvh", leaf_size=leaf)
        scene, cam = load_scene(
            f"{SCENES}/veach-mis/veach-mis.xml",
            f"{SCENES}/veach-mis/veach-mis.obj",
            f"{SCENES}/veach-mis/veach-mis.mtl",
            f"{SCENES}/veach-mis", with_bvh=True, leaf_size=leaf,
        )
        lo = np.asarray(scene.v0).min(0) * 0 + np.array([-2.0, -1.0, -2.0])
        hi = np.array([2.0, 2.0, 2.0])

        trace = jax.jit(lambda o, d: fused_trace_planes(
            scene, o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2], cfg)[0])

        for name, (o, d) in [
            ("camera/tiled", coherent_rays(cam)),
            ("random", random_rays(lo, hi)),
            ("random+sorted", sorted_random_rays(lo, hi)),
        ]:
            dt = timeit(trace, o, d)
            print(f"veach leaf={leaf:2d} {name:14s}: {dt*1e3:7.1f} ms "
                  f"-> {R/dt/1e6:7.1f} Mrays/s", flush=True)

    # sort + permute cost at wavefront scale
    rng = np.random.default_rng(1)
    key32 = jnp.asarray(rng.integers(0, 1 << 12, R), jnp.int32)
    state = jnp.asarray(rng.normal(size=(R, 24)), jnp.float32)

    argsort = jax.jit(lambda k: jnp.argsort(k))
    perm = np.argsort(np.asarray(key32), kind="stable")
    permj = jnp.asarray(perm)
    apply_rows = jax.jit(lambda s, p: s[p])
    apply_planes = jax.jit(lambda s, p: tuple(s[:, c][p] for c in range(24)))

    print(f"argsort (R,) i32:        {timeit(argsort, key32)*1e3:7.1f} ms")
    print(f"permute (R,24) rows:     {timeit(apply_rows, state, permj)*1e3:7.1f} ms")
    print(f"permute 24x(R,) planes:  {timeit(apply_planes, state, permj)*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
