"""Per-phase timing of the queue-fed fused renderer's iteration body.

The full-render throughput on veach-mis (~3.4 Mrays/s) is far below the
fused trace kernel's measured closest-hit rate (~95-110 Mrays/s on random
rays), so ~95% of the iteration is spent OUTSIDE the kernels. This bench
times each phase of fused_queue.render_fused_queue's body standalone
(jitted, on the real device) to attribute the gap: lane regeneration
(cumsum + camera rays), RNG draws, material/texture lookup, NEE geometry,
the two kernel dispatches, and the scatter-add.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/queue_phases.py [veach|stair]
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/jaxcache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from tinyraytracing_tpu.config import RenderConfig
from tinyraytracing_tpu.integrator.fused import (
    _material_planes, _nee_geometry, _tex_kd, pixel_tile_order,
    sample_bsdf_planar,
)
from tinyraytracing_tpu.models.camera import camera_basis
from tinyraytracing_tpu.models.scene import load_scene
from tinyraytracing_tpu.ops.pallas_trace import fused_trace_planes
from tinyraytracing_tpu.ops import vec

SCENES = "/root/reference/RayTracingOnCPU/example-scenes-cg22"
R = int(os.environ.get("BENCH_LANES", 262144))

which = sys.argv[1] if len(sys.argv) > 1 else "veach"
name = {"veach": "veach-mis", "stair": "staircase"}[which]
cfg = RenderConfig(intersector="auto", max_depth=16)
scene, cam = load_scene(
    f"{SCENES}/{name}/{name}.xml", f"{SCENES}/{name}/{name}.obj",
    f"{SCENES}/{name}/{name}.mtl", f"{SCENES}/{name}", with_bvh=True,
)
L = int(scene.light_mtl.shape[0])
W, H = cam.width, cam.height
key = jax.random.PRNGKey(0)


def timeit(f, *a, n=5):
    r = jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n


rng = np.random.default_rng(0)
o = jnp.asarray(rng.uniform(-2, 2, (R, 3)), jnp.float32)
dd = rng.normal(size=(R, 3))
dd /= np.linalg.norm(dd, axis=1, keepdims=True)
d = jnp.asarray(dd, jnp.float32)
active = jnp.asarray(rng.uniform(size=R) < 0.9)
pkd = jnp.asarray(rng.integers(0, 2**32, (R, 2), dtype=np.uint32))
bounce = jnp.asarray(rng.integers(0, 8, R, dtype=np.int32))
pix = jnp.asarray(rng.integers(0, W * H, R, dtype=np.int32))
contrib = jnp.asarray(rng.normal(size=(R, 3)), jnp.float32)

order = jnp.asarray(pixel_tile_order(W, H)[0])
eye, horizontal, vertical, llc = camera_basis(cam)
eye = tuple(eye[k] for k in range(3))
horizontal = tuple(horizontal[k] for k in range(3))
vertical = tuple(vertical[k] for k in range(3))
llc = tuple(llc[k] for k in range(3))

spp = 8
n_pix = W * H


@jax.jit
def regen_block(active, key):
    dead = ~active
    rank = jnp.cumsum(dead.astype(jnp.int32)) - 1
    new_id = jnp.int32(1000) + rank
    path_id = jnp.maximum(new_id, 0)
    p = order[jnp.clip(path_id // spp, 0, n_pix - 1)]
    i = (p // W).astype(jnp.float32)
    j = (p % W).astype(jnp.float32)
    k2 = jax.random.key_data(jax.vmap(
        lambda t: jax.random.fold_in(key, t))(path_id))
    h1 = (k2[..., 0].astype(jnp.uint32) >> 8).astype(jnp.float32) / jnp.float32(1 << 24)
    h2 = (k2[..., 1].astype(jnp.uint32) >> 8).astype(jnp.float32) / jnp.float32(1 << 24)
    x = j / (W - 1.0) + (h1 - 0.5) / W
    y = (H - i) / (H - 1.0) + (h2 - 0.5) / H
    dv = (
        llc[0] + x * horizontal[0] + y * vertical[0] - eye[0],
        llc[1] + x * horizontal[1] + y * vertical[1] - eye[1],
        llc[2] + x * horizontal[2] + y * vertical[2] - eye[2],
    )
    return vec.normalize(dv), k2, p


@jax.jit
def draws_block(pkd, bounce):
    from tinyraytracing_tpu.ops.rng import bounce_uniforms
    return jnp.stack(
        bounce_uniforms(pkd[:, 0], pkd[:, 1], bounce, 4 * L + 5), axis=-1
    )


@jax.jit
def trace_block(o, d):
    return fused_trace_planes(scene, o[:, 0], o[:, 1], o[:, 2],
                              d[:, 0], d[:, 1], d[:, 2], cfg)


@jax.jit
def shadow_block(o, d):
    o3 = jnp.concatenate([o[:, 0]] * L), jnp.concatenate([o[:, 1]] * L), jnp.concatenate([o[:, 2]] * L)
    d3 = jnp.concatenate([d[:, 0]] * L), jnp.concatenate([d[:, 1]] * L), jnp.concatenate([d[:, 2]] * L)
    return fused_trace_planes(scene, *o3, *d3, cfg)


def _shade(o, d, pkd, bounce):
    t, pnx, pny, pnz, tcu, tcv, mtl, em = trace_block(o, d)
    return t, (pnx, pny, pnz), (tcu, tcv), mtl, em


traced = jax.block_until_ready(trace_block(o, d))
t, pnx, pny, pnz, tcu, tcv, mtl, em = traced
point = (o[:, 0] + t * d[:, 0], o[:, 1] + t * d[:, 1], o[:, 2] + t * d[:, 2])
pn = vec.normalize((pnx, pny, pnz))
wi = (-d[:, 0], -d[:, 1], -d[:, 2])
draws = jax.block_until_ready(draws_block(pkd, bounce))
shade_mask = active & (t < 3e37)


@jax.jit
def mat_block(mtl, tcu, tcv):
    mat = _material_planes(scene, mtl)
    kd = _tex_kd(scene, mat, tcu, tcv, mat["kd"])
    return kd, mat["ks"], mat["ns"], mat["ni"], mat["rad"]


kd_val, ks, ns, ni, mrad = jax.block_until_ready(mat_block(mtl, tcu, tcv))


@jax.jit
def nee_block(point, pn, wi, kd_val, ks, ns, draws, shade_mask):
    outs = []
    for l in range(L):
        outs.append(_nee_geometry(
            scene, cfg, l, point, pn, wi, kd_val, ks, ns,
            draws[:, 4 * l + 0], draws[:, 4 * l + 1],
            draws[:, 4 * l + 2], draws[:, 4 * l + 3], shade_mask))
    return outs


@jax.jit
def bsdf_block(d, pn, kd, ks, ns, ni, draws):
    return sample_bsdf_planar(
        (d[:, 0], d[:, 1], d[:, 2]), pn, kd, ks, ns, ni,
        draws[:, 4 * L + 1], draws[:, 4 * L + 2],
        draws[:, 4 * L + 3], draws[:, 4 * L + 4])


@jax.jit
def scatter_block(img, pix, contrib):
    return img.at[pix].add(contrib, mode="drop")


img0 = jnp.zeros((n_pix, 3), jnp.float32)

phases = [
    ("regen (cumsum+camera+fold_in)", lambda: regen_block(active, key)),
    ("rng draws (4L+5 uniforms)", lambda: draws_block(pkd, bounce)),
    ("trace kernel (R bounce rays)", lambda: trace_block(o, d)),
    ("shadow kernel (L*R rays)", lambda: shadow_block(o, d)),
    ("material+texture lookup", lambda: mat_block(mtl, tcu, tcv)),
    ("NEE geometry xL", lambda: nee_block(point, pn, wi, kd_val, ks, ns, draws, shade_mask)),
    ("BSDF sample", lambda: bsdf_block(d, pn, kd_val, ks, ns, ni, draws)),
    ("scatter-add (R,3)->(n_pix,3)", lambda: scatter_block(img0, pix, contrib)),
]

print(f"{name}: R={R} L={L} {W}x{H}", flush=True)
total = 0.0
for label, f in phases:
    dt = timeit(f)
    total += dt
    print(f"  {label:34s} {dt*1e3:8.2f} ms", flush=True)
print(f"  {'TOTAL (sum of phases)':34s} {total*1e3:8.2f} ms", flush=True)
