import time, jax, jax.numpy as jnp
from tinyraytracing_tpu.config import RenderConfig
from tinyraytracing_tpu.integrator.regen import render_persistent_stats_jit
from tinyraytracing_tpu.integrator.planar import render_planar_stats_jit
from tinyraytracing_tpu.models.procedural import cornell_box

scene, cam = cornell_box(width=512, height=512)
cfg = RenderConfig(intersector="auto", max_depth=16)
key = jax.random.PRNGKey(0)
SPP = 16

for name, fn in [("persistent", render_persistent_stats_jit), ("planar", render_planar_stats_jit)]:
    img, rays = fn(scene, cam, key, cfg, SPP)
    jax.block_until_ready(img)   # warmup/compile
    n = 3
    t0 = time.perf_counter()
    for _ in range(n):
        img, rays = fn(scene, cam, key, cfg, SPP)
        jax.block_until_ready(img)
    dt = (time.perf_counter() - t0) / n
    r = int(rays)
    print(f"{name}: {dt*1e3:.1f} ms, rays={r}, {r/dt/1e6:.2f} Mrays/s, mean={float(img.mean()):.4f}")
