import time, jax, jax.numpy as jnp
from tinyraytracing_tpu.config import RenderConfig
from tinyraytracing_tpu.integrator.planar import render_planar_stats_jit
from tinyraytracing_tpu.models.procedural import cornell_box

scene, cam = cornell_box(width=512, height=512)
cfg = RenderConfig(intersector="auto", max_depth=16)
key = jax.random.PRNGKey(0)
img, rays = render_planar_stats_jit(scene, cam, key, cfg, 16)
jax.block_until_ready(img)
with jax.profiler.trace("/tmp/planar_trace"):
    img, rays = render_planar_stats_jit(scene, cam, key, cfg, 16)
    jax.block_until_ready(img)
print("done", float(img.mean()))
