"""Inverse rendering: optimizable scene parameters + gradient-descent loop
(BASELINE.json config 4: recover albedo + vertex offsets on the Cornell box
via pixel-gradient descent)."""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from tinyraytracing_tpu.config import RenderConfig
from tinyraytracing_tpu.models.camera import Camera
from tinyraytracing_tpu.models.scene import Scene
from tinyraytracing_tpu.render import render


def _static():
    return dataclasses.field(metadata=dict(static=True))


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SceneParams:
    """Differentiable leaves layered onto a Scene/Camera.

    Any field can be None (not optimized). vertex_offset is a per-triangle
    rigid offset added to all three vertices — silhouette gradients are
    interior-term only (see diff/__init__ docstring).
    """

    kd: jax.Array | None = None             # (M, 3) material albedo
    radiance: jax.Array | None = None       # (M, 3) emitter radiance
    vertex_offset: jax.Array | None = None  # (T, 3)
    eye: jax.Array | None = None            # (3,) camera position
    lookat: jax.Array | None = None         # (3,)

    @staticmethod
    def init_from(scene: Scene, cam: Camera, *fields: str) -> "SceneParams":
        src = dict(
            kd=scene.kd,
            radiance=scene.radiance,
            vertex_offset=jnp.zeros_like(scene.v0),
            eye=cam.eye,
            lookat=cam.lookat,
        )
        return SceneParams(**{f: src[f] for f in fields})


def apply_params(scene: Scene, cam: Camera, p: SceneParams):
    """Overlay the optimizable parameters onto scene + camera."""
    up_s = {}
    if p.kd is not None:
        up_s["kd"] = p.kd
    if p.radiance is not None:
        up_s["radiance"] = p.radiance
        # keep the light table's cached radiance consistent
        up_s["light_radiance"] = p.radiance[scene.light_mtl]
    if p.vertex_offset is not None:
        up_s["v0"] = scene.v0 + p.vertex_offset
        up_s["v1"] = scene.v1 + p.vertex_offset
        up_s["v2"] = scene.v2 + p.vertex_offset
        # NOTE: BVH AABBs are NOT rebuilt under differentiation — use the
        # brute-force intersector for geometry optimization, or keep
        # offsets within the 1e-3 AABB pad.
    if up_s:
        scene = dataclasses.replace(scene, **up_s)
    up_c = {}
    if p.eye is not None:
        up_c["eye"] = p.eye
    if p.lookat is not None:
        up_c["lookat"] = p.lookat
    if up_c:
        cam = dataclasses.replace(cam, **up_c)
    return scene, cam


def render_loss(
    params: SceneParams,
    scene: Scene,
    cam: Camera,
    key,
    target,
    config: RenderConfig,
    spp: int,
):
    """Mean-squared pixel loss against a target image. Differentiable in
    ``params`` (path-replay interior-term gradients)."""
    s2, c2 = apply_params(scene, cam, params)
    img = render(s2, c2, key, config, spp)
    return jnp.mean((img - target) ** 2)


def make_train_step(scene, cam, target, config: RenderConfig, spp: int,
                    learning_rate: float = 0.05):
    """Returns (step_fn, init_state) for adam-based inverse rendering.

    step_fn(state, key) -> (state, loss); state = (params, opt_state).
    """
    import optax

    opt = optax.adam(learning_rate)

    @jax.jit
    def step(state, key):
        params, opt_state = state
        loss, grads = jax.value_and_grad(render_loss)(
            params, scene, cam, key, target, config, spp
        )
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    def init(params: SceneParams):
        return (params, opt.init(params))

    return step, init
