"""Gradient correctness: path-replay (detached-sampling) gradients vs
central finite differences on the SAME fixed-key estimator (BASELINE.json
"grad max-err vs finite differences").

With detach_sampling, albedo/radiance only enter through contribution
terms; the sampling decisions are piecewise-constant in them, so for a
fixed key the detached AD gradient must equal the finite difference of the
deterministic estimator (up to float32 arithmetic)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinyraytracing_tpu.config import RenderConfig
from tinyraytracing_tpu.diff.inverse import SceneParams, apply_params, render_loss
from tinyraytracing_tpu.models.procedural import cornell_box

CFG = RenderConfig(intersector="brute", max_depth=3, ray_chunk=1024, tri_chunk=64)
SPP = 2


@pytest.fixture(scope="module")
def setup():
    scene, cam = cornell_box(width=12, height=12)
    cam = dataclasses.replace(cam, width=12, height=12)
    key = jax.random.PRNGKey(11)
    target = jnp.zeros((12, 12, 3), jnp.float32)
    return scene, cam, key, target


def _loss_fn(setup, field):
    scene, cam, key, target = setup

    def f(x):
        p = SceneParams(**{field: x})
        return render_loss(p, scene, cam, key, target, CFG, SPP)

    return f, SceneParams.init_from(scene, cam, field)


def test_albedo_grad_matches_fd(setup):
    f, p0 = _loss_fn(setup, "kd")
    x0 = p0.kd
    g = jax.grad(f)(x0)
    assert np.isfinite(np.asarray(g)).all()
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.normal(size=x0.shape), jnp.float32)
    eps = 1e-2
    fd = (f(x0 + eps * v) - f(x0 - eps * v)) / (2 * eps)
    an = jnp.vdot(g, v)
    assert float(an) == pytest.approx(float(fd), rel=0.05, abs=1e-5)


def test_radiance_grad_matches_fd(setup):
    f, p0 = _loss_fn(setup, "radiance")
    x0 = p0.radiance
    g = jax.grad(f)(x0)
    rng = np.random.default_rng(1)
    v = jnp.asarray(rng.normal(size=x0.shape), jnp.float32)
    eps = 1e-2
    fd = (f(x0 + eps * v) - f(x0 - eps * v)) / (2 * eps)
    an = jnp.vdot(g, v)
    assert float(an) == pytest.approx(float(fd), rel=0.05, abs=1e-5)


def test_camera_grads_finite_nonzero(setup):
    f, p0 = _loss_fn(setup, "eye")
    g = np.asarray(jax.grad(f)(p0.eye))
    assert np.isfinite(g).all() and np.abs(g).sum() > 0


def test_vertex_grads_finite(setup):
    f, p0 = _loss_fn(setup, "vertex_offset")
    g = np.asarray(jax.grad(f)(p0.vertex_offset))
    assert np.isfinite(g).all()
    assert np.abs(g).sum() > 0


def test_inverse_rendering_recovers_albedo(setup):
    """Config-4 miniature: perturb the white albedo, descend, loss must
    drop substantially toward the target render."""
    scene, cam, key, _ = setup
    from tinyraytracing_tpu.render import render

    target = render(scene, cam, key, CFG, SPP)

    def loss(kd, k):
        p = SceneParams(kd=kd)
        return render_loss(p, scene, cam, k, target, CFG, SPP)

    kd = scene.kd * 0.5 + 0.1
    l0 = float(loss(kd, key))
    g_fn = jax.jit(jax.value_and_grad(loss))
    lr = 10.0
    for i in range(40):
        l, g = g_fn(kd, key)
        kd = kd - lr * g
    l1 = float(loss(kd, key))
    assert l1 < 0.05 * l0
