"""Sampling distribution tests: reference ONB frame, cosine/Phong lobes,
light-point barycentrics (chi-square-style moment checks)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinyraytracing_tpu.ops.sampling import (
    barycentric_ref,
    barycentric_uniform,
    reference_onb,
    sample_lobe,
)


def test_onb_orthonormal(rng):
    a = rng.normal(size=(100, 3))
    a /= np.linalg.norm(a, axis=1, keepdims=True)
    a = jnp.asarray(a, jnp.float32)
    right, front = jax.tree.map(np.asarray, reference_onb(a))
    an = np.asarray(a)
    assert np.abs(np.sum(right * an, axis=1)).max() < 1e-5
    assert np.abs(np.sum(front * an, axis=1)).max() < 1e-5
    assert np.abs(np.sum(front * right, axis=1)).max() < 1e-5
    assert np.allclose(np.linalg.norm(front, axis=1), 1.0, atol=1e-5)


def test_cosine_lobe_moments():
    n = 200_000
    key = jax.random.PRNGKey(0)
    u = jax.random.uniform(key, (2, n))
    axis = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
    d = np.asarray(sample_lobe(axis, u[0], u[1], jnp.asarray(True), jnp.asarray(1.0)))
    cos = d[:, 2]
    assert cos.min() >= -1e-6  # hemisphere
    # cosine-weighted: E[cos] = 2/3, E[cos^2] = 1/2
    assert cos.mean() == pytest.approx(2 / 3, abs=5e-3)
    assert (cos ** 2).mean() == pytest.approx(0.5, abs=5e-3)


def test_phong_lobe_moments():
    n = 200_000
    ns = 50.0
    key = jax.random.PRNGKey(1)
    u = jax.random.uniform(key, (2, n))
    axis = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
    d = np.asarray(
        sample_lobe(axis, u[0], u[1], jnp.asarray(False), jnp.asarray(ns))
    )
    cos = d[:, 2]
    # cos = u^(1/(ns+1)) -> E[cos] = (ns+1)/(ns+2)
    assert cos.mean() == pytest.approx((ns + 1) / (ns + 2), abs=5e-3)
    assert cos.min() > 0


def test_barycentric_ref_distribution():
    key = jax.random.PRNGKey(2)
    u = jax.random.uniform(key, (3, 100_000))
    p1, p2, p3 = jax.tree.map(np.asarray, barycentric_ref(u[0], u[1], u[2]))
    s = p1 + p2 + p3
    assert np.allclose(s, 1.0, atol=1e-6)
    # the reference's sampler is NOT uniform: center-biased, E[p1]=1/3
    assert p1.mean() == pytest.approx(1 / 3, abs=3e-3)
    # uniform-over-area has E[p1^2]=1/6; normalized-3-uniforms differs
    assert (p1 ** 2).mean() != pytest.approx(1 / 6, abs=3e-3)


def test_barycentric_uniform_distribution():
    key = jax.random.PRNGKey(3)
    u = jax.random.uniform(key, (2, 200_000))
    p1, p2, p3 = jax.tree.map(np.asarray, barycentric_uniform(u[0], u[1]))
    assert np.allclose(p1 + p2 + p3, 1.0, atol=1e-6)
    for p in (p1, p2, p3):
        assert p.mean() == pytest.approx(1 / 3, abs=3e-3)
        assert (p ** 2).mean() == pytest.approx(1 / 6, abs=3e-3)
