"""Camera/raygen tests: viewport math vs hand-computed corners
(reference camera.cpp:3-28) and frame orthonormality."""

import jax
import numpy as np
import pytest

from tinyraytracing_tpu.models.camera import Camera, camera_basis, generate_rays, generate_rays_np


def _cam(width=64, height=64):
    return Camera.create(
        eye=(278.0, 273.0, -800.0),
        lookat=(278.0, 273.0, -799.0),
        up=(0.0, 1.0, 0.0),
        fovy=39.3077,
        width=width,
        height=height,
    )


def test_basis_orthonormal():
    cam = _cam()
    eye, horizontal, vertical, llc = jax.tree.map(np.asarray, camera_basis(cam))
    h = np.deg2rad(39.3077) / 2
    assert np.linalg.norm(vertical) == pytest.approx(2 * np.tan(h), rel=1e-5)
    assert np.linalg.norm(horizontal) == pytest.approx(2 * np.tan(h) * cam.aspect, rel=1e-5)
    assert np.dot(horizontal, vertical) == pytest.approx(0.0, abs=1e-5)
    # center ray (s=t=0.5) must look along lookat-eye
    center = llc + 0.5 * horizontal + 0.5 * vertical - eye
    center /= np.linalg.norm(center)
    assert center == pytest.approx([0.0, 0.0, 1.0], abs=1e-6)


def test_screen_mapping_and_jitter():
    cam = _cam(8, 8)
    o, d = jax.tree.map(np.asarray, generate_rays(cam, jax.random.PRNGKey(0)))
    assert o.shape == (64, 3) and d.shape == (64, 3)
    assert np.allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-6)
    # reference mapping for pixel (i row, j col): x=j/(W-1), y=(H-i)/(H-1)
    W = H = 8
    j = np.tile(np.arange(W), H).astype(np.float64)
    i = np.repeat(np.arange(H), W).astype(np.float64)
    x = j / (W - 1)
    y = (H - i) / (H - 1)
    _, d_ref = generate_rays_np(cam, x, y)
    # jitter is at most half a pixel -> direction deviation is bounded
    cos = np.sum(d * d_ref, axis=1)
    assert cos.min() > 0.99
    # top-left pixel's unjittered y overshoots to H/(H-1) (reference quirk):
    assert y[0] == pytest.approx(8 / 7)


def test_camera_is_differentiable():
    cam = _cam(4, 4)

    def loss(eye):
        import dataclasses

        c = dataclasses.replace(cam, eye=eye)
        _, d = generate_rays(c, jax.random.PRNGKey(0))
        return (d ** 2).sum() + (d[:, 2]).mean()

    g = jax.grad(loss)(cam.eye)
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.abs(np.asarray(g)).sum() > 0
