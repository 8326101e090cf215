"""Integrator tests on the 26-triangle reference smoke scene (test/back):
estimator structure, determinism, intersector equivalence at the image
level, and basic physical sanity."""

import dataclasses

import jax
import numpy as np
import pytest

from tinyraytracing_tpu.config import RenderConfig
from tinyraytracing_tpu.render import render

CFG = RenderConfig(intersector="brute", ray_chunk=4096)
SIZE = 24
SPP = 4


def _small_cam(cam, size=SIZE):
    return dataclasses.replace(cam, width=size, height=size)


@pytest.fixture(scope="module")
def small_render(test_scene):
    scene, cam = test_scene
    cam = _small_cam(cam)
    img = render(scene, cam, jax.random.PRNGKey(7), CFG, SPP)
    return np.asarray(img)


def test_image_finite_nonnegative(small_render):
    assert small_render.shape == (SIZE, SIZE, 3)
    assert np.isfinite(small_render).all()
    assert (small_render >= 0).all()
    assert small_render.mean() > 0.01  # scene is lit


def test_light_pixels_return_radiance(test_scene):
    """Camera rays that hit the emissive panel must return exactly its
    radiance (34, 24, 8) — reference pathTracing.cpp:9-12."""
    scene, cam = test_scene
    cam = _small_cam(cam, 48)
    img = np.asarray(render(scene, cam, jax.random.PRNGKey(3), CFG, 1))
    # light panel is on the ceiling near image center-top; find any pixel
    # with the exact radiance ratio 34:24:8
    mx = img.reshape(-1, 3).max(axis=0)
    assert mx[0] == pytest.approx(34.0, abs=1e-3)


def test_determinism(test_scene):
    scene, cam = test_scene
    cam = _small_cam(cam, 16)
    a = np.asarray(render(scene, cam, jax.random.PRNGKey(5), CFG, 2))
    b = np.asarray(render(scene, cam, jax.random.PRNGKey(5), CFG, 2))
    np.testing.assert_array_equal(a, b)
    c = np.asarray(render(scene, cam, jax.random.PRNGKey(6), CFG, 2))
    assert not np.array_equal(a, c)


def test_bvh_equals_brute_image(test_scene, test_scene_bvh):
    """Same key + same estimator decisions -> the BVH image must match the
    brute-force image to float tolerance."""
    scene, cam = test_scene
    sbvh, _ = test_scene_bvh
    cam = _small_cam(cam, 16)
    a = np.asarray(render(scene, cam, jax.random.PRNGKey(9), CFG, 2))
    cfg_bvh = CFG.replace(intersector="bvh")
    b = np.asarray(render(sbvh, cam, jax.random.PRNGKey(9), cfg_bvh, 2))
    # ULP-level t differences (different vectorization widths) can
    # decorrelate individual RR paths, so compare noise-aware: almost all
    # pixels bitwise-close, aggregate means tight.
    close = np.isclose(a, b, rtol=1e-4, atol=1e-4)
    assert close.mean() > 0.95
    assert abs(a.mean() - b.mean()) / a.mean() < 0.02


def test_ray_chunking_invariance(test_scene):
    """Chunk size must not change the estimate (same fold_in per chunk
    index would break this if keys were chunk-dependent...). We only check
    the mean is stable because per-ray keys ARE chunk-indexed."""
    scene, cam = test_scene
    cam = _small_cam(cam, 16)
    a = np.asarray(render(scene, cam, jax.random.PRNGKey(4), CFG, 2))
    b = np.asarray(
        render(scene, cam, jax.random.PRNGKey(4), CFG.replace(ray_chunk=128), 2)
    )
    assert abs(a.mean() - b.mean()) / a.mean() < 0.25


def test_depth_truncation_small(test_scene):
    """Radiance added beyond depth 8 should be a small fraction (RR 0.8 x
    albedo decay)."""
    scene, cam = test_scene
    cam = _small_cam(cam, 16)
    a = np.asarray(render(scene, cam, jax.random.PRNGKey(2), CFG.replace(max_depth=4), 4))
    b = np.asarray(render(scene, cam, jax.random.PRNGKey(2), CFG.replace(max_depth=10), 4))
    rel = abs(b.mean() - a.mean()) / b.mean()
    assert rel < 0.25


def test_regen_matches_scan_statistically(test_scene):
    """The regeneration wavefront must estimate the same image as the
    fixed-depth scan (different schedule + RNG mapping -> statistical
    comparison)."""
    from tinyraytracing_tpu.integrator.regen import render_regen_jit
    from tinyraytracing_tpu.models.procedural import cornell_box

    scene, _ = cornell_box(width=24, height=24), None
    scene, cam = cornell_box(width=24, height=24)
    cfg = RenderConfig(intersector="mxu", max_depth=8, tri_chunk=64)
    a = np.asarray(render(scene, cam, jax.random.PRNGKey(3), cfg, 16))
    b = np.asarray(render_regen_jit(scene, cam, jax.random.PRNGKey(3), cfg, 16, lanes=4096))
    assert np.isfinite(b).all() and (b >= 0).all()
    assert abs(a.mean() - b.mean()) / a.mean() < 0.1
    corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
    assert corr > 0.9, corr


def test_regen_deterministic(test_scene):
    from tinyraytracing_tpu.integrator.regen import render_regen_jit
    from tinyraytracing_tpu.models.procedural import cornell_box

    scene, cam = cornell_box(width=16, height=16)
    cfg = RenderConfig(intersector="mxu", max_depth=4, tri_chunk=64)
    a = np.asarray(render_regen_jit(scene, cam, jax.random.PRNGKey(1), cfg, 4, lanes=512))
    b = np.asarray(render_regen_jit(scene, cam, jax.random.PRNGKey(1), cfg, 4, lanes=512))
    np.testing.assert_array_equal(a, b)
    # lane count must not change the set of traced paths' statistics much
    c = np.asarray(render_regen_jit(scene, cam, jax.random.PRNGKey(1), cfg, 4, lanes=2048))
    assert abs(a.mean() - c.mean()) / a.mean() < 0.3


def test_persistent_matches_scan_statistically(test_scene):
    """The pixel-persistent wavefront (scatter-free scheduling) must
    estimate the same image as the fixed-depth scan."""
    from tinyraytracing_tpu.integrator.regen import render_persistent_jit
    from tinyraytracing_tpu.models.procedural import cornell_box

    scene, cam = cornell_box(width=24, height=24)
    cfg = RenderConfig(intersector="mxu", max_depth=8, tri_chunk=64)
    a = np.asarray(render(scene, cam, jax.random.PRNGKey(3), cfg, 16))
    b = np.asarray(
        render_persistent_jit(scene, cam, jax.random.PRNGKey(3), cfg, 16, lanes=4096)
    )
    assert np.isfinite(b).all() and (b >= 0).all()
    assert abs(a.mean() - b.mean()) / a.mean() < 0.1
    corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
    assert corr > 0.9, corr


def test_persistent_deterministic_and_epochs(test_scene):
    """Bitwise-deterministic per key; the multi-epoch path (lanes < n_pix)
    must tile the image without seams or double-writes."""
    from tinyraytracing_tpu.integrator.regen import render_persistent_jit
    from tinyraytracing_tpu.models.procedural import cornell_box

    scene, cam = cornell_box(width=16, height=16)
    cfg = RenderConfig(intersector="mxu", max_depth=4, tri_chunk=64)
    a = np.asarray(render_persistent_jit(scene, cam, jax.random.PRNGKey(1), cfg, 4, lanes=256))
    b = np.asarray(render_persistent_jit(scene, cam, jax.random.PRNGKey(1), cfg, 4, lanes=256))
    np.testing.assert_array_equal(a, b)
    # epochs: 64-lane pool over 256 pixels = 4 dense epoch writes; bounce
    # RNG is iteration-keyed (like render_regen), so different lane counts
    # give a different-but-valid estimate of the same image
    c = np.asarray(render_persistent_jit(scene, cam, jax.random.PRNGKey(1), cfg, 4, lanes=64))
    assert np.isfinite(c).all() and (c >= 0).all()
    assert abs(a.mean() - c.mean()) / a.mean() < 0.3
