"""Checkpoint/resume and observability-report tests."""

import os

import numpy as np
import pytest

from tinyraytracing_tpu.config import RenderConfig
from tinyraytracing_tpu.models.procedural import cornell_box
from tinyraytracing_tpu.utils.checkpoint import render_checkpointed
from tinyraytracing_tpu.utils.report import bvh_depth, profiled_render

CFG = RenderConfig(intersector="mxu", max_depth=2, ray_chunk=1024, tri_chunk=64)


def test_checkpoint_resume_bitwise(tmp_path):
    scene, cam = cornell_box(width=12, height=12)
    p1 = str(tmp_path / "a.npz")
    img_full = render_checkpointed(scene, cam, CFG, spp=6, ckpt_path=p1, chunk=6)

    # interrupted: run 3 passes (chunk=3 -> checkpoint at 3), then "resume"
    p2 = str(tmp_path / "b.npz")
    calls = []

    def stop_after_first(done, spp):
        calls.append(done)
        if len(calls) == 1:
            raise KeyboardInterrupt

    try:
        render_checkpointed(
            scene, cam, CFG, spp=6, ckpt_path=p2, chunk=3, progress=stop_after_first
        )
    except KeyboardInterrupt:
        pass
    assert os.path.exists(p2)
    img_resumed = render_checkpointed(scene, cam, CFG, spp=6, ckpt_path=p2, chunk=3)
    np.testing.assert_array_equal(img_full, img_resumed)


def test_incompatible_checkpoint_restarts(tmp_path):
    scene, cam = cornell_box(width=12, height=12)
    p = str(tmp_path / "c.npz")
    render_checkpointed(scene, cam, CFG, spp=2, ckpt_path=p, chunk=2)
    # different seed must ignore the stale checkpoint, not blend into it
    img = render_checkpointed(scene, cam, CFG, spp=2, ckpt_path=p, seed=9, chunk=2)
    assert np.isfinite(img).all()


def test_bvh_depth():
    # chain: root(internal) -> leaf at depth 1 + leaf at depth 1
    skip = np.array([3, 2, 3], np.int32)  # root covers [0,3); two leaves
    assert bvh_depth(skip) == 2
    assert bvh_depth(np.array([1], np.int32)) == 1


def test_profiled_render_report():
    scene, cam = cornell_box(width=12, height=12)
    img, rep = profiled_render(scene, cam, CFG, spp=2)
    assert img.shape == (12, 12, 3)
    assert rep.num_triangles == 32
    assert rep.rays_traced > 12 * 12 * 2  # at least primaries + some shadows
    assert rep.rays_per_s > 0
    assert "rays_per_s" in rep.to_json()


def test_threefry_planar_uniformity_and_determinism():
    import jax
    import jax.numpy as jnp

    from tinyraytracing_tpu.ops.rng import (
        bounce_uniforms, master_key_data, path_keys)

    kd = master_key_data(jax.random.PRNGKey(7))
    pid = jnp.arange(1 << 14, dtype=jnp.int32)
    k0, k1 = path_keys(kd, pid)
    us = bounce_uniforms(k0, k1, jnp.zeros_like(pid), 7)
    u = np.asarray(jnp.stack(us))
    assert u.shape == (7, 1 << 14)
    assert (u >= 0).all() and (u < 1).all()
    assert abs(u.mean() - 0.5) < 0.01
    assert abs(u.std() - np.sqrt(1 / 12)) < 0.01
    # counter-based: same inputs -> identical, different bounce -> different
    v = bounce_uniforms(k0, k1, jnp.zeros_like(pid), 7)
    np.testing.assert_array_equal(u, np.asarray(jnp.stack(v)))
    w = bounce_uniforms(k0, k1, jnp.ones_like(pid), 7)
    assert not np.array_equal(u[0], np.asarray(w[0]))
    # lane-1 shifted path ids give decorrelated streams
    c = np.corrcoef(u[0][:-1], u[0][1:])[0, 1]
    assert abs(c) < 0.05


def test_prefix_sum_lanes_exact():
    import jax.numpy as jnp

    from tinyraytracing_tpu.ops.scan import prefix_sum_lanes

    rng_ = np.random.default_rng(3)
    for n in (5, 127, 128, 1024, 4097, 70000):
        x = rng_.integers(0, 3, n).astype(np.int32)
        got = np.asarray(prefix_sum_lanes(jnp.asarray(x)))
        np.testing.assert_array_equal(got, np.cumsum(x))
        assert got.dtype == np.int32
    b = rng_.integers(0, 2, 2048).astype(bool)
    np.testing.assert_array_equal(
        np.asarray(prefix_sum_lanes(jnp.asarray(b))), np.cumsum(b)
    )


def test_threefry_planar_fixed_vectors():
    """Pin the planar threefry stream: any refactor that changes these
    values silently changes every rendered image."""
    import jax.numpy as jnp

    from tinyraytracing_tpu.ops.rng import threefry2x32

    k0 = jnp.asarray([0x12345678, 0, 0xFFFFFFFF], jnp.uint32)
    k1 = jnp.asarray([0x9ABCDEF0, 0, 0xFFFFFFFF], jnp.uint32)
    c0 = jnp.asarray([0, 1, 0xDEADBEEF], jnp.uint32)
    c1 = jnp.asarray([0, 2, 0xCAFEBABE], jnp.uint32)
    r0, r1 = threefry2x32(k0, k1, c0, c1)
    got = np.stack([np.asarray(r0), np.asarray(r1)])
    # recorded once from the shipped implementation (see docstring)
    pinned = np.asarray(_THREEFRY_PINNED, np.uint32)
    np.testing.assert_array_equal(got, pinned)
    # ... and since round 4 the schedule is the STANDARD Threefry-2x32-20,
    # so the stream must be bit-identical to jax's own implementation.
    # The cross-check imports a private jax module; the pinned vectors
    # above already guard the stream, so a jax relayout of that module
    # skips the redundant check instead of failing the suite.
    try:
        from jax._src.prng import threefry_2x32
    except ImportError:
        pytest.skip("jax private threefry module moved; pinned vectors above still guard the stream")

    for i in range(3):
        ref = threefry_2x32(
            jnp.asarray([int(k0[i]), int(k1[i])], jnp.uint32),
            jnp.asarray([int(c0[i]), int(c1[i])], jnp.uint32),
        )
        assert int(ref[0]) == int(r0[i]) and int(ref[1]) == int(r1[i])


_THREEFRY_PINNED = [[3978822521, 1390163619, 2952086823], [2696639427, 3131650755, 4024725739]]  # recorded 2026-08-21 (standard 20-round schedule)
