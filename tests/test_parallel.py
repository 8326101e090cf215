"""Sharded-render tests on the 8-fake-device CPU mesh (conftest forces
--xla_force_host_platform_device_count=8): determinism, mesh-shape
consistency, and agreement with the single-device renderer."""

import dataclasses

import jax
import numpy as np
import pytest

from tinyraytracing_tpu.config import RenderConfig
from tinyraytracing_tpu.models.procedural import cornell_box
from tinyraytracing_tpu.parallel.mesh import make_mesh, render_sharded

CFG = RenderConfig(intersector="brute", max_depth=3, ray_chunk=1024, tri_chunk=64)


@pytest.fixture(scope="module")
def scene_cam():
    return cornell_box(width=16, height=16)


def test_eight_devices_present():
    assert len(jax.devices()) == 8


def test_sharded_deterministic(scene_cam):
    scene, cam = scene_cam
    mesh = make_mesh(n_tile=4, n_spp=2)
    a = np.asarray(render_sharded(scene, cam, jax.random.PRNGKey(0), CFG, mesh, spp=4))
    b = np.asarray(render_sharded(scene, cam, jax.random.PRNGKey(0), CFG, mesh, spp=4))
    np.testing.assert_array_equal(a, b)


def test_mesh_shapes_statistically_consistent(scene_cam):
    scene, cam = scene_cam
    spp = 64
    imgs = []
    for n_tile, n_spp in [(8, 1), (4, 2), (2, 4)]:
        mesh = make_mesh(n_tile=n_tile, n_spp=n_spp)
        imgs.append(
            np.asarray(
                render_sharded(scene, cam, jax.random.PRNGKey(1), CFG, mesh, spp=spp)
            )
        )
    for img in imgs[1:]:
        assert abs(img.mean() - imgs[0].mean()) / imgs[0].mean() < 0.1


def test_sharded_matches_single_device(scene_cam):
    scene, cam = scene_cam
    from tinyraytracing_tpu.render import render

    spp = 128
    mesh = make_mesh(n_tile=8, n_spp=1)
    a = np.asarray(render_sharded(scene, cam, jax.random.PRNGKey(2), CFG, mesh, spp=spp))
    b = np.asarray(render(scene, cam, jax.random.PRNGKey(2), CFG, spp))
    # different RNG stream layouts -> compare statistically at enough spp
    # that a 10% mean gap is well outside MC noise (~2% at 16x16x128)
    assert abs(a.mean() - b.mean()) / b.mean() < 0.1
    assert np.isfinite(a).all() and (a >= 0).all()


def test_uneven_pixel_count(scene_cam):
    scene, cam = scene_cam
    cam = dataclasses.replace(cam, width=15, height=13)  # 195 px, not /8
    mesh = make_mesh(n_tile=8, n_spp=1)
    img = np.asarray(render_sharded(scene, cam, jax.random.PRNGKey(3), CFG, mesh, spp=2))
    assert img.shape == (13, 15, 3)
    assert np.isfinite(img).all()


def test_uneven_spp(scene_cam):
    scene, cam = scene_cam
    mesh = make_mesh(n_tile=2, n_spp=4)
    img = np.asarray(render_sharded(scene, cam, jax.random.PRNGKey(4), CFG, mesh, spp=5))
    assert np.isfinite(img).all() and img.mean() > 0


# ---------------------------------------------------------------------------
# sharded FUSED renderer (the fast path)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def scene_cam_bvh():
    from tinyraytracing_tpu.ops.bvh import attach_bvh

    scene, cam = cornell_box(width=32, height=32)
    return attach_bvh(scene, RenderConfig()), cam


def test_fused_sharded_bitwise_matches_single_device(scene_cam_bvh):
    """Path-indexed RNG makes the fused renderer's output a function of
    (pixel, sample) only — so 8-way tile sharding must be BITWISE equal to
    the single-device render (SURVEY §5: same seed => bitwise-equal image
    across shardings)."""
    from tinyraytracing_tpu.integrator.fused import render_fused_jit
    from tinyraytracing_tpu.parallel.mesh import render_fused_sharded

    scene, cam = scene_cam_bvh
    cfg = RenderConfig(intersector="bvh", max_depth=4)
    key = jax.random.PRNGKey(5)
    single = np.asarray(render_fused_jit(scene, cam, key, cfg, 4, lanes=512))
    for n_tile in (8, 4):
        mesh = make_mesh(n_tile=n_tile, n_spp=8 // n_tile)
        img, rays = render_fused_sharded(scene, cam, key, cfg, 4, mesh, lanes=512)
        np.testing.assert_array_equal(np.asarray(img), single)
        assert float(rays) > 0


def test_fused_sharded_uneven_pixels(scene_cam_bvh):
    """Pixel count not divisible by the device count."""
    from tinyraytracing_tpu.integrator.fused import render_fused_jit
    from tinyraytracing_tpu.parallel.mesh import render_fused_sharded

    scene, cam = scene_cam_bvh
    cam = dataclasses.replace(cam, width=20, height=13)  # 260 = 4*65
    cfg = RenderConfig(intersector="bvh", max_depth=3)
    key = jax.random.PRNGKey(6)
    single = np.asarray(render_fused_jit(scene, cam, key, cfg, 2, lanes=256))
    mesh = make_mesh(n_tile=8, n_spp=1)
    img, _ = render_fused_sharded(scene, cam, key, cfg, 2, mesh, lanes=256)
    np.testing.assert_array_equal(np.asarray(img), single)


def test_queue_sharded_matches_single_device(scene_cam_bvh):
    """Path-queue sharding of the queue-fed fused renderer: 8 devices each
    serve a slice of the global path queue; psum'd partial images must
    agree with the single-device render (allclose, not bitwise — the
    scatter-add order into a pixel differs; radiance per path is identical
    because the RNG is path-indexed)."""
    from tinyraytracing_tpu.integrator.fused_queue import render_fused_queue_jit
    from tinyraytracing_tpu.parallel.mesh import render_queue_sharded

    scene, cam = scene_cam_bvh
    cfg = RenderConfig(intersector="bvh", max_depth=4)
    key = jax.random.PRNGKey(11)
    single = np.asarray(render_fused_queue_jit(scene, cam, key, cfg, 4, lanes=512))
    mesh = make_mesh(n_tile=8, n_spp=1)
    img, rays = render_queue_sharded(scene, cam, key, cfg, 4, mesh, lanes=512)
    np.testing.assert_allclose(np.asarray(img), single, rtol=2e-5, atol=2e-5)
    assert float(rays) > 0


def test_queue_sharded_uneven_paths(scene_cam_bvh):
    """Global path count not divisible by the device count: the tail
    device's queue slice extends past W*H*spp and those ids must never
    start (no duplicated or phantom contributions)."""
    from tinyraytracing_tpu.integrator.fused_queue import render_fused_queue_jit
    from tinyraytracing_tpu.parallel.mesh import render_queue_sharded

    scene, cam = scene_cam_bvh
    cam = dataclasses.replace(cam, width=19, height=11)  # 209 px * 3 spp = 627
    cfg = RenderConfig(intersector="bvh", max_depth=3)
    key = jax.random.PRNGKey(12)
    single = np.asarray(render_fused_queue_jit(scene, cam, key, cfg, 3, lanes=256))
    mesh = make_mesh(n_tile=8, n_spp=1)
    img, _ = render_queue_sharded(scene, cam, key, cfg, 3, mesh, lanes=256)
    np.testing.assert_allclose(np.asarray(img), single, rtol=2e-5, atol=2e-5)

def test_queue_sharded_chunked_matches_one_shot():
    """The production chunked driver, sharded, with preempt -> snapshot ->
    resume, must reproduce the one-shot sharded render exactly.

    Runs in a subprocess: a multi-partition while_loop program executed
    earlier in this pytest process (the tests above) deadlocks the chunk
    step's dispatch on the virtual-CPU backend (jax-0.9 runtime quirk);
    chunked-first in a fresh process is the supported order there.
    """
    import os
    import subprocess
    import sys
    import textwrap

    script = textwrap.dedent("""
        import jax
        jax.config.update("jax_platforms", "cpu")
        import numpy as np
        from tinyraytracing_tpu.config import RenderConfig
        from tinyraytracing_tpu.models.procedural import quad_grid
        from tinyraytracing_tpu.ops.bvh import attach_bvh
        from tinyraytracing_tpu.parallel.mesh import (
            make_mesh, render_queue_sharded, render_queue_sharded_chunked)
        config = RenderConfig(intersector="brute", max_depth=2,
                              ray_chunk=1024, spp=2, tri_chunk=64)
        scene, cam = quad_grid(1024, width=16, height=16)
        scene = attach_bvh(scene, config)
        mesh = make_mesh(n_tile=8, n_spp=1, devices=jax.devices()[:8])
        key = jax.random.PRNGKey(3)
        ck = "/tmp/test_queue_chunk_ck.npz"
        a, _ = render_queue_sharded_chunked(
            scene, cam, key, config, spp=32, mesh=mesh, lanes=256)
        part = []
        render_queue_sharded_chunked(
            scene, cam, key, config, spp=32, mesh=mesh, lanes=256,
            checkpoint_path=ck, stop_after_chunks=1,
            progress=lambda **kw: part.append(kw["it"]))
        import os as _os
        assert _os.path.exists(ck)
        half = []
        b, _ = render_queue_sharded_chunked(
            scene, cam, key, config, spp=32, mesh=mesh, lanes=256,
            checkpoint_path=ck, resume=True,
            progress=lambda **kw: half.append(kw["it"]))
        assert half[0] > part[-1], "resume restarted from scratch"
        c, _ = render_queue_sharded(
            scene, cam, key, config, spp=32, mesh=mesh, lanes=256)
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=2e-5, atol=2e-6)
        np.testing.assert_allclose(np.asarray(b), np.asarray(c),
                                   rtol=2e-5, atol=2e-6)
        print("CHUNKED-SHARDED-OK")
    """)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    if "--xla_force_host_platform_device_count=" not in env.get("XLA_FLAGS", ""):
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8"
        ).strip()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "-c", script], env=env, cwd=repo,
        capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0 and "CHUNKED-SHARDED-OK" in proc.stdout, (
        proc.stdout + "\n" + proc.stderr
    )


def test_fast_grad_path_sharded_matches_single_device(scene_cam_bvh):
    """render_loss_fast_sharded (round 5): the custom-VJP fused gradient
    path under shard_map — loss AND parameter gradients must match the
    single-device render_loss_fast (pixel values are partition-independent
    via path-indexed RNG; only reduction order differs)."""
    import jax.numpy as jnp

    from tinyraytracing_tpu.diff.fast import render_loss_fast
    from tinyraytracing_tpu.diff.inverse import SceneParams
    from tinyraytracing_tpu.parallel.mesh import render_loss_fast_sharded

    scene, cam = scene_cam_bvh
    cfg = RenderConfig(intersector="bvh", max_depth=2, ray_chunk=1024)
    key = jax.random.PRNGKey(7)
    target = jnp.zeros((cam.height, cam.width, 3), jnp.float32)
    params = SceneParams.init_from(scene, cam, "kd", "vertex_offset", "eye")
    mesh = make_mesh(n_tile=8, n_spp=1)

    loss1, g1 = jax.value_and_grad(
        lambda p: render_loss_fast(p, scene, cam, key, target, cfg, 2)
    )(params)
    loss8, g8 = jax.value_and_grad(
        lambda p: render_loss_fast_sharded(p, scene, cam, key, target, cfg,
                                           2, mesh)
    )(params)
    np.testing.assert_allclose(float(loss8), float(loss1), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g8)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=1e-6)
    assert float(sum(jnp.abs(x).sum()
                     for x in jax.tree_util.tree_leaves(g8))) > 0
