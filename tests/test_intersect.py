"""Intersection tests: Möller–Trumbore vs analytic expectations and vs an
independent implementation of the reference's plane+inside test
(bvh.cpp:177-209); brute-force vs BVH traversal equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinyraytracing_tpu.config import RenderConfig
from tinyraytracing_tpu.ops.intersect import brute_force_intersect, moller_trumbore
from tinyraytracing_tpu.ops.traverse import bvh_intersect

CFG = RenderConfig()


def _ref_plane_test(org, d, v0, v1, v2, t_min=5e-4, eps=1e-5):
    """Independent numpy replica of the reference interactTriangle
    (bvh.cpp:177-209) for cross-validation."""
    n = np.cross(v1 - v0, v2 - v0)
    n = n / np.linalg.norm(n)
    ndd = np.dot(n, d)
    if abs(ndd) < eps:
        return None
    t = np.dot(v0 - org, n) / ndd
    if t < t_min:
        return None
    p = org + t * d
    c1 = np.cross(v1 - v0, p - v0)
    c2 = np.cross(v2 - v1, p - v1)
    c3 = np.cross(v0 - v2, p - v2)
    d1, d2, d3 = np.dot(c1, n), np.dot(c2, n), np.dot(c3, n)
    if (d1 > 0 and d2 > 0 and d3 > 0) or (d1 < 0 and d2 < 0 and d3 < 0):
        return t
    return None


def test_mt_against_reference_plane_test(rng):
    hits_mt = 0
    for _ in range(300):
        v = rng.uniform(-1, 1, (3, 3))
        org = rng.uniform(-2, 2, 3)
        # aim at a random point near the centroid so a good fraction hit
        target = v.mean(axis=0) + rng.normal(scale=0.3, size=3)
        d = target - org
        d /= np.linalg.norm(d)
        gn = np.cross(v[1] - v[0], v[2] - v[0])
        gn = gn / np.linalg.norm(gn)
        t, u, uu, ok = jax.tree.map(
            np.asarray,
            moller_trumbore(
                jnp.asarray(org[None], jnp.float32),
                jnp.asarray(d[None], jnp.float32),
                jnp.asarray(v[0][None], jnp.float32),
                jnp.asarray(v[1][None], jnp.float32),
                jnp.asarray(v[2][None], jnp.float32),
                jnp.asarray(gn[None], jnp.float32),
                CFG,
            ),
        )
        ref_t = _ref_plane_test(org, d, *v)
        if ok[0, 0] and ref_t is not None:
            assert t[0, 0] == pytest.approx(ref_t, rel=1e-3)
            hits_mt += 1
        elif ok[0, 0] != (ref_t is not None):
            # disagreement allowed only near the triangle boundary (the
            # reference uses strict inequalities, we use >=)
            pass
    assert hits_mt > 20  # sanity: the sampling actually produced hits


def test_barycentric_point_reconstruction(rng):
    v0 = np.array([0.0, 0, 0]); v1 = np.array([2.0, 0, 0]); v2 = np.array([0.0, 3, 0])
    org = np.array([0.5, 0.5, -5.0])
    d = np.array([0.0, 0, 1.0])
    gn = np.array([0.0, 0, 1.0])
    t, u, v, ok = jax.tree.map(
        np.asarray,
        moller_trumbore(
            *(jnp.asarray(x[None], jnp.float32) for x in (org, d, v0, v1, v2, gn)),
            CFG,
        ),
    )
    assert bool(ok[0, 0])
    assert t[0, 0] == pytest.approx(5.0)
    w = 1 - u[0, 0] - v[0, 0]
    p = w * v0 + u[0, 0] * v1 + v[0, 0] * v2
    assert p == pytest.approx([0.5, 0.5, 0.0], abs=1e-5)


def test_tmin_culling():
    # a hit closer than 5e-4 must be rejected (reference bvh.cpp:189)
    v0 = np.array([-1.0, -1, 1e-4]); v1 = np.array([1.0, -1, 1e-4]); v2 = np.array([0.0, 2, 1e-4])
    org = np.zeros(3); d = np.array([0.0, 0, 1.0]); gn = np.array([0.0, 0, 1.0])
    *_, ok = moller_trumbore(
        *(jnp.asarray(x[None], jnp.float32) for x in (org, d, v0, v1, v2, gn)), CFG
    )
    assert not bool(ok[0, 0])


def test_emissive_tie_break(test_scene):
    """Two coplanar triangles at the same distance: the emissive one wins
    (reference bvh.cpp:219)."""
    import dataclasses

    s, _cam = test_scene
    # build a 2-triangle scene manually: identical geometry, one emissive
    v0 = jnp.asarray([[0, 0, 1], [0, 0, 1]], jnp.float32)
    v1 = jnp.asarray([[1, 0, 1], [1, 0, 1]], jnp.float32)
    v2 = jnp.asarray([[0, 1, 1], [0, 1, 1]], jnp.float32)
    gn = jnp.asarray([[0, 0, 1], [0, 0, 1]], jnp.float32)
    sc = dataclasses.replace(
        s, v0=v0, v1=v1, v2=v2, gn=gn,
        n0=gn, n1=gn, n2=gn,
        t0=jnp.zeros((2, 2)), t1=jnp.zeros((2, 2)), t2=jnp.zeros((2, 2)),
        tri_mtl=jnp.asarray([0, 1], jnp.int32),
        tri_emissive=jnp.asarray([False, True]),
        bvh=None,
    )
    org = jnp.asarray([[0.2, 0.2, 0.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    hit = brute_force_intersect(sc, org, d, CFG)
    assert bool(hit.hit[0]) and int(hit.idx[0]) == 1


def test_bvh_matches_brute(test_scene, test_scene_bvh, rng):
    scene, _ = test_scene
    sbvh, _ = test_scene_bvh
    R = 512
    org = jnp.asarray(rng.uniform([0, 0, -400], [556, 548, 559], (R, 3)), jnp.float32)
    d = rng.normal(size=(R, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d, jnp.float32)
    h1 = jax.jit(lambda o, dd: brute_force_intersect(scene, o, dd, CFG))(org, d)
    h2 = jax.jit(lambda o, dd: bvh_intersect(sbvh, o, dd, CFG))(org, d)
    np.testing.assert_array_equal(np.asarray(h1.hit), np.asarray(h2.hit))
    m = np.asarray(h1.hit)
    np.testing.assert_allclose(
        np.asarray(h1.t)[m], np.asarray(h2.t)[m], rtol=1e-5, atol=1e-4
    )
    # triangle identity via material id (permutation-independent)
    m1 = np.asarray(scene.tri_mtl)[np.asarray(h1.idx)][m]
    m2 = np.asarray(sbvh.tri_mtl)[np.asarray(h2.idx)][m]
    np.testing.assert_array_equal(m1, m2)


def test_bvh_no_early_out_matches(test_scene_bvh, rng):
    test_scene_bvh, _ = test_scene_bvh
    cfg2 = CFG.replace(bvh_early_out=False)
    R = 256
    org = jnp.asarray(rng.uniform([0, 0, -400], [556, 548, 559], (R, 3)), jnp.float32)
    d = rng.normal(size=(R, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d, jnp.float32)
    h1 = bvh_intersect(test_scene_bvh, org, d, CFG)
    h2 = bvh_intersect(test_scene_bvh, org, d, cfg2)
    np.testing.assert_array_equal(np.asarray(h1.hit), np.asarray(h2.hit))
    np.testing.assert_allclose(np.asarray(h1.t), np.asarray(h2.t), rtol=1e-6)


def test_mxu_matches_brute(test_scene, rng):
    """The Woop-transform matmul intersector (MXU path) must agree with
    Möller–Trumbore on hits, distances, and same-index barycentrics."""
    from tinyraytracing_tpu.ops.intersect import mxu_intersect

    scene, _ = test_scene
    R = 512
    org = jnp.asarray(rng.uniform([0, 0, -400], [556, 548, 559], (R, 3)), jnp.float32)
    d = rng.normal(size=(R, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d, jnp.float32)
    h1 = brute_force_intersect(scene, org, d, CFG)
    h2 = mxu_intersect(scene, org, d, CFG)
    np.testing.assert_array_equal(np.asarray(h1.hit), np.asarray(h2.hit))
    m = np.asarray(h1.hit)
    np.testing.assert_allclose(np.asarray(h1.t)[m], np.asarray(h2.t)[m], rtol=1e-4, atol=1e-2)
    same = m & (np.asarray(h1.idx) == np.asarray(h2.idx))
    assert same.sum() / m.sum() > 0.99  # shared-edge ties may differ
    np.testing.assert_allclose(np.asarray(h1.u)[same], np.asarray(h2.u)[same], atol=1e-4)


def test_pallas_matches_mxu(test_scene, rng):
    """The fused Pallas kernel must agree exactly with the XLA mxu backend
    (runs in interpret mode on the CPU test backend)."""
    from tinyraytracing_tpu.ops.intersect import mxu_intersect
    from tinyraytracing_tpu.ops.pallas_intersect import pallas_intersect

    scene, _ = test_scene
    for R in (2048, 1000):  # even and uneven tile counts
        org = jnp.asarray(
            rng.uniform([0, 0, -400], [556, 548, 559], (R, 3)), jnp.float32
        )
        d = rng.normal(size=(R, 3))
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        d = jnp.asarray(d, jnp.float32)
        h1 = mxu_intersect(scene, org, d, CFG.replace(tri_chunk=128))
        h2 = pallas_intersect(scene, org, d, CFG.replace(tri_chunk=128))
        np.testing.assert_array_equal(np.asarray(h1.hit), np.asarray(h2.hit))
        m = np.asarray(h1.hit)
        np.testing.assert_array_equal(np.asarray(h1.idx)[m], np.asarray(h2.idx)[m])
        # the kernel computes the K=3 contraction as FMA chains; rounding
        # differs from the XLA HIGHEST-precision matmul in final ulps
        np.testing.assert_allclose(np.asarray(h1.t)[m], np.asarray(h2.t)[m], rtol=1e-4, atol=1e-3)


def test_packet_bvh_matches_while_loop(test_scene_bvh, rng):
    """Pallas packet BVH traversal vs the while_loop traversal (interpret
    mode), on the test scene and on a larger procedural grid."""
    from tinyraytracing_tpu.models.procedural import quad_grid
    from tinyraytracing_tpu.ops.pallas_bvh import pallas_bvh_intersect

    scenes = [test_scene_bvh[0], quad_grid(3000, width=8, height=8)[0]]
    for scene in scenes:
        R = 1024
        org = jnp.asarray(
            rng.uniform([50, 50, -400], [500, 500, 500], (R, 3)), jnp.float32
        )
        d = rng.normal(size=(R, 3))
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        d = jnp.asarray(d, jnp.float32)
        h1 = bvh_intersect(scene, org, d, CFG)
        h2 = pallas_bvh_intersect(scene, org, d, CFG)
        np.testing.assert_array_equal(np.asarray(h1.hit), np.asarray(h2.hit))
        m = np.asarray(h1.hit)
        assert (np.asarray(h1.idx)[m] == np.asarray(h2.idx)[m]).mean() > 0.999
        np.testing.assert_allclose(
            np.asarray(h1.t)[m], np.asarray(h2.t)[m], rtol=1e-4, atol=1e-3
        )
