"""Fused trace kernel (ops/pallas_trace.py) + gather-free lookups
(ops/lookup.py) + fused renderer (integrator/fused.py).

The kernel's contract: identical hit set to every other intersector
(reference acceptance rules, RayTracingOnCPU/bvh.cpp:146-229) AND the
barycentric-interpolated shading attributes equal to what the integrator
previously computed with XLA gathers from (t, idx, u, v).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinyraytracing_tpu.config import RenderConfig
from tinyraytracing_tpu.ops.lookup import chain_lookup, chain_lookup_planes

CFG = RenderConfig(intersector="bvh")


def _rays(rng, n, center=(0.0, 0.5, 2.0), spread=0.2):
    org = rng.uniform(-1, 1, (n, 3)) * spread + np.asarray(center)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(org, jnp.float32), jnp.asarray(d, jnp.float32)


def _reference_attrs(scene, hit):
    """Shading attributes the old way: gathers from (idx, u, v)."""
    idx = np.asarray(hit.idx)
    u = np.asarray(hit.u)
    v = np.asarray(hit.v)
    w = 1.0 - u - v
    interp = lambda a, b, c: (
        np.asarray(a)[idx] * w[:, None]
        + np.asarray(b)[idx] * u[:, None]
        + np.asarray(c)[idx] * v[:, None]
    )
    return dict(
        pn=interp(scene.n0, scene.n1, scene.n2),
        tc=interp(scene.t0, scene.t1, scene.t2)[:, :2],
        mtl=np.asarray(scene.tri_mtl)[idx],
        em=np.asarray(scene.tri_emissive)[idx],
    )


def _check_fused(scene, org, d, cfg):
    from tinyraytracing_tpu.ops.intersect import intersect
    from tinyraytracing_tpu.ops.pallas_trace import fused_trace_planes

    hit = intersect(scene, org, d, cfg)
    t, pnx, pny, pnz, tcu, tcv, mtl, em = fused_trace_planes(
        scene, org[:, 0], org[:, 1], org[:, 2], d[:, 0], d[:, 1], d[:, 2],
        cfg, force_kernel=True,   # interpret-mode kernel, not the CPU fallback
    )
    t_ref = np.asarray(hit.t)
    t_new = np.asarray(t)
    h = t_ref < 1e38
    assert np.array_equal(h, t_new < 1e38), "hit sets differ"
    np.testing.assert_allclose(t_new[h], t_ref[h], rtol=1e-5, atol=1e-6)

    ref = _reference_attrs(scene, hit)
    pn_new = np.stack([pnx, pny, pnz], -1)
    tc_new = np.stack([tcu, tcv], -1)
    np.testing.assert_allclose(pn_new[h], ref["pn"][h], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(tc_new[h], ref["tc"][h], rtol=1e-4, atol=1e-4)
    assert np.array_equal(np.asarray(mtl)[h].astype(np.int32), ref["mtl"][h])
    assert np.array_equal(np.asarray(em)[h] > 0.5, ref["em"][h])


def test_fused_trace_matches_gather_path(test_scene_bvh, rng):
    scene, _ = test_scene_bvh
    org, d = _rays(rng, 512)
    _check_fused(scene, org, d, CFG)


def test_fused_trace_hbm_node_variant(test_scene_bvh, rng, monkeypatch):
    """Force the BINARY HBM-node-record kernel (used when the tree exceeds
    the SMEM budget) and check it against the same reference."""
    import tinyraytracing_tpu.ops.pallas_trace as ptr

    monkeypatch.setattr(ptr, "SMEM_NODE_LIMIT", 0)
    scene, _ = test_scene_bvh
    org, d = _rays(rng, 256)
    _check_fused(scene, org, d, CFG.replace(bvh_walk="binary"))


def test_fused_trace_binary_walk(test_scene_bvh, rng):
    """The round-3 binary skip-link walk stays available as the A/B path."""
    scene, _ = test_scene_bvh
    org, d = _rays(rng, 256)
    _check_fused(scene, org, d, CFG.replace(bvh_walk="binary"))


def test_fused_trace_wide_hbm_variant(test_scene_bvh, rng, monkeypatch):
    """Force the WIDE HBM-row kernel (big trees) and check vs reference."""
    import tinyraytracing_tpu.ops.pallas_trace as ptr

    monkeypatch.setattr(ptr, "SMEM_WIDE_LIMIT", 0)
    scene, _ = test_scene_bvh
    org, d = _rays(rng, 256)
    _check_fused(scene, org, d, CFG)


def test_wide_walk_bitwise_matches_binary_walk(test_scene_bvh, rng):
    """The wide walk must produce BITWISE the binary walk's outputs —
    same leaf set (modulo extra slot tests that can never replace the
    best), same per-slot arithmetic — including under shadow t-bounds
    and target-material early-kill."""
    from tinyraytracing_tpu.ops.pallas_trace import fused_trace_planes

    scene, _ = test_scene_bvh
    org, d = _rays(rng, 384)
    args = (org[:, 0], org[:, 1], org[:, 2], d[:, 0], d[:, 1], d[:, 2])
    tb = jnp.asarray(rng.uniform(0.5, 5.0, 384), jnp.float32)
    tg = jnp.asarray(
        np.where(rng.uniform(size=384) < 0.5, 0.0, -2.0), jnp.float32
    )
    for kwargs in (dict(), dict(t_bound=tb, target_mtl=tg)):
        a = fused_trace_planes(scene, *args, CFG.replace(bvh_walk="wide"),
                               force_kernel=True, return_tri=True, **kwargs)
        b = fused_trace_planes(scene, *args, CFG.replace(bvh_walk="binary"),
                               force_kernel=True, return_tri=True, **kwargs)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_fused_trace_kill_with_return_tri(test_scene_bvh, rng):
    """Target-material early-kill combined with return_tri/attrs: killed
    lanes must report (t=-1, mtl=-3, em=0, tri=-1) exactly like the
    reference path — a stale occluder slot on a killed lane would make the
    diff path replay gradients for a hit the forward reported as killed
    (round-4 advisor finding). pn/tc of killed lanes are undefined by
    contract and not compared."""
    from tinyraytracing_tpu.ops.pallas_trace import fused_trace_planes

    scene, _ = test_scene_bvh
    n = 384
    # genuine shadow-style queries: origins in the box, directions AT a
    # sampled point on the light, bound = that distance. (Arbitrary
    # bounds/targets would make the kill order-dependent — a target-
    # material hit strictly inside the bound is exactly what the planar-
    # light equivalence argument excludes, _walk docstring.)
    org, _ = _rays(rng, n)
    lv0 = np.asarray(scene.lt_v0[0, 0])
    lv1 = np.asarray(scene.lt_v1[0, 0])
    lv2 = np.asarray(scene.lt_v2[0, 0])
    b = rng.uniform(0, 1, (n, 3))
    b /= b.sum(1, keepdims=True)
    lp = b[:, :1] * lv0 + b[:, 1:2] * lv1 + b[:, 2:] * lv2
    to_l = lp - np.asarray(org)
    tb = jnp.asarray(np.linalg.norm(to_l, axis=1), jnp.float32)
    d = jnp.asarray(to_l / np.asarray(tb)[:, None], jnp.float32)
    tg = jnp.full((n,), float(scene.light_mtl[0]), jnp.float32)
    args = (org[:, 0], org[:, 1], org[:, 2], d[:, 0], d[:, 1], d[:, 2])
    kw = dict(t_bound=tb, target_mtl=tg, return_tri=True)
    for walk in ("wide", "binary"):
        ker = fused_trace_planes(scene, *args, CFG.replace(bvh_walk=walk),
                                 force_kernel=True, **kw)
        ref = fused_trace_planes(scene, *args, CFG.replace(bvh_walk=walk),
                                 force_kernel=False, **kw)
        killed = np.asarray(ref[6]) == -3.0
        assert killed.any(), "test did not exercise the kill path"
        # same killed set; killed lanes report the exact sentinel tuple
        np.testing.assert_array_equal(np.asarray(ker[6]) == -3.0, killed)
        for i, sentinel in ((0, -1.0), (7, 0.0), (8, -1.0)):
            np.testing.assert_array_equal(
                np.asarray(ker[i])[killed], np.full(killed.sum(), sentinel)
            )
        # surviving lanes: same hits/materials/triangles, attrs close
        live = ~killed
        for i in (6, 7, 8):
            np.testing.assert_array_equal(np.asarray(ker[i])[live],
                                          np.asarray(ref[i])[live])
        np.testing.assert_allclose(np.asarray(ker[0])[live],
                                   np.asarray(ref[0])[live],
                                   rtol=1e-5, atol=1e-6)
        for i in (1, 2, 3, 4, 5):
            np.testing.assert_allclose(np.asarray(ker[i])[live],
                                       np.asarray(ref[i])[live],
                                       rtol=1e-4, atol=1e-4)


def _shadow_queries(scene, rng, n):
    """Genuine shadow-style queries: origins in the scene, directions at a
    sampled point on light 0, bound = that distance (planar-light regime
    where the kill/seen decomposition is exact — _walk docstring)."""
    org, _ = _rays(rng, n)
    lv0 = np.asarray(scene.lt_v0[0, 0])
    lv1 = np.asarray(scene.lt_v1[0, 0])
    lv2 = np.asarray(scene.lt_v2[0, 0])
    b = rng.uniform(0, 1, (n, 3))
    b /= b.sum(1, keepdims=True)
    lp = b[:, :1] * lv0 + b[:, 1:2] * lv1 + b[:, 2:] * lv2
    to_l = lp - np.asarray(org)
    tb = jnp.asarray(np.linalg.norm(to_l, axis=1), jnp.float32)
    d = jnp.asarray(to_l / np.asarray(tb)[:, None], jnp.float32)
    tg = jnp.full((n,), float(scene.light_mtl[0]), jnp.float32)
    return org, d, tb, tg


def test_occlusion_query_matches_closest_hit_visibility(test_scene_bvh, rng):
    """query="occlusion" (the round-5 any-hit shadow walk) must agree with
    the closest-hit walk's material-equality visibility on genuine shadow
    queries — both walks, and the CPU reference emulation."""
    from tinyraytracing_tpu.ops.pallas_trace import fused_trace_planes

    scene, _ = test_scene_bvh
    org, d, tb, tg = _shadow_queries(scene, rng, 384)
    args = (org[:, 0], org[:, 1], org[:, 2], d[:, 0], d[:, 1], d[:, 2])
    kw = dict(t_bound=tb, target_mtl=tg)
    for walk in ("wide", "binary"):
        cfg = CFG.replace(bvh_walk=walk)
        # old visibility: closest-hit material == target
        _, _, _, _, _, _, smtl, _ = fused_trace_planes(
            scene, *args, cfg, force_kernel=True, attrs=False, **kw
        )
        vis_old = np.asarray(smtl) == np.asarray(tg)
        assert vis_old.any() and not vis_old.all()
        # new: seen & ~killed from the 2-plane occlusion query
        sbt, sseen = fused_trace_planes(
            scene, *args, cfg, force_kernel=True, query="occlusion", **kw
        )
        vis_new = (np.asarray(sseen) > 0.5) & (np.asarray(sbt) >= 0.0)
        np.testing.assert_array_equal(vis_new, vis_old)
        # CPU reference emulation agrees too
        rbt, rseen = fused_trace_planes(
            scene, *args, cfg, force_kernel=False, query="occlusion", **kw
        )
        vis_ref = (np.asarray(rseen) > 0.5) & (np.asarray(rbt) >= 0.0)
        np.testing.assert_array_equal(vis_ref, vis_old)


def test_wide_walk_near_order(test_scene_bvh, rng):
    """walk_order="near" (experimental ordered pushes + stale culling)
    must keep the same hit set and distances as the default preorder walk
    — visit order may only flip tie-band corner cases, none of which
    exist on this scene's random rays."""
    from tinyraytracing_tpu.ops.pallas_trace import fused_trace_planes

    scene, _ = test_scene_bvh
    org, d = _rays(rng, 256)
    args = (org[:, 0], org[:, 1], org[:, 2], d[:, 0], d[:, 1], d[:, 2])
    a = fused_trace_planes(scene, *args,
                           CFG.replace(bvh_walk="wide", walk_order="near"),
                           force_kernel=True)
    b = fused_trace_planes(scene, *args, CFG.replace(bvh_walk="wide"),
                           force_kernel=True)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_fused_trace_on_cornell_synth(rng):
    from tinyraytracing_tpu.models.procedural import cornell_box
    from tinyraytracing_tpu.ops.bvh import attach_bvh

    scene, cam = cornell_box(width=32, height=32)
    scene = attach_bvh(scene, CFG)
    org, d = _rays(rng, 384, center=(278, 273, -500), spread=100.0)
    _check_fused(scene, org, d, CFG)


def test_chain_lookup_matches_indexing(rng):
    tab = jnp.asarray(rng.normal(size=(7, 3)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 7, size=(50,)), jnp.int32)
    np.testing.assert_array_equal(chain_lookup(tab, idx), tab[idx])
    planes = chain_lookup_planes(tab, idx)
    for c in range(3):
        np.testing.assert_array_equal(planes[c], tab[idx, c])
    # float-carried indices (the fused kernel returns mtl as f32)
    idx_f = idx.astype(jnp.float32)
    np.testing.assert_array_equal(chain_lookup(tab, idx_f), tab[idx])
    # big tables fall back to a real gather
    big = jnp.asarray(rng.normal(size=(200, 2)), jnp.float32)
    bidx = jnp.asarray(rng.integers(0, 200, size=(31,)), jnp.int32)
    np.testing.assert_array_equal(chain_lookup(big, bidx), big[bidx])


def test_fused_renderer_matches_scan_statistically(test_scene_paths):
    """The fused renderer must agree with the differentiable scan renderer
    in expectation (same estimator, different scheduling + RNG streams)."""
    from tinyraytracing_tpu.models.scene import load_scene
    from tinyraytracing_tpu.integrator.fused import render_fused_jit
    from tinyraytracing_tpu.render import render

    p = test_scene_paths
    scene, cam = load_scene(p["xml"], p["obj"], p["mtl"], p["basedir"],
                            with_bvh=True)
    cam = dataclasses.replace(cam, width=24, height=24)
    cfg = RenderConfig(intersector="bvh", max_depth=8)
    a = np.asarray(render(scene, cam, jax.random.PRNGKey(0), cfg, spp=16))
    b = np.asarray(
        render_fused_jit(scene, cam, jax.random.PRNGKey(3), cfg, 16, lanes=512)
    )
    assert np.all(np.isfinite(b))
    # MC agreement: means within noise, high correlation
    assert abs(a.mean() - b.mean()) < 0.15 * max(a.mean(), 1e-6)
    corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
    assert corr > 0.9


def test_fused_renderer_deterministic(test_scene_bvh):
    from tinyraytracing_tpu.integrator.fused import render_fused_jit

    scene, cam = test_scene_bvh
    cam = dataclasses.replace(cam, width=16, height=16)
    cfg = RenderConfig(intersector="bvh", max_depth=4)
    a = np.asarray(render_fused_jit(scene, cam, jax.random.PRNGKey(1), cfg, 4, lanes=256))
    b = np.asarray(render_fused_jit(scene, cam, jax.random.PRNGKey(1), cfg, 4, lanes=256))
    c = np.asarray(render_fused_jit(scene, cam, jax.random.PRNGKey(9), cfg, 4, lanes=256))
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)


def test_fused_renderer_slot_range(test_scene_bvh):
    """slot_base / n_slots must render bitwise the same slot rows as the
    full image — the contract tile-sharding relies on, guaranteed by the
    path-indexed RNG (randomness is a function of (path_id, bounce) only,
    never of the lane/epoch/shard a pixel lands on)."""
    from tinyraytracing_tpu.integrator.fused import render_fused

    scene, cam = test_scene_bvh
    cam = dataclasses.replace(cam, width=16, height=16)
    cfg = RenderConfig(intersector="bvh", max_depth=4)
    key = jax.random.PRNGKey(2)
    full, _ = jax.jit(
        lambda k: render_fused(scene, cam, k, cfg, 4, lanes=128)
    )(key)
    half, _ = jax.jit(
        lambda k: render_fused(scene, cam, k, cfg, 4, lanes=128,
                               slot_base=128, n_slots=128)
    )(key)
    np.testing.assert_array_equal(np.asarray(half)[:128], np.asarray(full)[128:256])


# ---------------------------------------------------------------------------
# queue-fed fused renderer (integrator/fused_queue.py)
# ---------------------------------------------------------------------------

def test_fused_queue_matches_scan_statistically(test_scene_paths):
    from tinyraytracing_tpu.models.scene import load_scene
    from tinyraytracing_tpu.integrator.fused_queue import render_fused_queue_jit
    from tinyraytracing_tpu.render import render

    p = test_scene_paths
    scene, cam = load_scene(p["xml"], p["obj"], p["mtl"], p["basedir"],
                            with_bvh=True)
    cam = dataclasses.replace(cam, width=24, height=24)
    cfg = RenderConfig(intersector="bvh", max_depth=8)
    a = np.asarray(render(scene, cam, jax.random.PRNGKey(0), cfg, spp=16))
    b = np.asarray(
        render_fused_queue_jit(scene, cam, jax.random.PRNGKey(3), cfg, 16, lanes=512)
    )
    assert np.all(np.isfinite(b))
    assert abs(a.mean() - b.mean()) < 0.15 * max(a.mean(), 1e-6)
    corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
    assert corr > 0.9


def test_fused_queue_matches_fused_persistent(test_scene_bvh):
    """Same key => both fused schedulers draw identical per-path randomness
    (path-indexed RNG), so their images agree sample-for-sample — up to
    float contraction differences between the two compiled programs: XLA
    fuses each renderer differently, a borderline ray can flip a hit in
    one program only, and that one sample shifts its pixel by
    O(value/spp). Observed on the CPU reference path: ~2% of elements
    (17 of 768 with the standard 20-round threefry stream); on the TPU
    kernel path both schedulers share the trace kernel and agree to
    ~2e-6 absolute."""
    from tinyraytracing_tpu.integrator.fused import render_fused_jit
    from tinyraytracing_tpu.integrator.fused_queue import render_fused_queue_jit

    scene, cam = test_scene_bvh
    cam = dataclasses.replace(cam, width=16, height=16)
    cfg = RenderConfig(intersector="bvh", max_depth=6)
    key = jax.random.PRNGKey(4)
    a = np.asarray(render_fused_jit(scene, cam, key, cfg, 8, lanes=256))
    b = np.asarray(render_fused_queue_jit(scene, cam, key, cfg, 8, lanes=256))
    close = np.isclose(a, b, rtol=2e-4, atol=2e-5)
    assert close.mean() > 0.97, f"{(~close).sum()} of {close.size} elements differ"
    # flipped elements shift by O(one path's radiance / spp) — bound the
    # damage globally instead of element-wise
    assert abs(a.mean() - b.mean()) < 0.02 * max(a.mean(), 1e-6)


def test_fused_queue_deterministic(test_scene_bvh):
    from tinyraytracing_tpu.integrator.fused_queue import render_fused_queue_jit

    scene, cam = test_scene_bvh
    cam = dataclasses.replace(cam, width=16, height=16)
    cfg = RenderConfig(intersector="bvh", max_depth=4)
    a = np.asarray(render_fused_queue_jit(scene, cam, jax.random.PRNGKey(1), cfg, 4, lanes=256))
    b = np.asarray(render_fused_queue_jit(scene, cam, jax.random.PRNGKey(1), cfg, 4, lanes=256))
    c = np.asarray(render_fused_queue_jit(scene, cam, jax.random.PRNGKey(7), cfg, 4, lanes=256))
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)


def test_fused_queue_chunked_bitwise_and_resume(test_scene_bvh, tmp_path):
    """Host-chunked execution (the TPU ~60 s program-watchdog fix) is the
    SAME loop paused at chunk boundaries: image bitwise-equal to the
    one-shot while_loop, and resuming from a mid-render checkpoint is
    bitwise-equal too."""
    from tinyraytracing_tpu.integrator.fused_queue import (
        render_fused_queue_chunked, render_fused_queue_jit)
    from tinyraytracing_tpu.utils import checkpoint as ckpt

    scene, cam = test_scene_bvh
    cam = dataclasses.replace(cam, width=16, height=16)
    cfg = RenderConfig(intersector="bvh", max_depth=4)
    key = jax.random.PRNGKey(2)
    one = np.asarray(render_fused_queue_jit(scene, cam, key, cfg, 4, lanes=256))
    img, rays = render_fused_queue_chunked(
        scene, cam, key, cfg, 4, lanes=256, target_chunk_s=1e-9
    )  # tiny target -> many small chunks
    np.testing.assert_array_equal(np.asarray(img).reshape(16, 16, 3), one)
    assert float(rays) > 0

    # resume: snapshot every chunk, interrupt by reloading the last one
    p = str(tmp_path / "queue.npz")
    img2, _ = render_fused_queue_chunked(
        scene, cam, key, cfg, 4, lanes=256, target_chunk_s=1e-9,
        checkpoint_path=p, checkpoint_every_s=0.0)
    assert not (tmp_path / "queue.npz").exists()   # cleared when done
    np.testing.assert_array_equal(np.asarray(img2).reshape(16, 16, 3), one)


def test_fused_queue_max_iters_cap_drops_unfinished(test_scene_bvh):
    """When the iteration cap binds, unfinished paths (and their queued
    NEE) are dropped — the image must stay finite and bounded by the full
    render (pinning the cap-bound behavior flagged in round 2)."""
    from tinyraytracing_tpu.integrator.fused_queue import render_fused_queue

    scene, cam = test_scene_bvh
    cam = dataclasses.replace(cam, width=8, height=8)
    cfg = RenderConfig(intersector="bvh", max_depth=6)
    key = jax.random.PRNGKey(3)

    def run(mi):
        # max_iters is a Python static (branch inside render_fused_queue)
        return jax.jit(
            lambda s, c, k: render_fused_queue(
                s, c, k, cfg, 4, lanes=128, max_iters=mi)
        )(scene, cam, key)

    full, rays_full = run(10_000)
    capped, rays_capped = run(2)
    full, capped = np.asarray(full), np.asarray(capped)
    assert np.isfinite(capped).all() and (capped >= 0).all()
    assert float(rays_capped) < float(rays_full)
    assert capped.sum() <= full.sum() + 1e-4
    # with the cap beyond the loop's natural end the cap must be inert
    again, _ = run(10_000)
    np.testing.assert_array_equal(full, np.asarray(again))


def test_shadow_early_kill_target_material(rng):
    """Shadow early-kill: a wrong-material hit within the bound kills the
    lane (mtl == -3); an unobstructed ray to the light reports the light's
    material; bound-0 lanes park (mtl == -1). Kernel (interpret) and the
    CPU oracle must agree on this scene (every blocked ray's hits are all
    wrong-material, so kill order cannot diverge from closest-hit)."""
    from tinyraytracing_tpu.models.procedural import cornell_box
    from tinyraytracing_tpu.ops.bvh import attach_bvh
    from tinyraytracing_tpu.ops.pallas_trace import fused_trace_planes

    scene, _ = cornell_box(width=8, height=8)
    scene = attach_bvh(scene, CFG)
    light_mtl = float(np.asarray(scene.light_mtl)[0])
    n = 128
    under_light = np.tile([278.0, 100.0, 280.0], (n, 1)).astype(np.float32)
    off_side = np.tile([400.0, 50.0, 400.0], (n, 1)).astype(np.float32)
    target = np.array([278.0, 548.8, 280.0], np.float32)
    orgs = np.concatenate([under_light, off_side])
    dirs = target[None, :] - orgs
    dist = np.linalg.norm(dirs, axis=1, keepdims=True)
    dirs = dirs / dist
    o = jnp.asarray(orgs)
    d = jnp.asarray(dirs)
    tb = jnp.asarray(dist[:, 0])
    tg = jnp.full((2 * n,), light_mtl, jnp.float32)

    for fk in (False, True):
        outs = fused_trace_planes(
            scene, o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
            CFG, force_kernel=fk, t_bound=tb, target_mtl=tg)
        mtl = np.asarray(outs[6])
        # clear column: straight up to the light
        assert (mtl[:n] == light_mtl).all(), mtl[:8]
        # second column: each lane is the light, a kill (-3), or a miss
        # (-1) — never a foreign positive material id
        assert np.isin(mtl[n:], [light_mtl, -3.0, -1.0]).all(), set(mtl[n:])
        # parked lanes: bound 0 -> no walk at all
        outs0 = fused_trace_planes(
            scene, o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
            CFG, force_kernel=fk, t_bound=jnp.zeros(2 * n), target_mtl=tg)
        assert (np.asarray(outs0[6]) == -1.0).all()


def test_fused_trace_hbm_large_tree(rng):
    """Round-2 verdict ask: pin the HBM-node-row encoding on a tree well
    past the SMEM limit (1,981 nodes = 124 packed 16-node rows) — the
    configuration that faulted staircase in round 2 — against the pure-JAX
    oracle, in interpret mode."""
    from tinyraytracing_tpu.models.procedural import quad_grid
    from tinyraytracing_tpu.ops.bvh import attach_bvh

    cfg = RenderConfig(intersector="bvh", leaf_size=8)
    scene, _ = quad_grid(6000, width=16, height=16)
    scene = attach_bvh(scene, cfg)
    assert scene.bvh.packed.n_nodes > 1024   # really on the HBM path
    org = jnp.asarray(rng.uniform(100, 450, (128, 3)), jnp.float32)
    d = rng.normal(size=(128, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    _check_fused(scene, org, jnp.asarray(d, jnp.float32), cfg)


def test_fused_trace_all_smem_variant(test_scene_bvh, rng, monkeypatch):
    """The experimental all-SMEM kernel (nodes + whole leaf payload in
    SMEM, zero per-visit DMA — rejected as default, see SMEM_PS_FLOATS)
    must still match the oracle."""
    import tinyraytracing_tpu.ops.pallas_trace as ptr

    monkeypatch.setattr(ptr, "SMEM_PS_FLOATS", 1_000_000)
    scene, _ = test_scene_bvh
    org, d = _rays(rng, 256)
    _check_fused(scene, org, d, CFG)


def test_nee_mxu_onehot_row_select_exact(rng):
    """The large-K NEE table path (integrator/fused._nee_geometry): the
    bf16 one-hot built from the monotone prefix-compare, dotted at
    HIGHEST precision, must select table rows EXACTLY like the clamped
    count-gather — including rnd below the first prefix and beyond the
    real rows (zero pad row, masked by validity downstream)."""
    K = 97
    areas = rng.uniform(0.1, 2.0, K).astype(np.float32)
    prefix = np.cumsum(areas).astype(np.float32)
    prefix_pad = np.concatenate([prefix, np.full(31, np.inf, np.float32)])
    tab = np.zeros((K + 31, 18), np.float32)
    tab[:K] = rng.normal(size=(K, 18))
    R = 2048
    rnd = rng.uniform(0, prefix[-1] * 1.05, R).astype(np.float32)
    rnd[0] = 0.0
    rnd[1] = prefix[0]
    rnd[2] = np.nextafter(prefix[0], 0, dtype=np.float32)

    sel = np.minimum((prefix_pad[None, :] <= rnd[:, None]).sum(1), K + 30)
    want = tab[sel]

    pj, rj, tj = jnp.asarray(prefix_pad), jnp.asarray(rnd), jnp.asarray(tab)
    cmp = (pj[None, :] <= rj[:, None]).astype(jnp.bfloat16)
    prev = jnp.concatenate(
        [jnp.ones((R, 1), jnp.bfloat16), cmp[:, :-1]], axis=1
    )
    onehot = (1.0 - cmp) * prev
    got = jax.lax.dot_general(
        onehot.astype(jnp.float32), tj, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    )
    np.testing.assert_array_equal(np.asarray(got), want)


def test_fused_queue_shadow_compact_bitwise():
    """Shadow-lane compaction (config.shadow_compact) is a pure
    permutation: live lanes are packed to each light segment's front for
    the occlusion dispatch and inverse-sorted after, and per-lane results
    are packet-membership-invariant — the image must be BITWISE the
    uncompacted renderer's. veach-mis (3 lights) exercises the (L, R)
    segment reshapes nontrivially."""
    import dataclasses

    from tinyraytracing_tpu.integrator.fused_queue import render_fused_queue_jit
    from tinyraytracing_tpu.models.scene import load_scene
    from tests.conftest import SCENES

    base = f"{SCENES}/veach-mis"
    scene, cam = load_scene(f"{base}/veach-mis.xml", f"{base}/veach-mis.obj",
                            f"{base}/veach-mis.mtl", base, with_bvh=True)
    cam = dataclasses.replace(cam, width=16, height=16)
    key = jax.random.PRNGKey(5)
    cfg = RenderConfig(intersector="bvh", max_depth=4, shadow_test="mtl")
    off = np.asarray(render_fused_queue_jit(
        scene, cam, key, cfg.replace(shadow_compact="off"), 2, lanes=256))
    on = np.asarray(render_fused_queue_jit(
        scene, cam, key, cfg.replace(shadow_compact="on"), 2, lanes=256))
    np.testing.assert_array_equal(on, off)
