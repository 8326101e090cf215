"""Boundary-aware visibility gradients (diff/edge.py prototype).

The canonical failure of interior-term path-replay AD: a dark occluder
sliding over a bright emissive floor. The pixel radiance is piecewise
constant in the occluder's position, so interior AD reports ~zero
gradient, while the true derivative of an MSE loss against a SHIFTED
target is finite (it lives on the silhouette). The edge-sampled boundary
term must recover it (match central finite differences); the interior
term must be negligible."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinyraytracing_tpu.config import RenderConfig
from tinyraytracing_tpu.diff.edge import (
    boundary_edges,
    mse_G_fn,
    silhouette_edge_surrogate,
)
from tinyraytracing_tpu.diff.inverse import SceneParams, apply_params
from tinyraytracing_tpu.io.mtl import MaterialSpec
from tinyraytracing_tpu.io.xmlscene import LightSpec, SceneConfig
from tinyraytracing_tpu.models.camera import Camera
from tinyraytracing_tpu.models.procedural import _quads_to_mesh
from tinyraytracing_tpu.models.scene import assemble_scene
from tinyraytracing_tpu.render import render

CFG = RenderConfig(intersector="brute", max_depth=1, ray_chunk=8192,
                   tri_chunk=64)
RES = 48


def _make(dx=0.0):
    """Emissive floor + floating dark occluder quad offset by dx in x."""
    occ = [(-100 + dx, 150, -100), (100 + dx, 150, -100),
           (100 + dx, 150, 100), (-100 + dx, 150, 100)]
    quads = [
        ([(-600, 0, -600), (600, 0, -600), (600, 0, 600), (-600, 0, 600)],
         "Light"),
        ([occ[0], occ[1], occ[2], occ[3]], "Black"),
    ]
    cfg = SceneConfig(
        width=RES, height=RES, fovy=45.0,
        eye=(0.0, 500.0, -1e-3), lookat=(0.0, 0.0, 0.0),
        up=(0.0, 0.0, 1.0),
        lights=[LightSpec("Light", (5.0, 5.0, 5.0))],
    )
    mats = {
        "Light": MaterialSpec("Light", kd=(0, 0, 0)),
        "Black": MaterialSpec("Black", kd=(0, 0, 0)),
    }
    scene = assemble_scene(cfg, _quads_to_mesh(quads), mats)
    cam = Camera.create(cfg.eye, cfg.lookat, cfg.up, cfg.fovy, RES, RES)
    return scene, cam


def test_edge_term_recovers_silhouette_gradient():
    scene, cam = _make(0.0)
    key = jax.random.PRNGKey(0)
    # target = the scene with the occluder shifted +30 in x
    tscene, _ = _make(30.0)
    target = jax.lax.stop_gradient(render(tscene, cam, key, CFG, spp=4))

    occ_tris = [2, 3]            # occluder triangles (quads appended last)
    edges = boundary_edges(scene.v0, scene.v1, scene.v2, occ_tris)
    E = edges.shape[0]
    assert E == 4                # a quad's 4 boundary edges (diagonal shared)

    def loss(dx):
        off = jnp.zeros_like(scene.v0)
        off = off.at[jnp.asarray(occ_tris), 0].add(dx)
        p = SceneParams(vertex_offset=off)
        s2, c2 = apply_params(scene, cam, p)
        img = render(s2, c2, key, CFG, spp=4)
        return jnp.mean((img - target) ** 2)

    # interior-term AD: ~0 (piecewise-constant radiance)
    g_int = jax.grad(loss)(jnp.float32(0.0))

    # edge term via the surrogate
    def edge_term(dx):
        off = jnp.zeros_like(scene.v0)
        off = off.at[jnp.asarray(occ_tris), 0].add(dx)
        p = SceneParams(vertex_offset=off)
        s2, c2 = apply_params(scene, cam, p)
        verts = jnp.stack([s2.v0, s2.v1, s2.v2], axis=1)   # (T, 3, 3)
        e = jnp.asarray(edges)                             # (E, 2, 2)
        pa = verts[e[:, 0, 0], e[:, 0, 1]]
        pb = verts[e[:, 1, 0], e[:, 1, 1]]
        G = mse_G_fn(jax.lax.stop_gradient(s2), c2, CFG, target,
                     jax.random.fold_in(key, 9), spp=1)
        return silhouette_edge_surrogate(
            pa, pb, c2, G, jax.random.PRNGKey(5), n_samples=2048
        )

    g_edge = jax.grad(edge_term)(jnp.float32(0.0))

    # central FD of the true loss
    eps = 10.0
    fd = (loss(jnp.float32(eps)) - loss(jnp.float32(-eps))) / (2 * eps)

    fd, g_int, g_edge = float(fd), float(g_int), float(g_edge)
    assert abs(fd) > 1e-6, "test setup degenerate: FD gradient vanished"
    # interior term misses (essentially all of) the silhouette gradient
    assert abs(g_int) < 0.1 * abs(fd)
    # interior + edge recovers it (MC estimator: 15% tolerance)
    assert g_int + g_edge == pytest.approx(fd, rel=0.15)


def _cube_quads(cx, cy, cz, h, mtl):
    """6 outward-wound quads of an axis-aligned cube (center, half-size)."""
    lo = (cx - h, cy - h, cz - h)
    hi = (cx + h, cy + h, cz + h)
    x0, y0, z0 = lo
    x1, y1, z1 = hi
    return [
        ([(x0, y1, z0), (x1, y1, z0), (x1, y1, z1), (x0, y1, z1)], mtl),  # +y
        ([(x0, y0, z1), (x1, y0, z1), (x1, y0, z0), (x0, y0, z0)], mtl),  # -y
        ([(x1, y0, z0), (x1, y0, z1), (x1, y1, z1), (x1, y1, z0)], mtl),  # +x
        ([(x0, y0, z1), (x0, y0, z0), (x0, y1, z0), (x0, y1, z1)], mtl),  # -x
        ([(x0, y0, z1), (x0, y1, z1), (x1, y1, z1), (x1, y0, z1)], mtl),  # +z
        ([(x1, y0, z0), (x1, y1, z0), (x0, y1, z0), (x0, y0, z0)], mtl),  # -z
    ]


def _make_cube(dx=0.0):
    """Emissive floor + floating CLOSED dark cube offset by dx in x."""
    quads = [
        ([(-600, 0, -600), (600, 0, -600), (600, 0, 600), (-600, 0, 600)],
         "Light"),
    ] + _cube_quads(dx, 150.0, 0.0, 60.0, "Black")
    cfg = SceneConfig(
        width=RES, height=RES, fovy=45.0,
        eye=(0.0, 500.0, -1e-3), lookat=(0.0, 0.0, 0.0),
        up=(0.0, 0.0, 1.0),
        lights=[LightSpec("Light", (5.0, 5.0, 5.0))],
    )
    mats = {
        "Light": MaterialSpec("Light", kd=(0, 0, 0)),
        "Black": MaterialSpec("Black", kd=(0, 0, 0)),
    }
    scene = assemble_scene(cfg, _quads_to_mesh(quads), mats)
    cam = Camera.create(cfg.eye, cfg.lookat, cfg.up, cfg.fovy, RES, RES)
    return scene, cam


def test_closed_mesh_silhouette_gradient():
    """CLOSED occluder (cube): view-dependent silhouette detection must
    pick the eye-facing/back-facing transition edges, and the integrated
    render_loss_fast(edge_samples=N) gradient must match FD (round-4
    verdict ask 5: the prototype handled boundary edges only)."""
    from tinyraytracing_tpu.diff.edge import build_edge_aux, silhouette_mask
    from tinyraytracing_tpu.diff.fast import render_loss_fast

    scene, cam = _make_cube(0.0)
    key = jax.random.PRNGKey(0)
    tscene, _ = _make_cube(30.0)
    target = jax.lax.stop_gradient(render(tscene, cam, key, CFG, spp=4))
    aux = build_edge_aux(scene)

    # sanity: the cube's interior edges are adjacency-paired, and from
    # straight above only the top-face rim (front/back transition) and
    # floor boundary qualify — NOT e.g. the bottom-face rim
    m = np.asarray(silhouette_mask(scene.v0, scene.v1, scene.v2, scene.gn,
                                   aux["adj"], jnp.asarray(cam.eye)))
    adj = np.asarray(aux["adj"])
    assert (adj[:, 1] >= 0).sum() > 0, "no interior edges found on the cube"
    interior = adj[:, 1] >= 0
    assert 0 < m[interior].sum() < interior.sum(), (
        "view-dependent mask should select a strict subset of interior edges"
    )

    cube_tris = jnp.arange(2, scene.num_triangles)

    def loss(dx, n_edge):
        off = jnp.zeros_like(scene.v0)
        off = off.at[cube_tris, 0].add(dx)
        p = SceneParams(vertex_offset=off)
        return render_loss_fast(p, scene, cam, key, target, CFG, 4,
                                edge_samples=n_edge, edge_aux=aux)

    g_int = jax.grad(loss)(jnp.float32(0.0), 0)
    g_full = jax.grad(loss)(jnp.float32(0.0), 4096)
    eps = 10.0
    fd = (loss(jnp.float32(eps), 0) - loss(jnp.float32(-eps), 0)) / (2 * eps)
    fd, g_int, g_full = float(fd), float(g_int), float(g_full)
    assert abs(fd) > 1e-6
    assert abs(g_int) < 0.1 * abs(fd)
    assert g_full == pytest.approx(fd, rel=0.2)


def _make_shadow(dx=0.0):
    """Diffuse floor lit by a small overhead area light, with an occluder
    BETWEEN light and floor, outside the camera frustum — the loss moves
    only through the shadow boundary on the floor."""
    quads = [
        # wound so the geometric normal faces UP (+y): a diffuse floor
        # with a downward normal rejects every light sample (cos_o <= 0)
        ([(-600, 0, -600), (-600, 0, 600), (600, 0, 600), (600, 0, -600)],
         "White"),
        # light: small quad high up, off to +x (outside the narrow frustum)
        ([(220, 400, -80), (380, 400, -80), (380, 400, 80), (220, 400, 80)],
         "Light"),
        # occluder between light and the visible floor patch
        ([(100 + dx, 200, -50), (200 + dx, 200, -50),
          (200 + dx, 200, 50), (100 + dx, 200, 50)], "Black"),
    ]
    cfg = SceneConfig(
        width=RES, height=RES, fovy=30.0,
        eye=(0.0, 500.0, -1e-3), lookat=(0.0, 0.0, 0.0),
        up=(0.0, 0.0, 1.0),
        lights=[LightSpec("Light", (15.0, 15.0, 15.0))],
    )
    mats = {
        "White": MaterialSpec("White", kd=(0.7, 0.7, 0.7)),
        "Light": MaterialSpec("Light", kd=(0, 0, 0)),
        "Black": MaterialSpec("Black", kd=(0, 0, 0)),
    }
    scene = assemble_scene(cfg, _quads_to_mesh(quads), mats)
    cam = Camera.create(cfg.eye, cfg.lookat, cfg.up, cfg.fovy, RES, RES)
    return scene, cam


def test_shadow_silhouette_gradient():
    """SECONDARY-edge term (round-4 verdict ask 5): the loss derivative
    lives entirely on the SHADOW boundary cast on the floor (the occluder
    is outside the camera frustum). Interior AD gives ~0; the shadow-edge
    estimator through render_loss_fast(shadow_edge_samples=N) must match
    FD. light_sampler="uniform" so the forward estimator is the unbiased
    integral the boundary term differentiates."""
    from tinyraytracing_tpu.diff.edge import build_edge_aux
    from tinyraytracing_tpu.diff.fast import render_loss_fast

    cfgr = CFG.replace(light_sampler="uniform")
    scene, cam = _make_shadow(0.0)
    key = jax.random.PRNGKey(0)
    tscene, _ = _make_shadow(20.0)
    target = jax.lax.stop_gradient(render(tscene, cam, key, cfgr, spp=8))
    aux = build_edge_aux(scene)
    occ_tris = jnp.asarray([4, 5])     # occluder quad's triangles

    def loss(dx, n_shadow):
        off = jnp.zeros_like(scene.v0)
        off = off.at[occ_tris, 0].add(dx)
        p = SceneParams(vertex_offset=off)
        return render_loss_fast(p, scene, cam, key, target, cfgr, 8,
                                shadow_edge_samples=n_shadow, edge_aux=aux)

    g_int = jax.grad(loss)(jnp.float32(0.0), 0)
    g_full = jax.grad(loss)(jnp.float32(0.0), 8192)
    eps = 8.0
    fd = (loss(jnp.float32(eps), 0) - loss(jnp.float32(-eps), 0)) / (2 * eps)
    fd, g_int, g_full = float(fd), float(g_int), float(g_full)
    assert abs(fd) > 1e-7, "setup degenerate: shadow FD gradient vanished"
    assert abs(g_int) < 0.1 * abs(fd)
    assert g_full == pytest.approx(fd, rel=0.25)
