"""Boundary-aware (edge-sampled) visibility gradients — prototype.

The path-replay estimator everywhere else in diff/ is INTERIOR-TERM ONLY:
it differentiates radiance with the hit set held fixed, so losses whose
derivative lives on silhouettes (an occluder sliding across a bright
background) get a ~zero gradient even though the true derivative is
finite (SURVEY.md §7 hard part 3). The missing piece is the boundary
term of Reynolds' transport theorem over the image integral:

    d/dθ ∫ G_θ(x) dx  =  ∫ ∂G/∂θ dx  +  ∫_C (G⁻ − G⁺)(x) (n̂·v) dl

where C is the image-space discontinuity curve (projected silhouette
edges), n̂ its image normal, v = dC/dθ its image velocity, and G⁻/G⁺ the
integrand on the two sides (edge-sampling estimator of Li et al. 2018,
"Differentiable Monte Carlo Ray Tracing through Edge Sampling" — public
method, independent implementation).

Round 5 promotes the round-4 prototype to an OPT-IN estimator on the fast
path — ``diff.fast.render_loss_fast(edge_samples=N,
shadow_edge_samples=M, edge_aux=build_edge_aux(scene))``:

- PRIMARY visibility: C = projected silhouette edges through the pinhole
  camera. The edge set is the whole mesh (``mesh_edges`` adjacency) with
  a view-dependent runtime mask (``silhouette_mask``): boundary edges
  always qualify; interior edges qualify when their faces straddle the
  eye — CLOSED meshes included (round-4 covered boundary edges only).
- SECONDARY (shadow-silhouette) visibility: ``shadow_edge_surrogate``
  samples (camera-visible shading point, edge point) pairs and
  accumulates the NEE direct term's boundary contribution in the plane
  of a PLANAR light (all reference scenes' lights).
- G / f are evaluated with DETACHED radiance/shadow rays ±δ across the
  boundary; the pixel filter is a box of area 1 px.

The estimators return SURROGATE scalars whose jax.grad equals the
boundary term: each sample contributes len · (G⁻ − G⁺)_detached ·
(n̂_detached · curve_point(θ)), so differentiation recovers (n̂·v).
render_loss_fast adds them value-neutrally (x − stop_gradient(x)).

Remaining limits (documented per round-4 verdict ask 5): boundary terms
are single-scattering (camera or first-hit NEE — discontinuities seen
through additional bounces are not sampled); the shadow integrand uses
the constant-Kd diffuse lobe; uniform edge sampling scales to the tested
scene sizes (thousands of edges), not production meshes — importance
sampling of the silhouette subset is the known next step.

Validated in tests/test_diff_edge.py against central finite differences:
(1) open occluder over an emissive floor (round 4), (2) CLOSED cube
occluder through the integrated render_loss_fast(edge_samples=N), and
(3) a shadow-silhouette-dominated loss (occluder outside the camera
frustum, derivative entirely in the cast shadow) through
render_loss_fast(shadow_edge_samples=M) — interior AD reports ~0 in all
three; interior+edge matches FD.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tinyraytracing_tpu.models.camera import camera_basis


def boundary_edges(tri_v0, tri_v1, tri_v2, tri_ids) -> np.ndarray:
    """Boundary (used-once) edges of the given triangles.

    Returns (E, 2, 2) int32: [edge, endpoint, (triangle index, vertex slot
    0/1/2)] — indices, not positions, so callers can rebuild endpoint
    coordinates differentiably from the (possibly offset) vertex arrays.
    Vertex identity is matched by POSITION (meshes here are triangle
    soups without an index buffer)."""
    v = np.stack([np.asarray(tri_v0), np.asarray(tri_v1),
                  np.asarray(tri_v2)], axis=1)     # (T, 3, 3)
    seen: dict = {}
    for t in tri_ids:
        for a, b in ((0, 1), (1, 2), (2, 0)):
            ka = tuple(np.round(v[t, a], 5))
            kb = tuple(np.round(v[t, b], 5))
            key = (min(ka, kb), max(ka, kb))
            if key in seen:
                seen[key] = None                  # interior (shared) edge
            else:
                seen[key] = (t, a, b)
    edges = [e for e in seen.values() if e is not None]
    out = np.asarray(
        [[[t, a], [t, b]] for (t, a, b) in edges], np.int32
    )
    return out


def mesh_edges(tri_v0, tri_v1, tri_v2, tri_ids=None) -> tuple:
    """ALL unique edges of the given triangles with face adjacency.

    Returns (endpoints (E, 2, 2) int32 [(tri, slot), (tri, slot)],
    adj (E, 2) int32 [left tri, right tri or -1]) — boundary edges have
    adj[:, 1] == -1. Vertex identity by rounded POSITION (triangle soups).
    The round-4 prototype's ``boundary_edges`` is the adj[:,1]==-1 subset;
    with adjacency, view-dependent silhouettes of CLOSED meshes become a
    runtime mask (``silhouette_mask``)."""
    v = np.stack([np.asarray(tri_v0), np.asarray(tri_v1),
                  np.asarray(tri_v2)], axis=1)     # (T, 3, 3)
    if tri_ids is None:
        tri_ids = range(v.shape[0])
    seen: dict = {}
    for t in tri_ids:
        for a, b in ((0, 1), (1, 2), (2, 0)):
            ka = tuple(np.round(v[t, a], 5))
            kb = tuple(np.round(v[t, b], 5))
            key = (min(ka, kb), max(ka, kb))
            if key in seen:
                ends, adj = seen[key]
                seen[key] = (ends, (adj[0], t))
            else:
                seen[key] = (((t, a), (t, b)), (t, -1))
    ends = np.asarray([[list(e[0][0]), list(e[0][1])]
                       for e in seen.values()], np.int32)
    adj = np.asarray([list(e[1]) for e in seen.values()], np.int32)
    return ends, adj


def edge_endpoints(v0, v1, v2, ends):
    """Differentiable (E, 3) endpoint positions from (possibly offset)
    vertex arrays through the static (tri, slot) index map."""
    tabs = (v0, v1, v2)
    pick = lambda k: sum(
        jnp.where((ends[:, k, 1] == s)[:, None], tabs[s][ends[:, k, 0]], 0.0)
        for s in range(3)
    )
    return pick(0), pick(1)


def silhouette_mask(v0, v1, v2, gn, adj, viewpoint):
    """(E,) 0/1 DETACHED mask: which edges are silhouettes as seen from
    ``viewpoint``. An edge qualifies if it is a boundary edge (one face)
    or its two faces face OPPOSITE sides of the viewpoint (the closed-mesh
    silhouette condition). All inputs may be traced; the output is
    stop_gradient'd (the silhouette SET is discrete)."""
    sg = jax.lax.stop_gradient
    cen = (v0 + v1 + v2) / 3.0
    tl = adj[:, 0]
    tr = jnp.maximum(adj[:, 1], 0)
    side = lambda t: jnp.sum(gn[t] * (viewpoint[None, :] - cen[t]), axis=-1)
    sil = jnp.where(
        adj[:, 1] < 0, True, (side(tl) > 0.0) != (side(tr) > 0.0)
    )
    return sg(sil.astype(jnp.float32))


def _project(cam, p):
    """World point(s) -> continuous image coords (x, y) in the ray-gen
    parameterization (models.camera: x = j/(W-1) + ..., y = (H-i)/(H-1)).
    Differentiable. p: (..., 3)."""
    eye, horizontal, vertical, llc = camera_basis(cam)
    basis = jnp.stack([horizontal, vertical, llc - eye], axis=1)  # (3, 3)
    coef = jnp.linalg.solve(
        basis[None], (p - eye)[..., None]
    )[..., 0]                                      # (..., 3): [alpha, beta, gamma]
    g = coef[..., 2]
    return coef[..., 0] / g, coef[..., 1] / g


def _ray_through(cam, x, y):
    eye, horizontal, vertical, llc = camera_basis(cam)
    d = (llc - eye)[None] + x[:, None] * horizontal[None] + y[:, None] * vertical[None]
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.broadcast_to(eye, d.shape)
    return o, d


def silhouette_edge_surrogate(
    pa, pb, cam, G_fn, key, n_samples: int = 256, delta: float = 0.1,
    weights=None,
):
    """Surrogate scalar whose gradient is the image-boundary term.

    pa, pb: (E, 3) DIFFERENTIABLE edge endpoints (world space).
    G_fn(x, y) -> per-sample integrand value in the ray-gen
    parameterization (e.g. the squared error density of an MSE loss, per
    unit PIXEL area), evaluated by the CALLER with detached radiance
    rays; this function calls it at ±``delta`` PIXELS along the
    projected edge normal.
    ``weights``: optional (E,) DETACHED 0/1 edge weights (e.g. the
    view-dependent ``silhouette_mask``) — masked edges contribute 0 while
    staying in the uniform edge draw, keeping the estimator unbiased for
    the masked subset.
    Returns the surrogate (its VALUE is meaningless; only its gradient
    w.r.t. pa/pb/camera matters).
    """
    E = pa.shape[0]
    W1 = jnp.float32(cam.width - 1)
    H1 = jnp.float32(cam.height - 1)
    s = jax.random.uniform(key, (n_samples,))
    e_idx = jax.random.randint(jax.random.fold_in(key, 1), (n_samples,), 0, E)
    a = pa[e_idx]
    b = pb[e_idx]
    p = a + s[:, None] * (b - a)                  # (S, 3) on-edge points

    # everything in PIXEL units: the loss integrand G is per unit pixel
    # area, so lengths and velocities must be too
    def proj_px(q):
        x, y = _project(cam, q)
        return x * W1, y * H1

    ax, ay = proj_px(a)
    bx, by = proj_px(b)
    px, py = proj_px(p)

    # image-space tangent / normal / length (DETACHED: geometry factors)
    sg = jax.lax.stop_gradient
    tx, ty = sg(bx - ax), sg(by - ay)
    ln = jnp.sqrt(tx * tx + ty * ty)
    inv = 1.0 / jnp.maximum(ln, 1e-12)
    nx, ny = -ty * inv, tx * inv                  # unit normal

    gm = G_fn((sg(px) - delta * nx) / W1, (sg(py) - delta * ny) / H1)
    gp = G_fn((sg(px) + delta * nx) / W1, (sg(py) + delta * ny) / H1)

    # per-sample: len * (G- - G+) * (n . p_img);  E edges x uniform s
    contrib = ln * sg(gm - gp) * (nx * px + ny * py)
    if weights is not None:
        contrib = contrib * jax.lax.stop_gradient(weights)[e_idx]
    return jnp.sum(contrib) * (E / n_samples)


def mse_G_fn(scene, cam, config, target, key, spp: int = 1):
    """Returns G_fn for the loss mean((img - target)^2) — the mean over
    pixels AND channels: G(x) = sum_c (L_c(x) - t_c(x))^2 / (3 n_pix),
    with L the (detached) radiance through the image point and t the
    target's nearest-pixel value. Radiance uses the standard forward
    estimator at the given spp."""
    from tinyraytracing_tpu.integrator.wavefront import trace

    W, H = cam.width, cam.height
    n_pix = W * H
    target = jnp.asarray(target).reshape(H, W, 3)

    def G(x, y):
        o, d = _ray_through(cam, x, y)
        rad = trace(scene, o, d, key, config)     # (S, 3), detached inputs
        j = jnp.clip(jnp.round(x * (W - 1)).astype(jnp.int32), 0, W - 1)
        i = jnp.clip(jnp.round(H - y * (H - 1)).astype(jnp.int32), 0, H - 1)
        t = target[i, j]
        return jnp.sum((rad - t) ** 2, axis=-1) / (3.0 * n_pix)
    return G


def build_edge_aux(scene) -> dict:
    """HOST-side (concrete scene) edge topology for the production edge
    estimators: call once per scene OUTSIDE jit and pass the result into
    ``diff.fast.render_loss_fast(edge_aux=...)``. The (tri, slot) index
    maps stay valid under vertex offsets (topology is static)."""
    ends, adj = mesh_edges(scene.v0, scene.v1, scene.v2)
    return dict(ends=jnp.asarray(ends), adj=jnp.asarray(adj))


def primary_edge_surrogate(scene, cam, config, target, key, aux,
                           n_samples: int = 256, delta: float = 0.1,
                           spp: int = 1):
    """Primary-visibility boundary term over the WHOLE mesh with
    view-dependent silhouette masking (closed meshes included): boundary
    edges always qualify; interior edges qualify when their two faces
    face opposite sides of the eye. Returns the surrogate scalar
    (gradient-only; see silhouette_edge_surrogate)."""
    pa, pb = edge_endpoints(scene.v0, scene.v1, scene.v2, aux["ends"])
    w = silhouette_mask(scene.v0, scene.v1, scene.v2, scene.gn,
                        aux["adj"], jnp.asarray(cam.eye))
    G = mse_G_fn(scene, cam, config, target, key, spp)
    return silhouette_edge_surrogate(
        pa, pb, cam, G, jax.random.fold_in(key, 17), n_samples, delta,
        weights=w,
    )


def shadow_edge_surrogate(scene, cam, config, target, img, key, aux,
                          n_samples: int = 256, delta_frac: float = 2e-2,
                          light: int = 0):
    """SECONDARY-edge (shadow silhouette) boundary term — the NEE direct
    term's visibility discontinuity for camera-visible shading points.

    For the loss mean((img-target)^2), each pixel's direct term
    D_pix = integral_light V(p, y) f(p, y) dy is discontinuous in y along the
    projection (from the shading point p) of silhouette edges onto the
    light's plane. This estimator samples (pixel, edge, point-on-edge),
    projects the edge through the DETACHED shading point onto the plane
    of light ``light`` (planar lights — all reference scenes' lights are
    planar polygons), and accumulates the boundary term in light-plane
    coordinates with the same surrogate trick as the primary estimator:

        contrib = dLoss/dD_pix . (f- - f+)_detached * len2 * (nhat . y2(theta))

    Scope/limits (documented, tested in tests/test_diff_edge.py):
    - camera-visible (depth-1) shading points only — shadow boundaries
      seen through further bounces are not sampled;
    - planar lights; the light's plane basis comes from its first
      triangle;
    - f uses the material's constant Kd diffuse term (textures and the
      Phong lobe excluded from the boundary integrand — their product
      with the visibility step is second-order at the tested scales);
    - p is DETACHED: gradients flow to the OCCLUDER geometry (and, via
      the projection, the light/edge vertices), not the receiver.
    ``img`` is the DETACHED rendered image (the caller already has it).
    """
    from tinyraytracing_tpu.ops.intersect import intersect

    sg = jax.lax.stop_gradient
    W, H = cam.width, cam.height
    n_pix = W * H
    E = aux["ends"].shape[0]
    k1, k2, k3 = (jax.random.fold_in(key, i) for i in (31, 32, 33))

    # --- sample pixels; camera rays -> DETACHED primary hits
    delta = sg(
        jnp.sqrt(jnp.maximum(scene.light_area[light], 1e-12))
    ) * delta_frac
    pix = jax.random.randint(k1, (n_samples,), 0, n_pix)
    i = (pix // W).astype(jnp.float32)
    j = (pix % W).astype(jnp.float32)
    x = j / (W - 1.0)
    y = (H - i) / (H - 1.0)
    o, d = _ray_through(cam, x, y)
    hit = intersect(sg(scene), sg(o), sg(d), config)
    p = sg(o + hit.t[:, None] * d)
    tri = jnp.maximum(hit.idx, 0)
    valid = hit.hit & ~scene.tri_emissive[tri]
    n_p = sg(scene.gn[tri])
    kd = scene.kd[scene.tri_mtl[tri]]               # (S, 3)

    # --- light plane (planar light): origin, normal, in-plane basis
    lv0 = scene.lt_v0[light, 0]
    lv1 = scene.lt_v1[light, 0]
    lv2 = scene.lt_v2[light, 0]
    nl = jnp.cross(lv1 - lv0, lv2 - lv0)
    nl = nl / jnp.maximum(jnp.linalg.norm(nl), 1e-12)
    ul = (lv1 - lv0) / jnp.maximum(jnp.linalg.norm(lv1 - lv0), 1e-12)
    wl = jnp.cross(nl, ul)
    le = scene.light_radiance[light]

    # --- sample edges; silhouette wrt EACH p; project endpoints on plane
    e_idx = jax.random.randint(k2, (n_samples,), 0, E)
    pa, pb = edge_endpoints(scene.v0, scene.v1, scene.v2, aux["ends"])
    a3, b3 = pa[e_idx], pb[e_idx]
    adj = aux["adj"][e_idx]
    cen = sg((scene.v0 + scene.v1 + scene.v2) / 3.0)
    gn = sg(scene.gn)
    side = lambda t: jnp.sum(gn[t] * (p - cen[t]), axis=-1)
    tl, tr = adj[:, 0], jnp.maximum(adj[:, 1], 0)
    sil = jnp.where(adj[:, 1] < 0, True,
                    (side(tl) > 0.0) != (side(tr) > 0.0))

    def to_plane(q):
        dq = q - p
        denom = jnp.sum(dq * nl[None], axis=-1)
        safe = jnp.abs(denom) > 1e-9
        tau = jnp.sum((lv0[None] - p) * nl[None], axis=-1) / jnp.where(
            safe, denom, 1.0
        )
        yw = p + tau[:, None] * dq
        return (jnp.sum((yw - lv0[None]) * ul[None], axis=-1),
                jnp.sum((yw - lv0[None]) * wl[None], axis=-1),
                tau, safe)

    ax2, ay2, ta, sa_ok = to_plane(a3)
    bx2, by2, tb_, sb_ok = to_plane(b3)
    s = jax.random.uniform(k3, (n_samples,))
    qx = ax2 + s * (bx2 - ax2)                      # y2(theta), differentiable
    qy = ay2 + s * (by2 - ay2)

    tx, ty = sg(bx2 - ax2), sg(by2 - ay2)
    ln2 = jnp.sqrt(tx * tx + ty * ty)
    inv = 1.0 / jnp.maximum(ln2, 1e-12)
    nx, ny = -ty * inv, tx * inv

    # edge must sit BETWEEN p and the light plane (0 < t_edge < t_plane
    # along the ray p->q: tau > 1 in the parameterization above)
    tau_q = ta + s * (tb_ - ta)
    between = (tau_q > 1.0) & sa_ok & sb_ok

    # --- integrand f on both sides (DETACHED; includes visibility)
    def f_at(y2x, y2y):
        yw = lv0[None] + y2x[:, None] * ul[None] + y2y[:, None] * wl[None]
        to_l = yw - p
        r2 = jnp.maximum(jnp.sum(to_l * to_l, axis=-1), 1e-12)
        dist = jnp.sqrt(r2)
        wo = to_l / dist[:, None]
        cos_p = jnp.sum(wo * n_p, axis=-1)
        cos_y = jnp.abs(jnp.sum(wo * nl[None], axis=-1))
        # inside the light polygon?
        inside = _point_in_light(scene, light, y2x, y2y, ul, wl, lv0)
        # visibility: closest-hit material == light material
        h2 = intersect(sg(scene), p, wo, config)
        vis = h2.hit & (
            scene.tri_mtl[jnp.maximum(h2.idx, 0)]
            == scene.light_mtl[light]
        )
        geom = jnp.maximum(cos_p, 0.0) * cos_y / r2
        f = (kd / jnp.pi) * (geom * inside * vis)[:, None] * le[None]
        return f

    gm = sg(f_at(sg(qx) - delta * nx, sg(qy) - delta * ny))
    gp = sg(f_at(sg(qx) + delta * nx, sg(qy) + delta * ny))

    # --- loss weighting: dLoss/dD_pix = 2 (img - target) / (3 n_pix)
    img = sg(img.reshape(n_pix, 3))
    tgt = sg(jnp.asarray(target).reshape(n_pix, 3))
    gw = 2.0 * (img[pix] - tgt[pix]) / (3.0 * n_pix)

    ok = (sg(valid) & sil & between).astype(jnp.float32)
    contrib = (
        jnp.sum(sg(gw) * (gm - gp), axis=-1)
        * ln2 * (nx * qx + ny * qy) * sg(ok)
    )
    return jnp.sum(contrib) * (float(n_pix) * E / n_samples)


def _point_in_light(scene, light, y2x, y2y, ul, wl, lv0):
    """DETACHED: is the plane point inside any triangle of the light?"""
    sg = jax.lax.stop_gradient
    K = scene.lt_v0.shape[1]
    inside = jnp.zeros(y2x.shape, bool)
    px, py = sg(y2x), sg(y2y)
    for k in range(K):
        va = scene.lt_v0[light, k]
        vb = scene.lt_v1[light, k]
        vc = scene.lt_v2[light, k]
        p2 = lambda v: (jnp.sum((v - lv0) * ul), jnp.sum((v - lv0) * wl))
        axk, ayk = p2(va)
        bxk, byk = p2(vb)
        cxk, cyk = p2(vc)
        d00x, d00y = bxk - axk, byk - ayk
        d01x, d01y = cxk - axk, cyk - ayk
        den = d00x * d01y - d01x * d00y
        degen = jnp.abs(den) < 1e-12
        den = jnp.where(degen, 1.0, den)
        ex, ey = px - axk, py - ayk
        u = (ex * d01y - d01x * ey) / den
        v = (d00x * ey - ex * d00y) / den
        inside = inside | (
            ~degen & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
        )
    return sg(inside.astype(jnp.float32))

