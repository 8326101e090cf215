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

This module implements the SMALLEST HONEST version of that estimator:

- PRIMARY (camera) visibility only: C = the projection of given 3-D
  silhouette edges through the pinhole camera; no secondary/shadow edges.
- the silhouette edge set is the mesh's BOUNDARY edges (edges used by
  exactly one triangle, ``boundary_edges``) — correct for open occluders
  like the test's floating quad; closed meshes would need view-dependent
  silhouette detection (front/back-facing triangle pairs), not done here.
- G is evaluated by casting one detached radiance ray per side (±δ in
  image space); the pixel-filter is treated as a box of area 1 px.

The estimator returns a SURROGATE scalar whose jax.grad equals the
boundary term: each sample contributes len_img · (G⁻ − G⁺)_detached ·
(n̂_detached · p_img(θ)), so differentiation recovers (n̂·v). Add its
gradient to the interior-term gradient (diff/fast.py / diff/inverse.py).

Validated in tests/test_diff_edge.py: a 2-triangle occluder over an
emissive floor, MSE loss against a shifted target — interior AD gives
~0 while interior+edge matches finite differences.
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
    pa, pb, cam, G_fn, key, n_samples: int = 256, delta: float = 0.1
):
    """Surrogate scalar whose gradient is the image-boundary term.

    pa, pb: (E, 3) DIFFERENTIABLE edge endpoints (world space).
    G_fn(x, y) -> per-sample integrand value in the ray-gen
    parameterization (e.g. the squared error density of an MSE loss, per
    unit PIXEL area), evaluated by the CALLER with detached radiance
    rays; this function calls it at ±``delta`` PIXELS along the
    projected edge normal.
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
