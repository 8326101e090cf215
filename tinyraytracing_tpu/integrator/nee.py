"""Next-event estimation (direct lighting) — the vectorized equivalent of the
reference's per-light loop in shade() (RayTracingOnCPU/pathTracing.cpp:34-74).

Per shading point, for every light (vectorized over the padded L axis):

1. Pick a light triangle by drawing rnd uniform and scanning the per-light
   prefix-area CDF for the first triangle with prefix > rnd
   (pathTracing.cpp:38-43). FIDELITY QUIRK (config.light_sampler == "ref"):
   the reference's pick distribution is a function-static
   ``uniform_real_distribution(0, total_area)`` constructed on the FIRST
   call — i.e. with the FIRST light's area — and reused for every light
   (pathTracing.cpp:37-38). A draw beyond a smaller light's total area
   selects nothing (zero contribution that sample); a larger light's tail
   triangles are never sampled. ``scene.nee_range`` carries that first
   light's area.
2. Sample a point with normalized-3-uniforms barycentrics ("ref") or the
   uniform sqrt warp ("uniform").
3. Shadow ray: closest-hit trace; visibility is material-name equality with
   the light ("mtl", pathTracing.cpp:55-58 — any hit on the light's own
   material counts as visible, regardless of distance) or a classic
   distance-based occlusion test ("tmin").
4. Contribution: radiance * cosθ_p * cosθ / r^2 / (1/area) with the Phong
   half-vector BRDF ``Kd/π + Ks (Ns+2)/(2π) cos^Ns α`` (pathTracing.cpp:60-70),
   gated on dot(wo, pn) > 0. The pdf uses the CURRENT light's true area even
   in "ref" mode (only the pick range is wrong in the reference).
"""

from __future__ import annotations

import jax.numpy as jnp

from tinyraytracing_tpu.config import RenderConfig
from tinyraytracing_tpu.ops.linalg import dot, length2, normalize
from tinyraytracing_tpu.ops.sampling import PI, barycentric_ref, barycentric_uniform


def direct_light(scene, config: RenderConfig, intersect_fn,
                 point, pn, wi, kd_val, ks, ns, uniforms):
    """Direct-light radiance for R shading points. Returns (R, 3).

    uniforms: (R, L, 4) — pick, and 3 barycentric draws per light.
    intersect_fn(org, dir) -> Hit over flattened ray batches.
    """
    R = point.shape[0]
    L, K = scene.lt_prefix.shape

    u_pick = uniforms[:, :, 0]                               # (R, L)
    if config.light_sampler == "ref":
        rnd = u_pick * scene.nee_range
    else:
        rnd = u_pick * scene.light_area[None, :]
    valid = rnd < scene.light_area[None, :]                  # (R, L)

    # first triangle with prefix > rnd (padding prefix = +inf)
    sel = jnp.argmax(
        scene.lt_prefix[None, :, :] > rnd[:, :, None], axis=-1
    ).astype(jnp.int32)                                      # (R, L)

    def take(table):  # (L, K, 3) -> (R, L, 3)
        return jnp.take_along_axis(
            table[None], sel[:, :, None, None], axis=2
        )[:, :, 0, :]

    lv0, lv1, lv2 = take(scene.lt_v0), take(scene.lt_v1), take(scene.lt_v2)
    ln0, ln1, ln2 = take(scene.lt_n0), take(scene.lt_n1), take(scene.lt_n2)

    if config.light_sampler == "ref":
        p1, p2, p3 = barycentric_ref(
            uniforms[:, :, 1], uniforms[:, :, 2], uniforms[:, :, 3]
        )
    else:
        p1, p2, p3 = barycentric_uniform(uniforms[:, :, 1], uniforms[:, :, 2])
    bc = lambda a, b, c: a * p1[..., None] + b * p2[..., None] + c * p3[..., None]
    light_p = bc(lv0, lv1, lv2)                              # (R, L, 3)
    light_n = normalize(bc(ln0, ln1, ln2))

    to_light = light_p - point[:, None, :]
    wo = normalize(to_light)                                 # (R, L, 3)

    # shadow rays: closest hit, flattened (R*L,)
    sh = intersect_fn(
        jnp.broadcast_to(point[:, None, :], (R, L, 3)).reshape(R * L, 3),
        wo.reshape(R * L, 3),
    )
    hit_mtl = jnp.where(
        sh.hit, scene.tri_mtl[sh.idx], jnp.int32(-1)
    ).reshape(R, L)
    if config.shadow_test == "mtl":
        visible = hit_mtl == scene.light_mtl[None, :]
    else:
        dist = jnp.sqrt(length2(to_light))
        visible = ~(sh.hit.reshape(R, L) & (sh.t.reshape(R, L) < dist - 1e-3))

    cos_o = dot(wo, pn[:, None, :])                          # (R, L)
    visible = visible & (cos_o > 0.0) & valid

    area = scene.light_area[None, :]
    inv_pdf = area                                           # pdf = 1/area
    cos_p = jnp.abs(dot(wo, light_n))
    cos_t = jnp.abs(cos_o)
    r2 = jnp.maximum(length2(to_light), 1e-20)
    intensity = (
        scene.light_radiance[None, :, :]
        * (cos_p * cos_t / r2 * inv_pdf)[..., None]
    )                                                        # (R, L, 3)

    h = normalize(wi[:, None, :] + wo)
    cos_alpha = jnp.maximum(dot(pn[:, None, :], h), 0.0)
    phong = (
        ks[:, None, :]
        * ((ns[:, None] + 2.0) * jnp.power(cos_alpha, ns[:, None]) / (2.0 * PI))[..., None]
    )
    brdf = kd_val[:, None, :] / PI + phong

    contrib = jnp.where(visible[..., None], intensity * brdf, 0.0)
    return jnp.sum(contrib, axis=1)                          # (R, 3)
