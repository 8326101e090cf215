"""BSDF sampling — the vectorized equivalent of the reference's nextRay()
(RayTracingOnCPU/pathTracing.cpp:147-209).

Decision tree per surviving ray (all branches evaluated, masked — no
data-dependent control flow under jit):

1. Refractive materials (Ni > 1): Schlick Fresnel
   ``F = rf0 + (1-rf0)(1-|cos_in|)^5`` with rf0 = ((n1-n2)/(n1+n2))^2 and
   media orientation from the sign of dot(d, pn) (pathTracing.cpp:155-174).
   With probability (1-F): refract (glm::refract) -> TRANSMISSION, or on
   total internal reflection: mirror reflect -> SPECULAR
   (pathTracing.cpp:175-188). With probability F: FALL THROUGH to the lobe
   choice below (the reference has no early mirror return here).
2. Lobe choice by vector lengths: kd = |Kd|/(|Kd|+|Ks|), ks likewise
   (pathTracing.cpp:191-194). u < kd: cosine-sample about the shading
   normal -> DIFFUSE. Else if Ns > 1 and u < kd+ks: Phong-lobe-sample about
   the mirror direction -> SPECULAR. Else: INVALID (the path dies — the
   reference leaves ray_type INVALID and shade() drops it,
   pathTracing.cpp:82).

Zero-length Kd and Ks produce 0/0=NaN fractions in the reference; both
comparisons are then false and the ray is INVALID — replicated here with an
explicit guard.
"""

from __future__ import annotations

import jax.numpy as jnp

from tinyraytracing_tpu.config import DIFFUSE, INVALID, SPECULAR, TRANSMISSION
from tinyraytracing_tpu.ops.linalg import dot, length, reflect, refract
from tinyraytracing_tpu.ops.sampling import sample_lobe


def sample_bsdf(d, pn, kd, ks, ns, ni, u_fresnel, u_lobe, u_phi, u_theta):
    """Sample the next ray direction and type for a batch of hits.

    d: (R,3) incoming ray direction; pn: (R,3) shading normal;
    kd/ks: (R,3); ns/ni: (R,); u_*: (R,) uniforms.
    Returns (new_dir (R,3), ray_type (R,) int32).
    """
    # --- Fresnel / refraction branch (Ni > 1) ---
    cos_in = dot(d, pn)
    exiting = cos_in > 0.0
    normal = jnp.where(exiting[:, None], -pn, pn)
    n1 = jnp.where(exiting, ni, 1.0)
    n2 = jnp.where(exiting, 1.0, ni)
    rf0 = jnp.square((n1 - n2) / (n1 + n2))
    fresnel = rf0 + (1.0 - rf0) * jnp.power(1.0 - jnp.abs(cos_in), 5.0)
    take_refract = (ni > 1.0) & (fresnel < u_fresnel)

    refr_dir, tir = refract(d, normal, n1 / n2)
    mirror_normal = reflect(d, normal)

    # --- lobe branch ---
    kd_len = length(kd)
    ks_len = length(ks)
    denom = kd_len + ks_len
    safe = denom > 0.0
    kd_frac = jnp.where(safe, kd_len / jnp.where(safe, denom, 1.0), 0.0)
    ks_frac = jnp.where(safe, ks_len / jnp.where(safe, denom, 1.0), 0.0)

    is_diffuse = safe & (u_lobe < kd_frac)
    is_specular = safe & ~is_diffuse & (ns > 1.0) & (u_lobe < kd_frac + ks_frac)
    lobe_axis = jnp.where(is_diffuse[:, None], pn, reflect(d, pn))
    lobe_dir = sample_lobe(lobe_axis, u_phi, u_theta, is_diffuse, ns)
    lobe_type = jnp.where(
        is_diffuse, DIFFUSE, jnp.where(is_specular, SPECULAR, INVALID)
    ).astype(jnp.int32)

    # --- combine ---
    new_dir = jnp.where(
        take_refract[:, None],
        jnp.where(tir[:, None], mirror_normal, refr_dir),
        lobe_dir,
    )
    ray_type = jnp.where(
        take_refract,
        jnp.where(tir, SPECULAR, TRANSMISSION).astype(jnp.int32),
        lobe_type,
    )
    return new_dir, ray_type
