"""Monte-Carlo direction sampling, replicating the reference's Sample()
(RayTracingOnCPU/pathTracing.cpp:111-145) in batched form.

The reference builds a local frame around ``axis`` (the shading normal for
DIFFUSE, the mirror direction for SPECULAR):

    front = |a.x| > |a.y| ? normalize(a.z, 0, -a.x) : normalize(0, -a.z, a.y)
    right = cross(a, front)
    out   = normalize(right*s.x + a*s.y + front*s.z)

with s = (sinθ cosφ, cosθ, sinθ sinφ), φ = 2π u, and
θ = asin(√u) for the cosine-weighted diffuse lobe, or
θ = acos(u^(1/(Ns+1))) for the Phong specular lobe.
"""

from __future__ import annotations

import jax.numpy as jnp

from tinyraytracing_tpu.ops.linalg import cross, normalize

PI = jnp.pi


def reference_onb(axis):
    """(right, front) completing ``axis`` to the reference's local frame."""
    ax, ay, az = axis[..., 0], axis[..., 1], axis[..., 2]
    zeros = jnp.zeros_like(ax)
    f1 = jnp.stack([az, zeros, -ax], axis=-1)
    f2 = jnp.stack([zeros, -az, ay], axis=-1)
    front = normalize(
        jnp.where((jnp.abs(ax) > jnp.abs(ay))[..., None], f1, f2)
    )
    right = cross(axis, front)
    return right, front


def sample_lobe(axis, u_phi, u_theta, is_diffuse, ns):
    """Sample a direction about ``axis``: cosine lobe when is_diffuse else
    Phong lobe with exponent ns. All args broadcast over leading dims."""
    phi = 2.0 * PI * u_phi
    theta_d = jnp.arcsin(jnp.sqrt(jnp.clip(u_theta, 0.0, 1.0)))
    theta_s = jnp.arccos(
        jnp.clip(jnp.power(jnp.maximum(u_theta, 1e-30), 1.0 / (ns + 1.0)), -1.0, 1.0)
    )
    theta = jnp.where(is_diffuse, theta_d, theta_s)
    sx = jnp.sin(theta) * jnp.cos(phi)
    sy = jnp.cos(theta)
    sz = jnp.sin(theta) * jnp.sin(phi)
    right, front = reference_onb(axis)
    out = right * sx[..., None] + axis * sy[..., None] + front * sz[..., None]
    return normalize(out)


def barycentric_ref(u1, u2, u3):
    """The reference's light-point barycentrics: three uniforms normalized by
    their sum (pathTracing.cpp:44-47). NOT uniform over the triangle — kept
    for fidelity (config.light_sampler == "ref")."""
    s = u1 + u2 + u3
    s = jnp.where(s == 0.0, 1.0, s)
    return u1 / s, u2 / s, u3 / s


def barycentric_uniform(u1, u2):
    """Uniform-over-area barycentrics (sqrt warp) — the corrected sampler
    (config.light_sampler == "uniform")."""
    su = jnp.sqrt(jnp.clip(u1, 0.0, 1.0))
    p1 = 1.0 - su
    p2 = su * (1.0 - u2)
    p3 = su * u2
    return p1, p2, p3
