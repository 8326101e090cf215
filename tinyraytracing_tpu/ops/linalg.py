"""Small batched vector-math helpers (last axis = xyz).

The reference leans on glm (vec3 ops) and one Eigen QR solve; everything here
is shape-(..., 3) jnp with safe guards so masked/dead lanes never produce
NaNs that survive a ``where``.
"""

from __future__ import annotations

import jax.numpy as jnp

EPS_NORM = 1e-20


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def cross(a, b):
    return jnp.cross(a, b)


def length(a):
    return jnp.sqrt(jnp.maximum(dot(a, a), 0.0))


def length2(a):
    return dot(a, a)


def normalize(a):
    return a * jnp.reciprocal(jnp.maximum(length(a), EPS_NORM))[..., None]


def reflect(d, n):
    """glm::reflect: d - 2*dot(d,n)*n."""
    return d - 2.0 * dot(d, n)[..., None] * n


def refract(d, n, eta):
    """glm::refract semantics: returns (refracted_dir, total_internal_reflection).

    k = 1 - eta^2 (1 - dot(n,d)^2); TIR iff k < 0 (glm returns the zero
    vector then — the reference tests ``!= vec3(0)``, pathTracing.cpp:177).
    """
    cosi = dot(n, d)
    k = 1.0 - eta * eta * (1.0 - cosi * cosi)
    tir = k < 0.0
    ksafe = jnp.maximum(k, 0.0)
    out = eta[..., None] * d - (eta * cosi + jnp.sqrt(ksafe))[..., None] * n
    return out, tir
