"""Wavefront path-tracing loop.

The reference's recursive estimator (shade(), pathTracing.cpp:3-102) is
re-expressed as a fixed-depth ``lax.scan`` over bounce waves. Per bounce,
for the whole ray batch at once:

1. closest-hit intersect (reference traverseBVH, bvh.cpp:146-175)
2. emissive hits terminate, contributing throughput * radiance — but only
   when the PREVIOUS bounce was the camera or a TRANSMISSION ray: the
   reference's indirect switch excludes emissive hits for DIFFUSE and
   SPECULAR rays to avoid double counting with NEE (pathTracing.cpp:87-93),
   while its default (TRANSMISSION) case includes them (pathTracing.cpp:96).
3. surviving hits: diffuse albedo from texture or constant
   (pathTracing.cpp:15-30), then NEE direct light (integrator/nee.py)
4. Russian roulette with P_RR = 0.8 (pathtracing.h:12): survivors sample the
   BSDF (integrator/bsdf.py) and carry
   throughput *= weight / P_RR, where weight is Kd for DIFFUSE **and**
   SPECULAR bounces (the reference's quirk, pathTracing.cpp:91-93; set
   config.specular_weight="ks" for the corrected Ks weight) and Tr for
   TRANSMISSION (pathTracing.cpp:96).

No origin offset is applied to secondary rays — like the reference, the
t_min = 5e-4 epsilon in the intersector is the only acne guard
(pathTracing.cpp:207, bvh.cpp:189).

The fixed depth truncates paths the reference's unbounded recursion would
continue; with P_RR = 0.8 and typical albedos the truncated mass at the
default depth 16 is < 1e-2 * 0.8^16 ≈ negligible.

RNG: counter-based ``jax.random`` (threefry) keys folded per (bounce,
purpose), with per-ray streams coming from the batch dimension of each
draw — bit-reproducible for a given key regardless of device count or
sharding, unlike the reference's racy shared ``default_random_engine``
(main.cpp:57-58).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tinyraytracing_tpu.config import CAMERA, INVALID, RenderConfig, TRANSMISSION
from tinyraytracing_tpu.integrator.bsdf import sample_bsdf
from tinyraytracing_tpu.integrator.nee import direct_light
from tinyraytracing_tpu.ops.intersect import intersect
from tinyraytracing_tpu.ops.linalg import normalize


def trace(scene, org, d, key, config: RenderConfig, return_stats: bool = False):
    """Estimate radiance for a batch of camera rays. Returns (R, 3); with
    ``return_stats`` also a dict of per-bounce ray counts (closest-hit rays
    actually alive + shadow rays — the honest "rays traced" denominator for
    rays/s reporting)."""
    R = org.shape[0]
    L = scene.light_mtl.shape[0]

    def intersect_fn(o, dd):
        return intersect(scene, o, dd, config)

    def bounce(carry, depth):
        org, d, ray_type, throughput, radiance, alive = carry
        kb = jax.random.fold_in(key, depth)
        ks_ = lambda i: jax.random.fold_in(kb, i)

        hit = intersect_fn(org, d)
        idx = hit.idx
        m = scene.tri_mtl[idx]
        point = org + hit.t[:, None] * d

        hit_emissive = hit.hit & scene.tri_emissive[idx]
        include_emis = (ray_type == CAMERA) | (ray_type == TRANSMISSION)
        emis_contrib = scene.radiance[m]
        radiance = radiance + jnp.where(
            (alive & hit_emissive & include_emis)[:, None],
            throughput * emis_contrib,
            0.0,
        )

        shade_mask = alive & hit.hit & ~hit_emissive

        # interpolated shading normal (reference interactBVHNode,
        # bvh.cpp:222-224, via the per-hit Eigen QR solve — here the free
        # Möller–Trumbore barycentrics)
        w = hit.w
        pn = normalize(
            scene.n0[idx] * w[:, None]
            + scene.n1[idx] * hit.u[:, None]
            + scene.n2[idx] * hit.v[:, None]
        )

        # diffuse albedo: texture or constant (pathTracing.cpp:15-30)
        tid = scene.tex_id[m]
        has_tex = tid >= 0
        tid_safe = jnp.maximum(tid, 0)
        col = scene.t0[idx, 0] * w + scene.t1[idx, 0] * hit.u + scene.t2[idx, 0] * hit.v
        row = scene.t0[idx, 1] * w + scene.t1[idx, 1] * hit.u + scene.t2[idx, 1] * hit.v
        icol = col - jnp.floor(col)
        irow = row - jnp.floor(row)
        th = scene.tex_hw[tid_safe, 0]
        tw = scene.tex_hw[tid_safe, 1]
        r_ix = jnp.clip((irow * th).astype(jnp.int32), 0, th - 1)
        c_ix = jnp.clip((icol * tw).astype(jnp.int32), 0, tw - 1)
        tex_val = scene.tex[tid_safe, r_ix, c_ix]
        kd_val = jnp.where(has_tex[:, None], tex_val, scene.kd[m])

        # NEE direct lighting. Dead lanes are parked far outside the scene
        # so their shadow rays fail the root AABB test instead of walking
        # the tree (their contribution is masked below either way).
        wi = -d
        nee_uniforms = jax.random.uniform(ks_(0), (R, L, 4), dtype=jnp.float32)
        point_sh = jnp.where(shade_mask[:, None], point, 1.0e30)
        l_dir = direct_light(
            scene, config, intersect_fn,
            point_sh, pn, wi, kd_val, scene.ks[m], scene.ns[m], nee_uniforms,
        )
        radiance = radiance + jnp.where(
            shade_mask[:, None], throughput * l_dir, 0.0
        )

        # Russian roulette (pathTracing.cpp:78) + BSDF sampling
        u = jax.random.uniform(ks_(1), (5, R), dtype=jnp.float32)
        survive = shade_mask & (u[0] < config.p_rr)
        new_dir, new_type = sample_bsdf(
            d, pn, scene.kd[m], scene.ks[m], scene.ns[m], scene.ni[m],
            u[1], u[2], u[3], u[4],
        )
        if config.detach_sampling:
            # path-replay backward: the sampling DECISIONS are treated as
            # fixed; gradients flow through the contribution terms only
            new_dir = jax.lax.stop_gradient(new_dir)
        valid = new_type != INVALID
        alive = survive & valid

        # bounce weight (pathTracing.cpp:85-97): Kd for DIFFUSE/SPECULAR
        # ("ref") or Ks for SPECULAR ("ks"), Tr for TRANSMISSION.
        if config.specular_weight == "ref":
            ds_weight = kd_val
        else:
            from tinyraytracing_tpu.config import SPECULAR

            ds_weight = jnp.where(
                (new_type == SPECULAR)[:, None], scene.ks[m], kd_val
            )
        weight = jnp.where(
            (new_type == TRANSMISSION)[:, None], scene.tr[m], ds_weight
        )
        throughput = jnp.where(
            alive[:, None], throughput * weight / config.p_rr, throughput
        )

        # dead rays keep a harmless unit direction so the next intersect
        # stays NaN-free; their results are masked anyway.
        safe_dir = jnp.where(alive[:, None], new_dir, jnp.array([0.0, 0.0, 1.0]))
        org = jnp.where(alive[:, None], point, org)
        stats = dict(
            primary=jnp.sum(carry[5].astype(jnp.int32)),
            shadow=jnp.sum(shade_mask.astype(jnp.int32)) * L,
        )
        return (org, safe_dir, new_type, throughput, radiance, alive), stats

    init = (
        org,
        d,
        jnp.full((R,), CAMERA, jnp.int32),
        jnp.ones((R, 3), jnp.float32),
        jnp.zeros((R, 3), jnp.float32),
        jnp.ones((R,), bool),
    )
    carry, stats = jax.lax.scan(
        bounce, init, jnp.arange(config.max_depth), unroll=1
    )
    if return_stats:
        return carry[4], stats
    return carry[4]
