"""Planar pixel-persistent wavefront with DEFERRED next-event estimation.

This is the third-generation forward renderer (after wavefront.py's fixed
scan and regen.py's regeneration/persistent loops), addressing the two
costs that dominated the persistent renderer on a v5e:

1. **Layout.** TPU vector registers tile (8 sublanes, 128 lanes) over the
   last two dims, so every elementwise op on the (R, 3) ray-state arrays of
   regen.py ran at 3/128 lane utilization (shade + bookkeeping measured
   ~35% of the render). Here ALL per-ray state is component-planar: a
   vector is three (R,) planes (ops/vec.py), every op full-width. The
   Pallas intersectors gained matching planar entries
   (pallas_intersect_planes / pallas_bvh_intersect_planes) so no
   (R, 3) <-> plane relayout exists anywhere in the loop.

2. **One trace per iteration.** regen.py dispatched the intersection kernel
   twice per bounce (closest hit, then NEE shadow rays) and each dispatch
   carries ~2 ms of launch + pipeline overhead at 262k rays. Here NEE
   visibility is DEFERRED one iteration: at iteration i the kernel traces
   the (1+L)·R batch [bounce-i rays | shadow rays of bounce i-1], and the
   pending NEE contribution (throughput x radiance x G x BRDF, everything
   except visibility) resolves at i+1.

   Deferral is only this clean under PIXEL-PERSISTENT scheduling (lane ==
   pixel for a whole epoch): the path estimator is purely additive, so a
   resolved NEE term can be added straight into the lane's pixel
   accumulator even if its path has since terminated and the lane has
   already started the pixel's next sample. No parking, no scatter.

Estimator semantics are IDENTICAL to wavefront.trace / regen renderers
(reference pathTracing.cpp:3-102 NEE + RR + quirk flags; see
integrator/nee.py + integrator/bsdf.py for the file:line parity notes).
RNG is keyed per (epoch, iteration) and per path id => deterministic for a
given key; scheduling differs from regen.py so images agree in
distribution, not bitwise (tests/test_integrator.py checks MC agreement).

Forward-only (lax.while_loop), like regen.py; gradients use the scan path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from tinyraytracing_tpu.config import (
    CAMERA,
    DIFFUSE,
    INVALID,
    SPECULAR,
    TRANSMISSION,
    RenderConfig,
)
from tinyraytracing_tpu.models.camera import Camera, camera_basis
from tinyraytracing_tpu.ops import vec
from tinyraytracing_tpu.ops.sampling import PI

_INF = jnp.float32(3.0e38)


# ---------------------------------------------------------------------------
# planar building blocks
# ---------------------------------------------------------------------------

def intersect_planes(scene, o, d, config: RenderConfig):
    """Planar closest-hit dispatch: component triples in, (t, idx, u, v,
    hit) planes out. Uses the planar Pallas entries on TPU; falls back to
    the row-layout dispatcher elsewhere (CPU tests)."""
    on_tpu = jax.default_backend() == "tpu"
    backend = config.intersector
    if backend == "auto":
        if scene.bvh is not None and scene.bvh.packed is not None and on_tpu:
            backend = "bvh_pallas"
        elif on_tpu:
            backend = "pallas"
        else:
            backend = "rows"
    if backend == "pallas":
        from tinyraytracing_tpu.ops.pallas_intersect import (
            pallas_intersect_planes,
        )

        t, idx, u, v = pallas_intersect_planes(scene, *o, *d, config)
    elif backend == "bvh_pallas":
        from tinyraytracing_tpu.ops.pallas_bvh import (
            pallas_bvh_intersect_planes,
        )

        t, idx, u, v = pallas_bvh_intersect_planes(scene, *o, *d, config)
    else:
        from tinyraytracing_tpu.ops.intersect import intersect

        hit = intersect(scene, vec.to_rows(o), vec.to_rows(d), config)
        t, idx, u, v = hit.t, hit.idx, hit.u, hit.v
    return t, idx, u, v, t < _INF


def sample_lobe_planar(axis, u_phi, u_theta, is_diffuse, ns):
    """Planar ops/sampling.sample_lobe (reference Sample(),
    pathTracing.cpp:111-145)."""
    ax, ay, az = axis
    phi = (2.0 * PI) * u_phi
    theta_d = jnp.arcsin(jnp.sqrt(jnp.clip(u_theta, 0.0, 1.0)))
    theta_s = jnp.arccos(
        jnp.clip(jnp.power(jnp.maximum(u_theta, 1e-30), 1.0 / (ns + 1.0)), -1.0, 1.0)
    )
    theta = jnp.where(is_diffuse, theta_d, theta_s)
    st = jnp.sin(theta)
    sx = st * jnp.cos(phi)
    sy = jnp.cos(theta)
    sz = st * jnp.sin(phi)
    # reference ONB (pathTracing.cpp:131-144)
    zeros = jnp.zeros_like(ax)
    pickx = jnp.abs(ax) > jnp.abs(ay)
    front = vec.normalize(vec.where(
        pickx, (az, zeros, -ax), (zeros, -az, ay)
    ))
    right = vec.cross(axis, front)
    return vec.normalize((
        right[0] * sx + ax * sy + front[0] * sz,
        right[1] * sx + ay * sy + front[1] * sz,
        right[2] * sx + az * sy + front[2] * sz,
    ))


def sample_bsdf_planar(d, pn, kd, ks, ns, ni, u_fresnel, u_lobe, u_phi, u_theta):
    """Planar integrator/bsdf.sample_bsdf (reference nextRay(),
    pathTracing.cpp:147-209). Same decision tree, component planes."""
    cos_in = vec.dot(d, pn)
    exiting = cos_in > 0.0
    normal = vec.where(exiting, vec.neg(pn), pn)
    n1 = jnp.where(exiting, ni, 1.0)
    n2 = jnp.where(exiting, 1.0, ni)
    rf0 = jnp.square((n1 - n2) / (n1 + n2))
    fresnel = rf0 + (1.0 - rf0) * jnp.power(1.0 - jnp.abs(cos_in), 5.0)
    take_refract = (ni > 1.0) & (fresnel < u_fresnel)

    refr_dir, tir = vec.refract(d, normal, n1 / n2)
    mirror_normal = vec.reflect(d, normal)

    kd_len = vec.length(kd)
    ks_len = vec.length(ks)
    denom = kd_len + ks_len
    safe = denom > 0.0
    inv_denom = jnp.reciprocal(jnp.where(safe, denom, 1.0))
    kd_frac = jnp.where(safe, kd_len * inv_denom, 0.0)
    ks_frac = jnp.where(safe, ks_len * inv_denom, 0.0)

    is_diffuse = safe & (u_lobe < kd_frac)
    is_specular = safe & ~is_diffuse & (ns > 1.0) & (u_lobe < kd_frac + ks_frac)
    lobe_axis = vec.where(is_diffuse, pn, vec.reflect(d, pn))
    lobe_dir = sample_lobe_planar(lobe_axis, u_phi, u_theta, is_diffuse, ns)
    lobe_type = jnp.where(
        is_diffuse, DIFFUSE, jnp.where(is_specular, SPECULAR, INVALID)
    ).astype(jnp.int32)

    new_dir = vec.where(
        take_refract, vec.where(tir, mirror_normal, refr_dir), lobe_dir
    )
    ray_type = jnp.where(
        take_refract,
        jnp.where(tir, SPECULAR, TRANSMISSION).astype(jnp.int32),
        lobe_type,
    )
    return new_dir, ray_type


def _tex_kd(scene, m, idx, u, v, w):
    """Planar Kd fetch: texture (barycentric-interp UV, wrap, nearest —
    reference pathTracing.cpp:15-30) or constant material Kd."""
    tid = scene.tex_id[m]
    has_tex = tid >= 0
    tid_safe = jnp.maximum(tid, 0)
    col = scene.t0[idx, 0] * w + scene.t1[idx, 0] * u + scene.t2[idx, 0] * v
    row = scene.t0[idx, 1] * w + scene.t1[idx, 1] * u + scene.t2[idx, 1] * v
    icol = col - jnp.floor(col)
    irow = row - jnp.floor(row)
    th = scene.tex_hw[tid_safe, 0]
    tw = scene.tex_hw[tid_safe, 1]
    r_ix = jnp.clip((irow * th).astype(jnp.int32), 0, th - 1)
    c_ix = jnp.clip((icol * tw).astype(jnp.int32), 0, tw - 1)
    texel = (
        scene.tex[tid_safe, r_ix, c_ix, 0],
        scene.tex[tid_safe, r_ix, c_ix, 1],
        scene.tex[tid_safe, r_ix, c_ix, 2],
    )
    kd_m = vec.gather(scene.kd, m)
    return vec.where(has_tex, texel, kd_m)


def _nee_geometry(scene, config, l, point, pn, wi, kd_val, ks, ns,
                  u_pick, u1, u2, u3, shade_mask):
    """Everything of light l's NEE term EXCEPT visibility (reference
    pathTracing.cpp:34-74 split at the shadow trace): returns the shadow
    direction, the pre-visibility contribution planes, the light distance,
    and the validity mask. All planar over R lanes."""
    prefix = scene.lt_prefix[l]                       # (K,) +inf padded
    area = scene.light_area[l]
    if config.light_sampler == "ref":
        rnd = u_pick * scene.nee_range
    else:
        rnd = u_pick * area
    valid = rnd < area
    # first triangle with prefix > rnd == count of prefix <= rnd
    sel = jnp.sum(
        (prefix[:, None] <= rnd[None, :]).astype(jnp.int32), axis=0
    )
    sel = jnp.minimum(sel, prefix.shape[0] - 1)

    gat = lambda tab: vec.gather(tab[l], sel)
    lv0, lv1, lv2 = gat(scene.lt_v0), gat(scene.lt_v1), gat(scene.lt_v2)
    ln0, ln1, ln2 = gat(scene.lt_n0), gat(scene.lt_n1), gat(scene.lt_n2)

    if config.light_sampler == "ref":
        s = u1 + u2 + u3
        s = jnp.where(s == 0.0, 1.0, s)
        p1, p2, p3 = u1 / s, u2 / s, u3 / s
    else:
        su = jnp.sqrt(jnp.clip(u1, 0.0, 1.0))
        p1, p2, p3 = 1.0 - su, su * (1.0 - u2), su * u2
    bc = lambda a, b, c: (
        a[0] * p1 + b[0] * p2 + c[0] * p3,
        a[1] * p1 + b[1] * p2 + c[1] * p3,
        a[2] * p1 + b[2] * p2 + c[2] * p3,
    )
    light_p = bc(lv0, lv1, lv2)
    light_n = vec.normalize(bc(ln0, ln1, ln2))

    to_light = vec.sub(light_p, point)
    r2 = jnp.maximum(vec.length2(to_light), 1e-20)
    dist = jnp.sqrt(r2)
    wo = vec.scale(to_light, jnp.reciprocal(jnp.maximum(dist, 1e-20)))

    cos_o = vec.dot(wo, pn)
    ok = shade_mask & valid & (cos_o > 0.0)

    cos_p = jnp.abs(vec.dot(wo, light_n))
    geom = cos_p * jnp.abs(cos_o) / r2 * area        # pdf = 1/area
    lr = scene.light_radiance[l]

    h = vec.normalize(vec.add(wi, wo))
    cos_alpha = jnp.maximum(vec.dot(pn, h), 0.0)
    phong_s = (ns + 2.0) * jnp.power(cos_alpha, ns) / (2.0 * PI)
    contrib = (
        lr[0] * geom * (kd_val[0] / PI + ks[0] * phong_s),
        lr[1] * geom * (kd_val[1] / PI + ks[1] * phong_s),
        lr[2] * geom * (kd_val[2] / PI + ks[2] * phong_s),
    )
    zero = jnp.zeros_like(geom)
    contrib = vec.where(ok, contrib, (zero, zero, zero))
    return wo, contrib, dist, ok


# ---------------------------------------------------------------------------
# the renderer
# ---------------------------------------------------------------------------

def render_planar(
    scene,
    cam: Camera,
    key,
    config: RenderConfig,
    spp: int,
    lanes: int = 262144,
    max_iters: int | None = None,
):
    """Render (H, W, 3); returns (image, traced_ray_count). Pixel-persistent
    epochs as regen.render_persistent, planar state + fused deferred-NEE
    trace per iteration (module docstring)."""
    W, H = cam.width, cam.height
    n_pix = W * H
    R = min(lanes, n_pix)
    R = -(-R // 128) * 128                           # full lane tiles
    n_epochs = -(-n_pix // R)
    if max_iters is None:
        max_iters = int(spp * (1.0 / (1.0 - config.p_rr)) * 3) + config.max_depth + 9

    eye, horizontal, vertical, llc = camera_basis(cam)
    inv_spp = jnp.float32(1.0 / spp)
    L = scene.light_mtl.shape[0]
    shape = (R,)

    def camera_ray(path_id):
        pix = path_id // spp
        i = (pix // W).astype(jnp.float32)
        j = (pix % W).astype(jnp.float32)
        bits = jax.random.key_data(jax.vmap(
            lambda t: jax.random.fold_in(key, t))(path_id))
        h1 = (bits[..., 0].astype(jnp.uint32) >> 8).astype(jnp.float32) / jnp.float32(1 << 24)
        h2 = (bits[..., 1].astype(jnp.uint32) >> 8).astype(jnp.float32) / jnp.float32(1 << 24)
        x = j / (W - 1.0) + (h1 - 0.5) / W
        y = (H - i) / (H - 1.0) + (h2 - 0.5) / H
        d = (
            llc[0] + x * horizontal[0] + y * vertical[0] - eye[0],
            llc[1] + x * horizontal[1] + y * vertical[1] - eye[1],
            llc[2] + x * horizontal[2] + y * vertical[2] - eye[2],
        )
        d = vec.normalize(d)
        o = vec.splat(eye, d[0].shape)
        return o, d

    # camera_basis returns (3,) arrays; keep host-scalar components
    eye = tuple(eye[k] for k in range(3))
    horizontal = tuple(horizontal[k] for k in range(3))
    vertical = tuple(vertical[k] for k in range(3))
    llc = tuple(llc[k] for k in range(3))

    def epoch(e, carry):
        img, rays_traced = carry
        lane = jnp.arange(R, dtype=jnp.int32)
        pixel = e * R + lane
        in_range = pixel < n_pix

        def cond(s):
            it = s[0]
            active, samples_done = s[1], s[2]
            pend_ok = s[12]
            more = jnp.any(active) | jnp.any(in_range & (samples_done < spp))
            for p in pend_ok:
                more = more | jnp.any(p)
            return (it < max_iters) & more

        def body(s):
            (it, active, samples_done, bounce, o, d, ray_type, thr, rad,
             accum, sh_o, sh_d, pend_ok, pend_c, pend_dist, rays_traced) = s

            # --- regenerate: start the pixel's next sample on dead lanes
            can = ~active & in_range & (samples_done < spp)
            path_id = jnp.where(can, pixel * spp + samples_done, 0)
            norg, nd = camera_ray(path_id)
            o = vec.where(can, norg, o)
            d = vec.where(can, nd, d)
            ray_type = jnp.where(can, CAMERA, ray_type)
            one = jnp.ones(shape, jnp.float32)
            zero = jnp.zeros(shape, jnp.float32)
            thr = vec.where(can, (one, one, one), thr)
            rad = vec.where(can, (zero, zero, zero), rad)
            bounce = jnp.where(can, 0, bounce)
            samples_done = samples_done + can.astype(jnp.int32)
            active = active | can

            # --- ONE fused trace: [bounce rays | L shadow-ray groups]
            cat = lambda main, sh: jnp.concatenate([main] + sh)
            ox = cat(o[0], [sh_o[0]] * L)
            oy = cat(o[1], [sh_o[1]] * L)
            oz = cat(o[2], [sh_o[2]] * L)
            dx = cat(d[0], [sh_d[l][0] for l in range(L)])
            dy = cat(d[1], [sh_d[l][1] for l in range(L)])
            dz = cat(d[2], [sh_d[l][2] for l in range(L)])
            t_all, idx_all, u_all, v_all, hit_all = intersect_planes(
                scene, (ox, oy, oz), (dx, dy, dz), config
            )
            step_rays = jnp.sum(active.astype(jnp.int32))
            for l in range(L):
                step_rays = step_rays + jnp.sum(pend_ok[l].astype(jnp.int32))
            rays_traced = rays_traced + step_rays.astype(jnp.float32)

            # --- resolve LAST iteration's NEE with this trace's shadow legs
            for l in range(L):
                sl = slice((1 + l) * R, (2 + l) * R)
                sh_hit = hit_all[sl]
                if config.shadow_test == "mtl":
                    sh_m = scene.tri_mtl[idx_all[sl]]
                    vis = sh_hit & (sh_m == scene.light_mtl[l])
                else:
                    vis = ~(sh_hit & (t_all[sl] < pend_dist[l] - 1e-3))
                add = pend_ok[l] & vis
                accum = (
                    accum[0] + jnp.where(add, pend_c[l][0] * inv_spp, 0.0),
                    accum[1] + jnp.where(add, pend_c[l][1] * inv_spp, 0.0),
                    accum[2] + jnp.where(add, pend_c[l][2] * inv_spp, 0.0),
                )

            # --- shade the bounce leg
            t = t_all[:R]
            idx = idx_all[:R]
            bu = u_all[:R]
            bv = v_all[:R]
            hit = hit_all[:R]
            m = scene.tri_mtl[idx]
            point = vec.add(o, vec.scale(d, t))

            hit_emissive = hit & scene.tri_emissive[idx]
            include = (ray_type == CAMERA) | (ray_type == TRANSMISSION)
            emit = active & hit_emissive & include
            mrad = vec.gather(scene.radiance, m)
            rad = (
                rad[0] + jnp.where(emit, thr[0] * mrad[0], 0.0),
                rad[1] + jnp.where(emit, thr[1] * mrad[1], 0.0),
                rad[2] + jnp.where(emit, thr[2] * mrad[2], 0.0),
            )
            shade_mask = active & hit & ~hit_emissive

            bw = 1.0 - bu - bv
            n0 = vec.gather(scene.n0, idx)
            n1 = vec.gather(scene.n1, idx)
            n2 = vec.gather(scene.n2, idx)
            pn = vec.normalize((
                n0[0] * bw + n1[0] * bu + n2[0] * bv,
                n0[1] * bw + n1[1] * bu + n2[1] * bv,
                n0[2] * bw + n1[2] * bu + n2[2] * bv,
            ))
            kd_val = _tex_kd(scene, m, idx, bu, bv, bw)
            ks = vec.gather(scene.ks, m)
            ns = scene.ns[m]
            wi = vec.neg(d)

            # --- queue THIS bounce's NEE (resolves next iteration)
            kb = jax.random.fold_in(jax.random.fold_in(key, 3), e * max_iters + it)
            nee_u = jax.random.uniform(
                jax.random.fold_in(kb, 0), (L, 4, R), dtype=jnp.float32
            )
            # pre-scale by throughput: the pending term is final once visible
            new_pend_ok, new_pend_c, new_pend_dist, new_sh_d = [], [], [], []
            for l in range(L):
                wo, contrib, distl, okl = _nee_geometry(
                    scene, config, l, point, pn, wi, kd_val, ks, ns,
                    nee_u[l, 0], nee_u[l, 1], nee_u[l, 2], nee_u[l, 3],
                    shade_mask,
                )
                new_pend_ok.append(okl)
                new_pend_c.append(vec.mul(thr, contrib))
                new_pend_dist.append(distl)
                fallback = vec.splat(jnp.asarray([0.0, 0.0, 1.0]), shape)
                new_sh_d.append(vec.where(okl, wo, fallback))
            sh_o = point
            pend_ok = tuple(new_pend_ok)
            pend_c = tuple(new_pend_c)
            pend_dist = tuple(new_pend_dist)
            sh_d = tuple(new_sh_d)

            # --- Russian roulette + BSDF continuation
            u = jax.random.uniform(jax.random.fold_in(kb, 1), (5, R),
                                   dtype=jnp.float32)
            survive = shade_mask & (u[0] < config.p_rr) & (bounce + 1 < config.max_depth)
            ni = scene.ni[m]
            new_dir, new_type = sample_bsdf_planar(
                d, pn, vec.gather(scene.kd, m), ks, ns, ni,
                u[1], u[2], u[3], u[4],
            )
            alive_next = survive & (new_type != INVALID)

            if config.specular_weight == "ref":
                ds_weight = kd_val
            else:
                ds_weight = vec.where((new_type == SPECULAR), ks, kd_val)
            trm = vec.gather(scene.tr, m)
            weight = vec.where(new_type == TRANSMISSION, trm, ds_weight)
            inv_prr = jnp.float32(1.0 / config.p_rr)
            thr = vec.where(
                alive_next,
                (thr[0] * weight[0] * inv_prr,
                 thr[1] * weight[1] * inv_prr,
                 thr[2] * weight[2] * inv_prr),
                thr,
            )
            o = vec.where(alive_next, point, o)
            d = vec.where(alive_next, new_dir,
                          vec.splat(jnp.asarray([0.0, 0.0, 1.0]), shape))
            ray_type = jnp.where(alive_next, new_type, ray_type)
            bounce = bounce + 1

            # --- finished paths: emissive radiance into the lane accumulator
            finished = active & ~alive_next
            accum = (
                accum[0] + jnp.where(finished, rad[0] * inv_spp, 0.0),
                accum[1] + jnp.where(finished, rad[1] * inv_spp, 0.0),
                accum[2] + jnp.where(finished, rad[2] * inv_spp, 0.0),
            )
            active = alive_next

            return (it + 1, active, samples_done, bounce, o, d, ray_type,
                    thr, rad, accum, sh_o, sh_d, pend_ok, pend_c, pend_dist,
                    rays_traced)

        zero = jnp.zeros(shape, jnp.float32)
        one = jnp.ones(shape, jnp.float32)
        z3 = (zero, zero, zero)
        up = vec.splat(jnp.asarray([0.0, 0.0, 1.0]), shape)
        state = (
            jnp.int32(0),
            jnp.zeros(shape, bool),              # active
            jnp.zeros(shape, jnp.int32),         # samples_done
            jnp.zeros(shape, jnp.int32),         # bounce
            z3,                                  # o
            up,                                  # d
            jnp.full(shape, CAMERA, jnp.int32),  # ray_type
            (one, one, one),                     # throughput
            z3,                                  # radiance (emissive terms)
            z3,                                  # accum
            z3,                                  # sh_o
            tuple(up for _ in range(L)),         # sh_d
            tuple(jnp.zeros(shape, bool) for _ in range(L)),   # pend_ok
            tuple(z3 for _ in range(L)),         # pend_c
            tuple(zero for _ in range(L)),       # pend_dist
            rays_traced,
        )
        state = jax.lax.while_loop(cond, body, state)
        accum, rays_traced = state[9], state[-1]
        img = jax.lax.dynamic_update_slice(
            img, jnp.stack(accum, axis=-1), (e * R, 0)
        )
        return img, rays_traced

    img = jnp.zeros((n_epochs * R, 3), jnp.float32)
    rt0 = jnp.float32(0.0)  # per-step counts are exact int32; f32 total avoids int32 overflow at >2^31 rays
    img, rays_traced = jax.lax.fori_loop(0, n_epochs, epoch, (img, rt0))
    return img[:n_pix].reshape(H, W, 3), rays_traced


@partial(jax.jit, static_argnames=("config", "spp", "lanes"))
def render_planar_jit(scene, cam, key, config, spp, lanes=262144):
    return render_planar(scene, cam, key, config, spp, lanes)[0]


@partial(jax.jit, static_argnames=("config", "spp", "lanes"))
def render_planar_stats_jit(scene, cam, key, config, spp, lanes=262144):
    return render_planar(scene, cam, key, config, spp, lanes)
