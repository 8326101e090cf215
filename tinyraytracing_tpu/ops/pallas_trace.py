"""Pallas TPU kernel: FUSED packet BVH traversal + hit-attribute shading.

Round-1 profiling showed the render loop spending ~85% of device time in
XLA per-lane gathers of per-triangle attributes (shading normals,
texcoords, material ids) AFTER the intersection kernel returned (t, idx):
every gather of 262K elements costs ~2-4 ms on a v5e regardless of table
size, and the shade path needs ~15 of them per bounce. The intersection
kernel itself was 3% of the render.

This kernel removes the gathers entirely: the leaf payload carries a
second 4-row block of SHADING attributes per triangle slot (PackedLeaves.PS
— per-vertex normals, texcoords, material id), and the per-slot loop
best-updates the barycentric-INTERPOLATED shading normal and texcoord plus
the material/emissive ids alongside the hit distance. Attribute reads are
SMEM scalar loads (~free — see ops/pallas_intersect.py for the measured
layout rules); the interpolation is straight-line (8, 128) VPU code. The
integrator that consumes this kernel (integrator/fused.py) then runs with
ZERO per-triangle gathers — remaining table lookups (materials, light
triangles) chain over tiny tables as fused selects (ops/lookup.py).

TWO WALKS (config.bvh_walk):

- "wide" (round 4, default): 8-wide collapsed nodes (ops/bvh.widen_bvh)
  walked with a scalar SMEM STACK shared by the whole packet. One interior
  visit DMAs one 128-f32 row and slab-tests all 8 child boxes; union-hit
  children are pushed (branch-free conditional-bump stores). Leaf pops go
  straight to the slot loop — their box was already tested at the parent.
  On union-saturated big trees this cuts visits ~(1 interior per 8
  children + leaves) vs (every node) and the serialized per-visit node
  DMAs ~7x — the round-3 attribution's last 2x-class lever.
- "binary" (round 3): preorder skip-link cursor walk, one node per visit.
  Kept as the A/B oracle and fallback.

Both walks visit the SAME leaf set modulo best-t staleness (a wide walk
may slot-test a leaf a tighter bound would have pruned; every extra test
fails the per-slot ``tm < bt`` update), so results are bitwise-identical.

Memory plan (validated by microbenchmark on v5e — serialized 2 KB
HBM->SMEM DMAs with a data-dependent walk measured ~20-50 ns/visit):

- leaf payload PS lives in ANY (compiler: VMEM when small, HBM when big)
  and each leaf visit DMAs its (8, 128) block into SMEM scratch — this
  lifts round-1's ~190K-triangle VMEM residency cap (BASELINE.md).
- node tables: SMEM flat arrays for small trees (fast scalar loads);
  beyond the SMEM budget the HBM-row variants DMA one row per visit.

Traversal semantics identical to ops/pallas_bvh.py (union descend,
epsilon-banded emissive tie-break per RayTracingOnCPU/bvh.cpp:219,
t_min 5e-4 per bvh.cpp:189, grazing cull 1e-5 per bvh.cpp:185);
cross-checked against the other intersectors in tests/test_pallas_trace.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tinyraytracing_tpu.config import RenderConfig
from tinyraytracing_tpu.models.scene import Scene

_INF = 3.0e38
# RAY_TILE: rays per packet (one shared walk per packet). Swept on v5e
# (full renders): 4096 is the broad winner — cornell 71.7 -> 121.8M,
# veach 10.8 -> 12.5M, staircase 4.1 -> 4.7 Mrays/s (the scalar walk
# bookkeeping amortizes over 32 rows) — EXCEPT big wide trees (grid100K
# n_wide=1883: 0.52M @1024 vs 0.44M @4096, the per-packet node union
# grows faster than the amortization) — so the tile is picked per scene:
# 1024 when the wide tree exceeds WIDE_TILE_LIMIT rows, else 4096.
# config.ray_tile overrides for sweeps (a config field so it participates
# in the jit cache key — an env knob would silently hit stale compilations).
import os as _os
RAY_TILE = 4096
RAY_TILE_BIG = 1024
WIDE_TILE_LIMIT = 1024
SLOT = 32          # triangle slots per leaf block (PackedLeaves layout)
N_OUT = 9          # t, pn xyz, tc uv, mtl, em, slot

# node count beyond which the node tables move from SMEM to HBM records.
# Measured on v5e (262K random rays): the HBM-record path is as fast as or
# faster than SMEM nodes even at veach-mis scale (99.5 vs 95.3 Mrays/s,
# 815 nodes), and large SMEM node tables HANG the device — staircase's
# 10,759-node table (430 KB) never completes and is killed by the TPU
# watchdog ("UNAVAILABLE: TPU device error"), while the same tree via HBM
# records runs at 110.7 Mrays/s. Keep SMEM only for small trees where it
# is known-safe.
SMEM_NODE_LIMIT = 1024
# same limit for the wide walk, in wide-node rows (128 f32 each): 1024
# rows = 512 KB would exceed SMEM; keep the known-safe budget of ~40 KB
SMEM_WIDE_LIMIT = 80

# leaf-payload float count below which the WHOLE packed payload lives in
# SMEM (no per-visit DMA). MEASURED AND REJECTED as the default on v5e:
# cornell full render dropped 71 -> 53 Mrays/s — the direct scalar loads
# pay a dynamic-offset address computation per read (512 reads per leaf
# visit), while the DMA path's scratch reads use constant offsets and
# the 4 KB copy itself is cheap. Kept as an experimental variant
# (tests force it via monkeypatch); 0 disables.
SMEM_PS_FLOATS = 0


def _ray_consts(ox, oy, oz, dx, dy, dz):
    """Hoisted per-packet slab-test constants (see _walk docstring)."""
    # axis-parallel sentinel 1e18 (not f32-INF): with the hoisted o*inv
    # form, an INF sentinel would give b*inv - o*inv = inf - inf = NaN
    # for d==0 rays; 1e18 keeps every product finite (scene coords ~1e3)
    # while (b - o)*1e18 still acts as +/-inf in the min/max slab logic
    big = jnp.float32(1e18)
    tiny = jnp.float32(1e-18)
    invx = jnp.where(jnp.abs(dx) < tiny, big, 1.0) / jnp.where(jnp.abs(dx) < tiny, 1.0, dx)
    invy = jnp.where(jnp.abs(dy) < tiny, big, 1.0) / jnp.where(jnp.abs(dy) < tiny, 1.0, dy)
    invz = jnp.where(jnp.abs(dz) < tiny, big, 1.0) / jnp.where(jnp.abs(dz) < tiny, 1.0, dz)
    # hoisted o*inv: the slab test becomes 6 FMAs per box instead of
    # 6 subs + 6 muls (the walk is VPU-bound on these — see BASELINE.md)
    return invx, invy, invz, ox * invx, oy * invy, oz * invz


def _slab(bx0, by0, bz0, bx1, by1, bz1, invx, invy, invz, oix, oiy, oiz,
          bt, tie_eps):
    """Slab test of one (scalar) box against the packet; returns the
    per-lane hit mask pruned by the current per-lane best t."""
    t_ax = bx0 * invx - oix
    t_bx = bx1 * invx - oix
    t_ay = by0 * invy - oiy
    t_by = by1 * invy - oiy
    t_az = bz0 * invz - oiz
    t_bz = bz1 * invz - oiz
    t0 = jnp.maximum(
        jnp.maximum(jnp.minimum(t_ax, t_bx), jnp.minimum(t_ay, t_by)),
        jnp.minimum(t_az, t_bz),
    )
    t1 = jnp.minimum(
        jnp.minimum(jnp.maximum(t_ax, t_bx), jnp.maximum(t_ay, t_by)),
        jnp.maximum(t_az, t_bz),
    )
    dist = jnp.where(t0 > 0.0, t0, t1)
    return (t1 >= t0) & (dist > 0.0) & (
        jnp.maximum(t0, 0.0) <= bt * (1.0 + tie_eps)
    )


def _slab2(bx0, by0, bz0, bx1, by1, bz1, invx, invy, invz, oix, oiy, oiz,
           bt, tie_eps, with_entry=True):
    """_slab + the packet's MIN entry distance (for pop-time stale culling:
    every content hit in the box satisfies tm >= entry, so a popped node
    whose recorded entry exceeds max(bt)*(1+tie_eps) can never update any
    lane — skipping it is bitwise-free)."""
    t_ax = bx0 * invx - oix
    t_bx = bx1 * invx - oix
    t_ay = by0 * invy - oiy
    t_by = by1 * invy - oiy
    t_az = bz0 * invz - oiz
    t_bz = bz1 * invz - oiz
    t0 = jnp.maximum(
        jnp.maximum(jnp.minimum(t_ax, t_bx), jnp.minimum(t_ay, t_by)),
        jnp.minimum(t_az, t_bz),
    )
    t1 = jnp.minimum(
        jnp.minimum(jnp.maximum(t_ax, t_bx), jnp.maximum(t_ay, t_by)),
        jnp.maximum(t_az, t_bz),
    )
    dist = jnp.where(t0 > 0.0, t0, t1)
    mask = (t1 >= t0) & (dist > 0.0) & (
        jnp.maximum(t0, 0.0) <= bt * (1.0 + tie_eps)
    )
    if not with_entry:
        return mask, None
    entry = jnp.min(jnp.where(mask, jnp.maximum(t0, 0.0), _INF))
    return mask, entry


def _leaf_slots(leaf, carry, rays, leaf_loader, *, L, t_min, graze, tie_eps,
                cnt=None, attrs=True, occl=False):
    """Best-update the carry over one leaf block's L triangle slots.

    ``carry`` = (bt, bpnx, bpny, bpnz, btcu, btcv, bmtl, bem, bslot);
    ``rays`` = (ox, oy, oz, dx, dy, dz, tg). Shared by the binary and wide
    walks — the estimator-defining inner loop (Woop-plane test, tie-banded
    emissive tie-break per bvh.cpp:219, shadow early-kill).

    ``cnt`` (wide walk): the leaf's occupied slot count — 8-slot GROUPS
    entirely past ``cnt`` are skipped via lax.cond (leaves average ~2/3
    full at leaf_size 32, and pad slots cost the full ~60-op test while
    never hitting). ``None`` (binary walk) processes all L slots.

    ``attrs=False`` (shadow / any-hit queries): skip the shading-attribute
    interpolation and its best-updates (~40% of the slot loop) — only
    (bt, bmtl, bem) carry meaning; visibility consumers read mtl alone.

    ``occl=True`` (round 5, the ANY-HIT shadow walk): the pure OCCLUSION
    query. ``carry`` = (bt, bs); the loop answers only the two questions
    reference visibility (pathTracing.cpp:55-58) decomposes into under the
    planar/closed-light argument (_walk docstring): (a) KILL — an accepted
    wrong-material hit strictly inside the band occludes (bt := -1, lane
    leaves the packet union), (b) SEEN — some target-material hit within
    the tie band of the bound exists (bs := 1). Visibility = seen & ~killed.
    No best-t/near/tie-break/attribute bookkeeping at all — the whole
    closest-hit carry and ~1/3 of the slot arithmetic drop out, and the
    kernel writes 2 output planes instead of 9."""
    ga, ha = leaf_loader(leaf)
    leaf_f = (leaf * SLOT).astype(jnp.float32)

    def run_slots_occl(carry, lo, hi):
        # EXACTLY the closest-hit loop's (bt, bmtl, bem) update dynamics
        # with bmtl reduced to the boolean "best is the target" (bs) — so
        # visibility is bitwise what the round-4 attrs=False walk computed
        # (incl. the order-dependent corner cases: a near-face target hit
        # suppressing kills from lamp internals behind it, and a wrong-but-
        # emissive band hit blocking later target recording via bem; both
        # flip lanes on staircase if simplified away — measured). The
        # savings vs attrs=False are the carry (3 planes vs 9) and the
        # kernel outputs (2 vs 9), not the slot arithmetic.
        bt, bs, bem = carry
        ox, oy, oz, dx, dy, dz, tg = rays
        tga = tg > -1.5    # per-lane constant: hoisted out of the slot loop
        for s in range(lo, hi):
            g = lambda a: ga(a, s)
            h = lambda a: ha(a, s)
            ax, ay, az, bx = g(0), g(1), g(2), g(3)
            by, bz, cx, cy = g(4), g(5), g(6), g(7)
            cz, ou, ov, ow = g(8), g(9), g(10), g(11)
            gx, gy, gz, em = g(12), g(13), g(14), g(15)

            ldw = dx * cx + dy * cy + dz * cz
            low = ox * cx + oy * cy + oz * cz + ow
            inv = jnp.where(ldw == 0.0, 0.0, 1.0) / jnp.where(
                ldw == 0.0, 1.0, ldw
            )
            t = -low * inv
            u = (ox * ax + oy * ay + oz * az + ou) + t * (
                dx * ax + dy * ay + dz * az
            )
            v = (ox * bx + oy * by + oz * bz + ov) + t * (
                dx * bx + dy * by + dz * bz
            )
            ndd = dx * gx + dy * gy + dz * gz
            ok = (
                (jnp.abs(ndd) >= graze)
                & (ldw != 0.0)
                & (t >= t_min)
                & (u >= 0.0)
                & (v >= 0.0)
                & (u + v <= 1.0)
            )
            tm = jnp.where(ok, t, _INF)
            tme = tm * (1.0 + tie_eps)   # shared by near + kill, bitwise same
            near = (
                (tm <= bt * (1.0 + tie_eps))
                & (bt <= tme)
                & (tm < _INF)
            )
            repl = (~near & (tm < bt)) | (near & (em > 0.5) & (bem < 0.5))
            mt_slot = h(15)
            wrong = jnp.abs(mt_slot - tg) > 0.5
            kill = tga & (tme < bt) & wrong
            bt = jnp.where(kill, -1.0, jnp.where(repl, tm, bt))
            bs = jnp.where(
                kill, 0.0,
                jnp.where(repl, jnp.where(wrong, 0.0, 1.0), bs),
            )
            bem = jnp.where(kill, 0.0, jnp.where(repl, em, bem))
        return (bt, bs, bem)

    def run_slots(carry, lo, hi):
        if occl:
            return run_slots_occl(carry, lo, hi)
        bt, bpnx, bpny, bpnz, btcu, btcv, bmtl, bem, bslot = carry
        ox, oy, oz, dx, dy, dz, tg = rays
        tga = tg > -1.5    # per-lane constant: hoisted out of the slot loop
        for s in range(lo, hi):
            g = lambda a: ga(a, s)
            h = lambda a: ha(a, s)
            ax, ay, az, bx = g(0), g(1), g(2), g(3)
            by, bz, cx, cy = g(4), g(5), g(6), g(7)
            cz, ou, ov, ow = g(8), g(9), g(10), g(11)
            gx, gy, gz, em = g(12), g(13), g(14), g(15)

            ldw = dx * cx + dy * cy + dz * cz
            low = ox * cx + oy * cy + oz * cz + ow
            inv = jnp.where(ldw == 0.0, 0.0, 1.0) / jnp.where(
                ldw == 0.0, 1.0, ldw
            )
            t = -low * inv
            u = (ox * ax + oy * ay + oz * az + ou) + t * (
                dx * ax + dy * ay + dz * az
            )
            v = (ox * bx + oy * by + oz * bz + ov) + t * (
                dx * bx + dy * by + dz * bz
            )
            ndd = dx * gx + dy * gy + dz * gz
            ok = (
                (jnp.abs(ndd) >= graze)
                & (ldw != 0.0)
                & (t >= t_min)
                & (u >= 0.0)
                & (v >= 0.0)
                & (u + v <= 1.0)
            )
            tm = jnp.where(ok, t, _INF)
            tme = tm * (1.0 + tie_eps)   # shared by near + kill
            near = (
                (tm <= bt * (1.0 + tie_eps))
                & (bt <= tme)
                & (tm < _INF)
            )
            repl = (~near & (tm < bt)) | (near & (em > 0.5) & (bem < 0.5))
            # shadow early-kill: accepted wrong-material hit STRICTLY
            # inside the tie band of the current bound -> dead lane
            # (bt=-1 prunes everything). Strict: a wrong hit AT the
            # bound may be the reference's coplanar-light tie (ceiling
            # and light share a plane in cornell) where the emissive
            # tie-break must still find the light.
            mt_slot = h(15)
            kill = (
                tga
                & (tme < bt)
                & (jnp.abs(mt_slot - tg) > 0.5)
            )

            bt = jnp.where(kill, -1.0, jnp.where(repl, tm, bt))
            bmtl = jnp.where(kill, -3.0, jnp.where(repl, mt_slot, bmtl))
            # killed lanes report em=0 / slot=-1 like the reference path:
            # without the reset a killed lane would keep (or take, when the
            # killing hit also satisfies ``repl``) a stale occluder slot and
            # return_tri would report tri >= 0 for a lane the forward killed
            bem = jnp.where(kill, 0.0, jnp.where(repl, em, bem))
            if attrs:
                # interpolated shading attributes (replaces the integrator's
                # n0/n1/n2/t0/t1/t2/tri_mtl gathers)
                w = 1.0 - u - v
                n0x, n0y, n0z, n1x = h(0), h(1), h(2), h(3)
                n1y, n1z, n2x, n2y = h(4), h(5), h(6), h(7)
                n2z, t0u, t0v, t1u = h(8), h(9), h(10), h(11)
                t1v, t2u, t2v = h(12), h(13), h(14)
                pnx = n0x * w + n1x * u + n2x * v
                pny = n0y * w + n1y * u + n2y * v
                pnz = n0z * w + n1z * u + n2z * v
                tcu = t0u * w + t1u * u + t2u * v
                tcv = t0v * w + t1v * u + t2v * v
                bpnx = jnp.where(repl, pnx, bpnx)
                bpny = jnp.where(repl, pny, bpny)
                bpnz = jnp.where(repl, pnz, bpnz)
                btcu = jnp.where(repl, tcu, btcu)
                btcv = jnp.where(repl, tcv, btcv)
                bslot = jnp.where(
                    kill, -1.0, jnp.where(repl, leaf_f + jnp.float32(s), bslot)
                )
        return (bt, bpnx, bpny, bpnz, btcu, btcv, bmtl, bem, bslot)

    if cnt is None:
        return run_slots(carry, 0, L)
    GROUP = 8
    for lo in range(0, L, GROUP):
        hi = min(lo + GROUP, L)
        if lo == 0:
            carry = run_slots(carry, lo, hi)     # a leaf has >= 1 slot
        else:
            carry = jax.lax.cond(
                cnt > lo,
                lambda c, lo=lo, hi=hi: run_slots(c, lo, hi),
                lambda c: c,
                carry,
            )
    return carry


# Batcher odd-even merge sorting network for 8 elements (19 CEs)
_SORT8 = ((0, 1), (2, 3), (4, 5), (6, 7), (0, 2), (1, 3), (4, 6), (5, 7),
          (1, 2), (5, 6), (0, 4), (1, 5), (2, 6), (3, 7), (2, 4), (3, 5),
          (1, 2), (3, 4), (5, 6))


def _mean_dir(dx, dy, dz):
    """Packet mean direction (unnormalized scalars) — the NEAR-FIRST walk
    order key basis; cheap: three cross-lane reduces once per packet."""
    return jnp.sum(dx), jnp.sum(dy), jnp.sum(dz)


def _interior_push(sp, stack, tstack, g, slab2f, md, ordered):
    """Push a wide node's union-hit children (+ their packet entry t on the
    parallel ``tstack``, consumed by pop-time stale culling); returns sp.

    ``ordered`` (config.walk_order == "near"): children are pushed in
    DESCENDING distance along the packet's mean direction (box-center
    projection, 6 scalar FMAs per child + a 19-CE scalar sorting network),
    so pops visit near nodes first. For coherent packets this finds
    occluders (shadow kills) and close hits (bt shrink) sooner, pruning
    the rest of the walk; for incoherent packets the key degenerates to
    noise and the order is simply arbitrary — still a correct walk.
    Default pushes reverse preorder (pops = binary walk order), which
    keeps results bitwise-identical to the binary walk."""
    if not ordered:
        for c in range(7, -1, -1):       # reverse preorder push
            meta = g(c, 6)
            hit_c, _ = slab2f(c)
            keep = jnp.any(hit_c) & (meta != -1.0)
            stack[sp] = meta.astype(jnp.int32)
            sp = sp + keep.astype(jnp.int32)
        return sp
    kids = []
    for c in range(8):
        meta = g(c, 6)
        hit_c, ent_c = slab2f(c)
        keep = jnp.any(hit_c) & (meta != -1.0)
        key = ((g(c, 0) + g(c, 3)) * md[0]
               + (g(c, 1) + g(c, 4)) * md[1]
               + (g(c, 2) + g(c, 5)) * md[2])
        # dropped children sort anywhere (no bump); park them far-first
        kids.append([jnp.where(keep, key, jnp.float32(3e38)), meta, keep,
                     ent_c])
    for a, b in _SORT8:
        ka, ma, pa, ea = kids[a]
        kb, mb, pb, eb = kids[b]
        sw = ka < kb                      # descending: far pushed first
        kids[a] = [jnp.where(sw, kb, ka), jnp.where(sw, mb, ma),
                   jnp.where(sw, pb, pa), jnp.where(sw, eb, ea)]
        kids[b] = [jnp.where(sw, ka, kb), jnp.where(sw, ma, mb),
                   jnp.where(sw, pa, pb), jnp.where(sw, ea, eb)]
    for _, meta, keep, ent in kids:
        stack[sp] = meta.astype(jnp.int32)
        tstack[sp] = ent
        sp = sp + keep.astype(jnp.int32)
    return sp


def _init_carry(shp, tb, occl=False):
    zero = jnp.zeros(shp, jnp.float32)
    if occl:
        # (bound, best-is-target, best-emissive); only the first two are
        # kernel outputs (_write_out zips against the 2 output refs)
        return (tb, zero, zero)
    return (tb, zero, zero, zero + 1.0, zero, zero, zero - 1.0, zero,
            zero - 1.0)


def _walk(ox, oy, oz, dx, dy, dz, tb, tg, read_node, leaf_loader,
          *, n_nodes, L, t_min, graze, tie_eps, attrs=True, occl=False):
    """BINARY skip-link packet walk; returns the best-hit carry.

    ``tb`` is the per-ray INITIAL best-t (t-bound): INF for closest-hit
    queries; the light distance for shadow queries, which prunes every
    node/triangle beyond the light from the first visit (the per-lane
    best-t test below also shrinks the packet's node union). A ray that
    never beats its bound reports t == bound and mtl == -1 — callers
    detect hits via ``mtl >= 0`` (misses also keep em == 0).

    ``tg`` is the per-ray TARGET MATERIAL for shadow early-kill: when
    tg > -1.5, any accepted hit whose material differs from tg KILLS the
    lane (bt := -1 prunes every later node/leaf; mtl := -3 reports
    "occluded"). This is the reference's closest-hit-material visibility
    test (pathTracing.cpp:55-58) restated: for closed or planar lights a
    wrong-material hit in front of the light can never be superseded by
    a closer target-material hit (that would put geometry inside the
    light), so killing on first discovery is equivalent — and occluded
    lanes stop inflating the packet's node union, which is where shadow
    time goes (88% of the staircase render before this). tg == -2
    disables the kill (closest-hit queries).
    """
    shp = ox.shape
    invx, invy, invz, oix, oiy, oiz = _ray_consts(ox, oy, oz, dx, dy, dz)
    rays = (ox, oy, oz, dx, dy, dz, tg)

    def cond(s):
        return s[0] < n_nodes

    def body(s):
        i = s[0]
        carry = s[1:]
        bt = carry[0]
        bx0, by0, bz0, bx1, by1, bz1, skip, enc = read_node(i)
        hit_i = _slab(bx0, by0, bz0, bx1, by1, bz1,
                      invx, invy, invz, oix, oiy, oiz, bt, tie_eps)
        anyhit = jnp.any(hit_i)
        is_leaf = enc >= 0               # leaf_id*64 + count (pack_bvh_leaves)

        carry = jax.lax.cond(
            anyhit & is_leaf,
            lambda c: _leaf_slots(enc >> 6, c, rays, leaf_loader, L=L,
                                  t_min=t_min, graze=graze, tie_eps=tie_eps,
                                  cnt=enc & 63, attrs=attrs, occl=occl),
            lambda c: c,
            carry,
        )
        nxt = jnp.where(anyhit & ~is_leaf, i + 1, skip)
        return (nxt,) + carry

    init = (jnp.int32(0),) + _init_carry(shp, tb, occl)
    out = jax.lax.while_loop(cond, body, init)
    return out[1:]


def _walk_wide(ox, oy, oz, dx, dy, dz, tb, tg, wide_child, leaf_loader,
               stack, tstack, *, L, t_min, graze, tie_eps, attrs=True,
               occl=False, ordered=False):
    """8-WIDE stack packet walk; returns the best-hit carry.

    ``wide_child(i)`` -> callable ``g(c, k)`` returning scalar attr k of
    child c of wide node i (k: x0 y0 z0 x1 y1 z1 meta). ``stack`` is an
    SMEM int32 scratch shared by the packet — traversal state is SCALAR
    (one union walk per packet), so a per-packet stack costs nothing
    per lane. Pushes are branch-free: write the candidate, bump the
    pointer only when the packet union hit the child (a stale write above
    the top is simply overwritten). Children are pushed in reverse
    preorder so pops preserve the binary walk's front-to-back order.
    t-bound / tie-break / early-kill semantics are _walk's (shared
    _slab/_leaf_slots)."""
    shp = ox.shape
    invx, invy, invz, oix, oiy, oiz = _ray_consts(ox, oy, oz, dx, dy, dz)
    rays = (ox, oy, oz, dx, dy, dz, tg)
    md = _mean_dir(dx, dy, dz) if ordered else None

    stack[0] = jnp.int32(0)      # root wide node (meta >= 0 == interior)
    tstack[0] = jnp.float32(0.0)

    def cond(s):
        return s[0] > 0

    def body(s):
        sp = s[0]
        carry = s[1:]
        m = stack[sp - 1]
        sp = sp - 1
        is_leaf = m < 0

        def leaf_case(op):
            sp, carry = op
            dec = -m - 2                 # leaf_id*64 + count (widen_bvh)
            leaf = dec >> 6
            cnt = dec & 63
            return sp, _leaf_slots(leaf, carry, rays, leaf_loader, L=L,
                                   t_min=t_min, graze=graze, tie_eps=tie_eps,
                                   cnt=cnt, attrs=attrs, occl=occl)

        def interior_case(op):
            sp, carry = op
            bt = carry[0]
            g = wide_child(m)
            slab2f = lambda c: _slab2(g(c, 0), g(c, 1), g(c, 2),
                                      g(c, 3), g(c, 4), g(c, 5),
                                      invx, invy, invz, oix, oiy, oiz, bt,
                                      tie_eps, with_entry=ordered)
            sp = _interior_push(sp, stack, tstack, g, slab2f, md, ordered)
            return sp, carry

        if ordered:
            # pop-time stale culling (with the near order): every content
            # hit of this node satisfies tm >= t_e, so if t_e exceeds
            # every lane's admission bound the visit cannot update
            # anything — skip it. MEASURED NEUTRAL-TO-NEGATIVE on the
            # bench scenes (one INF-bt miss lane disables the cull); kept
            # only with the experimental near order.
            t_e = tstack[sp]
            stale = t_e > jnp.max(carry[0]) * (1.0 + tie_eps)
            sp, carry = jax.lax.cond(
                stale, lambda op: op,
                lambda op: jax.lax.cond(is_leaf, leaf_case, interior_case,
                                        op),
                (sp, carry),
            )
        else:
            sp, carry = jax.lax.cond(is_leaf, leaf_case, interior_case,
                                     (sp, carry))
        return (sp,) + carry

    init = (jnp.int32(1),) + _init_carry(shp, tb, occl)
    out = jax.lax.while_loop(cond, body, init)
    return out[1:]


def _walk_wide_pf(ox, oy, oz, dx, dy, dz, tb, tg, wide_child, ps_ref,
                  stack, tstack, lb, sems, *, L, t_min, graze, tie_eps,
                  attrs=True, occl=False, ordered=False):
    """_walk_wide with DOUBLE-BUFFERED leaf prefetch: sibling leaves are
    pushed together, so consecutive pops are often leaves — after
    resolving the current leaf's block, the NEXT stack top (if a leaf) is
    DMA'd into the other buffer while the current slot loop runs, hiding
    the per-visit leaf-DMA latency. ``lb`` is (2, 8, 128) SMEM, ``sems``
    a (2,) DMA semaphore array. Traversal results identical to
    _walk_wide."""
    shp = ox.shape
    invx, invy, invz, oix, oiy, oiz = _ray_consts(ox, oy, oz, dx, dy, dz)
    rays = (ox, oy, oz, dx, dy, dz, tg)
    md = _mean_dir(dx, dy, dz) if ordered else None

    stack[0] = jnp.int32(0)
    tstack[0] = jnp.float32(0.0)

    def dma(leaf, buf):
        off = pl.multiple_of(jnp.maximum(leaf, 0) * 128, 128)
        return pltpu.make_async_copy(
            ps_ref.at[:, pl.ds(off, 128)], lb.at[buf], sems.at[buf]
        )

    def cond(s):
        return s[0] > 0

    def body(s):
        sp, pf_leaf, pf_buf = s[0], s[1], s[2]
        carry = s[3:]
        m = stack[sp - 1]
        sp = sp - 1
        is_leaf = m < 0

        def leaf_case(op):
            sp, pf_leaf, pf_buf, carry = op
            dec = -m - 2
            leaf = dec >> 6
            cnt = dec & 63

            def use_pf(_):
                dma(pf_leaf, pf_buf).wait()
                return pf_buf

            def fetch(_):
                @pl.when(pf_leaf >= 0)
                def _():
                    dma(pf_leaf, pf_buf).wait()      # discard stale prefetch
                buf = jnp.maximum(pf_buf, 0)
                d = dma(leaf, buf)
                d.start()
                d.wait()
                return buf

            buf = jax.lax.cond(pf_leaf == leaf, use_pf, fetch, 0)

            # prefetch the next top if it is a DIFFERENT leaf
            nxt = stack[jnp.maximum(sp - 1, 0)]
            ndec = -nxt - 2
            nleaf = ndec >> 6
            do_pf = (sp > 0) & (nxt < -1) & (nleaf != leaf)
            ob = 1 - buf

            @pl.when(do_pf)
            def _():
                dma(nleaf, ob).start()

            pf_leaf2 = jnp.where(do_pf, nleaf, -1)
            pf_buf2 = jnp.where(do_pf, ob, 0)

            def loader(_leaf):
                g = lambda a, s: lb[buf, a // 4, (a % 4) * SLOT + s]
                h = lambda a, s: lb[buf, 4 + a // 4, (a % 4) * SLOT + s]
                return g, h

            carry = _leaf_slots(leaf, carry, rays, loader, L=L,
                                t_min=t_min, graze=graze, tie_eps=tie_eps,
                                cnt=cnt, attrs=attrs, occl=occl)
            return (sp, pf_leaf2, pf_buf2, carry)

        def interior_case(op):
            sp, pf_leaf, pf_buf, carry = op
            bt = carry[0]
            g = wide_child(m)
            slab2f = lambda c: _slab2(g(c, 0), g(c, 1), g(c, 2),
                                      g(c, 3), g(c, 4), g(c, 5),
                                      invx, invy, invz, oix, oiy, oiz, bt,
                                      tie_eps, with_entry=ordered)
            sp = _interior_push(sp, stack, tstack, g, slab2f, md, ordered)
            return (sp, pf_leaf, pf_buf, carry)

        if ordered:
            t_e = tstack[sp]
            stale = t_e > jnp.max(carry[0]) * (1.0 + tie_eps)
            sp, pf_leaf, pf_buf, carry = jax.lax.cond(
                stale, lambda op: op,
                lambda op: jax.lax.cond(is_leaf, leaf_case, interior_case,
                                        op),
                (sp, pf_leaf, pf_buf, carry),
            )
        else:
            sp, pf_leaf, pf_buf, carry = jax.lax.cond(
                is_leaf, leaf_case, interior_case,
                (sp, pf_leaf, pf_buf, carry),
            )
        return (sp, pf_leaf, pf_buf) + carry

    init = (jnp.int32(1), jnp.int32(-1), jnp.int32(0)) + _init_carry(
        shp, tb, occl
    )
    out = jax.lax.while_loop(cond, body, init)

    # drain a dangling prefetch (semaphores must balance)
    @pl.when(out[1] >= 0)
    def _():
        dma(out[1], out[2]).wait()

    return out[3:]


def _dma_leaf_loader(ps_ref, scratch, sem):
    """Per-visit HBM/ANY -> SMEM DMA of the leaf's (8, 128) block."""
    def load(leaf):
        off = pl.multiple_of(jnp.maximum(leaf, 0) * 128, 128)
        dma = pltpu.make_async_copy(
            ps_ref.at[:, pl.ds(off, 128)], scratch, sem
        )
        dma.start()
        dma.wait()
        # P attr a at (a//4, (a%4)*32 + s); S attr at row 4 + a//4
        g = lambda a, s: scratch[a // 4, (a % 4) * SLOT + s]
        h = lambda a, s: scratch[4 + a // 4, (a % 4) * SLOT + s]
        return g, h
    return load


def _smem_leaf_loader(ps_flat, cols):
    """Whole leaf payload resident in SMEM (small scenes): zero DMA —
    slot attributes are direct scalar loads at leaf*128 offsets."""
    def load(leaf):
        off = jnp.maximum(leaf, 0) * 128
        g = lambda a, s: ps_flat[(a // 4) * cols + off + (a % 4) * SLOT + s]
        h = lambda a, s: ps_flat[(4 + a // 4) * cols + off + (a % 4) * SLOT + s]
        return g, h
    return load


def _write_out(outs, r0, rows, carry):
    sl = (pl.ds(r0, rows), slice(None))
    for ref, val in zip(outs, carry):
        ref[sl] = val


def _tile_args(refs, r0, rows):
    return [r[pl.ds(r0, rows), :] for r in refs]


def _kernel_smem(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tb_ref,
                 tg_ref, box_ref, meta_ref, ps_ref,
                 *rest, n_nodes, n_tiles, rows, L, t_min, graze, tie_eps, attrs,
                 occl, n_out):
    outs, (scratch, sem) = rest[:n_out], rest[n_out:]

    def read_node(i):
        b = i * 8
        return (box_ref[b + 0], box_ref[b + 1], box_ref[b + 2],
                box_ref[b + 3], box_ref[b + 4], box_ref[b + 5],
                meta_ref[i * 2], meta_ref[i * 2 + 1])

    def tile(ti, _):
        r0 = ti * rows
        args = _tile_args(
            (ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tb_ref, tg_ref),
            r0, rows,
        )
        carry = _walk(
            *args, read_node, _dma_leaf_loader(ps_ref, scratch, sem),
            n_nodes=n_nodes, L=L, t_min=t_min, graze=graze, tie_eps=tie_eps,
            attrs=attrs, occl=occl,
        )
        _write_out(outs, r0, rows, carry)
        return 0

    jax.lax.fori_loop(0, n_tiles, tile, 0)


def _kernel_smem_all(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tb_ref,
                     tg_ref, box_ref, meta_ref, ps_ref,
                     *outs, n_nodes, n_tiles, rows, L, t_min, graze, tie_eps, attrs,
                     occl, n_out, ps_cols):
    # small scenes: node tables AND the whole leaf payload in SMEM — leaf
    # visits are pure scalar loads, no per-visit DMA at all
    def read_node(i):
        b = i * 8
        return (box_ref[b + 0], box_ref[b + 1], box_ref[b + 2],
                box_ref[b + 3], box_ref[b + 4], box_ref[b + 5],
                meta_ref[i * 2], meta_ref[i * 2 + 1])

    loader = _smem_leaf_loader(ps_ref, ps_cols)

    def tile(ti, _):
        r0 = ti * rows
        args = _tile_args(
            (ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tb_ref, tg_ref),
            r0, rows,
        )
        carry = _walk(
            *args, read_node, loader,
            n_nodes=n_nodes, L=L, t_min=t_min, graze=graze, tie_eps=tie_eps,
            attrs=attrs, occl=occl,
        )
        _write_out(outs, r0, rows, carry)
        return 0

    jax.lax.fori_loop(0, n_tiles, tile, 0)


def _kernel_hbm(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tb_ref,
                tg_ref, node_ref, ps_ref,
                *rest, n_nodes, n_tiles, rows, L, t_min, graze, tie_eps, attrs,
                occl, n_out):
    outs, (scratch, nscratch, sem, nsem) = rest[:n_out], rest[n_out:]

    # node_ref is (ceil(N/16), 128): 16 nodes of 8 f32 per 128-lane row
    # (HBM slices must be 128-lane aligned, so single-record DMAs are out);
    # a node visit DMAs its whole row — a free 15-node neighborhood cache
    # would be possible, but even re-fetching per visit measured ~20 ns.
    def read_node(i):
        dma = pltpu.make_async_copy(node_ref.at[i // 16], nscratch, nsem)
        dma.start()
        dma.wait()
        b = (i % 16) * 8
        return (nscratch[b + 0], nscratch[b + 1], nscratch[b + 2],
                nscratch[b + 3], nscratch[b + 4], nscratch[b + 5],
                nscratch[b + 6].astype(jnp.int32),
                nscratch[b + 7].astype(jnp.int32))

    def tile(ti, _):
        r0 = ti * rows
        args = _tile_args(
            (ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tb_ref, tg_ref),
            r0, rows,
        )
        carry = _walk(
            *args, read_node, _dma_leaf_loader(ps_ref, scratch, sem),
            n_nodes=n_nodes, L=L, t_min=t_min, graze=graze, tie_eps=tie_eps,
            attrs=attrs,
        )
        _write_out(outs, r0, rows, carry)
        return 0

    jax.lax.fori_loop(0, n_tiles, tile, 0)


_NO_PREFETCH = _os.environ.get("TRT_NO_PREFETCH") == "1"  # A/B switch


def _kernel_wide_smem(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                      tb_ref, tg_ref, wn_ref, ps_ref,
                      *rest, n_tiles, rows, L, t_min, graze, tie_eps, attrs,
                      occl, n_out, ordered=False):
    # wn_ref: flat SMEM f32, wide node i child c attr k at i*128 + c*8 + k
    outs, (lb, stack, tstack, sems) = rest[:n_out], rest[n_out:]

    def wide_child(i):
        base = jnp.maximum(i, 0) * 128
        return lambda c, k: wn_ref[base + c * 8 + k]

    def tile(ti, _):
        r0 = ti * rows
        args = _tile_args(
            (ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tb_ref, tg_ref),
            r0, rows,
        )
        if _NO_PREFETCH:
            carry = _walk_wide(
                *args, wide_child,
                _dma_leaf_loader(ps_ref, lb.at[0], sems.at[0]),
                stack, tstack, L=L, t_min=t_min, graze=graze,
                tie_eps=tie_eps, attrs=attrs, occl=occl, ordered=ordered,
            )
        else:
            carry = _walk_wide_pf(
                *args, wide_child, ps_ref, stack, tstack, lb, sems,
                L=L, t_min=t_min, graze=graze, tie_eps=tie_eps, attrs=attrs,
                occl=occl, ordered=ordered,
            )
        _write_out(outs, r0, rows, carry)
        return 0

    jax.lax.fori_loop(0, n_tiles, tile, 0)


def _kernel_wide_hbm(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                     tb_ref, tg_ref, wn_ref, ps_ref,
                     *rest, n_tiles, rows, L, t_min, graze, tie_eps, attrs,
                     occl, n_out, ordered=False):
    # wn_ref: (n_wide, 128) in ANY/HBM; one row DMA per interior visit
    outs, (lb, wscratch, stack, tstack, sems, wsem) = rest[:n_out], rest[n_out:]

    def wide_child(i):
        dma = pltpu.make_async_copy(wn_ref.at[jnp.maximum(i, 0)], wscratch,
                                    wsem)
        dma.start()
        dma.wait()
        return lambda c, k: wscratch[c * 8 + k]

    def tile(ti, _):
        r0 = ti * rows
        args = _tile_args(
            (ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tb_ref, tg_ref),
            r0, rows,
        )
        if _NO_PREFETCH:
            carry = _walk_wide(
                *args, wide_child,
                _dma_leaf_loader(ps_ref, lb.at[0], sems.at[0]),
                stack, tstack, L=L, t_min=t_min, graze=graze,
                tie_eps=tie_eps, attrs=attrs, occl=occl, ordered=ordered,
            )
        else:
            carry = _walk_wide_pf(
                *args, wide_child, ps_ref, stack, tstack, lb, sems,
                L=L, t_min=t_min, graze=graze, tie_eps=tie_eps, attrs=attrs,
                occl=occl, ordered=ordered,
            )
        _write_out(outs, r0, rows, carry)
        return 0

    jax.lax.fori_loop(0, n_tiles, tile, 0)


def _fused_trace_reference(scene: Scene, ox, oy, oz, dx, dy, dz, tb, tg,
                           config: RenderConfig):
    """Pure-JAX reference implementation of the fused trace: the while_loop
    BVH intersector + XLA gathers of the shading attributes. Used (a) on
    CPU, where per-lane gathers are cheap and kernel interpret mode is
    minutes-per-call, and (b) as the oracle in tests/test_pallas_trace.py.

    The 9th output (best SLOT) is reported as -1 here: the reference path
    tracks triangle ids directly, so ``fused_trace_planes(return_tri=True)``
    uses hit.idx instead of a slot->tid mapping on this path."""
    from tinyraytracing_tpu.ops.intersect import intersect

    org = jnp.stack([ox, oy, oz], axis=-1)
    d = jnp.stack([dx, dy, dz], axis=-1)
    hit = intersect(scene, org, d, config)
    u, v = hit.u, hit.v
    w = 1.0 - u - v
    idx = hit.idx
    interp = lambda a, b, c, k: a[idx, k] * w + b[idx, k] * u + c[idx, k] * v
    pn = [interp(scene.n0, scene.n1, scene.n2, k) for k in range(3)]
    tc = [interp(scene.t0, scene.t1, scene.t2, k) for k in range(2)]
    mtl = scene.tri_mtl[idx].astype(jnp.float32)
    em = scene.tri_emissive[idx].astype(jnp.float32)
    # t-bound semantics as in _walk: hits at/beyond the bound (outside the
    # tie band that admits the light surface itself) are misses
    miss = ~hit.hit | (hit.t > tb * (1.0 + config.tie_eps))
    # target-material early-kill emulated as a closest-hit test (equal to
    # the kernel's in-order kill for closed/planar lights — _walk docs).
    # Matching the kernel, hits INSIDE the tie band of the bound are
    # excluded from the kill (the kernel only kills strictly inside the
    # band; a wrong-material tie-band hit stays a miss there, so it must
    # here too — shadow_test="tmin" distinguishes -1 from -3)
    wrong = ~miss & (tg > -1.5) & (jnp.abs(mtl - tg) > 0.5)
    killed = wrong & (hit.t * (1.0 + config.tie_eps) < tb)
    # a wrong-material NON-emissive hit inside the band is neither killed
    # nor recorded by the kernel (repl needs emissive for near hits) — a
    # plain miss; an emissive one IS recorded (near & em), so keep it
    miss = miss | (wrong & ~killed & ~(em > 0.5))
    zero = jnp.zeros_like(hit.t)
    miss_or_kill = miss | killed
    pn = (jnp.where(miss_or_kill, 0.0, pn[0]),
          jnp.where(miss_or_kill, 0.0, pn[1]),
          jnp.where(miss_or_kill, 1.0, pn[2]))
    t_out = jnp.where(killed, -1.0,
                      jnp.where(miss, jnp.minimum(tb, _INF), hit.t))
    mtl_out = jnp.where(killed, -3.0, jnp.where(miss, -1.0, mtl))
    tri_out = jnp.where(miss_or_kill, -1.0, idx.astype(jnp.float32))
    return (t_out, pn[0], pn[1], pn[2],
            jnp.where(miss_or_kill, 0.0, tc[0]),
            jnp.where(miss_or_kill, 0.0, tc[1]),
            mtl_out, jnp.where(miss_or_kill, 0.0, em), tri_out)


@functools.partial(
    jax.jit, static_argnames=("config", "force_kernel", "return_tri",
                              "attrs", "query")
)
def fused_trace_planes(scene: Scene, ox, oy, oz, dx, dy, dz,
                       config: RenderConfig, force_kernel: bool = False,
                       t_bound=None, target_mtl=None,
                       return_tri: bool = False, attrs: bool = True,
                       query: str = "closest"):
    """Fused closest-hit + shading-attribute trace.

    Planar in, planar out: six (R,) ray component planes -> a tuple of
    (t, pn_x, pn_y, pn_z, tc_u, tc_v, mtl, em) (R,) planes. ``pn`` is the
    UNNORMALIZED barycentric-interpolated shading normal (the integrator
    normalizes once), ``tc`` the interpolated texcoord, ``mtl`` the material
    id carried as f32 (MISSES have mtl == -1), ``em`` the hit triangle's
    emissive flag. Misses keep t at the bound (INF by default).

    ``t_bound``: optional (R,) per-ray initial best-t. Shadow queries pass
    the light distance — the walk then prunes everything beyond the light
    from its first node visit (big win on deep trees; see _walk). A hit is
    ``mtl >= 0`` (t < INF remains equivalent for unbounded queries).

    ``attrs=False`` (shadow / any-hit queries): skip the in-kernel
    shading-attribute interpolation (~40% of the slot loop); the pn/tc/
    slot outputs are then meaningless — only (t, mtl, em) carry results.

    ``return_tri``: append a 9th plane — the best-hit TRIANGLE index as
    f32 (-1 for miss/killed), exact to 2^24. This is what the path-replay
    backward (diff/) needs to re-derive analytic derivatives for the hit
    triangle; it costs one (R,) gather through PackedLeaves.tid, so it is
    off for the pure forward renderers.

    Walk selection: config.bvh_walk ("wide" 8-wide stack walk, "binary"
    skip-link cursor walk — see module docstring).

    ``query="occlusion"`` (round 5, the ANY-HIT shadow walk): the pure
    visibility query — returns just TWO planes (bt, seen): bt < 0 means a
    wrong-material hit strictly inside the band occluded the lane (the
    early-kill), seen > 0.5 means some target-material hit within the tie
    band of the bound exists. Reference visibility (pathTracing.cpp:55-58)
    is ``(seen > 0.5) & (bt >= 0)`` — the exact decomposition of the
    closest-hit material test under the planar/closed-light argument
    (_walk docstring). The slot loop loses the whole closest-hit carry
    (no best-t/tie-break/attribute updates) and the kernel writes 2
    output planes instead of 9. ``attrs``/``return_tri`` are ignored.

    On CPU backends dispatches to the pure-JAX reference path unless
    ``force_kernel`` (tests) — Pallas interpret mode re-interprets the walk
    per call, minutes per invocation.
    """
    occl = query == "occlusion"
    if t_bound is None:
        t_bound = jnp.full_like(ox, _INF)
    if target_mtl is None:
        target_mtl = jnp.full_like(ox, -2.0)
    if jax.default_backend() == "cpu" and not force_kernel:
        out = _fused_trace_reference(scene, ox, oy, oz, dx, dy, dz,
                                     t_bound, target_mtl, config)
        if occl:
            # order-free emulation: killed = closest-hit wrong-material
            # strictly inside; seen = final material == target (the
            # intersector's emissive tie-break already prefers the light
            # among band ties, matching the kernel's any-target-hit flag)
            killed = out[6] == -3.0
            seen = (out[6] >= 0.0) & (jnp.abs(out[6] - target_mtl) <= 0.5)
            return (jnp.where(killed, -1.0, t_bound),
                    seen.astype(jnp.float32))
        return out if return_tri else out[:8]
    pk = scene.bvh.packed
    R = ox.shape[0]

    have_wide = getattr(pk, "WN", None) is not None and pk.n_wide > 0
    # walk pick: wide for big trees (round 4 — binary's SMEM node loads
    # win small trees on closest-hit), but OCCLUSION queries prefer wide
    # even on small trees (t-bounded + early-killed lanes make visits the
    # dominant cost; measured veach shadow dispatch binary->wide took the
    # full render 18.4 -> 20.4 Mrays/s, results bitwise-equal)
    use_wide = have_wide and (
        config.bvh_walk == "wide"
        or (config.bvh_walk == "auto"
            and (pk.n_nodes > SMEM_NODE_LIMIT or occl))
    )
    # per-scene packet size (see RAY_TILE comment at the top). Round-5
    # grid sweep: with narrow leaves (<= 8 slots — the measured winner on
    # flat many-leaf scenes, slot-group work drops ~2.8x) the per-visit
    # cost shrinks enough that 2048-ray packets amortize the scalar walk
    # better than 1024 (grid100K 0.92 -> 0.99 Mrays/s).
    if config.ray_tile:
        tile = config.ray_tile
    elif use_wide and pk.n_wide > WIDE_TILE_LIMIT:
        tile = 2048 if pk.leaf_size <= 8 else RAY_TILE_BIG
    else:
        tile = RAY_TILE
    # ray tiles per grid step (config.trace_super_rays bounds the
    # pipeline's VMEM; the diff path uses a half-size step — remat can
    # co-locate two kernel instances, and 128K/step OOM'd scoped vmem
    # at exactly 17 MB on the veach backward)
    super_tiles = max(1, config.trace_super_rays // tile)

    super_rays = min(super_tiles * tile, tile * -(-R // tile))
    pad_r = (-R) % super_rays
    comps = [ox, oy, oz, dx, dy, dz, t_bound, target_mtl]
    if pad_r:
        comps = [jnp.pad(c, (0, pad_r)) for c in comps]
    Rp = comps[0].shape[0]
    n_super = Rp // super_rays
    tiles_per_super = super_rays // tile
    rows_per_super = super_rays // 128

    planes = [c.reshape(-1, 128) for c in comps]

    n_out = 2 if occl else N_OUT
    common = dict(
        n_tiles=tiles_per_super, rows=tile // 128, L=pk.leaf_size,
        t_min=config.t_min, graze=config.n_dot_d_min, tie_eps=config.tie_eps,
        attrs=attrs, occl=occl, n_out=n_out,
    )
    ray_spec = pl.BlockSpec(
        (rows_per_super, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (rows_per_super, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out_shape = [jax.ShapeDtypeStruct((Rp // 128, 128), jnp.float32)] * n_out

    if use_wide:
        # stack bound: every interior visit pops 1 and pushes <= 8, so the
        # high-water mark is depth*(arity-1)+1; +8 slack for the dangling
        # conditional-bump writes
        stack_size = max(64, pk.wide_depth * 7 + 16)
        stack_scratch = pltpu.SMEM((stack_size,), jnp.int32)
        ordered = config.walk_order == "near"
        if pk.n_wide <= SMEM_WIDE_LIMIT:
            kern = functools.partial(_kernel_wide_smem, **common,
                                     ordered=ordered)
            extra_in = [
                pl.BlockSpec(memory_space=pltpu.SMEM),   # wide nodes, flat
                pl.BlockSpec(memory_space=pl.ANY),       # PS leaf payload
            ]
            extra_args = (pk.WN.reshape(-1), pk.PS)
            scratch = [
                pltpu.SMEM((2, 8, 128), jnp.float32),    # leaf double buffer
                stack_scratch,
                pltpu.SMEM((stack_size,), jnp.float32),  # entry-t stack
                pltpu.SemaphoreType.DMA((2,)),
            ]
        else:
            kern = functools.partial(_kernel_wide_hbm, **common,
                                     ordered=ordered)
            extra_in = [
                pl.BlockSpec(memory_space=pl.ANY),       # wide node rows
                pl.BlockSpec(memory_space=pl.ANY),       # PS leaf payload
            ]
            extra_args = (pk.WN, pk.PS)
            scratch = [
                pltpu.SMEM((2, 8, 128), jnp.float32),    # leaf double buffer
                pltpu.SMEM((128,), jnp.float32),
                stack_scratch,
                pltpu.SMEM((stack_size,), jnp.float32),  # entry-t stack
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA,
            ]
    else:
        nodes_in_smem = pk.n_nodes <= SMEM_NODE_LIMIT
        # whole-leaf-payload SMEM residency for small scenes (~<=420 KB):
        # kills the per-leaf-visit DMA entirely (veach-class payloads)
        leaves_in_smem = nodes_in_smem and pk.PS.size <= SMEM_PS_FLOATS
        common["n_nodes"] = pk.n_nodes
        if leaves_in_smem:
            kern = functools.partial(
                _kernel_smem_all, **common, ps_cols=pk.PS.shape[1]
            )
            extra_in = [
                pl.BlockSpec(memory_space=pltpu.SMEM),   # node boxes, flat f32
                pl.BlockSpec(memory_space=pltpu.SMEM),   # node meta, flat i32
                pl.BlockSpec(memory_space=pltpu.SMEM),   # PS payload, flat f32
            ]
            extra_args = (pk.node_box.reshape(-1), pk.node_meta.reshape(-1),
                          pk.PS.reshape(-1))
            scratch = []
        elif nodes_in_smem:
            kern = functools.partial(_kernel_smem, **common)
            extra_in = [
                pl.BlockSpec(memory_space=pltpu.SMEM),   # node boxes, flat f32
                pl.BlockSpec(memory_space=pltpu.SMEM),   # node meta, flat i32
                pl.BlockSpec(memory_space=pl.ANY),       # PS leaf payload
            ]
            extra_args = (pk.node_box.reshape(-1), pk.node_meta.reshape(-1),
                          pk.PS)
            scratch = [
                pltpu.SMEM((8, 128), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ]
        else:
            kern = functools.partial(_kernel_hbm, **common)
            extra_in = [
                pl.BlockSpec(memory_space=pl.ANY),       # node rows (N/16, 128)
                pl.BlockSpec(memory_space=pl.ANY),       # PS leaf payload
            ]
            n_rows = -(-pk.n_nodes // 16)
            node_rows = jnp.pad(
                pk.node_box.reshape(-1),
                (0, n_rows * 128 - pk.n_nodes * 8),
            ).reshape(n_rows, 128)
            extra_args = (node_rows, pk.PS)
            scratch = [
                pltpu.SMEM((8, 128), jnp.float32),
                pltpu.SMEM((128,), jnp.float32),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ]

    outs = pl.pallas_call(
        kern,
        grid=(n_super,),
        interpret=jax.default_backend() == "cpu",    # tests run on CPU
        in_specs=[ray_spec] * 8 + extra_in,
        out_specs=[out_spec] * n_out,
        out_shape=out_shape,
        scratch_shapes=scratch,
    )(*planes, *extra_args)

    flat = lambda x: x.reshape(-1)[:R]
    outs = tuple(flat(o) for o in outs)
    if occl:
        return outs
    if not return_tri:
        return outs[:8]
    slot = outs[8]
    tri = jnp.where(
        slot >= 0.0,
        pk.tid[jnp.clip(slot, 0, None).astype(jnp.int32)].astype(jnp.float32),
        -1.0,
    )
    return outs[:8] + (tri,)

def occlusion_trace_segmented(scene: Scene, ox, oy, oz, dx, dy, dz,
                              t_bound, target_mtl, config: RenderConfig,
                              n_seg: int):
    """Occlusion query over ``n_seg`` concatenated equal segments of
    shadow lanes (one per light), with optional per-segment LIVE-LANE
    COMPACTION (config.shadow_compact; fused_queue's shadow dispatch and
    diff/fast's replay both use this). Returns ONE (n_seg * R,) f32
    VISIBILITY plane: 1.0 where some target-material hit exists within
    the tie band of the bound and no wrong-material hit strictly inside
    it occluded the lane (the reference's material-equality visibility,
    pathTracing.cpp:55-58) — parked lanes (t_bound == 0) report 0.

    ~35-40% of shadow lanes are zero-contribution parked (measured per
    scene in benchmarks/shadow_density.py). One batched stable
    (n_seg, R) lax.sort packs live lanes to each segment's front so the
    parked tail fills whole packets that exit at the root instead of
    diluting every packet; an inverse sort restores lane order.
    Per-lane kernel results are PACKET-MEMBERSHIP-INVARIANT — a leaf
    visited only for packet-mates cannot produce an accepted hit for a
    lane whose slab+bound test failed, because the same (1 + tie_eps)
    band governs the slab prune and the slot accept — so the returned
    visibility is bitwise the uncompacted dispatch's
    (tests/test_pallas_trace.py::test_fused_queue_shadow_compact_bitwise).
    target_mtl is NOT sorted: within a segment every live lane shares
    the segment's light material, so it is re-broadcast from the sorted
    bound instead (parked lanes never test material).

    Compaction is gated to walk-bound trees ("auto": n_wide > 512, the
    same signal as the every-iteration queue resort): staircase
    8.17 -> 9.23 Mrays/s; veach's cheap walk loses to the two-sort cost
    (22.3 -> 18.9 forced on), so small trees dispatch as-is.
    """
    pk = scene.bvh.packed if scene.bvh is not None else None
    n_wide = pk.n_wide if pk is not None else 0
    compact = config.shadow_compact == "on" or (
        config.shadow_compact == "auto" and n_wide > 512
    )
    vis = lambda bt, seen: ((seen > 0.5) & (bt >= 0.0)).astype(jnp.float32)
    if not compact or n_seg * 128 > ox.shape[0]:
        bt, seen = fused_trace_planes(
            scene, ox, oy, oz, dx, dy, dz, config,
            t_bound=t_bound, target_mtl=target_mtl, query="occlusion",
        )
        return vis(bt, seen)
    from tinyraytracing_tpu.ops.sort import sort_planes_by

    R = ox.shape[0] // n_seg
    seg = lambda x: x.reshape(n_seg, R)
    dead = (seg(t_bound) <= 0.0).astype(jnp.int32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (n_seg, R), 1)
    srt = sort_planes_by(
        dead,
        (seg(ox), seg(oy), seg(oz), seg(dx), seg(dy), seg(dz),
         seg(t_bound), lane),
        axis=1,
    )
    # per-segment target material, re-broadcast onto the live prefix
    # (live lanes of a segment all target the same light; -inf when the
    # whole segment is parked, in which case no lane reads it)
    seg_tg = jnp.max(
        jnp.where(seg(t_bound) > 0.0, seg(target_mtl), -jnp.inf),
        axis=1, keepdims=True,
    )
    ctg = jnp.where(srt[6] > 0.0, seg_tg, -2.0)
    flat = lambda a: a.reshape(n_seg * R)
    cbt, cseen = fused_trace_planes(
        scene, flat(srt[0]), flat(srt[1]), flat(srt[2]),
        flat(srt[3]), flat(srt[4]), flat(srt[5]),
        config, t_bound=flat(srt[6]), target_mtl=flat(ctg),
        query="occlusion",
    )
    # inverse permutation: lane ids are unique per segment, so sorting by
    # them restores original order exactly (2 operands — no packing)
    _, rvis = jax.lax.sort(
        (srt[7], seg(vis(cbt, cseen))), dimension=1, num_keys=1,
        is_stable=True,
    )
    return flat(rvis)
