"""Pallas TPU kernel: brute-force intersection, scalar-slot form.

For scenes up to a few thousand triangles (the reference's cornell-box and
veach-mis class) brute force beats a BVH walk on a vector machine — IF the
kernel is written against the hardware's grain correctly. Two earlier
generations of this kernel were each ~10-30x off the mark:

1. MXU matmul form: a Precision.HIGHEST f32 dot_general decomposes into
   multiple MXU passes whose systolic fill overhead dwarfs a 3-deep
   contraction (~30ms/call).
2. VPU broadcast-FMA + cross-lane closest-hit reduce: the (RT, C) lane
   reductions and (RT,)->(8,128) relayouts cost ~8us per chunk, and the
   per-ray-tile Pallas grid step adds ~39us of pipeline overhead.

This form has NO cross-lane operation anywhere: triangles are tested one
slot at a time, each slot's 16 attributes broadcast as SMEM SCALAR LOADS
against full (8, 128) ray tiles, with a running elementwise best-hit
update — the same shape as the leaf test in ops/pallas_bvh.py. (Reading
the same scalars by lane-extraction from a VMEM vector measured ~40ns per
extract — 14x slower end to end; SMEM scalar loads are ~free.) The loop
over ray tiles lives inside the kernel (fori), and triangles stream
through an unrolled 32-slot inner loop per chunk. Everything is
straight-line (8, 128) VPU code: measured 636 Mrays/s on the 32-triangle
cornell box (50 ns per slot per 1024-ray packet).

SMEM holds ~1 MB, so this path caps at ~480 chunks (15K triangles); the
auto dispatcher switches to the BVH packet kernel far earlier anyway.

Acceptance rules identical to ops/intersect.py (t >= 5e-4 per
RayTracingOnCPU/bvh.cpp:189, |gn.d| >= 1e-5 per bvh.cpp:185, epsilon-
banded emissive tie-break per bvh.cpp:219); cross-checked in
tests/test_intersect.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tinyraytracing_tpu.config import RenderConfig
from tinyraytracing_tpu.models.scene import Scene
from tinyraytracing_tpu.ops.intersect import INF, Hit

_INF = 3.0e38  # plain python float: jnp scalars would be captured consts

RAY_TILE = 1024
_ROWS = RAY_TILE // 128
SLOT = 32          # triangles per 128-lane chunk block
SUPER_TILES = 64   # ray tiles per grid step (bounds VMEM)


def pack_triangle_slots(woop_a, woop_b, gn, emissive):
    """(4, n_chunks*128) slot blocks: 16 attrs x 32 slots per chunk, attr a
    of slot s at (row a//4, lane (a%4)*32 + s) — the PackedLeaves layout
    with chunk c holding triangles [c*32, c*32+32). Identity slot->triangle
    mapping; padding slots are all-zero rows (can never hit). Pure jnp so
    it traces under jit (XLA folds it — inputs are jit constants)."""
    T = woop_a.shape[0]
    n_chunks = max(-(-T // SLOT), 1)
    Tp = n_chunks * SLOT

    def pad(x):
        return jnp.pad(x, [(0, Tp - T)] + [(0, 0)] * (x.ndim - 1))

    wa = pad(woop_a.astype(jnp.float32)).reshape(n_chunks, SLOT, 3, 3)
    wb = pad(woop_b.astype(jnp.float32)).reshape(n_chunks, SLOT, 3)
    g = pad(gn.astype(jnp.float32)).reshape(n_chunks, SLOT, 3)
    em = pad(emissive.astype(jnp.float32)).reshape(n_chunks, SLOT)
    attrs = [
        wa[:, :, 0, 0], wa[:, :, 0, 1], wa[:, :, 0, 2], wa[:, :, 1, 0],
        wa[:, :, 1, 1], wa[:, :, 1, 2], wa[:, :, 2, 0], wa[:, :, 2, 1],
        wa[:, :, 2, 2], wb[:, :, 0], wb[:, :, 1], wb[:, :, 2],
        g[:, :, 0], g[:, :, 1], g[:, :, 2], em,
    ]
    rows = [
        jnp.concatenate(attrs[r * 4 : r * 4 + 4], axis=1)  # (n_chunks, 128)
        for r in range(4)
    ]
    P = jnp.stack(rows, axis=0).reshape(4, n_chunks * 128)
    return P, n_chunks


def _kernel(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, p_ref,
            t_out, i_out, u_out, v_out,
            *, n_chunks: int, n_tiles: int,
            t_min: float, graze: float, tie_eps: float):
    shp = (_ROWS, 128)

    def tile(ti, _):
        r0 = ti * _ROWS
        ox = ox_ref[pl.ds(r0, _ROWS), :]
        oy = oy_ref[pl.ds(r0, _ROWS), :]
        oz = oz_ref[pl.ds(r0, _ROWS), :]
        dx = dx_ref[pl.ds(r0, _ROWS), :]
        dy = dy_ref[pl.ds(r0, _ROWS), :]
        dz = dz_ref[pl.ds(r0, _ROWS), :]

        def chunk(k, carry):
            bt, bi, bu, bv, be = carry
            base = k * 128
            slotbase = jnp.float32(SLOT) * k.astype(jnp.float32)
            for s in range(SLOT):
                # SMEM scalar loads: attr a of slot s at flat index
                # (a//4)*stride + k*128 + (a%4)*32 + s
                g = lambda a: p_ref[a // 4, base + (a % 4) * SLOT + s]
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
                near = (
                    (tm <= bt * (1.0 + tie_eps))
                    & (bt <= tm * (1.0 + tie_eps))
                    & (tm < _INF)
                )
                repl = (~near & (tm < bt)) | (near & (em > 0.5) & (be < 0.5))
                bt = jnp.where(repl, tm, bt)
                bi = jnp.where(repl, slotbase + s, bi)
                bu = jnp.where(repl, u, bu)
                bv = jnp.where(repl, v, bv)
                be = jnp.where(repl, em, be)
            return bt, bi, bu, bv, be

        init = (
            jnp.full(shp, _INF),
            jnp.zeros(shp, jnp.float32),   # triangle id carried as f32
            jnp.zeros(shp, jnp.float32),
            jnp.zeros(shp, jnp.float32),
            jnp.zeros(shp, jnp.float32),   # best-hit-emissive flag
        )
        bt, bi, bu, bv, _ = jax.lax.fori_loop(0, n_chunks, chunk, init)
        t_out[pl.ds(r0, _ROWS), :] = bt
        i_out[pl.ds(r0, _ROWS), :] = bi.astype(jnp.int32)
        u_out[pl.ds(r0, _ROWS), :] = bu
        v_out[pl.ds(r0, _ROWS), :] = bv
        return 0

    jax.lax.fori_loop(0, n_tiles, tile, 0)


def pallas_intersect_planes(scene: Scene, ox, oy, oz, dx, dy, dz,
                            config: RenderConfig):
    """Planar entry: six (R,) component planes in, planar hit out —
    (t, idx, u, v) each (R,). Skips all (R, 3) marshalling so callers that
    already carry state as component planes (integrator/fused.py) pay no
    relayout on either side of the kernel."""
    T = scene.v0.shape[0]
    P, n_chunks = pack_triangle_slots(
        scene.woop_a, scene.woop_b, scene.gn, scene.tri_emissive
    )

    R = ox.shape[0]
    super_rays = min(SUPER_TILES * RAY_TILE, RAY_TILE * -(-R // RAY_TILE))
    pad_r = (-R) % super_rays
    comps = [ox, oy, oz, dx, dy, dz]
    if pad_r:
        comps = [jnp.pad(c, (0, pad_r)) for c in comps]
    Rp = comps[0].shape[0]
    n_super = Rp // super_rays
    tiles_per_super = super_rays // RAY_TILE
    rows_per_super = super_rays // 128

    planes = [c.reshape(-1, 128) for c in comps]

    kern = functools.partial(
        _kernel, n_chunks=n_chunks, n_tiles=tiles_per_super,
        t_min=config.t_min, graze=config.n_dot_d_min, tie_eps=config.tie_eps,
    )
    ray_spec = pl.BlockSpec(
        (rows_per_super, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (rows_per_super, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
    )

    bt, bi, bu, bv = pl.pallas_call(
        kern,
        grid=(n_super,),
        interpret=jax.default_backend() == "cpu",  # tests run on CPU
        in_specs=[ray_spec] * 6 + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[out_spec] * 4,
        out_shape=[
            jax.ShapeDtypeStruct((Rp // 128, 128), jnp.float32),
            jax.ShapeDtypeStruct((Rp // 128, 128), jnp.int32),
            jax.ShapeDtypeStruct((Rp // 128, 128), jnp.float32),
            jax.ShapeDtypeStruct((Rp // 128, 128), jnp.float32),
        ],
    )(*planes, P)

    flat = lambda x: x.reshape(-1)[:R]
    bt, bi, bu, bv = flat(bt), flat(bi), flat(bu), flat(bv)
    bi = jnp.minimum(bi, T - 1)  # padded-slot ids can't win, but clamp anyway
    return bt, bi, bu, bv


@functools.partial(jax.jit, static_argnames=("config",))
def pallas_intersect(scene: Scene, org, d, config: RenderConfig) -> Hit:
    bt, bi, bu, bv = pallas_intersect_planes(
        scene, org[:, 0], org[:, 1], org[:, 2], d[:, 0], d[:, 1], d[:, 2],
        config,
    )
    return Hit(t=bt, idx=bi, u=bu, v=bv, hit=bt < INF)
