"""Pallas TPU kernel: packet BVH traversal.

The vmapped ``while_loop`` traversal (ops/traverse.py) performs per-lane
dynamic gathers of node data — measured ~5K rays/s on a v5e, unusable.
This kernel instead walks the tree ONE NODE AT A TIME for a whole PACKET
of 1024 rays (8 sublanes x 128 lanes in lockstep), which maps onto the
hardware:

- node AABBs + links live as FLAT 1-D arrays in SMEM and are read as
  scalars (a 2-D (N, 8) SMEM array would lane-pad 16x; VMEM row reads +
  lane extraction measured ~10x slower than SMEM scalar loads)
- the slab test runs vectorized over the packet as (8, 128) full-tile ops;
  measured ~25 ns per node visit
- descend (cursor+1) when ANY lane's ray enters the box and can still
  improve its best hit; otherwise jump the skip link
- every leaf is ONE 128-lane block of up to 32 triangle slots
  (models.scene.PackedLeaves) resident in VMEM; a leaf visit DMAs that
  (4, 128) block into an SMEM scratch buffer (~free: latency hides under
  the walk's scalar latency) and then runs a PER-SLOT loop where each
  triangle's 16 attributes are broadcast as SMEM scalars against full
  (8, 128) ray tiles — measured ~50 ns per slot. The kernel has no
  cross-lane reduction or (R,)->(8,128) relayout anywhere; the
  reduction-based variant measured ~8 us per leaf visit, the VMEM
  lane-extraction variant ~20 us.
- the loop over ray tiles lives INSIDE the kernel (fori_loop) — a Pallas
  grid dimension re-issues the input pipeline every step, ~39 us/tile of
  pure overhead. A coarse grid over 64-tile super-blocks bounds VMEM.

Divergence cost: a packet visits the UNION of the nodes its rays need —
excellent for coherent (camera/shadow) packets, degrading toward brute
force for fully incoherent bounce rays; render drivers emit camera rays
in 32x32 pixel tiles to keep packets compact.

Same acceptance rules + epsilon-banded emissive tie-break as every other
intersector (reference: RayTracingOnCPU/bvh.cpp:146-229); cross-checked
against them in tests/test_intersect.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tinyraytracing_tpu.config import RenderConfig
from tinyraytracing_tpu.models.scene import Scene
from tinyraytracing_tpu.ops.intersect import INF, Hit

_INF = 3.0e38
RAY_TILE = 1024
_ROWS = RAY_TILE // 128
SLOT = 32          # triangle slots per leaf block (PackedLeaves layout)
SUPER_TILES = 64   # ray tiles per grid step (bounds VMEM)


def _kernel(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
            box_ref, meta_ref, p_ref, t_out, i_out, u_out, v_out,
            scratch, sem,
            *, n_nodes: int, n_tiles: int, L: int,
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
        big = jnp.float32(_INF)
        invx = jnp.where(dx == 0.0, big, 1.0) / jnp.where(dx == 0.0, 1.0, dx)
        invy = jnp.where(dy == 0.0, big, 1.0) / jnp.where(dy == 0.0, 1.0, dy)
        invz = jnp.where(dz == 0.0, big, 1.0) / jnp.where(dz == 0.0, 1.0, dz)

        def cond(s):
            return s[0] < n_nodes

        def body(s):
            i, bt, bi, bu, bv, be = s
            b = i * 8
            t_ax = (box_ref[b + 0] - ox) * invx
            t_bx = (box_ref[b + 3] - ox) * invx
            t_ay = (box_ref[b + 1] - oy) * invy
            t_by = (box_ref[b + 4] - oy) * invy
            t_az = (box_ref[b + 2] - oz) * invz
            t_bz = (box_ref[b + 5] - oz) * invz
            t0 = jnp.maximum(
                jnp.maximum(jnp.minimum(t_ax, t_bx), jnp.minimum(t_ay, t_by)),
                jnp.minimum(t_az, t_bz),
            )
            t1 = jnp.minimum(
                jnp.minimum(jnp.maximum(t_ax, t_bx), jnp.maximum(t_ay, t_by)),
                jnp.maximum(t_az, t_bz),
            )
            dist = jnp.where(t0 > 0.0, t0, t1)
            hit_i = (t1 >= t0) & (dist > 0.0) & (
                jnp.maximum(t0, 0.0) <= bt * (1.0 + tie_eps)
            )
            anyhit = jnp.any(hit_i)

            skip = meta_ref[i * 2]
            enc = meta_ref[i * 2 + 1]    # leaf_id*64 + count, or -1
            leaf = jnp.where(enc >= 0, enc >> 6, -1)
            is_leaf = enc >= 0

            def do_leaf(carry):
                bt, bi, bu, bv, be = carry
                off = pl.multiple_of(jnp.maximum(leaf, 0) * 128, 128)
                dma = pltpu.make_async_copy(
                    p_ref.at[:, pl.ds(off, 128)], scratch, sem
                )
                dma.start()
                dma.wait()
                slotbase = jnp.float32(SLOT) * leaf.astype(jnp.float32)
                for s in range(L):
                    # attr a lives at (row a//4, lane (a%4)*32 + s)
                    g = lambda a: scratch[a // 4, (a % 4) * SLOT + s]
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

            carry = jax.lax.cond(
                anyhit & is_leaf, do_leaf, lambda c: c, (bt, bi, bu, bv, be)
            )
            bt, bi, bu, bv, be = carry
            nxt = jnp.where(anyhit & ~is_leaf, i + 1, skip)
            return (nxt, bt, bi, bu, bv, be)

        init = (
            jnp.int32(0),
            jnp.full(shp, _INF),
            jnp.zeros(shp, jnp.float32),   # slot id carried as f32
            jnp.zeros(shp, jnp.float32),   # barycentric u
            jnp.zeros(shp, jnp.float32),   # barycentric v
            jnp.zeros(shp, jnp.float32),   # best-hit-emissive flag
        )
        _, bt, bi, bu, bv, _ = jax.lax.while_loop(cond, body, init)
        t_out[pl.ds(r0, _ROWS), :] = bt
        i_out[pl.ds(r0, _ROWS), :] = bi.astype(jnp.int32)
        u_out[pl.ds(r0, _ROWS), :] = bu
        v_out[pl.ds(r0, _ROWS), :] = bv
        return 0

    jax.lax.fori_loop(0, n_tiles, tile, 0)


@functools.partial(jax.jit, static_argnames=("config",))
def pallas_bvh_intersect_planes(scene: Scene, ox, oy, oz, dx, dy, dz,
                                config: RenderConfig):
    """Planar entry: six (R,) component planes in, (t, idx, u, v) planes out.
    See ops/pallas_intersect.py pallas_intersect_planes for rationale."""
    pk = scene.bvh.packed
    R = ox.shape[0]

    super_rays = min(SUPER_TILES * RAY_TILE,
                     RAY_TILE * -(-R // RAY_TILE))
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
        _kernel, n_nodes=pk.n_nodes, n_tiles=tiles_per_super, L=pk.leaf_size,
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
        interpret=jax.default_backend() == "cpu",
        in_specs=[ray_spec] * 6 + [
            pl.BlockSpec(memory_space=pltpu.SMEM),   # node boxes, flat
            pl.BlockSpec(memory_space=pltpu.SMEM),   # node meta, flat
            pl.BlockSpec(memory_space=pltpu.VMEM),   # leaf payload
        ],
        out_specs=[out_spec] * 4,
        out_shape=[
            jax.ShapeDtypeStruct((Rp // 128, 128), jnp.float32),
            jax.ShapeDtypeStruct((Rp // 128, 128), jnp.int32),
            jax.ShapeDtypeStruct((Rp // 128, 128), jnp.float32),
            jax.ShapeDtypeStruct((Rp // 128, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.SMEM((4, 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )(*planes, pk.node_box.reshape(-1), pk.node_meta.reshape(-1), pk.P)

    flat = lambda x: x.reshape(-1)[:R]
    bt, bi, u, v = flat(bt), flat(bi), flat(bu), flat(bv)
    tri = pk.tid[jnp.clip(bi, 0, pk.tid.shape[0] - 1)]  # slot -> triangle id
    return bt, tri, u, v


def pallas_bvh_intersect(scene: Scene, org, d, config: RenderConfig) -> Hit:
    bt, tri, u, v = pallas_bvh_intersect_planes(
        scene, org[:, 0], org[:, 1], org[:, 2], d[:, 0], d[:, 1], d[:, 2],
        config,
    )
    return Hit(t=bt, idx=tri, u=u, v=v, hit=bt < INF)
