"""Pallas TPU kernel: packet BVH traversal.

The vmapped ``while_loop`` traversal (ops/traverse.py) performs per-lane
dynamic gathers of node data — measured ~5K rays/s on a v5e, unusable.
This kernel instead walks the tree ONE NODE AT A TIME for a whole PACKET
of rays (1024 lanes in lockstep), which maps onto the hardware:

- node AABB + links are SCALAR state (dynamic row reads from a VMEM node
  table — no per-lane gathers anywhere)
- the slab test runs vectorized over the packet as (8, 128) full-tile ops
- descend (cursor+1) when ANY lane's ray enters the box and can still
  improve its best hit; otherwise jump the skip link
- leaves are fixed ``leaf_size``-slot blocks (models.scene.PackedLeaves),
  so a leaf test is one contiguous static-size Woop FMA block — the same
  math as ops/pallas_intersect.py

Divergence cost: a packet visits the UNION of the nodes its rays need —
excellent for coherent (camera/shadow) packets, degrading toward brute
force for fully incoherent bounce rays; ray sorting is the follow-up.

Same acceptance rules + epsilon-banded emissive tie-break as every other
intersector; cross-checked against them in tests/test_intersect.py.
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


def _kernel(o_ref, d_ref, box_ref, meta_ref, a_ref, b_ref, g_ref, e_ref,
            t_out, i_out, u_out, v_out,
            *, n_nodes: int, L: int, t_min: float, graze: float,
            tie_eps: float):
    RT = o_ref.shape[0]
    shp = (_ROWS, 128)
    ox = o_ref[:, 0].reshape(shp)
    oy = o_ref[:, 1].reshape(shp)
    oz = o_ref[:, 2].reshape(shp)
    dx = d_ref[:, 0].reshape(shp)
    dy = d_ref[:, 1].reshape(shp)
    dz = d_ref[:, 2].reshape(shp)
    big = jnp.float32(_INF)
    invx = jnp.where(dx == 0.0, big, 1.0) / jnp.where(dx == 0.0, 1.0, dx)
    invy = jnp.where(dy == 0.0, big, 1.0) / jnp.where(dy == 0.0, 1.0, dy)
    invz = jnp.where(dz == 0.0, big, 1.0) / jnp.where(dz == 0.0, 1.0, dz)

    # column vectors for the leaf FMA block
    oxc, oyc, ozc = o_ref[:, 0:1], o_ref[:, 1:2], o_ref[:, 2:3]
    dxc, dyc, dzc = d_ref[:, 0:1], d_ref[:, 1:2], d_ref[:, 2:3]
    lanef = jax.lax.broadcasted_iota(jnp.int32, (RT, L), 1).astype(jnp.float32)

    def cond(s):
        return s[0] < n_nodes

    def body(s):
        i, bt, bi, bu, bv, be = s
        box = box_ref[pl.ds(i, 1), :]                  # (1, 8)
        t_ax = (box[0, 0] - ox) * invx
        t_bx = (box[0, 3] - ox) * invx
        t_ay = (box[0, 1] - oy) * invy
        t_by = (box[0, 4] - oy) * invy
        t_az = (box[0, 2] - oz) * invz
        t_bz = (box[0, 5] - oz) * invz
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

        skip = meta_ref[i, 0]
        leaf = meta_ref[i, 1]
        is_leaf = leaf >= 0

        def do_leaf(carry):
            bt, bi, bu, bv, be = carry
            off3 = leaf * (3 * L)
            off1 = leaf * L
            a = a_ref[:, pl.ds(off3, 3 * L)]           # (3, 3L)
            bb = b_ref[:, pl.ds(off3, 3 * L)]          # (1, 3L)
            g = g_ref[:, pl.ds(off1, L)]               # (3, L)
            em = e_ref[:, pl.ds(off1, L)] > 0.0        # (1, L)

            ld = dxc * a[0:1, :] + dyc * a[1:2, :] + dzc * a[2:3, :]
            lo = oxc * a[0:1, :] + oyc * a[1:2, :] + ozc * a[2:3, :] + bb
            ndd = dxc * g[0:1, :] + dyc * g[1:2, :] + dzc * g[2:3, :]
            ldw = ld[:, 2 * L :]
            inv = jnp.where(ldw == 0.0, 0.0, 1.0) / jnp.where(ldw == 0.0, 1.0, ldw)
            t = -lo[:, 2 * L :] * inv
            u = lo[:, :L] + t * ld[:, :L]
            v = lo[:, L : 2 * L] + t * ld[:, L : 2 * L]
            ok = (
                (jnp.abs(ndd) >= graze)
                & (ldw != 0.0)
                & (t >= t_min)
                & (u >= 0.0)
                & (v >= 0.0)
                & (u + v <= 1.0)
            )
            tm = jnp.where(ok, t, _INF)                # (RT, L)

            ct0 = jnp.min(tm, axis=1)
            tie = (tm <= ct0[:, None] * (1.0 + tie_eps)) & (tm < _INF) & em
            bigl = jnp.float32(1.0e9)
            idx_e = jnp.min(jnp.where(tie, lanef, bigl), axis=1)
            idx_m = jnp.min(jnp.where(tm == ct0[:, None], lanef, bigl), axis=1)
            chas = idx_e < bigl
            ci = jnp.where(chas, idx_e, idx_m)
            sel = lanef == ci[:, None]
            pick = lambda x: jnp.sum(jnp.where(sel, x, 0.0), axis=1)
            ct = pick(tm).reshape(shp)
            cu = pick(u).reshape(shp)
            cv = pick(v).reshape(shp)
            cid = (jnp.float32(L) * leaf.astype(jnp.float32) + ci).reshape(shp)
            chas = chas.reshape(shp)
            chas_f = jnp.where(chas, 1.0, 0.0)

            near = (ct <= bt * (1.0 + tie_eps)) & (bt <= ct * (1.0 + tie_eps)) & (ct < _INF)
            repl = (~near & (ct < bt)) | (near & chas & (be < 0.5))
            return (
                jnp.where(repl, ct, bt),
                jnp.where(repl, cid, bi),
                jnp.where(repl, cu, bu),
                jnp.where(repl, cv, bv),
                jnp.where(repl, chas_f, be),
            )

        carry = (bt, bi, bu, bv, be)
        carry = jax.lax.cond(
            anyhit & is_leaf, do_leaf, lambda c: c, carry
        )
        bt, bi, bu, bv, be = carry

        nxt = jnp.where(anyhit & ~is_leaf, i + 1, skip)
        return (nxt, bt, bi, bu, bv, be)

    init = (
        jnp.int32(0),
        jnp.full(shp, _INF),
        jnp.zeros(shp, jnp.float32),   # slot id carried as f32
        jnp.zeros(shp, jnp.float32),
        jnp.zeros(shp, jnp.float32),
        jnp.zeros(shp, jnp.float32),
    )
    _, bt, bi, bu, bv, _ = jax.lax.while_loop(cond, body, init)
    t_out[:, :] = bt
    i_out[:, :] = bi.astype(jnp.int32)
    u_out[:, :] = bu
    v_out[:, :] = bv


@functools.partial(jax.jit, static_argnames=("config",))
def pallas_bvh_intersect(scene: Scene, org, d, config: RenderConfig) -> Hit:
    pk = scene.bvh.packed
    L = pk.leaf_size

    R = org.shape[0]
    RT = RAY_TILE
    pad_r = (-R) % RT
    if pad_r:
        org = jnp.pad(org, ((0, pad_r), (0, 0)))
        d = jnp.pad(d, ((0, pad_r), (0, 0)))
    Rp = org.shape[0]
    n_tiles = Rp // RT

    kern = functools.partial(
        _kernel, n_nodes=pk.n_nodes, L=L,
        t_min=config.t_min, graze=config.n_dot_d_min, tie_eps=config.tie_eps,
    )
    ray_spec = pl.BlockSpec((RT, 3), lambda i: (i, 0), memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((_ROWS, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)

    bt, bi, bu, bv = pl.pallas_call(
        kern,
        grid=(n_tiles,),
        interpret=jax.default_backend() == "cpu",
        in_specs=[ray_spec, ray_spec, full, full, full, full, full, full],
        out_specs=[out_spec] * 4,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles * _ROWS, 128), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles * _ROWS, 128), jnp.int32),
            jax.ShapeDtypeStruct((n_tiles * _ROWS, 128), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles * _ROWS, 128), jnp.float32),
        ],
    )(org, d, pk.node_box, pk.node_meta, pk.A, pk.B, pk.G, pk.emis)

    flat = lambda x: x.reshape(-1)[:R]
    bt, bi, bu, bv = flat(bt), flat(bi), flat(bu), flat(bv)
    tri = pk.tid[jnp.clip(bi, 0, pk.tid.shape[0] - 1)]  # slot -> triangle id
    return Hit(t=bt, idx=tri, u=bu, v=bv, hit=bt < INF)
