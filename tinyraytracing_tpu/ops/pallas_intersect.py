"""Pallas TPU kernel: fused Woop-matmul intersection + closest-hit reduce.

The XLA mxu backend (ops/intersect.py) materializes (R, 3C) matmul outputs
and several (R, C) temporaries in HBM per triangle chunk — at 262k rays
that is ~3 GB of traffic per intersect. This kernel keeps the whole
pipeline in VMEM per ray tile:

    for each tile of RT rays (grid):
        for each chunk of C triangles (fori, triangle data VMEM-resident):
            lo/ld  = ray x Woop-transform matmuls (MXU, f32)
            t,u,v  = epilogue (VPU)
            closest-hit + epsilon-banded emissive tie-break (VPU reduce)
        write 5 per-ray scalars

HBM traffic: rays in (R*24B), results out (R*20B), triangles once — the
kernel is compute-bound on the MXU/VPU instead of bandwidth-bound.

Semantics identical to mxu_intersect (same acceptance rules + tie band);
cross-checked in tests/test_intersect.py.

Triangle layout (host-side prep, cached on the Scene object): per chunk of
C triangles, matmul matrix columns are BLOCK-ordered [C u-rows | C v-rows |
C w-rows] so the (RT, 3C) product slices into contiguous (RT, C) planes.
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

_INF = 3.0e38  # plain python float: jnp scalars would be captured consts in the kernel

DEFAULT_RAY_TILE = 1024  # 8 sublane-rows x 128 lanes


def _prep_triangles(scene: Scene, C: int):
    """Chunk-blocked triangle tensors (host-side layout, jit-constant)."""
    T = scene.v0.shape[0]
    n_chunks = -(-T // C)
    Tp = n_chunks * C

    def pad(x, value=0.0):
        pad_width = [(0, Tp - T)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, pad_width, constant_values=value)

    # A_t: (3, n_chunks*3C) with per-chunk [u|v|w] blocks
    wa = pad(scene.woop_a)                       # (Tp, 3, 3)
    blocks = [wa[:, i, :].reshape(n_chunks, C, 3) for i in range(3)]
    A = jnp.concatenate(blocks, axis=1)          # (n_chunks, 3C, 3)
    A_t = A.transpose(2, 0, 1).reshape(3, n_chunks * 3 * C)
    wb = pad(scene.woop_b)                       # (Tp, 3)
    Bb = jnp.concatenate(
        [wb[:, i].reshape(n_chunks, C) for i in range(3)], axis=1
    ).reshape(1, n_chunks * 3 * C)
    G_t = pad(scene.gn).reshape(n_chunks, C, 3).transpose(2, 0, 1).reshape(3, Tp)
    emis = pad(scene.tri_emissive.astype(jnp.float32)).reshape(1, Tp)
    return A_t, Bb, G_t, emis, n_chunks, Tp


def _kernel(o_ref, d_ref, a_ref, b_ref, g_ref, e_ref,
            t_out, i_out, u_out, v_out, eh_out,
            *, n_chunks: int, C: int, t_min: float, graze: float,
            tie_eps: float):
    RT = o_ref.shape[0]
    o = o_ref[:]                                  # (RT, 3)
    d = d_ref[:]
    # f32 lane ids (int iota then cast — tpu.iota is integer-only):
    # Mosaic only supports f32 index reductions, so "argmin" is expressed
    # as min over masked f32 lane ids.
    lanef = jax.lax.broadcasted_iota(jnp.int32, (RT, C), 1).astype(jnp.float32)

    def chunk(k, carry):
        bt, bi, bu, bv, be = carry
        a = a_ref[:, pl.ds(k * 3 * C, 3 * C)]     # (3, 3C)
        bb = b_ref[:, pl.ds(k * 3 * C, 3 * C)]    # (1, 3C)
        g = g_ref[:, pl.ds(k * C, C)]             # (3, C)
        em = e_ref[:, pl.ds(k * C, C)] > 0.0      # (1, C)

        # K=3 "matmuls" as three broadcast FMAs on the VPU: a
        # Precision.HIGHEST f32 dot_general decomposes into multiple MXU
        # passes whose systolic fill overhead dwarfs the 3-deep
        # contraction (measured ~30ms/call vs <2ms this way).
        dx, dy, dz = d[:, 0:1], d[:, 1:2], d[:, 2:3]      # (RT, 1)
        ox, oy, oz = o[:, 0:1], o[:, 1:2], o[:, 2:3]
        ld = dx * a[0:1, :] + dy * a[1:2, :] + dz * a[2:3, :]   # (RT, 3C)
        lo = ox * a[0:1, :] + oy * a[1:2, :] + oz * a[2:3, :] + bb
        ndd = dx * g[0:1, :] + dy * g[1:2, :] + dz * g[2:3, :]  # (RT, C)

        ldw = ld[:, 2 * C :]
        inv = jnp.where(ldw == 0.0, 0.0, 1.0) / jnp.where(ldw == 0.0, 1.0, ldw)
        t = -lo[:, 2 * C :] * inv
        u = lo[:, :C] + t * ld[:, :C]
        v = lo[:, C : 2 * C] + t * ld[:, C : 2 * C]
        ok = (
            (jnp.abs(ndd) >= graze)
            & (ldw != 0.0)
            & (t >= t_min)
            & (u >= 0.0)
            & (v >= 0.0)
            & (u + v <= 1.0)
        )
        tm = jnp.where(ok, t, _INF)

        ct0 = jnp.min(tm, axis=1)                  # (RT,)
        tie = (tm <= ct0[:, None] * (1.0 + tie_eps)) & (tm < _INF) & em
        big = jnp.float32(1.0e9)
        idx_emis = jnp.min(jnp.where(tie, lanef, big), axis=1)
        idx_min = jnp.min(jnp.where(tm == ct0[:, None], lanef, big), axis=1)
        chas = idx_emis < big
        chas_f = jnp.where(chas, 1.0, 0.0)  # bool carries trip Mosaic i1 casts
        ci_f = jnp.where(chas, idx_emis, idx_min)
        sel = lanef == ci_f[:, None]
        pick = lambda x: jnp.sum(jnp.where(sel, x, 0.0), axis=1)
        ct = pick(tm)
        cu = pick(u)
        cv = pick(v)
        cid = k * C + ci_f.astype(jnp.int32)

        near = (ct <= bt * (1.0 + tie_eps)) & (bt <= ct * (1.0 + tie_eps)) & (ct < _INF)
        repl = (~near & (ct < bt)) | (near & chas & (be < 0.5))
        return (
            jnp.where(repl, ct, bt),
            jnp.where(repl, cid.astype(jnp.int32), bi),
            jnp.where(repl, cu, bu),
            jnp.where(repl, cv, bv),
            jnp.where(repl, chas_f, be),
        )

    init = (
        jnp.full((RT,), _INF),
        jnp.zeros((RT,), jnp.int32),
        jnp.zeros((RT,), jnp.float32),
        jnp.zeros((RT,), jnp.float32),
        jnp.zeros((RT,), jnp.float32),  # emissive flag as f32 (Mosaic i1 limits)
    )
    bt, bi, bu, bv, be = jax.lax.fori_loop(0, n_chunks, chunk, init)
    t_out[:, :] = bt.reshape(RT // 128, 128)
    i_out[:, :] = bi.reshape(RT // 128, 128)
    u_out[:, :] = bu.reshape(RT // 128, 128)
    v_out[:, :] = bv.reshape(RT // 128, 128)
    eh_out[:, :] = be.astype(jnp.int32).reshape(RT // 128, 128)


@functools.partial(jax.jit, static_argnames=("config",))
def pallas_intersect(scene: Scene, org, d, config: RenderConfig) -> Hit:
    C = config.tri_chunk
    T = scene.v0.shape[0]
    A_t, Bb, G_t, emis, n_chunks, Tp = _prep_triangles(scene, C)

    R = org.shape[0]
    RT = DEFAULT_RAY_TILE
    pad_r = (-R) % RT
    if pad_r:
        # zero-direction padding rays can never hit (grazing cull)
        org = jnp.pad(org, ((0, pad_r), (0, 0)))
        d = jnp.pad(d, ((0, pad_r), (0, 0)))
    Rp = org.shape[0]

    kern = functools.partial(
        _kernel, n_chunks=n_chunks, C=C,
        t_min=config.t_min, graze=config.n_dot_d_min, tie_eps=config.tie_eps,
    )
    n_tiles = Rp // RT
    rows = RT // 128  # output rows per program
    grid = (n_tiles,)
    ray_spec = pl.BlockSpec((RT, 3), lambda i: (i, 0), memory_space=pltpu.VMEM)
    tri_spec = pl.BlockSpec(memory_space=pltpu.VMEM)  # whole array resident
    # outputs as (Rp/128, 128) row blocks: Mosaic wants the last two block
    # dims divisible by (8, 128)
    out_spec = pl.BlockSpec((rows, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)

    bt, bi, bu, bv, be = pl.pallas_call(
        kern,
        grid=grid,
        interpret=jax.default_backend() == "cpu",  # tests run on CPU
        in_specs=[ray_spec, ray_spec, tri_spec, tri_spec, tri_spec, tri_spec],
        out_specs=[out_spec] * 5,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles * rows, 128), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles * rows, 128), jnp.int32),
            jax.ShapeDtypeStruct((n_tiles * rows, 128), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles * rows, 128), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles * rows, 128), jnp.int32),
        ],
    )(org, d, A_t, Bb, G_t, emis)

    flat = lambda x: x.reshape(-1)[:R]
    bt, bi, bu, bv = flat(bt), flat(bi), flat(bu), flat(bv)
    bi = jnp.minimum(bi, T - 1)  # padded-chunk ids can't win, but clamp anyway
    return Hit(t=bt, idx=bi, u=bu, v=bv, hit=bt < INF)
