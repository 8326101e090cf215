"""Gather-free small-table lookups.

XLA TPU per-lane gathers cost ~12 ns per OUTPUT element regardless of
table size (measured v5e: a (262144,) gather from a (36, 3) table is
~2-4 ms; a one-hot MXU matmul ~1.3 ms; a fused select chain ~0.03 ms).
For the tiny tables a renderer keeps consulting per bounce — materials
(M ~ 4-36 rows), per-light triangle lists (K ~ 2-8 rows) — a chain of
``where(idx == k, table[k], ...)`` selects is 50-100x cheaper: it is pure
elementwise VPU code that XLA fuses into the surrounding bounce math.

Cost is O(M * C) vector ops per call, so these helpers fall back to a
real gather past ``CHAIN_LIMIT`` rows where the chain would stop winning.
"""

from __future__ import annotations

import jax.numpy as jnp

# beyond this many table rows a select chain stops beating a gather
CHAIN_LIMIT = 64


def chain_lookup(table, idx):
    """Look up ``table[idx]`` without a gather when the table is small.

    table: (M,) or (M, C) array (typically a jit-closure constant).
    idx:   integer array of any shape.
    Returns an array shaped idx.shape (+ (C,)) like ``table[idx]``.
    """
    M = table.shape[0]
    if M > CHAIN_LIMIT:
        return table[idx]
    if table.ndim == 1:
        out = jnp.full(idx.shape, table[M - 1], dtype=table.dtype)
        for k in range(M - 2, -1, -1):
            out = jnp.where(idx == k, table[k], out)
        return out
    cols = [chain_lookup(table[:, c], idx) for c in range(table.shape[1])]
    return jnp.stack(cols, axis=-1)


def chain_lookup_planes(table, idx):
    """Like chain_lookup for a (M, C) table, but returns a TUPLE of C
    component planes shaped like idx (the ops/vec.py planar layout)."""
    return tuple(chain_lookup(table[:, c], idx) for c in range(table.shape[1]))
