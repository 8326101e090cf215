"""BVH build invariants: leaf ranges partition the triangle set, skip links
form a valid preorder threading, node AABBs contain their triangles with the
reference's 1e-3 pad (bvh.cpp:31-40), SAH splits respect leaf_size
(main.cpp:76)."""

import numpy as np
import pytest

from tinyraytracing_tpu.ops.bvh import build_bvh


@pytest.fixture(scope="module")
def built(rng):
    v = rng.uniform(0, 100, (500, 3, 3))
    nodes, perm = build_bvh(v, leaf_size=8, aabb_pad=1e-3)
    return v, nodes, perm


def test_permutation_valid(built):
    v, nodes, perm = built
    assert sorted(perm.tolist()) == list(range(len(v)))


def test_leaves_partition(built):
    v, nodes, perm = built
    leaf = nodes["count"] > 0
    starts = nodes["start"][leaf]
    counts = nodes["count"][leaf]
    order = np.argsort(starts)
    starts, counts = starts[order], counts[order]
    assert starts[0] == 0
    assert np.all(starts[1:] == starts[:-1] + counts[:-1])
    assert starts[-1] + counts[-1] == len(v)
    assert counts.max() <= 8


def test_skip_links_preorder(built):
    v, nodes, perm = built
    N = len(nodes["skip"])
    skip = nodes["skip"]
    assert np.all(skip > np.arange(N))
    assert np.all(skip <= N)
    # walking hit-path (i+1 for internal, skip for leaf) visits every node
    visited = 0
    i = 0
    seen_leaf_tris = 0
    while i < N:
        visited += 1
        if nodes["count"][i] > 0:
            seen_leaf_tris += nodes["count"][i]
            i = skip[i]
        else:
            i += 1
    assert visited == N
    assert seen_leaf_tris == len(v)


def test_aabbs_contain_triangles(built):
    v, nodes, perm = built
    pv = v[perm]
    leaf = np.nonzero(nodes["count"] > 0)[0]
    for li in leaf[:50]:
        s, c = nodes["start"][li], nodes["count"][li]
        tri = pv[s : s + c]
        assert np.all(tri.min(axis=(0, 1)) >= nodes["nmin"][li] - 1e-5)
        assert np.all(tri.max(axis=(0, 1)) <= nodes["nmax"][li] + 1e-5)
    # root contains everything
    assert np.all(v.min(axis=(0, 1)) >= nodes["nmin"][0] - 1e-5)
    assert np.all(v.max(axis=(0, 1)) <= nodes["nmax"][0] + 1e-5)


def test_single_triangle_and_tiny_scenes():
    v = np.array([[[0, 0, 0], [1, 0, 0], [0, 1, 0]]], dtype=np.float64)
    nodes, perm = build_bvh(v)
    assert len(nodes["nmin"]) == 1 and nodes["count"][0] == 1
    v9 = np.repeat(v, 9, axis=0) + np.arange(9)[:, None, None]
    nodes, perm = build_bvh(v9, leaf_size=8)
    assert (nodes["count"] > 0).sum() == 2  # must split: 9 > 8


def test_widen_bvh_structure():
    """widen_bvh must partition the binary tree's leaves exactly: every
    leaf id appears exactly once across all wide-node children, child
    boxes equal the binary nodes' padded boxes, and internal children
    reference valid wide nodes forming a tree (each non-root wide node
    referenced exactly once)."""
    import numpy as np

    from tinyraytracing_tpu.ops.bvh import build_bvh, widen_bvh

    rng = np.random.default_rng(11)
    tri = rng.uniform(-5, 5, (777, 3, 3))
    nodes, _perm = build_bvh(tri, leaf_size=8)
    wide, depth, _bmap = widen_bvh(nodes)
    count = nodes["count"]
    n_leaves = int((count > 0).sum())

    metas = wide[:, 6::8]
    leaf_ids = []
    internal_refs = []
    for wi in range(wide.shape[0]):
        for c in range(8):
            m = metas[wi, c]
            if m == -1.0:
                continue
            if m <= -2.0:
                dec = int(-m) - 2
                leaf_ids.append(dec >> 6)
                assert 1 <= (dec & 63) <= 8   # slot count (leaf_size 8 here)
            else:
                internal_refs.append(int(m))
    assert sorted(leaf_ids) == list(range(n_leaves))
    # each non-root wide node referenced exactly once, no self/back refs
    assert sorted(internal_refs) == list(range(1, wide.shape[0]))
    assert depth >= 1
    # child boxes must be actual binary-node boxes (padded)
    all_boxes = set()
    for i in range(len(count)):
        all_boxes.add(tuple(np.round(
            np.concatenate([nodes["nmin"][i], nodes["nmax"][i]]).astype(np.float32), 5)))
    for wi in range(wide.shape[0]):
        for c in range(8):
            if metas[wi, c] == -1.0:
                continue
            box = tuple(np.round(wide[wi, c * 8:c * 8 + 6], 5))
            assert box in all_boxes
