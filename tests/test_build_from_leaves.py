"""Bottom-up Morton builder (ops.octree.build_from_leaves): must reproduce
the top-down frontier builder's packed layout bit-for-bit (the reference's
disabled SVOCreatorMorton role, Utility/Old/SVOCreatorMorton.cs.disabled)."""

import numpy as np
import pytest

import raytracingtest_tpu as rt
from raytracingtest_tpu.ops import traverse
from raytracingtest_tpu.ops.octree import build_from_leaves


@pytest.mark.parametrize("scene,depth", [("sphere", 5), ("terrain", 6)])
def test_matches_topdown_builder_bitwise(scene, depth):
    res = rt.build_svo(rt.get_scene(scene), depth)
    # shuffle the input: the builder must restore canonical Morton order
    rng = np.random.default_rng(0)
    perm = rng.permutation(res.leaf_coords.shape[0])
    svo2 = build_from_leaves(res.leaf_coords[perm], depth,
                             albedo=np.asarray(res.svo.leaf_albedo)[perm],
                             normal=np.asarray(res.svo.leaf_normal)[perm],
                             density=np.asarray(res.svo.leaf_density)[perm])
    np.testing.assert_array_equal(np.asarray(res.svo.masks), svo2.masks)
    np.testing.assert_array_equal(np.asarray(res.svo.child_base),
                                  svo2.child_base)
    np.testing.assert_array_equal(np.asarray(res.svo.leaf_base),
                                  svo2.leaf_base)
    np.testing.assert_array_equal(np.asarray(res.svo.leaf_albedo),
                                  svo2.leaf_albedo)
    assert res.svo.level_start == svo2.level_start
    np.testing.assert_array_equal(np.asarray(res.svo.parent_ptr),
                                  svo2.parent_ptr)


def test_traces_identically():
    res = rt.build_svo(rt.get_scene("sphere"), 5)
    svo2 = build_from_leaves(res.leaf_coords, 5)
    rng = np.random.default_rng(1)
    v = rng.normal(size=(128, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    o = (np.array([0.5] * 3) + 2 * v).astype(np.float32)
    d = (-v).astype(np.float32)
    r1 = traverse.trace_numpy(res.svo, o, d)
    r2 = traverse.trace_numpy(svo2, o, d)
    np.testing.assert_array_equal(r1.hit_leaf, r2.hit_leaf)
    np.testing.assert_array_equal(r1.hit_t, r2.hit_t)


def test_rejects_bad_input():
    with pytest.raises(ValueError):
        build_from_leaves(np.array([[0, 0, 0], [0, 0, 0]]), 3)  # duplicate
    with pytest.raises(ValueError):
        build_from_leaves(np.array([[8, 0, 0]]), 3)  # out of range


def test_empty_and_single():
    svo = build_from_leaves(np.zeros((0, 3), np.int64), 3)
    assert svo.n_leaves == 0
    r = traverse.trace_numpy(svo, np.array([[0.5, 0.5, -1.0]], np.float32),
                             np.array([[0.0, 0.0, 1.0]], np.float32))
    assert r.hit_leaf[0] == -1
    svo1 = build_from_leaves(np.array([[3, 4, 5]]), 3)
    assert svo1.n_leaves == 1
