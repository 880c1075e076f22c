import numpy as np
import pytest

from raytracingtest_tpu.ops.octree import build_svo
from raytracingtest_tpu.reference.dense_builder import dense_build
from raytracingtest_tpu.scenes import get_scene

SMALL_SCENES = ["sphere", "dense_cube", "flat_ground", "rotated_cuboid"]


def assert_svo_equal(a, b):
    assert a.depth == b.depth
    assert a.level_start == b.level_start
    np.testing.assert_array_equal(np.asarray(a.masks), np.asarray(b.masks))
    np.testing.assert_array_equal(np.asarray(a.child_base), np.asarray(b.child_base))
    np.testing.assert_array_equal(np.asarray(a.leaf_base), np.asarray(b.leaf_base))
    np.testing.assert_allclose(
        np.asarray(a.leaf_albedo), np.asarray(b.leaf_albedo), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(a.leaf_normal), np.asarray(b.leaf_normal), atol=1e-5
    )


@pytest.mark.parametrize("name", SMALL_SCENES)
@pytest.mark.parametrize("depth", [2, 3, 4])
def test_frontier_matches_dense_oracle(name, depth):
    """Construction oracle (role of the reference's GetAllNodesTest,
    Assets/Tests/SVOTests.cs:44-74): the fast pruned frontier builder must
    produce byte-identical packed arrays to the brute-force dense builder."""
    scene = get_scene(name)
    fast = build_svo(scene, depth)
    dense = dense_build(scene, depth)
    assert_svo_equal(fast.svo, dense.svo)
    np.testing.assert_array_equal(fast.leaf_coords, dense.leaf_coords)


@pytest.mark.parametrize("name", ["sphere", "terrain", "simplex"])
def test_unpruned_matches_pruned(name):
    scene = get_scene(name)
    a = build_svo(scene, 4, prune=True)
    b = build_svo(scene, 4, prune=False)
    assert_svo_equal(a.svo, b.svo)


def test_sphere_leaf_count_scales_like_surface():
    scene = get_scene("sphere")
    n4 = build_svo(scene, 4).svo.n_leaves
    n5 = build_svo(scene, 5).svo.n_leaves
    n6 = build_svo(scene, 6).svo.n_leaves
    # surface voxelization: ~4x leaves per depth increment
    assert 2.5 < n5 / n4 < 6.0
    assert 2.5 < n6 / n5 < 6.0


def test_pruning_is_effective():
    scene = get_scene("sphere")
    r = build_svo(scene, 6)
    # at depth 6 the dense grid has 8^6 = 262144 cells; the pruned frontier
    # must visit far fewer
    assert r.n_candidates[6] < 262144 / 4


def test_structure_invariants():
    scene = get_scene("sphere")
    r = build_svo(scene, 5)
    svo = r.svo
    masks = np.asarray(svo.masks)
    vm = (masks >> 8) & 0xFF
    lm = masks & 0xFF
    # leaf mask is a subset of valid mask
    assert np.all((lm & ~vm) == 0)
    # per level: non-leaf children counted by masks match next level's size
    for l in range(svo.depth - 1):
        lo, hi = svo.level_start[l], svo.level_start[l + 1]
        n_children = int(
            sum(bin(int(v & ~u) & 0xFF).count("1") for v, u in zip(vm[lo:hi], lm[lo:hi]))
        )
        assert n_children == svo.level_start[l + 2] - svo.level_start[l + 1]
    # total leaves counted by masks match the attribute array
    n_leaf = int(sum(bin(int(v)).count("1") for v in lm))
    assert n_leaf == svo.n_leaves
    # leaf normals are unit length
    nn = np.linalg.norm(np.asarray(svo.leaf_normal), axis=1)
    np.testing.assert_allclose(nn, 1.0, atol=1e-4)


def test_empty_scene_has_root():
    from raytracingtest_tpu.scenes import Scene

    empty = Scene("empty", lambda x, y, z, xp: xp.ones_like(xp.asarray(x)), 0.001)
    r = build_svo(empty, 3)
    assert r.svo.n_nodes == 1
    assert r.svo.n_leaves == 0
    assert int(np.asarray(r.svo.masks)[0]) == 0
