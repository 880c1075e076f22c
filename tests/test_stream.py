"""Streaming layer: chunk octree ops, clipmap ring maintenance, arena
upload/free, and stitched two-phase traversal vs a direct global build."""

import numpy as np
import pytest

from raytracingtest_tpu.ops import traverse
from raytracingtest_tpu.ops.octree import build_svo
from raytracingtest_tpu.scenes import get_scene
from raytracingtest_tpu.stream.chunk_octree import ChunkOctree
from raytracingtest_tpu.stream.clipmap import (
    Arena, Clipmap, trace_clipmap, _chunk_scene,
)


# ---------------------------------------------------------------------------
# chunk octree (Octree.cs parity)
# ---------------------------------------------------------------------------

def test_octree_add_find():
    t = ChunkOctree(origin=(0, 0, 0), size=1.0)
    t.add_chunk((0.0, 0.0, 0.0), 0.25, "a")
    t.add_chunk((0.25, 0.0, 0.0), 0.25, "b")
    assert t.find_chunk((0.1, 0.1, 0.1)) == "a"
    assert t.find_chunk((0.3, 0.1, 0.1)) == "b"
    assert t.find_chunk((0.9, 0.9, 0.9)) is None
    assert t.n_chunks == 2


def test_octree_grows_toward_outside_insert():
    t = ChunkOctree(origin=(0, 0, 0), size=1.0)
    t.add_chunk((0.0, 0.0, 0.0), 0.5, "in")
    t.add_chunk((-1.0, -1.0, -1.0), 1.0, "out")  # outside: root must grow
    assert t.root.size >= 2.0
    assert t.find_chunk((0.2, 0.2, 0.2)) == "in"
    assert t.find_chunk((-0.5, -0.5, -0.5)) == "out"


def test_octree_remove_prunes_and_simplifies():
    t = ChunkOctree(origin=(0, 0, 0), size=1.0)
    t.add_chunk((0.0, 0.0, 0.0), 0.25, "a")
    t.add_chunk((0.5, 0.5, 0.5), 0.5, "b")
    assert t.remove_chunk((0.5, 0.5, 0.5), 0.5)
    assert t.find_chunk((0.7, 0.7, 0.7)) is None
    assert not t.remove_chunk((0.5, 0.5, 0.5), 0.5)  # already gone
    assert t.n_chunks == 1


def test_extract_trunk_structure():
    t = ChunkOctree(origin=(0, 0, 0), size=1.0)
    t.add_chunk((0.0, 0.0, 0.0), 0.5, "a")
    t.add_chunk((0.5, 0.0, 0.0), 0.25, "b")
    trunk, table = t.extract_trunk()
    payloads = {c for _, _, c in table}
    assert payloads == {"a", "b"}
    # trace a ray at the big chunk: must hit its leaf slot
    r = traverse.trace_numpy(
        trunk, np.array([[0.25, 0.25, -1.0]], np.float32),
        np.array([[0.0, 0.0, 1.0]], np.float32))
    assert r.hit_leaf[0] >= 0
    assert table[r.hit_leaf[0]][2] == "a"
    # and a ray through empty space misses
    r2 = traverse.trace_numpy(
        trunk, np.array([[0.25, 0.75, -1.0]], np.float32),
        np.array([[0.0, 0.0, 1.0]], np.float32))
    assert r2.hit_leaf[0] == -1


# ---------------------------------------------------------------------------
# arena
# ---------------------------------------------------------------------------

def test_arena_upload_rebases_pointers():
    res = build_svo(get_scene("sphere"), 4)
    arena = Arena(node_capacity=10000, leaf_capacity=10000)
    # leave a hole at the start so offsets are nonzero
    hole_n = arena._alloc(arena._free_nodes, 64)
    hole_l = arena._alloc(arena._free_leaves, 64)
    node_off, leaf_off = arena.upload(res.svo)
    assert node_off == 64 and leaf_off == 64
    # tracing inside the arena with root=node_off must equal direct tracing
    from raytracingtest_tpu.ops.octree import SVO
    arena_svo = SVO(
        masks=arena.masks, child_base=arena.child_base,
        leaf_base=arena.leaf_base, leaf_albedo=arena.leaf_albedo,
        leaf_normal=arena.leaf_normal, leaf_density=arena.leaf_density,
        depth=4, level_start=res.svo.level_start)
    rng = np.random.default_rng(0)
    v = rng.normal(size=(100, 3)); v /= np.linalg.norm(v, axis=1, keepdims=True)
    o = (np.array([0.5] * 3) + 2 * v).astype(np.float32)
    d = -v.astype(np.float32)
    r_direct = traverse.trace_numpy(res.svo, o, d)
    r_arena = traverse.trace_numpy(arena_svo, o, d,
                                   root=np.full(100, node_off, np.int32))
    hit = r_direct.hit_leaf >= 0
    np.testing.assert_array_equal(r_direct.hit_leaf >= 0, r_arena.hit_leaf >= 0)
    np.testing.assert_array_equal(
        r_direct.hit_leaf[hit] + leaf_off, r_arena.hit_leaf[hit])
    np.testing.assert_allclose(r_direct.hit_t, r_arena.hit_t, rtol=1e-6)


def test_arena_free_coalesces():
    arena = Arena(node_capacity=1000, leaf_capacity=1000)
    res = build_svo(get_scene("sphere"), 3)
    chunks = []
    from raytracingtest_tpu.stream.clipmap import Chunk
    for i in range(3):
        no, lo = arena.upload(res.svo)
        chunks.append(Chunk(
            position=np.zeros(3), size=1.0, lod=0, creation_time=0,
            node_offset=no, n_nodes=res.svo.n_nodes, leaf_offset=lo,
            n_leaves=res.svo.n_leaves, depth=3,
            level_start=res.svo.level_start))
    used = arena.nodes_used
    for c in chunks:
        arena.free(c)
    assert arena.nodes_used == 0
    assert arena._free_nodes == [(0, 1000)]


# ---------------------------------------------------------------------------
# clipmap
# ---------------------------------------------------------------------------

def test_clipmap_update_and_eviction():
    scene = get_scene("flat_ground")
    arena = Arena(node_capacity=300000, leaf_capacity=300000)
    cm = Clipmap(scene, arena, min_chunk_size=0.25, radius=2, lods=2,
                 chunk_depth=3)
    stats1 = cm.update((0.3, 0.3, 0.3))
    assert stats1["added"] > 0
    n1 = stats1["resident"]
    # same snapped position: early-out, nothing changes
    stats2 = cm.update((0.31, 0.3, 0.3))
    assert stats2["added"] == 0 and stats2["evicted"] == 0
    # move far: rings recenter, old chunks evicted
    stats3 = cm.update((0.8, 0.3, 0.8))
    assert stats3["added"] > 0
    assert stats3["evicted"] > 0
    assert cm.octree.n_chunks == len(cm.resident)


def test_clipmap_lod_rings_do_not_overlap():
    scene = get_scene("flat_ground")
    arena = Arena(node_capacity=300000, leaf_capacity=300000)
    cm = Clipmap(scene, arena, min_chunk_size=0.125, radius=2, lods=2,
                 chunk_depth=2)
    cm.update((0.5, 0.5, 0.5))
    import pytest as _pytest
    with _pytest.raises(ValueError):
        Clipmap(scene, arena, min_chunk_size=0.125, radius=1, lods=2,
                chunk_depth=2)
    boxes = [(tuple(c.position), c.size) for c in cm.resident.values()]
    # pairwise: no strict containment/overlap of distinct chunk AABBs
    for i, (p1, s1) in enumerate(boxes):
        for p2, s2 in boxes[i + 1:]:
            lo1, hi1 = np.array(p1), np.array(p1) + s1
            lo2, hi2 = np.array(p2), np.array(p2) + s2
            inter = np.minimum(hi1, hi2) - np.maximum(lo1, lo2)
            assert not np.all(inter > 1e-9), (p1, s1, p2, s2)


def test_stitched_trace_matches_global_build():
    """Config parity for streaming: single-LOD clipmap covering the whole
    scene traced through trunk+arena must reproduce a direct global build
    of the same effective resolution."""
    scene = get_scene("sphere")
    arena = Arena(node_capacity=500000, leaf_capacity=500000)
    # 2 chunks of size 0.5 per axis at depth 4 == global depth 5
    cm = Clipmap(scene, arena, min_chunk_size=0.5, radius=2, lods=1,
                 chunk_depth=4)
    cm.update((0.5, 0.5, 0.5))
    assert len(cm.resident) == 8
    trunk, roots, origins, sizes = cm.master()

    rng = np.random.default_rng(5)
    v = rng.normal(size=(200, 3)); v /= np.linalg.norm(v, axis=1, keepdims=True)
    o = (np.array([0.5] * 3) + 2 * v).astype(np.float32)
    tgt = np.array([0.5] * 3) + rng.normal(0, 0.2, (200, 3))
    d = (tgt - o).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    hit_leaf, hit_t, hit_chunk = trace_clipmap(
        trunk, (0.0, 0.0, 0.0), 1.0, roots, origins, sizes, 4, arena, o, d)

    ref = build_svo(scene, 5)
    r_ref = traverse.trace_numpy(ref.svo, o, d)

    hit_ref = r_ref.hit_leaf >= 0
    hit_cm = hit_leaf >= 0
    np.testing.assert_array_equal(hit_ref, hit_cm)
    np.testing.assert_allclose(hit_t[hit_cm], r_ref.hit_t[hit_ref],
                               rtol=1e-4, atol=1e-5)
    # hit voxel positions must coincide: compare via arena leaf normals
    n_cm = arena.leaf_normal[hit_leaf[hit_cm]]
    n_ref = np.asarray(ref.svo.leaf_normal)[r_ref.hit_leaf[hit_ref]]
    dots = np.sum(n_cm * n_ref, axis=1)
    assert dots.min() > 0.99


def test_chunk_scene_density_scaling():
    scene = get_scene("sphere")
    sub = _chunk_scene(scene, (0.25, 0.25, 0.25), 0.5)
    # chunk-local (0.5,0.5,0.5) = world (0.5,0.5,0.5): centre of sphere
    f = float(sub(np.float32(0.5), np.float32(0.5), np.float32(0.5), xp=np))
    f_world = float(scene(np.float32(0.5), np.float32(0.5), np.float32(0.5), xp=np))
    np.testing.assert_allclose(f, f_world / 0.5, rtol=1e-6)
