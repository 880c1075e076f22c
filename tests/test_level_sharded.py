"""Level-sharded octree on the 8-device CPU mesh: subtree extraction,
trunk compilation, and sharded trace vs the direct single-array trace."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from raytracingtest_tpu.ops import traverse
from raytracingtest_tpu.ops.octree import SVO, build_svo
from raytracingtest_tpu.parallel.level_sharded import (
    LevelShardedSVO, extract_subtree, make_sharded_trace, split_svo,
)
from raytracingtest_tpu.parallel.mesh import make_mesh
from tests.test_traverse import random_rays


@pytest.fixture(scope="module")
def sphere6():
    return build_svo(get_scene_sphere(), 6)


def get_scene_sphere():
    from raytracingtest_tpu.scenes import get_scene

    return get_scene("sphere")


def test_extract_subtree_traces_identically(sphere6):
    svo = sphere6.svo
    level = 2
    lo, hi = svo.level_start[level], svo.level_start[level + 1]
    coords = sphere6.node_coords[level]
    size = 2.0 ** (-level)
    rng = np.random.default_rng(0)
    checked = 0
    for i in range(hi - lo):
        sub = extract_subtree(svo, level, i)
        if sub.n_leaves == 0:
            continue
        org = coords[i].astype(np.float32) * size
        # rays aimed at this octant, traced in subtree-local coords
        o, d = random_rays(64, seed=i,
                           toward=tuple(org + size / 2), spread=size / 6)
        o_loc = (o - org) / size
        r_sub = traverse.trace_numpy(sub, o_loc, d)
        r_full = traverse.trace_numpy(svo, o, d)
        # where the full trace hits inside this octant, the subtree trace
        # must hit the same voxel (attribute identity) at the same t
        vox = np.asarray(svo.leaf_albedo)
        vox_sub = np.asarray(sub.leaf_albedo)
        hit_full = r_full.hit_leaf >= 0
        hit_sub = r_sub.hit_leaf >= 0
        # only rays whose FULL-tree hit lies inside this octant are
        # comparable (the full trace may stop in an earlier octant)
        p = o + r_full.hit_t[:, None] * d
        in_oct = np.all((p >= org - 1e-5) & (p <= org + size + 1e-5), axis=1)
        both = hit_full & hit_sub & in_oct
        if both.sum() == 0:
            continue
        np.testing.assert_allclose(
            r_sub.hit_t[both] * size, r_full.hit_t[both], rtol=1e-4,
            atol=1e-5)
        np.testing.assert_allclose(
            vox_sub[r_sub.hit_leaf[both]], vox[r_full.hit_leaf[both]],
            atol=1e-6)
        checked += 1
        if checked >= 8:
            break
    assert checked >= 4


def test_split_trunk_hits_octants(sphere6):
    ls = split_svo(sphere6, split_level=2, n_devices=8)
    trunk = SVO(masks=ls.trunk_masks, child_base=ls.trunk_child,
                leaf_base=ls.trunk_leaf,
                leaf_albedo=np.zeros((len(ls.octant_root), 3), np.float32),
                leaf_normal=np.zeros((len(ls.octant_root), 3), np.float32),
                leaf_density=np.ones(len(ls.octant_root), np.float32),
                depth=ls.trunk_depth,
                level_start=ls.trunk_level_start)
    o, d = random_rays(200, seed=3)
    r = traverse.trace_numpy(trunk, o, d)
    hit = r.hit_leaf >= 0
    assert hit.sum() > 100
    assert r.hit_leaf[hit].max() < len(ls.octant_root)
    # hit octant must contain the hit point
    p = o + r.hit_t[:, None] * d
    org = ls.octant_origin[np.where(hit, r.hit_leaf, 0)]
    inside = np.all((p >= org - 1e-4) & (p <= org + ls.octant_size + 1e-4),
                    axis=1)
    assert inside[hit].all()


def test_sharded_trace_matches_direct(sphere6):
    svo = sphere6.svo
    ls = split_svo(sphere6, split_level=2, n_devices=8)
    mesh = make_mesh()
    trace = make_sharded_trace(mesh, ls, max_octants=6)

    o, d = random_rays(256, seed=7)
    out_leaf, out_t, out_owner = jax.jit(trace)(
        jnp.asarray(ls.trunk_masks), jnp.asarray(ls.trunk_child),
        jnp.asarray(ls.trunk_leaf), jnp.asarray(ls.octant_owner),
        jnp.asarray(ls.octant_root), jnp.asarray(ls.octant_leaf_off),
        jnp.asarray(ls.octant_origin), jnp.asarray(ls.arena_masks),
        jnp.asarray(ls.arena_child), jnp.asarray(ls.arena_leaf),
        jnp.asarray(o), jnp.asarray(d))
    out_leaf = np.asarray(out_leaf)
    out_t = np.asarray(out_t)
    out_owner = np.asarray(out_owner)

    r_ref = traverse.trace_numpy(svo, o, d)
    hit_ref = r_ref.hit_leaf >= 0
    hit_sh = out_leaf >= 0
    np.testing.assert_array_equal(hit_ref, hit_sh)
    np.testing.assert_allclose(out_t[hit_sh], r_ref.hit_t[hit_ref],
                               rtol=1e-4, atol=1e-5)
    # attribute identity through the owner's arena
    alb_ref = np.asarray(svo.leaf_albedo)[r_ref.hit_leaf[hit_ref]]
    alb_sh = ls.arena_albedo[out_owner[hit_sh], out_leaf[hit_sh]]
    np.testing.assert_allclose(alb_sh, alb_ref, atol=1e-6)


def test_sharded_memory_actually_shards(sphere6):
    ls = split_svo(sphere6, split_level=2, n_devices=8)
    total_nodes = sphere6.svo.n_nodes
    per_dev_cap = ls.arena_masks.shape[1]
    # each device holds far less than the whole tree
    assert per_dev_cap < total_nodes * 0.55
    # all subtree nodes accounted for
    used = sum(int((ls.arena_masks[dv] != 0).sum()) for dv in range(8))
    assert used > 0
