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
    out_leaf, out_t, out_owner, truncated = jax.jit(trace)(
        jnp.asarray(ls.trunk_masks), jnp.asarray(ls.trunk_child),
        jnp.asarray(ls.trunk_leaf), jnp.asarray(ls.octant_owner),
        jnp.asarray(ls.octant_root), jnp.asarray(ls.octant_leaf_off),
        jnp.asarray(ls.octant_origin), jnp.asarray(ls.arena_masks),
        jnp.asarray(ls.arena_child), jnp.asarray(ls.arena_leaf),
        jnp.asarray(o), jnp.asarray(d))
    out_leaf = np.asarray(out_leaf)
    out_t = np.asarray(out_t)
    out_owner = np.asarray(out_owner)
    assert not np.asarray(truncated).any()

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


def test_grazing_ray_many_octants_no_silent_loss(sphere6):
    """Adversarial (VERDICT r02 item 6): rays grazing the sphere's surface
    shell cross many occupied split-level octants before their hit. The
    while-until-done phase loop must resolve every ray exactly (no
    truncation), matching the direct trace."""
    svo = sphere6.svo
    ls = split_svo(sphere6, split_level=2, n_devices=8)
    mesh = make_mesh()
    trace = make_sharded_trace(mesh, ls)  # provable bound, no fixed cap

    # tangential rays: origins on a ring outside the sphere, directions
    # nearly tangent so they skim through a long run of surface octants
    n = 128
    ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
    r_ring = 0.49
    o = np.stack([0.5 + r_ring * np.cos(ang),
                  np.full(n, 0.5),
                  0.5 + r_ring * np.sin(ang)], 1).astype(np.float32)
    # impact parameter ~0.28 < sphere r=0.30: grazing chords through the shell
    tangent = np.stack([-np.sin(ang), np.zeros(n), np.cos(ang)], 1)
    inward = np.stack([0.5 - o[:, 0], np.zeros(n), 0.5 - o[:, 2]], 1)
    inward /= np.linalg.norm(inward, axis=1, keepdims=True)
    d = (tangent + 1.45 * inward).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    out_leaf, out_t, out_owner, truncated = jax.jit(trace)(
        jnp.asarray(ls.trunk_masks), jnp.asarray(ls.trunk_child),
        jnp.asarray(ls.trunk_leaf), jnp.asarray(ls.octant_owner),
        jnp.asarray(ls.octant_root), jnp.asarray(ls.octant_leaf_off),
        jnp.asarray(ls.octant_origin), jnp.asarray(ls.arena_masks),
        jnp.asarray(ls.arena_child), jnp.asarray(ls.arena_leaf),
        jnp.asarray(o), jnp.asarray(d))
    assert not np.asarray(truncated).any()

    r_ref = traverse.trace_numpy(svo, o, d)
    hit_ref = r_ref.hit_leaf >= 0
    np.testing.assert_array_equal(hit_ref, np.asarray(out_leaf) >= 0)
    assert hit_ref.sum() > 20  # the adversarial rays do hit
    np.testing.assert_allclose(np.asarray(out_t)[hit_ref],
                               r_ref.hit_t[hit_ref], rtol=1e-4, atol=1e-5)


def test_exchange_hotspot_truncation_is_flagged(sphere6):
    """Adversarial: every ray routed to ONE octant owner with a tiny
    capacity cap. Rays that overflow every round must come back flagged
    `truncated` — never as silent misses — and a generous-rounds run must
    resolve them all."""
    from raytracingtest_tpu.parallel.level_sharded import make_exchange_trace

    svo = sphere6.svo
    ls = split_svo(sphere6, split_level=2, n_devices=8)
    mesh = make_mesh()

    # all rays enter through the same octant: aim at one point on the
    # sphere's +x surface from slightly-jittered directions
    n = 512
    rng = np.random.default_rng(5)
    o = np.tile(np.asarray([[1.4, 0.5, 0.5]], np.float32), (n, 1))
    aim = np.asarray([0.85, 0.5, 0.5], np.float32)
    d = aim[None, :] - o + rng.normal(0, 0.01, (n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    args = (jnp.asarray(ls.trunk_masks), jnp.asarray(ls.trunk_child),
            jnp.asarray(ls.trunk_leaf), jnp.asarray(ls.octant_owner),
            jnp.asarray(ls.octant_root), jnp.asarray(ls.octant_origin),
            jnp.asarray(ls.arena_masks), jnp.asarray(ls.arena_child),
            jnp.asarray(ls.arena_leaf), jnp.asarray(o), jnp.asarray(d))

    r_ref = traverse.trace_numpy(svo, o, d)
    hit_ref = r_ref.hit_leaf >= 0
    assert hit_ref.sum() > 400

    # starved: cap_factor=1 -> per-peer capacity 8 rays/round, 2 rounds
    starved = make_exchange_trace(mesh, ls, max_rounds=2, cap_factor=1)
    s_leaf, _, _, _, s_trunc = jax.jit(starved)(*args)
    s_leaf, s_trunc = np.asarray(s_leaf), np.asarray(s_trunc)
    # every golden hit is either found or explicitly flagged — none lost
    lost = hit_ref & (s_leaf < 0) & ~s_trunc
    assert not lost.any()
    assert s_trunc.sum() > 0  # the starvation actually bit

    # generous rounds clear the hotspot completely
    ample = make_exchange_trace(mesh, ls, max_rounds=80, cap_factor=1)
    a_leaf, _, _, _, a_trunc = jax.jit(ample)(*args)
    assert not np.asarray(a_trunc).any()
    np.testing.assert_array_equal(hit_ref, np.asarray(a_leaf) >= 0)
