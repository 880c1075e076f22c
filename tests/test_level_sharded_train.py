"""Level-sharded training + ray-exchange trace on the 8-device CPU mesh.

VERDICT round-1 items 4 and 5: (a) level-sharded gradients must equal the
replicated-tree gradients (voxel params sharded with their arenas, grads
device-local); (b) the all_to_all exchange trace must match the replicated
trace while distributing deep-trace work ~evenly across devices.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from raytracingtest_tpu import diff
from raytracingtest_tpu.ops import traverse
from raytracingtest_tpu.ops.octree import build_svo
from raytracingtest_tpu.parallel.level_sharded import (
    make_exchange_trace, make_sharded_fit_step, split_svo,
)
from raytracingtest_tpu.parallel.mesh import make_mesh
from raytracingtest_tpu.scenes import get_scene
from tests.test_traverse import random_rays


@pytest.fixture(scope="module")
def sphere6():
    return build_svo(get_scene("sphere"), 6)


@pytest.fixture(scope="module")
def split8(sphere6):
    return split_svo(sphere6, split_level=2, n_devices=8)


def test_sharded_fit_grads_match_replicated(sphere6, split8):
    """Level-sharded loss/grads == single-tree diff.loss_and_grads."""
    svo = sphere6.svo
    ls = split8
    mesh = make_mesh()
    step = make_sharded_fit_step(mesh, ls, max_octants=6)

    o, d = random_rays(256, seed=11)
    light = jnp.asarray([-0.5, -1.0, -0.3], jnp.float32)
    rng = np.random.default_rng(0)
    target = jnp.asarray(rng.random((256, 3), np.float32))

    loss_sh, (ga, gn, gd) = jax.jit(step)(
        jnp.asarray(ls.arena_albedo), jnp.asarray(ls.arena_normal),
        jnp.asarray(ls.arena_density), jnp.asarray(ls.trunk_masks),
        jnp.asarray(ls.trunk_child), jnp.asarray(ls.trunk_leaf),
        jnp.asarray(ls.octant_owner), jnp.asarray(ls.octant_root),
        jnp.asarray(ls.octant_origin), jnp.asarray(ls.arena_masks),
        jnp.asarray(ls.arena_child), jnp.asarray(ls.arena_leaf),
        jnp.asarray(o), jnp.asarray(d), light, target)

    svo_d = svo.device()
    loss_ref, (ra, rn, rd) = diff.loss_and_grads(
        jnp.asarray(svo.leaf_albedo), jnp.asarray(svo.leaf_normal),
        jnp.asarray(svo.leaf_density), svo_d.masks, svo_d.child_base,
        svo_d.leaf_base, jnp.asarray(o), jnp.asarray(d), svo.depth, light,
        target, parent_ptr=svo_d.parent_ptr)

    # NOTE the sharded trace uses world-rescaled t and the same hit set
    # (test_sharded_trace_matches_direct); losses must agree
    np.testing.assert_allclose(float(loss_sh), float(loss_ref), rtol=1e-5)

    # map arena-local grads back to global leaf ids octant by octant
    ga, gn, gd = np.asarray(ga), np.asarray(gn), np.asarray(gd)
    ra, rn, rd = np.asarray(ra), np.asarray(rn), np.asarray(rd)
    got_a = np.zeros_like(ra)
    got_n = np.zeros_like(rn)
    got_d = np.zeros_like(rd)
    for i in range(len(ls.octant_owner)):
        dev = int(ls.octant_owner[i])
        off = int(ls.octant_leaf_off[i])
        lo = int(ls.octant_leaf_lo[i])
        cnt = int(ls.octant_n_leaves[i])
        got_a[lo:lo + cnt] = ga[dev, off:off + cnt]
        got_n[lo:lo + cnt] = gn[dev, off:off + cnt]
        got_d[lo:lo + cnt] = gd[dev, off:off + cnt]
    np.testing.assert_allclose(got_a, ra, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(got_n, rn, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(got_d, rd, rtol=1e-5, atol=1e-7)


def test_exchange_trace_matches_direct(sphere6, split8):
    svo = sphere6.svo
    ls = split8
    mesh = make_mesh()
    trace = make_exchange_trace(mesh, ls, max_rounds=8, cap_factor=4)

    o, d = random_rays(512, seed=13)
    out_leaf, out_t, out_owner, traced, truncated = jax.jit(trace)(
        jnp.asarray(ls.trunk_masks), jnp.asarray(ls.trunk_child),
        jnp.asarray(ls.trunk_leaf), jnp.asarray(ls.octant_owner),
        jnp.asarray(ls.octant_root), jnp.asarray(ls.octant_origin),
        jnp.asarray(ls.arena_masks), jnp.asarray(ls.arena_child),
        jnp.asarray(ls.arena_leaf), jnp.asarray(o), jnp.asarray(d))
    out_leaf = np.asarray(out_leaf)
    out_t = np.asarray(out_t)
    out_owner = np.asarray(out_owner)
    traced = np.asarray(traced)
    assert not np.asarray(truncated).any()

    r_ref = traverse.trace_numpy(svo, o, d)
    hit_ref = r_ref.hit_leaf >= 0
    np.testing.assert_array_equal(hit_ref, out_leaf >= 0)
    np.testing.assert_allclose(out_t[hit_ref], r_ref.hit_t[hit_ref],
                               rtol=1e-4, atol=1e-5)
    # attribute identity through the owner's arena
    alb_ref = np.asarray(svo.leaf_albedo)[r_ref.hit_leaf[hit_ref]]
    alb_sh = ls.arena_albedo[out_owner[hit_ref], out_leaf[hit_ref]]
    np.testing.assert_allclose(alb_sh, alb_ref, atol=1e-6)

    # deep-trace work is distributed: no device traced anywhere near the
    # full replicated load (8 devices x 512 rays x rounds), and several
    # devices participated
    assert traced.sum() > 0
    assert (traced > 0).sum() >= 4
    assert traced.max() <= 4 * (traced.sum() / 8 + 64)
