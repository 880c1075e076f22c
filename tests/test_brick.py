"""Brick traversal (ops/brick.py): bit-parity with the plain ESVO path.

The brick path re-blocks the bottom three levels into 512-bit occupancy
bricks; hits must be *bit-identical* to traverse.trace_jax (same leaf ids,
same f32 hit t — the DDA uses the same corner-plane arithmetic on the same
dyadic coordinates). Mirrors the reference's golden-trace strategy
(Assets/Tests/SVOTests.cs:13-42) at the whole-image level.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import raytracingtest_tpu as rt
from raytracingtest_tpu.ops import brick, traverse
from raytracingtest_tpu.ops.camera import Camera


def _camera_rays(res=64):
    cam = Camera(position=(0.5, 0.85, -0.6), look_at=(0.5, 0.4, 0.5),
                 fov_y_deg=50.0, width=res, height=res)
    return cam.rays(np)


@pytest.mark.parametrize("scene,depth", [
    ("terrain", 6), ("sphere", 5), ("flat_ground", 6), ("sphere", 4),
])
def test_brick_parity_camera(scene, depth):
    res = rt.build_svo(rt.get_scene(scene), depth)
    svo = res.svo.device()
    bs = brick.make_brick_svo(res.svo).device()
    o, d = _camera_rays()
    r0 = traverse.trace_jax(svo, jnp.asarray(o), jnp.asarray(d))
    r1 = brick.trace_brick_jax(bs, jnp.asarray(o), jnp.asarray(d))
    np.testing.assert_array_equal(np.asarray(r0.hit_leaf),
                                  np.asarray(r1.hit_leaf))
    np.testing.assert_array_equal(np.asarray(r0.hit_t), np.asarray(r1.hit_t))


def test_brick_parity_random_rays():
    """Random origins (inside/outside the cube, inside solid) + random dirs."""
    res = rt.build_svo(rt.get_scene("terrain"), 6)
    svo = res.svo.device()
    bs = brick.make_brick_svo(res.svo).device()
    rng = np.random.default_rng(7)
    o = (rng.random((4096, 3), np.float32) * 1.6 - 0.3).astype(np.float32)
    d = rng.standard_normal((4096, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    r0 = traverse.trace_jax(svo, jnp.asarray(o), jnp.asarray(d))
    r1 = brick.trace_brick_jax(bs, jnp.asarray(o), jnp.asarray(d))
    np.testing.assert_array_equal(np.asarray(r0.hit_leaf),
                                  np.asarray(r1.hit_leaf))
    np.testing.assert_array_equal(np.asarray(r0.hit_t), np.asarray(r1.hit_t))
    assert (np.asarray(r0.hit_leaf) >= 0).sum() > 100  # test actually hits


def test_brick_compaction_phases():
    """Batch large enough to trigger the width-compaction schedule."""
    res = rt.build_svo(rt.get_scene("sphere"), 5)
    svo = res.svo.device()
    bs = brick.make_brick_svo(res.svo).device()
    o, d = _camera_rays(128)  # 16384 rays -> widths [16384, 4096]
    r0 = traverse.trace_jax(svo, jnp.asarray(o), jnp.asarray(d))
    r1 = brick.trace_brick_jax(bs, jnp.asarray(o), jnp.asarray(d))
    np.testing.assert_array_equal(np.asarray(r0.hit_leaf),
                                  np.asarray(r1.hit_leaf))


def test_brick_leaf_base_and_bits():
    """Brick decomposition invariants: total set bits == n_leaves, and
    leaf ids recovered by prefix popcount tile the leaf array exactly."""
    res = rt.build_svo(rt.get_scene("terrain"), 5)
    svo = res.svo
    bs = brick.make_brick_svo(svo)
    words = np.asarray(bs.bricks[:, :16])
    counts = np.zeros(len(words), np.int64)
    for w in range(16):
        counts += np.bitwise_count(words[:, w].astype(np.uint32)).astype(np.int64)
    assert counts.sum() == svo.n_leaves
    bleaf = np.asarray(bs.bricks[:, 16]).astype(np.int64)
    # bricks are Morton-ordered; their leaf ranges are contiguous
    order = np.argsort(bleaf)
    np.testing.assert_array_equal(bleaf[order],
                                  np.concatenate([[0], np.cumsum(counts[order])[:-1]]))


def test_brick_empty_scene():
    from raytracingtest_tpu.scenes import Scene
    empty = Scene(name="air", lipschitz=1.0,
                  fn=lambda x, y, z, xp=np: xp.ones_like(x))
    res = rt.build_svo(empty, 5)
    bs = brick.make_brick_svo(res.svo).device()
    o, d = _camera_rays(16)
    r = brick.trace_brick_jax(bs, jnp.asarray(o), jnp.asarray(d))
    assert (np.asarray(r.hit_leaf) == -1).all()


@pytest.mark.parametrize("scene,depth", [("sphere", 5), ("terrain", 6)])
def test_brick_multi_hit_parity(scene, depth):
    """All-hits brick trace == plain multi trace, bitwise (segments feed the
    volumetric renderer)."""
    res = rt.build_svo(rt.get_scene(scene), depth)
    svo = res.svo.device()
    bs = brick.make_brick_svo(res.svo).device()
    o, d = _camera_rays()
    r0 = traverse.trace_multi_jax(svo, jnp.asarray(o), jnp.asarray(d), k=4)
    r1 = brick.trace_brick_multi_jax(bs, jnp.asarray(o), jnp.asarray(d), k=4)
    for f in ("hit_leaf", "t_in", "t_out", "count"):
        np.testing.assert_array_equal(np.asarray(getattr(r0, f)),
                                      np.asarray(getattr(r1, f)))


def test_brick_volumetric_matches_plain():
    import jax
    from raytracingtest_tpu import diff
    res = rt.build_svo(rt.get_scene("sphere"), 5)
    svo = res.svo.device()
    bs = brick.make_brick_svo(res.svo).device()
    o, d = _camera_rays(32)
    o = jnp.asarray(o); d = jnp.asarray(d)
    light = jnp.asarray([-0.5, -1.0, -0.3], jnp.float32)
    alb = jnp.asarray(svo.leaf_albedo)
    nrm = jnp.asarray(svo.leaf_normal)
    den = jnp.asarray(svo.leaf_density)
    img0 = diff.render_volumetric(alb, nrm, den, svo.masks, svo.child_base,
                                  svo.leaf_base, o, d, 5, light,
                                  parent_ptr=svo.parent_ptr)
    img1 = diff.render_volumetric_brick(alb, nrm, den, bs.top_masks,
                                        bs.top_child, bs.top_parent,
                                        bs.bricks, o, d, 5, bs.top_depth,
                                        light)
    np.testing.assert_array_equal(np.asarray(img0), np.asarray(img1))


def test_brick_diff_matches_plain():
    """render_diff_brick == render_diff (image + gradients)."""
    import jax
    from raytracingtest_tpu import diff
    res = rt.build_svo(rt.get_scene("sphere"), 5)
    svo = res.svo.device()
    bs = brick.make_brick_svo(res.svo).device()
    o, d = _camera_rays(32)
    o = jnp.asarray(o); d = jnp.asarray(d)
    light = jnp.asarray([-0.5, -1.0, -0.3], jnp.float32)
    target = jnp.zeros((o.shape[0], 3), jnp.float32)
    alb = jnp.asarray(svo.leaf_albedo)
    nrm = jnp.asarray(svo.leaf_normal)
    den = jnp.asarray(svo.leaf_density)
    l0, g0 = diff.loss_and_grads(alb, nrm, den, svo.masks, svo.child_base,
                                 svo.leaf_base, o, d, 5, light, target,
                                 parent_ptr=svo.parent_ptr)
    l1, g1 = diff.loss_and_grads_brick(alb, nrm, den, bs.top_masks,
                                       bs.top_child, bs.top_parent,
                                       bs.bricks, o, d, 5, bs.top_depth,
                                       light, target)
    assert np.allclose(float(l0), float(l1), rtol=0, atol=0)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
