"""LOD early-exit traversal + interior-node attribute rendering."""

import numpy as np
import pytest

import jax.numpy as jnp

from raytracingtest_tpu.ops import traverse
from raytracingtest_tpu.ops.camera import Camera
from raytracingtest_tpu.ops.lod import compute_node_attributes, render_lod
from raytracingtest_tpu.ops.octree import build_svo
from raytracingtest_tpu.scenes import get_scene
from tests.test_traverse import random_rays


@pytest.fixture(scope="module")
def sphere6():
    return build_svo(get_scene("sphere"), 6).svo


def test_zero_coef_equals_plain_trace(sphere6):
    svo = sphere6.device()
    o, d = random_rays(400, seed=5)
    r_lod = traverse.trace_lod_jax(svo, o, d, 0.0)
    r_ref = traverse.trace_numpy(sphere6, o, d)
    np.testing.assert_array_equal(np.asarray(r_lod.hit_leaf), r_ref.hit_leaf)
    assert int(jnp.sum(r_lod.hit_node >= 0)) == 0


def test_coarse_coef_terminates_early(sphere6):
    svo = sphere6.device()
    o, d = random_rays(400, seed=7, spread=0.1)
    r_fine = traverse.trace_lod_jax(svo, o, d, 0.0)
    r_coarse = traverse.trace_lod_jax(svo, o, d, 0.05)  # huge footprint
    n_node_hits = int(jnp.sum(r_coarse.hit_node >= 0))
    assert n_node_hits > 100  # most hits terminate at interior nodes
    # fewer iterations with early exit
    assert float(jnp.mean(r_coarse.iters)) < float(jnp.mean(r_fine.iters))
    # t is still a surface hit: close to the fine-trace t
    both = (np.asarray(r_coarse.hit_node) >= 0) & (
        np.asarray(r_fine.hit_leaf) >= 0)
    dt = np.abs(np.asarray(r_coarse.hit_t)[both]
                - np.asarray(r_fine.hit_t)[both])
    assert np.percentile(dt, 90) < 0.1  # within a coarse-voxel size


def test_node_attributes_average_children(sphere6):
    node_alb, node_nrm = compute_node_attributes(sphere6)
    masks = np.asarray(sphere6.masks)
    # bottom-level node: its albedo equals the mean of its leaf children
    l = sphere6.depth - 1
    lo, hi = sphere6.level_start[l], sphere6.level_start[l + 1]
    albedo = np.asarray(sphere6.leaf_albedo)
    leaf_base = np.asarray(sphere6.leaf_base)
    for row in range(lo, min(lo + 20, hi)):
        lm = masks[row] & 0xFF
        ids = [leaf_base[row] + bin(lm & ((1 << k) - 1)).count("1")
               for k in range(8) if (lm >> k) & 1]
        want = albedo[ids].mean(0)
        np.testing.assert_allclose(node_alb[row], want, atol=1e-5)
    # normals are unit where nonzero
    nn = np.linalg.norm(node_nrm[lo:hi], axis=1)
    np.testing.assert_allclose(nn, 1.0, atol=1e-4)


def test_render_lod_image(sphere6):
    svo = sphere6.device()
    node_alb, node_nrm = compute_node_attributes(sphere6)
    cam = Camera(position=(0.5, 0.6, -1.2), look_at=(0.5, 0.5, 0.5),
                 fov_y_deg=40.0, width=48, height=48)
    o, d = cam.rays(np)
    coef = 2 * np.tan(np.radians(20.0)) / 48
    img_lod, res = render_lod(svo, node_alb, node_nrm, o, d, coef * 8)
    img_fine, res_f = render_lod(svo, node_alb, node_nrm, o, d, 0.0)
    img_lod = np.asarray(img_lod)
    img_fine = np.asarray(img_fine)
    assert np.isfinite(img_lod).all()
    # coarse image approximates the fine image
    hit = np.asarray(res_f.hit_leaf >= 0)
    err = np.abs(img_lod - img_fine)[hit]
    assert err.mean() < 0.25
    # and it really used interior nodes
    assert int(jnp.sum(res.hit_node >= 0)) > 50


def test_brick_lod_parity_coarse():
    """Brick-path LOD (brick.trace_brick_lod_jax) vs plain trace_lod_jax:
    with a footprint that always stops at/above the brick level the two are
    bit-identical (hit_node in original-SVO rows, same t)."""
    import raytracingtest_tpu as rt
    from raytracingtest_tpu.ops import brick, traverse
    from raytracingtest_tpu.ops.camera import Camera
    import jax.numpy as jnp
    res = rt.build_svo(rt.get_scene("terrain"), 6)
    svo = res.svo.device()
    bs = brick.make_brick_svo(res.svo).device()
    cam = Camera(position=(0.5, 0.85, -0.6), look_at=(0.5, 0.4, 0.5),
                 fov_y_deg=50.0, width=64, height=64)
    o, d = cam.rays(np)
    coef = 0.4  # footprint ~0.4t: stops well above the 1/8 brick size
    r0 = traverse.trace_lod_jax(svo, jnp.asarray(o), jnp.asarray(d), coef)
    r1 = brick.trace_brick_lod_jax(bs, jnp.asarray(o), jnp.asarray(d), coef)
    np.testing.assert_array_equal(np.asarray(r0.hit_node),
                                  np.asarray(r1.hit_node))
    np.testing.assert_array_equal(np.asarray(r0.hit_leaf),
                                  np.asarray(r1.hit_leaf))
    np.testing.assert_array_equal(np.asarray(r0.hit_t), np.asarray(r1.hit_t))
    assert (np.asarray(r0.hit_node) >= 0).sum() > 50  # LOD actually fires


def test_brick_lod_zero_coef_is_exact():
    """coef=0: no early exit anywhere — identical to the non-LOD brick trace."""
    import raytracingtest_tpu as rt
    from raytracingtest_tpu.ops import brick
    import jax.numpy as jnp
    res = rt.build_svo(rt.get_scene("sphere"), 5)
    bs = brick.make_brick_svo(res.svo).device()
    rng = np.random.default_rng(3)
    o = (rng.random((2048, 3), np.float32) * 1.4 - 0.2).astype(np.float32)
    d = rng.standard_normal((2048, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    r0 = brick.trace_brick_jax(bs, jnp.asarray(o), jnp.asarray(d))
    r1 = brick.trace_brick_lod_jax(bs, jnp.asarray(o), jnp.asarray(d), 0.0)
    np.testing.assert_array_equal(np.asarray(r0.hit_leaf),
                                  np.asarray(r1.hit_leaf))
    assert (np.asarray(r1.hit_node) == -1).all()
