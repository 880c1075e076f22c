"""Pallas traversal kernel vs the vectorized/scalar references.

Runs the kernel in interpreter mode on CPU (SURVEY.md §4: kernel-vs-
reference allclose); the real-chip path is exercised by bench.py and the
driver."""

import numpy as np
import pytest

from raytracingtest_tpu.ops import traverse
from raytracingtest_tpu.ops.octree import build_svo
from raytracingtest_tpu.ops.traverse_pallas import TILE_N, trace_pallas
from raytracingtest_tpu.scenes import get_scene
from tests.test_traverse import random_rays


@pytest.mark.parametrize("name,depth", [
    ("sphere", 5), ("terrain", 5), ("flat_ground", 4), ("rotated_cuboid", 5),
])
def test_pallas_matches_numpy(name, depth):
    svo = build_svo(get_scene(name), depth).svo
    o, d = random_rays(TILE_N, seed=depth)
    r_ref = traverse.trace_numpy(svo, o, d)
    r_pal = trace_pallas(svo.device(), o, d, interpret=True)
    np.testing.assert_array_equal(r_ref.hit_leaf, np.asarray(r_pal.hit_leaf))
    hit = r_ref.hit_leaf >= 0
    np.testing.assert_allclose(r_ref.hit_t[hit],
                               np.asarray(r_pal.hit_t)[hit],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(r_ref.hit_parent[hit],
                                  np.asarray(r_pal.hit_parent)[hit])
    np.testing.assert_array_equal(r_ref.hit_child[hit],
                                  np.asarray(r_pal.hit_child)[hit])


def test_pallas_camera_tile_coherent():
    """Camera-ray tiles (the production access pattern) through a deeper
    scene."""
    from raytracingtest_tpu.ops.camera import Camera

    svo = build_svo(get_scene("terrain"), 6).svo
    cam = Camera(position=(0.5, 0.85, -0.6), look_at=(0.5, 0.4, 0.5),
                 fov_y_deg=50.0, width=64, height=32)  # 2048 rays = 2 tiles
    o, d = cam.rays(np)
    r_ref = traverse.trace_numpy(svo, o, d)
    r_pal = trace_pallas(svo.device(), o, d, interpret=True)
    np.testing.assert_array_equal(r_ref.hit_leaf, np.asarray(r_pal.hit_leaf))


def test_pallas_rejects_unaligned_count():
    svo = build_svo(get_scene("sphere"), 3).svo
    with pytest.raises(ValueError):
        trace_pallas(svo.device(), np.zeros((100, 3), np.float32),
                     np.ones((100, 3), np.float32), interpret=True)


def test_pallas_diff_render_matches_xla():
    """Production composition: Pallas forward traversal + differentiable
    shading VJP — image and voxel-parameter gradients must match the XLA
    path exactly (same shading graph, bit-identical hits)."""
    import jax
    import jax.numpy as jnp

    from raytracingtest_tpu import diff
    from raytracingtest_tpu.ops.camera import Camera

    svo = build_svo(get_scene("sphere"), 5).svo
    cam = Camera(position=(0.5, 0.5, -0.8), look_at=(0.5, 0.5, 0.5),
                 fov_y_deg=45.0, width=64, height=16)  # 1024 rays = 1 tile
    o, d = cam.rays(np)
    o = jnp.asarray(o)
    d = jnp.asarray(d)
    dsvo = svo.device()
    albedo = jnp.asarray(svo.leaf_albedo)
    normal = jnp.asarray(svo.leaf_normal)
    density = jnp.asarray(svo.leaf_density)
    light = jnp.asarray([-0.5, -1.0, -0.3], jnp.float32)
    target = jnp.zeros((o.shape[0], 3), jnp.float32)

    img_x = diff.render_diff(albedo, normal, density, dsvo.masks,
                             dsvo.child_base, dsvo.leaf_base, o, d, svo.depth,
                             light, parent_ptr=dsvo.parent_ptr)
    img_p = diff.render_diff_pallas(albedo, normal, density, dsvo.masks,
                                    dsvo.child_base, dsvo.leaf_base, o, d,
                                    svo.depth, light, interpret=True)
    np.testing.assert_array_equal(np.asarray(img_x), np.asarray(img_p))

    loss_x, grads_x = diff.loss_and_grads(
        albedo, normal, density, dsvo.masks, dsvo.child_base, dsvo.leaf_base,
        o, d, svo.depth, light, target, parent_ptr=dsvo.parent_ptr)
    loss_p, grads_p = diff.loss_and_grads_pallas(
        albedo, normal, density, dsvo.masks, dsvo.child_base, dsvo.leaf_base,
        o, d, svo.depth, light, target, interpret=True)
    np.testing.assert_allclose(float(loss_x), float(loss_p), rtol=0, atol=0)
    for gx, gp in zip(jax.tree_util.tree_leaves(grads_x),
                      jax.tree_util.tree_leaves(grads_p)):
        np.testing.assert_array_equal(np.asarray(gx), np.asarray(gp))
