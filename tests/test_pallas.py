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
