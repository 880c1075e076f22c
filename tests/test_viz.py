"""Debug viz (viz.py) + skybox texture sampling (render.sky_texture):
the SVODriver / gizmo / skybox parity surfaces."""

import numpy as np

import jax.numpy as jnp

from raytracingtest_tpu import viz
from raytracingtest_tpu.ops.camera import Camera
from raytracingtest_tpu.ops.octree import build_svo
from raytracingtest_tpu.render import (
    Light, make_gradient_skybox, render_jax, sky_color, sky_texture,
)
from raytracingtest_tpu.scenes import get_scene


def _cam(res=64):
    return Camera(position=(0.5, 0.85, -0.6), look_at=(0.5, 0.4, 0.5),
                  fov_y_deg=50.0, width=res, height=res)


def test_node_boxes_counts_match_levels():
    res = build_svo(get_scene("sphere"), 5)
    svo = res.svo
    for level in (1, 2, 3):
        origins, size = viz.node_boxes(svo, level)
        lo, hi = svo.level_start[level], svo.level_start[level + 1]
        assert origins.shape == (hi - lo, 3)
        assert size == 2.0 ** (-level)
        # boxes coincide with the build's node coords
        np.testing.assert_allclose(
            origins, res.node_coords[level].astype(np.float32) * size)


def test_camera_project_inverts_rays():
    cam = _cam(64)
    o, d = cam.rays(np)
    # a point along each pixel's ray must project back to that pixel
    pts = o + 0.7 * d
    px, in_front = cam.project(pts)
    assert in_front.all()
    ii, jj = np.divmod(np.arange(64 * 64), 64)
    np.testing.assert_allclose(px[:, 0], jj, atol=1e-2)
    np.testing.assert_allclose(px[:, 1], ii, atol=1e-2)


def test_draw_boxes_marks_pixels():
    res = build_svo(get_scene("sphere"), 4)
    cam = _cam(64)
    img = np.zeros((64, 64, 3), np.float32)
    origins, size = viz.node_boxes(res.svo, 2)
    viz.draw_boxes(img, cam, origins, size, color=(1, 0, 0))
    assert (img[..., 0] > 0).sum() > 50  # wireframes rasterized
    assert (img[..., 1] == 0).all()


def test_ray_probe_lists_hits_in_order():
    res = build_svo(get_scene("sphere"), 5)
    entries = viz.ray_probe(res.svo, (0.5, 2.0, 0.5), (0.0, -1.0, 0.0),
                            max_hits=16)
    assert len(entries) >= 2  # enters and exits the sphere shell
    ts = [e.t_enter for e in entries]
    assert ts == sorted(ts)
    text = viz.format_probe(entries)
    assert "leaf" in text


def test_sky_texture_matches_procedural_gradient():
    """A texture baked from the gradient must sample back to sky_color."""
    tex = make_gradient_skybox(256, 8)
    rng = np.random.default_rng(3)
    d = rng.standard_normal((512, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ref = sky_color(d, np)
    got = sky_texture(d, tex.astype(np.float32), np)
    np.testing.assert_allclose(got, ref, atol=5e-3)


def test_render_jax_with_skybox():
    res = build_svo(get_scene("sphere"), 4)
    cam = _cam(32)
    img0 = np.asarray(render_jax(res.svo.device(), cam))
    tex = make_gradient_skybox(128, 16)
    img1 = np.asarray(render_jax(res.svo.device(), cam, skybox=tex))
    np.testing.assert_allclose(img1, img0, atol=1e-2)
    # a red skybox shows red misses
    red = np.zeros((4, 8, 3), np.float32)
    red[..., 0] = 1.0
    img2 = np.asarray(render_jax(res.svo.device(), cam, skybox=red))
    corner = img2[0, 0]  # top corner is sky
    assert corner[0] > 0.9 and corner[1] < 0.1
