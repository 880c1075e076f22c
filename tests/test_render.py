import numpy as np
import pytest

from raytracingtest_tpu.ops.camera import Camera, OctreeFrame
from raytracingtest_tpu.ops.octree import build_svo
from raytracingtest_tpu.render import Light, render_jax, render_numpy, render_progressive
from raytracingtest_tpu.scenes import get_scene


@pytest.fixture(scope="module")
def sphere5():
    return build_svo(get_scene("sphere"), 5).svo


CAM = Camera(position=(0.5, 0.6, -1.2), look_at=(0.5, 0.5, 0.5),
             fov_y_deg=40.0, width=64, height=64)
ORTHO = Camera(position=(0.5, 0.5, -1.2), look_at=(0.5, 0.5, 0.5),
               ortho_height=1.2, width=64, height=64)


def test_render_numpy_sphere_silhouette(sphere5):
    from raytracingtest_tpu.ops import traverse

    img = render_numpy(sphere5, CAM)
    assert img.shape == (64, 64, 3)
    assert np.isfinite(img).all()
    # centre pixel hits the sphere, corner pixel sees sky
    o, d = CAM.rays(np)
    res = traverse.trace_numpy(sphere5, o, d)
    hit_mask = (res.hit_leaf >= 0).reshape(64, 64)
    assert hit_mask[32, 32]
    assert not hit_mask[0, 0]
    # silhouette coverage: the r=0.3 sphere seen from ~1.7 away at 40 deg
    # covers a substantial fraction of the frame
    assert 0.05 < hit_mask.mean() < 0.9


def test_render_jax_matches_numpy(sphere5):
    img_np = render_numpy(sphere5, CAM)
    img_jx = np.asarray(render_jax(sphere5.device(), CAM))
    np.testing.assert_allclose(img_np, img_jx, rtol=1e-4, atol=1e-5)


def test_render_ortho_matches(sphere5):
    img_np = render_numpy(sphere5, ORTHO)
    img_jx = np.asarray(render_jax(sphere5.device(), ORTHO))
    np.testing.assert_allclose(img_np, img_jx, rtol=1e-4, atol=1e-5)
    # orthographic circle: hit fraction ~ pi*r^2/(w*h) with r=0.3, extent 1.2
    hit_mask = np.abs(img_np - img_np[0, 0]).sum(-1) > 1e-3
    frac = hit_mask.mean()
    expected = np.pi * 0.3 ** 2 / (1.2 * 1.2)
    assert abs(frac - expected) < 0.05


def test_render_world_frame(sphere5):
    # octree placed at a different world position/scale must render the same
    # image when the camera moves with it
    frame = OctreeFrame(origin=(10.0, -2.0, 3.0), size=4.0)
    cam_w = Camera(
        position=(10.0 + 4 * 0.5, -2.0 + 4 * 0.6, 3.0 - 4 * 1.2),
        look_at=(12.0, 0.0, 5.0), fov_y_deg=40.0, width=64, height=64,
    )
    img_local = render_numpy(sphere5, CAM)
    img_world = render_numpy(sphere5, cam_w, frame=frame)
    np.testing.assert_allclose(img_local, img_world, rtol=1e-3, atol=2e-3)


def test_t_world_scales_by_frame_size():
    # regression: a local ray parameter t_l corresponds to world distance
    # size * t_l (world_to_local scales origins but not directions)
    frame = OctreeFrame(origin=(2.0, -1.0, 3.0), size=4.0)
    o_w = np.array([[0.25, 0.5, -0.75]], np.float32)
    d = np.array([[0.6, 0.0, 0.8]], np.float32)  # unit length
    o_l, d_l = frame.world_to_local(o_w, d, np)
    t_l = 0.7
    q_world = np.asarray(frame.origin) + frame.size * (o_l[0] + t_l * d_l[0])
    t_w_expected = float(np.dot(q_world - o_w[0], d[0]))
    assert abs(float(frame.t_world(np.float32(t_l), np)) - t_w_expected) < 1e-5
    assert abs(t_w_expected - frame.size * t_l) < 1e-5


def test_progressive_accumulation_reduces_noise(sphere5):
    img1 = render_progressive(sphere5, CAM, n_samples=1, backend="numpy", seed=0)
    img8 = render_progressive(sphere5, CAM, n_samples=8, backend="numpy", seed=0)
    assert img1.shape == img8.shape == (64, 64, 3)
    # jittered accumulation stays close to a single sample in smooth regions
    assert np.allclose(img1[0, 0], img8[0, 0], atol=2e-2)
    assert np.isfinite(img8).all()


def test_light_direction_changes_shading(sphere5):
    a = render_numpy(sphere5, CAM, light=Light(direction=(-1.0, -1.0, 0.0)))
    b = render_numpy(sphere5, CAM, light=Light(direction=(1.0, -1.0, 0.0)))
    assert not np.allclose(a, b)


def test_bounce_loop_specular_zero_matches_single_bounce():
    """The bounce machinery (RaytraceCompute.compute:159-166 role) with
    specular=0 must reproduce the single-bounce image exactly; specular>0
    must add finite reflection continuation that changes hit pixels."""
    import raytracingtest_tpu as rt
    from raytracingtest_tpu.ops import brick as brick_mod
    from raytracingtest_tpu.ops.camera import Camera
    from raytracingtest_tpu.render import Light, render_bounce, render_jax

    res = rt.build_svo(rt.get_scene("sphere"), 5)
    svo = res.svo.device()
    bsvo = brick_mod.make_brick_svo(res.svo).device()
    cam = Camera(position=(0.5, 0.6, -1.0), look_at=(0.5, 0.5, 0.5),
                 fov_y_deg=45.0, width=48, height=48)

    base = np.asarray(render_jax(svo, cam, light=Light()))
    b1 = render_bounce(bsvo, svo.leaf_albedo, svo.leaf_normal, cam,
                       specular=0.0, bounces=1)
    np.testing.assert_allclose(b1, base, rtol=1e-5, atol=1e-6)

    # more bounces with specular=0 change nothing (energy dies at bounce 1)
    b3 = render_bounce(bsvo, svo.leaf_albedo, svo.leaf_normal, cam,
                       specular=0.0, bounces=3)
    np.testing.assert_allclose(b3, b1, rtol=0, atol=0)

    # live reflections: finite, and different on hit pixels
    bs = render_bounce(bsvo, svo.leaf_albedo, svo.leaf_normal, cam,
                       specular=0.4, bounces=3)
    assert np.isfinite(bs).all()
    assert np.abs(bs - b1).max() > 1e-3
