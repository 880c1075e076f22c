"""Multi-hit traversal + volumetric differentiable rendering."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from raytracingtest_tpu import diff
from raytracingtest_tpu.ops import traverse
from raytracingtest_tpu.ops.camera import Camera
from raytracingtest_tpu.ops.octree import build_svo
from raytracingtest_tpu.reference import traverse as ref
from raytracingtest_tpu.scenes import get_scene
from tests.test_traverse import random_rays

LIGHT = jnp.asarray([-0.5, -1.0, -0.3], jnp.float32)


@pytest.fixture(scope="module")
def sphere5():
    return build_svo(get_scene("sphere"), 5).svo


def test_multi_matches_oracle_collect_all(sphere5):
    svo = sphere5
    o, d = random_rays(200, seed=31)
    k = 6
    res = traverse.trace_multi_jax(svo.device(), o, d, k=k)
    hl = np.asarray(res.hit_leaf)
    tin = np.asarray(res.t_in)
    tout = np.asarray(res.t_out)
    cnt = np.asarray(res.count)
    for i in range(o.shape[0]):
        hits = ref.cast_ray(svo, o[i], d[i], collect_all=True)
        expect = [h.leaf_id for h in hits[:k]]
        got = [int(v) for v in hl[i] if v >= 0]
        assert got == expect, i
        assert cnt[i] == len(expect)
        for j, h in enumerate(hits[:k]):
            np.testing.assert_allclose(tin[i, j], h.t, rtol=1e-5, atol=1e-6)
            assert tout[i, j] >= tin[i, j]


def test_multi_segments_ordered_disjoint(sphere5):
    o, d = random_rays(300, seed=37)
    res = traverse.trace_multi_jax(sphere5.device(), o, d, k=4)
    tin = np.asarray(res.t_in)
    tout = np.asarray(res.t_out)
    hl = np.asarray(res.hit_leaf)
    for i in range(300):
        m = hl[i] >= 0
        ts = tin[i][m]
        te = tout[i][m]
        assert np.all(np.diff(ts) > 0) if m.sum() > 1 else True
        assert np.all(te >= ts)
        if m.sum() > 1:
            assert np.all(te[:-1] <= ts[1:] + 1e-5)


def test_volumetric_high_density_approaches_surface(sphere5):
    """With near-opaque voxels the volumetric render must match the
    hard-surface renderer."""
    svo = sphere5.device()
    cam = Camera(position=(0.5, 0.6, -1.0), look_at=(0.5, 0.5, 0.5),
                 fov_y_deg=45.0, width=32, height=32)
    o, d = cam.rays(np)
    o, d = jnp.asarray(o), jnp.asarray(d)
    albedo = jnp.asarray(svo.leaf_albedo)
    normal = jnp.asarray(svo.leaf_normal)
    dense = jnp.full(svo.n_leaves, 100.0, jnp.float32)  # opaque
    img_vol = diff.render_volumetric(
        albedo, normal, dense, svo.masks, svo.child_base, svo.leaf_base,
        o, d, svo.depth, LIGHT, k=2, density_scale=1000.0)
    img_surf = diff.render_diff(
        albedo, normal, jnp.ones(svo.n_leaves), svo.masks, svo.child_base,
        svo.leaf_base, o, d, svo.depth, LIGHT)
    np.testing.assert_allclose(np.asarray(img_vol), np.asarray(img_surf),
                               atol=5e-3)


def test_volumetric_zero_density_is_sky(sphere5):
    svo = sphere5.device()
    o, d = random_rays(64, seed=41)
    o, d = jnp.asarray(o), jnp.asarray(d)
    img = diff.render_volumetric(
        jnp.asarray(svo.leaf_albedo), jnp.asarray(svo.leaf_normal),
        jnp.full(svo.n_leaves, -30.0, jnp.float32),  # softplus(-30) ~ 0
        svo.masks, svo.child_base, svo.leaf_base, o, d, svo.depth, LIGHT,
        k=4)
    from raytracingtest_tpu.render import sky_color
    np.testing.assert_allclose(np.asarray(img), sky_color(np.asarray(d), np),
                               atol=1e-3)


def test_density_gradcheck(sphere5):
    svo = sphere5.device()
    cam = Camera(position=(0.5, 0.6, -1.0), look_at=(0.5, 0.5, 0.5),
                 fov_y_deg=45.0, width=16, height=16)
    o, d = cam.rays(np)
    o, d = jnp.asarray(o), jnp.asarray(d)
    rng = np.random.default_rng(0)
    target = jnp.asarray(rng.random((o.shape[0], 3), dtype=np.float32))
    albedo = jnp.asarray(svo.leaf_albedo)
    normal = jnp.asarray(svo.leaf_normal)
    density = jnp.zeros(svo.n_leaves, jnp.float32)

    def f(den):
        return diff.volumetric_l2_loss(albedo, normal, den, svo.masks,
                                       svo.child_base, svo.leaf_base, o, d,
                                       svo.depth, LIGHT, target, k=4)

    g = np.asarray(jax.grad(f)(density))
    assert np.abs(g).max() > 0
    probe = np.argsort(np.abs(g))[-4:]
    eps = 1e-2
    d_np = np.asarray(density, np.float64)
    for pi in probe:
        dp = d_np.copy(); dp[pi] += eps
        dm = d_np.copy(); dm[pi] -= eps
        fd = (float(f(jnp.asarray(dp, jnp.float32)))
              - float(f(jnp.asarray(dm, jnp.float32)))) / (2 * eps)
        assert abs(fd - g[pi]) < 2e-2 * max(1.0, abs(fd)), (pi, fd, g[pi])


def test_volumetric_albedo_grads_flow(sphere5):
    svo = sphere5.device()
    o, d = random_rays(256, seed=43)
    o, d = jnp.asarray(o), jnp.asarray(d)
    target = jnp.zeros((256, 3), jnp.float32)

    def f(alb):
        return diff.volumetric_l2_loss(alb, jnp.asarray(svo.leaf_normal),
                                       jnp.zeros(svo.n_leaves),
                                       svo.masks, svo.child_base,
                                       svo.leaf_base, o, d, svo.depth, LIGHT,
                                       target, k=4)

    g = np.asarray(jax.grad(f)(jnp.asarray(svo.leaf_albedo)))
    assert np.abs(g).max() > 0
    assert (np.abs(g).sum(1) == 0).any()  # untouched voxels stay zero
