"""Differentiable-path correctness: custom segment-sum VJP vs builtin
autodiff vs finite differences (gradcheck mandated by SURVEY.md §7.2 P3)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from raytracingtest_tpu import diff
from raytracingtest_tpu.ops.camera import Camera
from raytracingtest_tpu.ops.octree import build_svo
from raytracingtest_tpu.scenes import get_scene

LIGHT = jnp.asarray([-0.5, -1.0, -0.3], jnp.float32)


@pytest.fixture(scope="module")
def setup():
    res = build_svo(get_scene("sphere"), 4)
    svo = res.svo.device()
    cam = Camera(position=(0.5, 0.6, -1.0), look_at=(0.5, 0.5, 0.5),
                 fov_y_deg=45.0, width=32, height=32)
    o, d = cam.rays(np)
    return svo, jnp.asarray(o), jnp.asarray(d)


def test_render_diff_matches_forward(setup):
    svo, o, d = setup
    img = diff.render_diff(
        jnp.asarray(svo.leaf_albedo), jnp.asarray(svo.leaf_normal),
        jnp.asarray(svo.leaf_density), svo.masks, svo.child_base,
        svo.leaf_base, o, d, svo.depth, LIGHT)
    from raytracingtest_tpu.render import render_jax
    cam = Camera(position=(0.5, 0.6, -1.0), look_at=(0.5, 0.5, 0.5),
                 fov_y_deg=45.0, width=32, height=32)
    img2 = render_jax(svo, cam)
    # density=1 everywhere -> identical to the plain forward renderer
    np.testing.assert_allclose(
        np.asarray(img).reshape(32, 32, 3), np.asarray(img2), rtol=1e-5,
        atol=1e-6)


def _loss_fn(svo, o, d, target):
    def f(albedo, normal, density):
        return diff.l2_loss(albedo, normal, density, svo.masks,
                            svo.child_base, svo.leaf_base, o, d, svo.depth,
                            LIGHT, target)
    return f


def test_grads_match_builtin_autodiff(setup):
    """The custom segment-sum VJP must equal jnp.take's builtin scatter-add
    backward exactly (same math, different scatter strategy)."""
    svo, o, d = setup
    target = jnp.zeros((o.shape[0], 3), jnp.float32)
    albedo = jnp.asarray(svo.leaf_albedo)
    normal = jnp.asarray(svo.leaf_normal)
    density = jnp.asarray(svo.leaf_density)

    f = _loss_fn(svo, o, d, target)
    g_custom = jax.grad(f, argnums=(0, 1, 2))(albedo, normal, density)

    def f_builtin(albedo, normal, density):
        from raytracingtest_tpu.ops import traverse
        res = traverse._trace_jax(svo.masks, svo.child_base, svo.leaf_base,
                                  traverse.parent_ptr_of(svo), o, d,
                                  svo.depth)
        hit_leaf = jax.lax.stop_gradient(res.hit_leaf)
        # rebuild shading with plain jnp.take (builtin VJP)
        hit = hit_leaf >= 0
        safe_leaf = jnp.where(hit, hit_leaf, 0)
        alb = jnp.take(albedo, safe_leaf, axis=0)
        nrm = jnp.take(normal, safe_leaf, axis=0)
        den = jnp.take(density, safe_leaf, axis=0)
        ldir = LIGHT / jnp.sqrt(jnp.sum(LIGHT * LIGHT))
        nn = nrm / jnp.sqrt(
            jnp.maximum(jnp.sum(nrm * nrm, -1, keepdims=True), 1e-12))
        ndotl = jnp.maximum(jnp.sum(nn * (-ldir)[None, :], axis=-1), 0.0)
        lit = alb * (ndotl * 1.3 + 0.08)[:, None]
        from raytracingtest_tpu.render import sky_color
        sky = sky_color(d, jnp)
        alpha = jnp.clip(den, 0.0, 1.0)[:, None] * hit[:, None]
        img = alpha * lit + (1.0 - alpha) * sky
        return jnp.mean((img - target) ** 2)

    g_builtin = jax.grad(f_builtin, argnums=(0, 1, 2))(albedo, normal, density)
    for gc, gb in zip(g_custom, g_builtin):
        np.testing.assert_allclose(np.asarray(gc), np.asarray(gb),
                                   rtol=1e-5, atol=1e-7)


def test_grads_match_finite_differences(setup):
    svo, o, d = setup
    rng = np.random.default_rng(0)
    target = jnp.asarray(rng.random((o.shape[0], 3), dtype=np.float32))
    albedo = jnp.asarray(svo.leaf_albedo)
    normal = jnp.asarray(svo.leaf_normal)
    density = jnp.asarray(svo.leaf_density)
    f = _loss_fn(svo, o, d, target)
    g_alb = np.asarray(jax.grad(f, argnums=0)(albedo, normal, density))

    # probe the highest-|grad| entries (touched voxels) with central diffs
    flat = np.abs(g_alb).ravel()
    probe = np.argsort(flat)[-5:]
    f64 = lambda a: float(f(jnp.asarray(a, jnp.float32), normal, density))
    eps = 1e-3
    a_np = np.asarray(albedo, np.float64)
    for pi in probe:
        i, c = divmod(int(pi), 3)
        ap = a_np.copy(); ap[i, c] += eps
        am = a_np.copy(); am[i, c] -= eps
        fd = (f64(ap) - f64(am)) / (2 * eps)
        assert abs(fd - g_alb[i, c]) < 5e-3 * max(1.0, abs(fd)), (
            i, c, fd, g_alb[i, c])


def test_untouched_voxels_get_zero_grad(setup):
    svo, o, d = setup
    target = jnp.zeros((o.shape[0], 3), jnp.float32)
    albedo = jnp.asarray(svo.leaf_albedo)
    normal = jnp.asarray(svo.leaf_normal)
    density = jnp.asarray(svo.leaf_density)
    f = _loss_fn(svo, o, d, target)
    g_alb = np.asarray(jax.grad(f, argnums=0)(albedo, normal, density))
    # the camera sees only the front hemisphere; some voxels must have
    # exactly zero gradient, and hit voxels nonzero
    row_mag = np.abs(g_alb).sum(axis=1)
    assert (row_mag == 0.0).any()
    assert (row_mag > 0.0).any()


def test_density_gradient_flows(setup):
    svo, o, d = setup
    target = jnp.zeros((o.shape[0], 3), jnp.float32)
    albedo = jnp.asarray(svo.leaf_albedo)
    normal = jnp.asarray(svo.leaf_normal)
    density = jnp.asarray(svo.leaf_density) * 0.5  # partially transparent
    f = _loss_fn(svo, o, d, target)
    g_den = np.asarray(jax.grad(f, argnums=2)(albedo, normal, density))
    assert np.abs(g_den).max() > 0.0


def test_segment_reduce_matches_rank1_at_scale():
    """The round-4 seg backward (sort+cumsum+boundary-gather) must agree
    with the serialized rank-1 scatter-adds up to f32 reassociation at a
    row count that actually takes the seg path (>= SEG_MIN_ROWS)."""
    from raytracingtest_tpu.diff import _segment_reduce_cols, SEG_MIN_ROWS
    rng = np.random.default_rng(5)
    n = max(SEG_MIN_ROWS, 1 << 16)
    m = 40_000
    ids = jnp.asarray(rng.integers(0, m, n, dtype=np.int32))
    cols = jnp.asarray(rng.random((n, 7), dtype=np.float32) - 0.5)
    seg = _segment_reduce_cols(ids, cols, m)
    rank1 = jnp.stack(
        [jnp.zeros(m, jnp.float32).at[ids].add(cols[:, j])
         for j in range(7)], axis=1)
    np.testing.assert_allclose(np.asarray(seg), np.asarray(rank1),
                               rtol=1e-4, atol=2e-5)
