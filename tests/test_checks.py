"""checkify-instrumented validation wrappers (SURVEY.md §5 NaN/bounds
checking; utils/checks.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

import raytracingtest_tpu as rt
from raytracingtest_tpu.ops import traverse
from raytracingtest_tpu.ops.camera import Camera
from raytracingtest_tpu.utils import checks


@pytest.fixture(scope="module")
def setup():
    res = rt.build_svo(rt.get_scene("sphere"), 4)
    svo = res.svo.device()
    cam = Camera(position=(0.5, 0.6, -1.0), look_at=(0.5, 0.5, 0.5),
                 fov_y_deg=45.0, width=16, height=16)
    o, d = cam.rays(np)
    return svo, jnp.asarray(o), jnp.asarray(d)


def test_checked_trace_clean(setup):
    svo, o, d = setup
    err, res = checks.checked_trace(
        svo.masks, svo.child_base, svo.leaf_base,
        traverse.parent_ptr_of(svo), o, d, svo.depth, svo.n_leaves)
    err.throw()   # no error on a healthy trace
    assert int(jnp.sum(res.hit_leaf >= 0)) > 0


def test_checked_trace_catches_bounds_violation(setup):
    svo, o, d = setup
    # lie about the leaf count: every hit is now "out of bounds"
    err, _res = checks.checked_trace(
        svo.masks, svo.child_base, svo.leaf_base,
        traverse.parent_ptr_of(svo), o, d, svo.depth, 1)
    with pytest.raises(Exception, match="out of bounds"):
        err.throw()


def test_checked_render_clean_and_nan_poison(setup):
    svo, o, d = setup
    light = jnp.asarray([-0.5, -1.0, -0.3], jnp.float32)
    alb = jnp.asarray(svo.leaf_albedo)
    nrm = jnp.asarray(svo.leaf_normal)
    den = jnp.asarray(svo.leaf_density)
    err, img = checks.checked_render_diff(
        alb, nrm, den, svo.masks, svo.child_base, svo.leaf_base, o, d,
        svo.depth, light)
    err.throw()
    assert np.isfinite(np.asarray(img)).all()

    # poison one hit voxel's albedo with NaN: the check must fire
    bad = alb.at[0].set(jnp.nan)
    err2, _ = checks.checked_render_diff(
        bad, nrm, den, svo.masks, svo.child_base, svo.leaf_base, o, d,
        svo.depth, light)
    # voxel 0 may or may not be hit by this camera; poison ALL to be sure
    bad_all = alb * jnp.nan
    err3, _ = checks.checked_render_diff(
        bad_all, nrm, den, svo.masks, svo.child_base, svo.leaf_base, o, d,
        svo.depth, light)
    with pytest.raises(Exception, match="non-finite radiance"):
        err3.throw()


def test_checked_grads_clean(setup):
    svo, o, d = setup
    light = jnp.asarray([-0.5, -1.0, -0.3], jnp.float32)
    target = jnp.zeros((o.shape[0], 3), jnp.float32)
    err, (loss, grads) = checks.checked_grads(
        jnp.asarray(svo.leaf_albedo), jnp.asarray(svo.leaf_normal),
        jnp.asarray(svo.leaf_density), svo, o, d, light, target)
    err.throw()
    assert np.isfinite(float(loss))
