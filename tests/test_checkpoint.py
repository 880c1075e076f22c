import numpy as np
import pytest

import jax.numpy as jnp
import optax

from raytracingtest_tpu.io import checkpoint as ckpt
from raytracingtest_tpu.ops.octree import build_svo
from raytracingtest_tpu.scenes import get_scene


@pytest.fixture(scope="module")
def sphere5():
    return build_svo(get_scene("sphere"), 5).svo


def test_esvo_binary_roundtrip(sphere5, tmp_path):
    p = str(tmp_path / "svo.bin")
    ckpt.save_esvo_binary(sphere5, p)
    masks, child_base, leaf_base, depth, level_start = ckpt.load_esvo_binary(p)
    assert depth == sphere5.depth
    assert level_start == sphere5.level_start
    np.testing.assert_array_equal(masks, np.asarray(sphere5.masks))
    np.testing.assert_array_equal(child_base, np.asarray(sphere5.child_base))
    np.testing.assert_array_equal(leaf_base, np.asarray(sphere5.leaf_base))


def test_esvo_binary_traversal_equivalent(sphere5, tmp_path):
    """A reloaded wire-format SVO must trace identically."""
    from raytracingtest_tpu.ops import traverse
    from raytracingtest_tpu.ops.octree import SVO

    p = str(tmp_path / "svo.bin")
    ckpt.save_esvo_binary(sphere5, p)
    masks, child_base, leaf_base, depth, level_start = ckpt.load_esvo_binary(p)
    svo2 = SVO(masks=masks, child_base=child_base, leaf_base=leaf_base,
               leaf_albedo=sphere5.leaf_albedo,
               leaf_normal=sphere5.leaf_normal,
               leaf_density=sphere5.leaf_density,
               depth=depth, level_start=level_start)
    rng = np.random.default_rng(3)
    v = rng.normal(size=(100, 3)); v /= np.linalg.norm(v, axis=1, keepdims=True)
    o = (np.array([0.5] * 3) + 2 * v).astype(np.float32)
    d = -v.astype(np.float32)
    r1 = traverse.trace_numpy(sphere5, o, d)
    r2 = traverse.trace_numpy(svo2, o, d)
    np.testing.assert_array_equal(r1.hit_leaf, r2.hit_leaf)
    np.testing.assert_array_equal(r1.hit_t, r2.hit_t)


def test_svo_npz_roundtrip(sphere5, tmp_path):
    p = str(tmp_path / "svo.npz")
    ckpt.save_svo(sphere5, p)
    svo2 = ckpt.load_svo(p)
    assert svo2.depth == sphere5.depth
    assert svo2.level_start == sphere5.level_start
    np.testing.assert_array_equal(np.asarray(svo2.masks), np.asarray(sphere5.masks))
    np.testing.assert_allclose(np.asarray(svo2.leaf_albedo),
                               np.asarray(sphere5.leaf_albedo))


def test_train_state_roundtrip(sphere5, tmp_path):
    p = str(tmp_path / "state.npz")
    params = {
        "albedo": jnp.asarray(sphere5.leaf_albedo),
        "normal": jnp.asarray(sphere5.leaf_normal),
        "density": jnp.asarray(sphere5.leaf_density),
    }
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)
    ckpt.save_train_state(p, params, opt_state, step=42, meta={"scene": "sphere"})
    params2, opt_state2, step = ckpt.load_train_state(
        p, opt_state_template=opt.init(params))
    assert step == 42
    np.testing.assert_allclose(np.asarray(params["albedo"]),
                               params2["albedo"])
    import jax
    l1 = jax.tree_util.tree_leaves(opt_state)
    l2 = jax.tree_util.tree_leaves(opt_state2)
    assert len(l1) == len(l2)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
