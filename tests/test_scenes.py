import numpy as np
import jax.numpy as jnp
import pytest

from raytracingtest_tpu.scenes import SCENES, get_scene
from raytracingtest_tpu.utils.noise import NOISE3_LIPSCHITZ, noise3


@pytest.mark.parametrize("name", sorted(SCENES))
def test_scene_numpy_jax_agree(name):
    scene = get_scene(name)
    rng = np.random.default_rng(0)
    p = rng.random((500, 3), dtype=np.float32)
    f_np = np.asarray(scene(p[:, 0], p[:, 1], p[:, 2], xp=np))
    f_jx = np.asarray(
        scene(jnp.asarray(p[:, 0]), jnp.asarray(p[:, 1]), jnp.asarray(p[:, 2]), xp=jnp)
    )
    # the *_ref scenes evaluate OpenSimplex in float64 on numpy (reference
    # numerics) but float32 under jax (x64 disabled) — looser bound there
    tol = dict(rtol=2e-3, atol=2e-3) if name.endswith("_ref") else \
        dict(rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(f_np, f_jx, **tol)


@pytest.mark.parametrize("name", sorted(SCENES))
def test_scene_has_solid_and_air(name):
    scene = get_scene(name)
    g = np.linspace(0.05, 0.95, 16, dtype=np.float32)
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    f = np.asarray(scene(X, Y, Z, xp=np))
    assert (f <= 0).any(), "scene has no solid region"
    assert (f > 0).any(), "scene has no air region"


def test_noise_range_and_smoothness():
    rng = np.random.default_rng(3)
    p = rng.random((2000, 3), dtype=np.float32) * 8.0
    v = noise3(p[:, 0], p[:, 1], p[:, 2], xp=np)
    assert np.all(np.abs(v) <= 1.5)
    assert np.std(v) > 0.05  # actually varies


def test_noise_lipschitz_bound():
    # dense finite-difference check of the declared Lipschitz constant
    rng = np.random.default_rng(4)
    p = rng.random((20000, 3), dtype=np.float64) * 7.0
    h = 1e-4
    v0 = noise3(p[:, 0], p[:, 1], p[:, 2], xp=np).astype(np.float64)
    for ax in range(3):
        q = p.copy()
        q[:, ax] += h
        v1 = noise3(q[:, 0], q[:, 1], q[:, 2], xp=np).astype(np.float64)
        grad = np.abs(v1 - v0) / h
        assert grad.max() < NOISE3_LIPSCHITZ, (ax, grad.max())


@pytest.mark.parametrize("name", sorted(SCENES))
def test_scene_lipschitz_empirical(name):
    # scene density must respect its declared bound (random secant check)
    scene = get_scene(name)
    rng = np.random.default_rng(5)
    a = rng.random((5000, 3), dtype=np.float64)
    b = a + rng.normal(0, 0.01, (5000, 3))
    fa = np.asarray(scene(a[:, 0], a[:, 1], a[:, 2], xp=np), np.float64)
    fb = np.asarray(scene(b[:, 0], b[:, 1], b[:, 2], xp=np), np.float64)
    dist = np.linalg.norm(a - b, axis=1)
    ratio = np.abs(fa - fb) / np.maximum(dist, 1e-12)
    assert ratio.max() <= scene.lipschitz * 1.001, (name, ratio.max())
