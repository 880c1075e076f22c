"""OpenSimplex parity: vectorized twin vs independent scalar port, plus the
reference-parity scenes build (VERDICT r03 missing 3 / next-round item 8).

Oracle structure mirrors the reference's own CPU/GPU twin pattern: the
vectorized redesign (utils/opensimplex.py, dense padded tables + batched
gathers) must reproduce the scalar linked-chain walk
(reference/opensimplex_scalar.py, transliterating Simplex.cs:265-323)
bit-for-bit in float64 on a grid."""

import numpy as np

from raytracingtest_tpu.reference.opensimplex_scalar import OpenSimplexScalar
from raytracingtest_tpu.utils.opensimplex import (
    OpenSimplex3D, OPENSIMPLEX3_LIPSCHITZ, make_perm)


def test_vectorized_matches_scalar_exactly():
    n_vec = OpenSimplex3D(7)
    n_sca = OpenSimplexScalar(7)
    rng = np.random.default_rng(3)
    pts = rng.uniform(-8.0, 72.0, (400, 3))
    got = n_vec.evaluate(pts[:, 0], pts[:, 1], pts[:, 2])
    want = np.array([n_sca.evaluate(*p) for p in pts])
    # same construction tables, same f64 contribution order -> bit-identical
    np.testing.assert_array_equal(got, want)


def test_seed_changes_field():
    a = OpenSimplex3D(7)
    b = OpenSimplex3D(8)
    x = np.linspace(0.0, 10.0, 64)
    va = a.evaluate(x, x * 0.5, x * 0.25)
    vb = b.evaluate(x, x * 0.5, x * 0.25)
    assert not np.allclose(va, vb)


def test_perm_is_permutation():
    perm, perm3d = make_perm(7)
    assert sorted(perm.tolist()) == list(range(256))
    assert ((perm3d % 3) == 0).all() and perm3d.max() <= 23 * 3


def test_value_range_and_statistics():
    n = OpenSimplex3D(7)
    rng = np.random.default_rng(0)
    pts = rng.uniform(0.0, 50.0, (20000, 3))
    v = n.evaluate(pts[:, 0], pts[:, 1], pts[:, 2])
    assert np.abs(v).max() <= 1.0          # normalized range
    assert abs(v.mean()) < 0.02            # ~zero-mean field
    assert v.std() > 0.1                   # non-degenerate


def test_lipschitz_bound_holds_empirically():
    n = OpenSimplex3D(7)
    rng = np.random.default_rng(1)
    p = rng.uniform(0.0, 20.0, (5000, 3))
    eps = 1e-4
    d = rng.normal(size=(5000, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    v0 = n.evaluate(p[:, 0], p[:, 1], p[:, 2])
    q = p + eps * d
    v1 = n.evaluate(q[:, 0], q[:, 1], q[:, 2])
    slope = np.abs(v1 - v0).max() / eps
    assert slope < OPENSIMPLEX3_LIPSCHITZ  # certified bound is conservative


def test_terrain_ref_scene_builds():
    """The reference-parity terrain builds a plausible SVO and matches a
    dense sampling of the same field (golden construction check)."""
    import raytracingtest_tpu as rt
    scene = rt.get_scene("terrain_ref")
    res = rt.build_svo(scene, 5)
    assert res.svo.n_leaves > 100
    # golden construction check: the Lipschitz-pruned build must equal the
    # exhaustive dense reference build on the same field
    from raytracingtest_tpu.reference.dense_builder import dense_build
    ref = dense_build(scene, 5)
    np.testing.assert_array_equal(np.asarray(res.svo.masks),
                                  np.asarray(ref.svo.masks))


def test_jnp_path_matches_numpy_in_f32():
    import jax.numpy as jnp
    n = OpenSimplex3D(7)
    x = np.linspace(0.0, 9.0, 128)
    v_np = n.evaluate(x, x * 0.3, x * 0.7)
    v_j = np.asarray(n.evaluate(jnp.asarray(x), jnp.asarray(x * 0.3),
                                jnp.asarray(x * 0.7), xp=jnp))
    np.testing.assert_allclose(v_np, v_j, atol=5e-3)
