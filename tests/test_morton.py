import numpy as np
import jax.numpy as jnp

from raytracingtest_tpu.ops.morton import (
    morton_decode, morton_decode64, morton_encode, morton_encode64,
)


def test_roundtrip_32():
    rng = np.random.default_rng(0)
    x, y, z = (rng.integers(0, 1024, 1000, dtype=np.uint32) for _ in range(3))
    code = morton_encode(x, y, z, xp=np)
    dx, dy, dz = morton_decode(code, xp=np)
    np.testing.assert_array_equal(dx, x.astype(np.int32))
    np.testing.assert_array_equal(dy, y.astype(np.int32))
    np.testing.assert_array_equal(dz, z.astype(np.int32))


def test_known_values():
    # x occupies bit 0 of each triple (x-fastest, like the reference's
    # vfoffsets child order)
    assert int(morton_encode(np.uint32(1), np.uint32(0), np.uint32(0))) == 1
    assert int(morton_encode(np.uint32(0), np.uint32(1), np.uint32(0))) == 2
    assert int(morton_encode(np.uint32(0), np.uint32(0), np.uint32(1))) == 4
    assert int(morton_encode(np.uint32(3), np.uint32(3), np.uint32(3))) == 63


def test_jax_matches_numpy():
    rng = np.random.default_rng(1)
    x, y, z = (rng.integers(0, 1024, 512, dtype=np.uint32) for _ in range(3))
    c_np = morton_encode(x, y, z, xp=np)
    c_jx = np.asarray(morton_encode(jnp.asarray(x), jnp.asarray(y), jnp.asarray(z), xp=jnp))
    np.testing.assert_array_equal(c_np, c_jx)


def test_roundtrip_64():
    rng = np.random.default_rng(2)
    x, y, z = (rng.integers(0, 1 << 21, 1000).astype(np.uint64) for _ in range(3))
    code = morton_encode64(x, y, z)
    dx, dy, dz = morton_decode64(code)
    np.testing.assert_array_equal(dx, x.astype(np.int64))
    np.testing.assert_array_equal(dy, y.astype(np.int64))
    np.testing.assert_array_equal(dz, z.astype(np.int64))


def test_morton_order_is_sorted_bfs_order():
    # Morton codes of a full level enumerate children parent-major: parent
    # code * 8 + child slot.
    x, y, z = np.meshgrid(np.arange(4), np.arange(4), np.arange(4), indexing="ij")
    codes = morton_encode(
        x.ravel().astype(np.uint32),
        y.ravel().astype(np.uint32),
        z.ravel().astype(np.uint32),
    )
    parents = morton_encode(
        (x // 2).ravel().astype(np.uint32),
        (y // 2).ravel().astype(np.uint32),
        (z // 2).ravel().astype(np.uint32),
    )
    np.testing.assert_array_equal(codes >> np.uint32(3), parents)
