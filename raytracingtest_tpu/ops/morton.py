"""Vectorized 3D Morton (Z-order) encode/decode.

Parity with the reference's scalar bit-interleave loop
(Assets/Scripts/SVO/RTUtility/MortonUtil.cs:2-23), re-designed for arrays:
magic-number bit spreading instead of a per-bit loop, identical under numpy
and jax.numpy (uint32/uint64 elementwise ops).

The 32-bit variant interleaves 10 bits per axis (octree depth <= 10); the
64-bit variant (numpy only — host-side streaming/indexing) supports 21 bits
per axis (depth <= 21, far beyond the depth-12 target).
"""

from __future__ import annotations

import numpy as np


def _part1by2_32(v, xp):
    u = xp.uint32
    v = v.astype(xp.uint32) & u(0x3FF)
    v = (v | (v << u(16))) & u(0x030000FF)
    v = (v | (v << u(8))) & u(0x0300F00F)
    v = (v | (v << u(4))) & u(0x030C30C3)
    v = (v | (v << u(2))) & u(0x09249249)
    return v


def _compact1by2_32(v, xp):
    u = xp.uint32
    v = v.astype(xp.uint32) & u(0x09249249)
    v = (v | (v >> u(2))) & u(0x030C30C3)
    v = (v | (v >> u(4))) & u(0x0300F00F)
    v = (v | (v >> u(8))) & u(0x030000FF)
    v = (v | (v >> u(16))) & u(0x3FF)
    return v


def morton_encode(x, y, z, xp=np):
    """Interleave three <=10-bit coords into one uint32 Morton code.

    Bit order matches the reference (MortonUtil.cs:6-12): x in bit 0,
    y in bit 1, z in bit 2 of each triple — x varies fastest, consistent
    with the child-offset table Constants.vfoffsets (Constants.cs:23-26).
    """
    x = xp.asarray(x)
    y = xp.asarray(y)
    z = xp.asarray(z)
    return (
        _part1by2_32(x, xp)
        | (_part1by2_32(y, xp) << xp.uint32(1))
        | (_part1by2_32(z, xp) << xp.uint32(2))
    )


def morton_decode(code, xp=np):
    """Inverse of morton_encode: uint32 code -> (x, y, z) int32 coords."""
    code = xp.asarray(code)
    x = _compact1by2_32(code, xp)
    y = _compact1by2_32(code >> xp.uint32(1), xp)
    z = _compact1by2_32(code >> xp.uint32(2), xp)
    return x.astype(xp.int32), y.astype(xp.int32), z.astype(xp.int32)


def _part1by2_64(v):
    v = np.asarray(v, np.uint64) & np.uint64(0x1FFFFF)
    v = (v | (v << np.uint64(32))) & np.uint64(0x1F00000000FFFF)
    v = (v | (v << np.uint64(16))) & np.uint64(0x1F0000FF0000FF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x100F00F00F00F00F)
    v = (v | (v << np.uint64(4))) & np.uint64(0x10C30C30C30C30C3)
    v = (v | (v << np.uint64(2))) & np.uint64(0x1249249249249249)
    return v


def _compact1by2_64(v):
    v = np.asarray(v, np.uint64) & np.uint64(0x1249249249249249)
    v = (v | (v >> np.uint64(2))) & np.uint64(0x10C30C30C30C30C3)
    v = (v | (v >> np.uint64(4))) & np.uint64(0x100F00F00F00F00F)
    v = (v | (v >> np.uint64(8))) & np.uint64(0x1F0000FF0000FF)
    v = (v | (v >> np.uint64(16))) & np.uint64(0x1F00000000FFFF)
    v = (v | (v >> np.uint64(32))) & np.uint64(0x1FFFFF)
    return v


def morton_encode64(x, y, z):
    """64-bit Morton encode (numpy host-side; 21 bits/axis)."""
    return (
        _part1by2_64(x)
        | (_part1by2_64(y) << np.uint64(1))
        | (_part1by2_64(z) << np.uint64(2))
    )


def morton_decode64(code):
    code = np.asarray(code, np.uint64)
    return (
        _compact1by2_64(code).astype(np.int64),
        _compact1by2_64(code >> np.uint64(1)).astype(np.int64),
        _compact1by2_64(code >> np.uint64(2)).astype(np.int64),
    )
