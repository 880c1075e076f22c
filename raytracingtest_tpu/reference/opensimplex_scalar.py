"""Scalar per-point OpenSimplex twin — the verification oracle.

A direct transliteration of the reference's linked-chain evaluation
(/root/reference/Assets/Scripts/Utility/Noise/Simplex.cs:265-323: region
hash -> contribution chain walk -> attenuated gradient sum, float64),
kept deliberately structured like the C# so the vectorized redesign in
utils/opensimplex.py can be tested against independent semantics
(tests/test_opensimplex.py)."""

from __future__ import annotations

import math

from raytracingtest_tpu.utils.opensimplex import (
    _BASE3D, _P3D, _LOOKUP_PAIRS_3D, GRADIENTS_3D, STRETCH_3D, SQUISH_3D,
    NORM_3D, make_perm,
)


class _Contribution:
    __slots__ = ("dx", "dy", "dz", "xsb", "ysb", "zsb", "next")

    def __init__(self, multiplier, xsb, ysb, zsb):
        self.dx = -xsb - multiplier * SQUISH_3D
        self.dy = -ysb - multiplier * SQUISH_3D
        self.dz = -zsb - multiplier * SQUISH_3D
        self.xsb, self.ysb, self.zsb = xsb, ysb, zsb
        self.next = None


def _build_lookup():
    contributions = []
    for i in range(0, len(_P3D), 9):
        base = _BASE3D[_P3D[i]]
        first = prev = None
        for k in range(0, len(base), 4):
            cur = _Contribution(base[k], base[k + 1], base[k + 2],
                                base[k + 3])
            if prev is None:
                first = cur
            else:
                prev.next = cur
            prev = cur
        prev.next = _Contribution(_P3D[i + 1], _P3D[i + 2], _P3D[i + 3],
                                  _P3D[i + 4])
        prev.next.next = _Contribution(_P3D[i + 5], _P3D[i + 6], _P3D[i + 7],
                                       _P3D[i + 8])
        contributions.append(first)
    lookup = [None] * 2048
    for h, ci in zip(_LOOKUP_PAIRS_3D[::2], _LOOKUP_PAIRS_3D[1::2]):
        lookup[h] = contributions[ci]
    return lookup


_LOOKUP = _build_lookup()
_GRAD = GRADIENTS_3D.reshape(-1)


class OpenSimplexScalar:
    def __init__(self, seed: int = 7):
        perm, perm3d = make_perm(seed)
        self.perm = [int(v) for v in perm]
        self.perm3d = [int(v) for v in perm3d]

    def evaluate(self, x: float, y: float, z: float) -> float:
        stretch = (x + y + z) * STRETCH_3D
        xs, ys, zs = x + stretch, y + stretch, z + stretch
        xsb, ysb, zsb = (math.floor(xs), math.floor(ys), math.floor(zs))
        squish = (xsb + ysb + zsb) * SQUISH_3D
        dx0, dy0, dz0 = x - (xsb + squish), y - (ysb + squish), z - (zsb + squish)
        xins, yins, zins = xs - xsb, ys - ysb, zs - zsb
        insum = xins + yins + zins

        h = (int(yins - zins + 1)
             | int(xins - yins + 1) << 1
             | int(xins - zins + 1) << 2
             | int(insum) << 3
             | int(insum + zins) << 5
             | int(insum + yins) << 7
             | int(insum + xins) << 9)
        c = _LOOKUP[h]
        value = 0.0
        while c is not None:
            dx, dy, dz = dx0 + c.dx, dy0 + c.dy, dz0 + c.dz
            attn = 2.0 - dx * dx - dy * dy - dz * dz
            if attn > 0:
                px, py, pz = xsb + c.xsb, ysb + c.ysb, zsb + c.zsb
                i = self.perm3d[
                    (self.perm[(self.perm[px & 0xFF] + py) & 0xFF] + pz)
                    & 0xFF]
                part = (_GRAD[i] * dx + _GRAD[i + 1] * dy + _GRAD[i + 2] * dz)
                attn *= attn
                value += attn * attn * part
            c = c.next
        return value * NORM_3D
