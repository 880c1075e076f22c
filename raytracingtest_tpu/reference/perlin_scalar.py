"""Scalar reference twin of utils/perlin.py (classic improved Perlin).

Straight-line scalar transcription of the reference semantics
(`Assets/Scripts/Utility/Noise/Perlin.cs:17-66`, Ken Perlin's public-domain
improved noise) in float32, used as the parity oracle for the vectorized
implementation (tests/test_perlin.py) — the same twin pattern as
reference/opensimplex_scalar.py."""

from __future__ import annotations

import math

import numpy as np

from raytracingtest_tpu.utils.perlin import PERM

_f = np.float32


def _fade(t):
    return _f(t * t * t * (t * (t * _f(6) - _f(15)) + _f(10)))


def _lerp(t, a, b):
    return _f(a + t * (b - a))


def _grad3(h, x, y, z):
    h &= 15
    u = x if h < 8 else y
    v = y if h < 4 else (x if h in (12, 14) else z)
    return _f((u if (h & 1) == 0 else -u) + (v if (h & 2) == 0 else -v))


def noise3(x, y, z):
    x, y, z = _f(x), _f(y), _f(z)
    X = int(math.floor(x)) & 0xFF
    Y = int(math.floor(y)) & 0xFF
    Z = int(math.floor(z)) & 0xFF
    x = _f(x - math.floor(x))
    y = _f(y - math.floor(y))
    z = _f(z - math.floor(z))
    u, v, w = _fade(x), _fade(y), _fade(z)
    A = (int(PERM[X]) + Y) & 0xFF
    B = (int(PERM[X + 1]) + Y) & 0xFF
    AA = (int(PERM[A]) + Z) & 0xFF
    BA = (int(PERM[B]) + Z) & 0xFF
    AB = (int(PERM[A + 1]) + Z) & 0xFF
    BB = (int(PERM[B + 1]) + Z) & 0xFF
    one = _f(1)
    return _lerp(
        w,
        _lerp(v,
              _lerp(u, _grad3(int(PERM[AA]), x, y, z),
                    _grad3(int(PERM[BA]), _f(x - one), y, z)),
              _lerp(u, _grad3(int(PERM[AB]), x, _f(y - one), z),
                    _grad3(int(PERM[BB]), _f(x - one), _f(y - one), z))),
        _lerp(v,
              _lerp(u, _grad3(int(PERM[AA + 1]), x, y, _f(z - one)),
                    _grad3(int(PERM[BA + 1]), _f(x - one), y, _f(z - one))),
              _lerp(u,
                    _grad3(int(PERM[AB + 1]), x, _f(y - one), _f(z - one)),
                    _grad3(int(PERM[BB + 1]), _f(x - one), _f(y - one),
                           _f(z - one)))))


def noise1(x):
    x = _f(x)
    X = int(math.floor(x)) & 0xFF
    x = _f(x - math.floor(x))
    u = _fade(x)
    g0 = _f(x if (int(PERM[X]) & 1) == 0 else -x)
    x1 = _f(x - _f(1))
    g1 = _f(x1 if (int(PERM[X + 1]) & 1) == 0 else -x1)
    return _f(_lerp(u, g0, g1) * _f(2))


def noise2(x, y):
    x, y = _f(x), _f(y)
    X = int(math.floor(x)) & 0xFF
    Y = int(math.floor(y)) & 0xFF
    x = _f(x - math.floor(x))
    y = _f(y - math.floor(y))
    u, v = _fade(x), _fade(y)
    A = (int(PERM[X]) + Y) & 0xFF
    B = (int(PERM[X + 1]) + Y) & 0xFF

    def g2(h, gx, gy):
        return _f((gx if (h & 1) == 0 else -gx)
                  + (gy if (h & 2) == 0 else -gy))

    one = _f(1)
    return _lerp(v,
                 _lerp(u, g2(int(PERM[A]), x, y),
                       g2(int(PERM[B]), _f(x - one), y)),
                 _lerp(u, g2(int(PERM[A + 1]), x, _f(y - one)),
                       g2(int(PERM[B + 1]), _f(x - one), _f(y - one))))
