"""Scene library: signed density functions over the octree-local unit cube.

Parity with the reference's sampler library
(Assets/Scripts/Utility/SampleFunctions.cs:4-68):

  reference Type enum          here
  ---------------------------  -------------------------------
  FlatGround                   "flat_ground"
  Sphere                       "sphere"
  Simplex                      "simplex"        (one-octave noise terrain)
  RotatedCuboid                "rotated_cuboid"
  Custom1 (2-octave terrain)   "terrain"        (the reference's default scene,
                                                 Assets/Scenes/Main.unity:417)
  Custom2 (null in reference)  — omitted (reference leaves functions[5] null)
  (new)                        "dense_cube"     (BASELINE config 1: 64^3 dense cube)

Convention: density(p) <= 0 is solid (same sign convention as the reference,
NaiveCreator.cs:56). Coordinates are octree-local in [0,1]^3 (the reference
samples its cube over [1,2]^3; we place the canonical cube at the origin —
one world<->octree transform lives in ops/camera.py, fixing the reference's
inconsistent SVO_SCALE constants noted in SURVEY.md §7.3.8).

Every scene declares a Lipschitz bound of its density so the hierarchical
builder can prune octants conservatively (|f(center)| > L * radius => the
octant cannot intersect the surface). This replaces the reference's
exhaustive 8^depth recursion (NaiveCreator.cs:52-118) which does not scale
to depth >= 9.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import numpy as np

from raytracingtest_tpu.utils.perlin import (
    fbm3 as perlin_fbm3, perlin_fbm3_lipschitz)
from raytracingtest_tpu.utils.noise import fbm3, fbm3_lipschitz, noise3, NOISE3_LIPSCHITZ


@dataclasses.dataclass(frozen=True)
class Scene:
    """A signed-density scene.

    fn(x, y, z, xp) -> density array; <= 0 means solid. Elementwise over
    arbitrarily-shaped coordinate arrays; xp is numpy or jax.numpy.
    lipschitz bounds |f(p) - f(q)| <= lipschitz * |p - q|.
    """

    name: str
    fn: Callable
    lipschitz: float

    def __call__(self, x, y, z, xp=np):
        return self.fn(x, y, z, xp)


def _flat_ground(x, y, z, xp):
    # Solid below y = 0.30 (reference FlatGround: SampleFunctions.cs:50-52).
    return xp.asarray(y, xp.float32) - 0.30


def _sphere(x, y, z, xp):
    # Sphere SDF radius 0.30 at center (reference: SampleFunctions.cs:54-57).
    x = xp.asarray(x, xp.float32)
    y = xp.asarray(y, xp.float32)
    z = xp.asarray(z, xp.float32)
    r = xp.sqrt((x - 0.5) ** 2 + (y - 0.5) ** 2 + (z - 0.5) ** 2)
    return r - 0.30


_NOISE_FREQ = 4.0
_NOISE_AMP = 0.12


def _simplex_terrain(x, y, z, xp):
    # One-octave noise heightfield (reference Simplex sampler).
    h = noise3(
        xp.asarray(x, xp.float32) * _NOISE_FREQ,
        xp.zeros_like(xp.asarray(x, xp.float32)),
        xp.asarray(z, xp.float32) * _NOISE_FREQ,
        xp=xp,
    )
    return xp.asarray(y, xp.float32) - (0.45 + _NOISE_AMP * h)


def _terrain(x, y, z, xp):
    # Two-octave fbm terrain — the reference's default render scene "Custom1"
    # (SampleFunctions.cs:40-47, selected by Main.unity:417 sampleType=4).
    h = fbm3(
        xp.asarray(x, xp.float32) * _NOISE_FREQ,
        xp.zeros_like(xp.asarray(x, xp.float32)),
        xp.asarray(z, xp.float32) * _NOISE_FREQ,
        xp=xp,
        octaves=2,
    )
    return xp.asarray(y, xp.float32) - (0.45 + _NOISE_AMP * h)


def _perlin_terrain(x, y, z, xp):
    # Two-octave classic-Perlin fbm heightfield — the same terrain family
    # as `_terrain` but over the reference's (dead-code) Perlin noise
    # (Perlin.cs:104-113 fbm semantics), exercising utils/perlin.py
    # through the production builder. Certified bound: perlin.py.
    x = xp.asarray(x, xp.float32)
    h = perlin_fbm3(
        x * _NOISE_FREQ,
        xp.zeros_like(x),
        xp.asarray(z, xp.float32) * _NOISE_FREQ,
        octaves=2,
        xp=xp,
    )
    return xp.asarray(y, xp.float32) - (0.45 + _NOISE_AMP * h)


_CUBOID_C = 0.04  # cos/sin of the fixed rotation angle are baked below


def _rotated_cuboid(x, y, z, xp):
    # Axis-rotated box SDF (reference RotatedCuboid: SampleFunctions.cs:59-68).
    x = xp.asarray(x, xp.float32) - 0.5
    y = xp.asarray(y, xp.float32) - 0.5
    z = xp.asarray(z, xp.float32) - 0.5
    ang = 0.6
    c, s = float(np.cos(ang)), float(np.sin(ang))
    # rotate about y then x
    x1 = c * x + s * z
    z1 = -s * x + c * z
    y1 = c * y - s * z1
    z2 = s * y + c * z1
    hx, hy, hz = 0.28, 0.16, 0.22
    qx = xp.abs(x1) - hx
    qy = xp.abs(y1) - hy
    qz = xp.abs(z2) - hz
    outside = xp.sqrt(
        xp.maximum(qx, 0.0) ** 2 + xp.maximum(qy, 0.0) ** 2 + xp.maximum(qz, 0.0) ** 2
    )
    inside = xp.minimum(xp.maximum(qx, xp.maximum(qy, qz)), 0.0)
    return outside + inside


def _dense_cube(x, y, z, xp):
    # Axis-aligned solid cube spanning [1/4, 3/4]^3 — the BASELINE config-1
    # "64^3 dense cube" scene. Chebyshev-distance box SDF (L<=1).
    x = xp.asarray(x, xp.float32) - 0.5
    y = xp.asarray(y, xp.float32) - 0.5
    z = xp.asarray(z, xp.float32) - 0.5
    return xp.maximum(xp.abs(x), xp.maximum(xp.abs(y), xp.abs(z))) - 0.25


_TERRAIN_L = 1.0 + _NOISE_AMP * _NOISE_FREQ * fbm3_lipschitz(octaves=2)
_SIMPLEX_L = 1.0 + _NOISE_AMP * _NOISE_FREQ * NOISE3_LIPSCHITZ


# ---------------------------------------------------------------------------
# reference-parity scenes: numerically IDENTICAL to the reference's samplers
# (OpenSimplex seed 7, SampleFunctions.cs:17), unlike the fast home-grown
# noise above. The reference evaluates over its [1,2]^3 root cube; our local
# frame is [0,1]^3, so coordinates shift by +1 to sample the same field.
# ---------------------------------------------------------------------------

_OS = None


def _opensimplex():
    global _OS
    if _OS is None:
        from raytracingtest_tpu.utils.opensimplex import OpenSimplex3D
        _OS = OpenSimplex3D(7)
    return _OS


def _terrain_ref(x, y, z, xp):
    # The reference's default render scene, bit-parity version ("Custom1",
    # SampleFunctions.cs:40-47: y-1.5 + 0.5*n(3p) + 0.15*n(24p), p in [1,2]^3).
    n = _opensimplex()
    x = xp.asarray(x) + 1.0
    y = xp.asarray(y) + 1.0
    z = xp.asarray(z) + 1.0
    r, r2 = 3.0, 24.0
    out = (y - 1.5
           + 0.5 * n.evaluate(x * r, y * r, z * r, xp=xp)
           + 0.15 * n.evaluate(x * r2, y * r2, z * r2, xp=xp))
    return out.astype(xp.float32) if xp is np else out


def _simplex_ref(x, y, z, xp):
    # The reference's raw "Simplex" sampler (SampleFunctions.cs:30-33)
    # at a usable frequency: the reference's r=1132 yields pixel noise with
    # no coherent surface; r=6 keeps the same field family and seed.
    n = _opensimplex()
    x = xp.asarray(x) + 1.0
    y = xp.asarray(y) + 1.0
    z = xp.asarray(z) + 1.0
    out = n.evaluate(x * 6.0, y * 6.0, z * 6.0, xp=xp)
    return out.astype(xp.float32) if xp is np else out


def _ref_lipschitz():
    """Certified Lipschitz bound of the vectorized OpenSimplex evaluator —
    the single source of truth for every *_ref scene bound (ADVICE r04)."""
    from raytracingtest_tpu.utils.opensimplex import OPENSIMPLEX3_LIPSCHITZ
    return OPENSIMPLEX3_LIPSCHITZ


SCENES = {
    s.name: s
    for s in [
        Scene("flat_ground", _flat_ground, 1.0),
        Scene("sphere", _sphere, 1.0),
        Scene("simplex", _simplex_terrain, _SIMPLEX_L),
        Scene("rotated_cuboid", _rotated_cuboid, 1.0),
        Scene("terrain", _terrain, _TERRAIN_L),
        Scene("dense_cube", _dense_cube, 1.0),
        Scene("perlin", _perlin_terrain,
              1.0 + _NOISE_AMP * _NOISE_FREQ * perlin_fbm3_lipschitz(2)),
        Scene("terrain_ref", _terrain_ref,
              1.0 + (0.5 * 3.0 + 0.15 * 24.0) * _ref_lipschitz()),
        Scene("simplex_ref", _simplex_ref, 6.0 * _ref_lipschitz()),
    ]
}


def get_scene(name: str) -> Scene:
    return SCENES[name]
