"""Scalar CPU reference ESVO ray traversal — the verification oracle.

Plays the role of the reference project's CPU twin tracers
(Assets/Scripts/SVO/CompactSVO/NVIDIAIterativeTracer.cs:72-290, itself a C#
port of the NVIDIA ESVO kernel Assets/Scripts/SVO/CompactSVO/Trace.cu): a
deliberately simple, branchy, scalar implementation of the Laine-Karras
PUSH/ADVANCE/POP traversal used to verify the vectorized XLA and Pallas
kernels ray-by-ray (SURVEY.md §3.3: "same traversal in a scalar reference and
in the kernel").

Algorithm notes (same scheme as the reference):
  * octree occupies [1, 2]^3; s_max = 23 scale levels so float32 mantissa
    bits encode the traversal scale directly (NVIDIAIterativeTracer.cs:82)
  * octant mirroring so every direction component is <= 0
    (NVIDIASVO.compute:36-38)
  * POP recovers the target scale from the highest differing mantissa bit
    via float<->int bitcasts (NVIDIASVO.compute:134-139)
  * child addressing by popcount rank — but over *absolute* int32 child/leaf
    base indices (our canonical layout, ops/octree.py) instead of the
    reference's 15-bit relative pointers.

All arithmetic is numpy float32 so results are bit-comparable with the
compiled kernels.
"""

from __future__ import annotations

import dataclasses
import struct
from typing import List, Optional

import numpy as np

S_MAX = 23
MAX_ITERS = 4000


def f2i(f) -> int:
    """float32 bits -> int (like HLSL asint / C# Buffer.BlockCopy helpers,
    NVIDIAIterativeTracer.cs:344-374)."""
    return struct.unpack("<i", struct.pack("<f", float(f)))[0]


def i2f(i) -> np.float32:
    return np.float32(struct.unpack("<f", struct.pack("<i", int(i)))[0])


def popcount(x: int) -> int:
    return bin(x & 0xFF).count("1")


@dataclasses.dataclass
class Hit:
    t: float          # ray parameter of entry into the hit leaf voxel
    leaf_id: int      # row into the SVO leaf attribute arrays
    parent: int       # node index whose child was hit
    child_shift: int  # unmirrored child slot (0..7)
    iters: int        # traversal iterations taken
    voxel: tuple      # integer voxel coords at finest resolution


def cast_ray(svo, origin, direction, collect_all: bool = False,
             max_iters: int = MAX_ITERS) -> List[Hit]:
    """Trace one ray through the SVO (octree-local coords: cube is [0,1]^3).

    Returns hits in t-order: the first hit only, or — with collect_all, the
    reference's Trace() behavior of returning every intersected leaf in order
    (CompactSVO.cs:92-94, used by the golden tests SVOTests.cs:13-42).
    """
    masks = np.asarray(svo.masks)
    child_base = np.asarray(svo.child_base)
    leaf_base = np.asarray(svo.leaf_base)
    depth = svo.depth

    f32 = np.float32
    # Map octree-local [0,1]^3 to the traversal cube [1,2]^3.
    o = [f32(origin[i]) + f32(1.0) for i in range(3)]
    d = [f32(direction[i]) for i in range(3)]

    eps = np.float32(2.0 ** -S_MAX)
    for i in range(3):
        if abs(d[i]) < eps:
            d[i] = eps if d[i] >= 0 else -eps

    t_coef = [f32(-1.0) / f32(abs(d[i])) for i in range(3)]
    t_bias = [t_coef[i] * o[i] for i in range(3)]

    octant_mask = 7
    for i in range(3):
        if d[i] > 0.0:
            octant_mask ^= 1 << i
            t_bias[i] = f32(3.0) * t_coef[i] - t_bias[i]

    t_min = max(f32(2.0) * t_coef[i] - t_bias[i] for i in range(3))
    t_max = min(t_coef[i] - t_bias[i] for i in range(3))
    t_min = max(t_min, f32(0.0))
    h = t_max

    if t_min >= t_max:
        return []

    parent = 0
    idx = 0
    pos = [f32(1.0), f32(1.0), f32(1.0)]
    scale = S_MAX - 1
    scale_exp2 = f32(0.5)
    for i in range(3):
        if f32(1.5) * t_coef[i] - t_bias[i] > t_min:
            idx ^= 1 << i
            pos[i] = f32(1.5)

    stack: List[Optional[tuple]] = [None] * S_MAX
    hits: List[Hit] = []
    iters = 0

    while scale < S_MAX and iters < max_iters:
        iters += 1
        vm = (int(masks[parent]) >> 8) & 0xFF
        lm = int(masks[parent]) & 0xFF

        t_corner = [pos[i] * t_coef[i] - t_bias[i] for i in range(3)]
        tc_max = min(t_corner)

        # unmirrored (true) child slot: mirrored axes are those with the
        # octant_mask bit cleared, hence the extra ^7 (the reference's
        # hit_idx = idx ^ octant_mask ^ 7, NVIDIASVO.compute:176; its loop
        # folds the ^7 into a left-shift against bit 15)
        child_shift = idx ^ octant_mask ^ 7
        child_valid = (vm >> child_shift) & 1

        advanced = False
        if child_valid and t_min <= t_max:
            tv_max = min(t_max, tc_max)
            half = scale_exp2 * f32(0.5)
            t_center = [half * t_coef[i] + t_corner[i] for i in range(3)]
            if t_min <= tv_max:
                if (lm >> child_shift) & 1:
                    # leaf hit
                    rank = popcount(vm & lm & ((1 << child_shift) - 1))
                    leaf_id = int(leaf_base[parent]) + rank
                    hits.append(
                        Hit(
                            t=float(t_min),
                            leaf_id=leaf_id,
                            parent=parent,
                            child_shift=child_shift,
                            iters=iters,
                            voxel=_voxel_coords(pos, scale_exp2, octant_mask, depth),
                        )
                    )
                    if not collect_all:
                        return hits
                    # fall through to ADVANCE to continue past the leaf
                else:
                    # PUSH
                    if tc_max < h:
                        stack[scale] = (parent, t_max)
                    h = tc_max
                    rank = popcount(vm & ~lm & ((1 << child_shift) - 1))
                    parent = int(child_base[parent]) + rank
                    idx = 0
                    scale -= 1
                    scale_exp2 = half
                    for i in range(3):
                        if t_center[i] > t_min:
                            idx ^= 1 << i
                            pos[i] = pos[i] + scale_exp2
                    t_max = tv_max
                    advanced = True  # skip ADVANCE this iteration
        if advanced:
            continue

        # ADVANCE
        step_mask = 0
        for i in range(3):
            if t_corner[i] <= tc_max:
                step_mask ^= 1 << i
                pos[i] = pos[i] - scale_exp2
        t_min = max(t_min, tc_max)
        idx ^= step_mask

        if idx & step_mask:
            # POP: find the highest differing mantissa bit over stepped axes
            differing = 0
            for i in range(3):
                if (step_mask >> i) & 1:
                    differing |= f2i(pos[i]) ^ f2i(pos[i] + scale_exp2)
            scale = (f2i(np.float32(differing)) >> 23) - 127
            if scale >= S_MAX:
                break  # popped out of the root: miss
            scale_exp2 = i2f((scale - S_MAX + 127) << 23)
            entry = stack[scale]
            if entry is None:
                break
            parent, t_max = entry
            sh = [f2i(pos[i]) >> scale for i in range(3)]
            pos = [i2f(sh[i] << scale) for i in range(3)]
            idx = (sh[0] & 1) | ((sh[1] & 1) << 1) | ((sh[2] & 1) << 2)
            h = f32(0.0)

    return hits


def _voxel_coords(pos, scale_exp2, octant_mask, depth):
    """Integer finest-grid coords of the current (mirrored-space) voxel."""
    size = np.float32(2.0 ** -depth)
    out = []
    for i in range(3):
        p = pos[i]
        if not ((octant_mask >> i) & 1):  # axis was mirrored
            p = np.float32(3.0) - p - scale_exp2
        out.append(int(round((float(p) - 1.0) / float(size))))
    return tuple(out)
