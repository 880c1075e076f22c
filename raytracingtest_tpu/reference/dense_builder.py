"""Brute-force dense SVO builder — construction-correctness oracle.

Mirrors the reference's exhaustive recursive build semantics
(Assets/Scripts/SVO/CompactSVO/NaiveCreator.cs:52-130: visit all 8^depth
cells; leaf iff sample(center) <= 0 and a six-neighbor air probe at one
voxel-size distance passes) with the simplest possible implementation:
sample the full (R+2)^3 extended center grid, compute exact leaf occupancy,
then emit nodes by a tiny recursive walk over the occupancy mip pyramid.

Deliberately independent of ops/octree.py's frontier/prune/scatter machinery
so the two builders cross-check each other (the role the reference's
GetAllNodesTest golden strings play, Assets/Tests/SVOTests.cs:44-74).
Only usable for small depths (<= 6).
"""

from __future__ import annotations

import numpy as np

from raytracingtest_tpu.ops.octree import (
    SVO, BuildResult, CHILD_OFFSETS, default_albedo, sampler_normal,
)


def dense_build(scene, depth: int) -> BuildResult:
    R = 1 << depth
    finest = 1.0 / R
    # extended center grid: indices -1 .. R (inclusive) per axis
    idx = np.arange(-1, R + 1)
    cx, cy, cz = np.meshgrid(idx, idx, idx, indexing="ij")
    px = ((cx + 0.5) * finest).astype(np.float32)
    py = ((cy + 0.5) * finest).astype(np.float32)
    pz = ((cz + 0.5) * finest).astype(np.float32)
    f = np.asarray(scene(px, py, pz, xp=np), np.float32)

    solid_ext = f <= 0.0
    inner = solid_ext[1:-1, 1:-1, 1:-1]
    air = np.zeros_like(inner)
    air |= ~solid_ext[:-2, 1:-1, 1:-1]
    air |= ~solid_ext[2:, 1:-1, 1:-1]
    air |= ~solid_ext[1:-1, :-2, 1:-1]
    air |= ~solid_ext[1:-1, 2:, 1:-1]
    air |= ~solid_ext[1:-1, 1:-1, :-2]
    air |= ~solid_ext[1:-1, 1:-1, 2:]
    leaf_occ = inner & air  # (R, R, R) exact leaf occupancy

    # occupancy pyramid: pyr[l] has shape (2^l,)*3; pyr[depth] = leaf_occ
    pyr = [None] * (depth + 1)
    pyr[depth] = leaf_occ
    for l in range(depth - 1, -1, -1):
        s = pyr[l + 1]
        n = s.shape[0] // 2
        pyr[l] = s.reshape(n, 2, n, 2, n, 2).any(axis=(1, 3, 5))

    # BFS node emission, parent-major / Morton child order per level
    node_coords = [np.zeros((1, 3), np.int32)]
    for l in range(1, depth):
        out = []
        for c in node_coords[l - 1]:
            for k in range(8):
                cc = c * 2 + CHILD_OFFSETS[k]
                if pyr[l][tuple(cc)]:
                    out.append(cc)
        node_coords.append(
            np.array(out, np.int32) if out else np.zeros((0, 3), np.int32)
        )

    level_counts = [nc.shape[0] for nc in node_coords]
    level_start = np.concatenate([[0], np.cumsum(level_counts)])
    n_nodes = int(level_start[-1])

    masks = np.zeros(n_nodes, np.int32)
    child_base = np.zeros(n_nodes, np.int32)
    leaf_base = np.zeros(n_nodes, np.int32)
    leaf_list = []

    next_child = [int(level_start[l]) for l in range(depth + 1)]
    n_leaves_so_far = 0
    for l in range(depth):
        for i, c in enumerate(node_coords[l]):
            row = int(level_start[l]) + i
            vm = 0
            first_child = -1
            first_leaf = -1
            for k in range(8):
                cc = c * 2 + CHILD_OFFSETS[k]
                if pyr[l + 1][tuple(cc)]:
                    vm |= 1 << k
                    if l == depth - 1:
                        if first_leaf < 0:
                            first_leaf = n_leaves_so_far
                        n_leaves_so_far += 1
                        leaf_list.append(cc)
                    else:
                        if first_child < 0:
                            first_child = next_child[l + 1]
                        next_child[l + 1] += 1
            if l == depth - 1:
                masks[row] = (vm << 8) | vm
                leaf_base[row] = max(first_leaf, 0)
            else:
                masks[row] = vm << 8
                child_base[row] = max(first_child, 0)

    leaf_cc = (
        np.array(leaf_list, np.int32) if leaf_list else np.zeros((0, 3), np.int32)
    )
    lp = (leaf_cc.astype(np.float32) + 0.5) * finest
    albedo = default_albedo(lp[:, 0], lp[:, 1], lp[:, 2], xp=np).astype(np.float32)
    normal = sampler_normal(scene, lp[:, 0], lp[:, 1], lp[:, 2], xp=np).astype(
        np.float32
    )

    svo = SVO(
        masks=masks,
        child_base=child_base,
        leaf_base=leaf_base,
        leaf_albedo=albedo,
        leaf_normal=normal,
        leaf_density=np.ones(leaf_cc.shape[0], np.float32),
        depth=depth,
        level_start=tuple(int(v) for v in level_start),
    )
    gx, gy, gz = np.meshgrid(np.arange(R), np.arange(R), np.arange(R),
                             indexing="ij")
    from raytracingtest_tpu.ops.morton import morton_encode
    codes = morton_encode(gx.ravel().astype(np.uint32),
                          gy.ravel().astype(np.uint32),
                          gz.ravel().astype(np.uint32))
    order = np.argsort(codes)
    frontier = np.stack([gx.ravel()[order], gy.ravel()[order],
                         gz.ravel()[order]], axis=1).astype(np.int32)
    return BuildResult(
        svo=svo, leaf_coords=leaf_cc, node_coords=node_coords,
        n_candidates=[8 ** l for l in range(depth + 1)],
        frontier_coords=frontier,
    )
