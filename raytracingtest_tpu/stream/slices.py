"""Slice-based incremental SVO construction.

Parity with the reference's slice pipeline (SURVEY.md §2.6):

  * occupancy_pyramid == SliceGenerator.GetSlices
    (Assets/Scripts/SliceBasedSVO/SliceGenerator.cs:13-69): finest level
    sampled in Morton order with the solid-and-has-air-neighbor test, coarser
    levels by 8-child OR-downsampling. Returned per level as Morton-ordered
    bit arrays.
  * extend_svo == SliceBasedSVO.AddSlice
    (Assets/Scripts/SliceBasedSVO/SliceBasedSVO.cs:59-109): append one level
    of detail to an existing SVO. The reference DFS-appends descriptors at
    the block end and patches parents in place (creating its RT.SL vs RT.CS
    pointer-layout divergence, SURVEY.md §7.3.8); here the breadth-first
    level layout makes the append a pure array operation — the old bottom
    node level flips its leaf bits to child pointers, one new node level and
    a new leaf set are computed vectorized, and all invariants of the
    canonical layout are preserved exactly (verified byte-identical to a
    from-scratch deeper build).

This also bounds construction memory by one level at a time — the role the
slice pipeline plays in the reference (SURVEY.md §5 long-context analog).
"""

from __future__ import annotations

import numpy as np

from raytracingtest_tpu.ops.morton import morton_encode
from raytracingtest_tpu.ops.octree import (
    SVO, BuildResult, CHILD_OFFSETS, build_svo, default_albedo, sampler_normal,
)

_SQRT3 = float(np.sqrt(3.0))


def occupancy_pyramid(scene, depth: int):
    """Full mip pyramid of boolean occupancy, Morton-ordered per level.

    Returns [level 0 .. level depth] where level l is a bool array of length
    8^l in Morton order; level `depth` uses the exact leaf test (solid and
    has-air-neighbor), coarser levels are OR-downsamples. Dense (8^depth
    work) like the reference — use for depth <= 8."""
    R = 1 << depth
    finest = 1.0 / R
    idx = np.arange(R)
    cx, cy, cz = np.meshgrid(idx, idx, idx, indexing="ij")
    code = morton_encode(
        cx.ravel().astype(np.uint32), cy.ravel().astype(np.uint32),
        cz.ravel().astype(np.uint32))
    order = np.argsort(code)  # Morton-ordered cell visit (SliceGenerator.cs:30)
    px = ((cx.ravel()[order] + 0.5) * finest).astype(np.float32)
    py = ((cy.ravel()[order] + 0.5) * finest).astype(np.float32)
    pz = ((cz.ravel()[order] + 0.5) * finest).astype(np.float32)

    f0 = np.asarray(scene(px, py, pz, xp=np), np.float32)
    solid = f0 <= 0.0
    air = np.zeros_like(solid)
    d = np.float32(finest)
    for ax, sgn in ((0, d), (0, -d), (1, d), (1, -d), (2, d), (2, -d)):
        off = [px, py, pz]
        off[ax] = off[ax] + sgn
        air |= np.asarray(scene(off[0], off[1], off[2], xp=np), np.float32) > 0.0
    finest_occ = solid & air

    pyramid = [None] * (depth + 1)
    pyramid[depth] = finest_occ
    for l in range(depth - 1, -1, -1):
        # Morton order makes children of one parent contiguous: OR over 8s
        pyramid[l] = pyramid[l + 1].reshape(-1, 8).any(axis=1)
    return pyramid


def extend_svo(result: BuildResult, scene) -> BuildResult:
    """Add one level of detail to an existing build (depth k -> k+1).

    The stored finest candidate frontier (post Lipschitz prune, pre leaf
    test) is expanded one level, pruned with the same Lipschitz bound, and
    leaf-tested exactly; the whole mask/pointer hierarchy above is then
    rebuilt from survival — including *resurrecting* octants that had no
    leaves at the coarse depth but gain some at the finer one. The output is
    byte-identical to a from-scratch build at depth k+1 (tested), which the
    reference's frontier-patching AddSlice cannot guarantee
    (SliceBasedSVO.cs:68-109)."""
    svo = result.svo
    depth = svo.depth
    new_depth = depth + 1
    finest = 2.0 ** (-new_depth)
    L = float(scene.lipschitz)

    # ---- expand the candidate frontier one level (build_svo phase A) ----
    frontier = result.frontier_coords.astype(np.int64)
    cc = (frontier[:, None, :] * 2 + CHILD_OFFSETS[None, :, :]).reshape(-1, 3)
    half = 2.0 ** (-(new_depth + 1))
    center = (cc.astype(np.float64) + 0.5) * finest
    px = center[:, 0].astype(np.float32)
    py = center[:, 1].astype(np.float32)
    pz = center[:, 2].astype(np.float32)
    f = np.asarray(scene(px, py, pz, xp=np), np.float32)
    r = _SQRT3 * half
    keep = (f <= L * r + 1e-6) & (f >= -(L * (r + 2.0 * finest)) - 1e-6)
    cc, px, py, pz = cc[keep], px[keep], py[keep], pz[keep]

    # ---- exact leaf test (phase B) --------------------------------------
    f0 = np.asarray(scene(px, py, pz, xp=np), np.float32)
    solid = f0 <= 0.0
    air = np.zeros_like(solid)
    d = np.float32(finest)
    for ax, sgn in ((0, d), (0, -d), (1, d), (1, -d), (2, d), (2, -d)):
        off = [px, py, pz]
        off[ax] = off[ax] + sgn
        air |= np.asarray(scene(off[0], off[1], off[2], xp=np), np.float32) > 0.0
    new_leaf = solid & air

    # ---- upward survival rebuild with resurrection ----------------------
    # Level sets are rebuilt as the union of the old node set and the
    # parents of surviving finer entries (sorted by Morton, deduped).
    level_sets = [None] * (new_depth + 1)
    survive = [None] * (new_depth + 1)
    level_sets[new_depth] = cc
    survive[new_depth] = new_leaf
    valid_masks = [None] * new_depth
    old_nodes = result.node_coords  # levels 0..depth-1

    for l in range(new_depth - 1, -1, -1):
        child_cc = level_sets[l + 1]
        s_child = survive[l + 1]
        parents = np.unique(_morton_of(child_cc[s_child] // 2))
        if l < depth:
            old_m = _morton_of(old_nodes[l].astype(np.int64))
            allm = np.unique(np.concatenate([old_m, parents]))
        else:
            allm = parents
        # decode morton back to coords
        from raytracingtest_tpu.ops.morton import morton_decode64
        xs, ys, zs = morton_decode64(allm)
        lvl_cc = np.stack([xs, ys, zs], axis=1).astype(np.int64)
        level_sets[l] = lvl_cc

        slot = (
            (child_cc[:, 0] & 1) | ((child_cc[:, 1] & 1) << 1)
            | ((child_cc[:, 2] & 1) << 2)
        ).astype(np.int32)
        pidx = np.searchsorted(allm, _morton_of(child_cc // 2))
        vm = np.zeros(lvl_cc.shape[0], np.int32)
        np.bitwise_or.at(vm, pidx[s_child], np.int32(1) << slot[s_child])
        valid_masks[l] = vm
        survive[l] = vm != 0
    survive[0][0] = True

    # ---- compaction + pointer assembly (same as build_svo phase C) ------
    new_idx = [np.cumsum(s, dtype=np.int64) - 1 for s in survive[:new_depth]]
    level_counts = [int(s.sum()) for s in survive[:new_depth]]
    leaf_idx = np.cumsum(survive[new_depth], dtype=np.int64) - 1
    n_leaves = int(survive[new_depth].sum())

    level_start = np.zeros(new_depth + 1, np.int64)
    np.cumsum(level_counts, out=level_start[1:])
    n_nodes = int(level_start[-1])

    out_masks = np.zeros(n_nodes, np.int32)
    out_child = np.zeros(n_nodes, np.int32)
    out_leaf = np.zeros(n_nodes, np.int32)
    node_coords = []
    big = np.int64(1) << 60
    for l in range(new_depth):
        s = survive[l]
        rows = level_start[l] + new_idx[l][s]
        vmx = valid_masks[l][s]
        node_coords.append(level_sets[l][s].astype(np.int32))
        child_cc = level_sets[l + 1]
        pidx = np.searchsorted(_morton_of(level_sets[l]), _morton_of(child_cc // 2))
        if l == new_depth - 1:
            out_masks[rows] = (vmx << 8) | vmx
            fb = np.full(level_sets[l].shape[0], big)
            sc = survive[new_depth]
            np.minimum.at(fb, pidx[sc], leaf_idx[sc])
            out_leaf[rows] = np.where(fb[s] >= big, 0, fb[s]).astype(np.int32)
        else:
            out_masks[rows] = vmx << 8
            fb = np.full(level_sets[l].shape[0], big)
            sc = survive[l + 1]
            np.minimum.at(fb, pidx[sc], level_start[l + 1] + new_idx[l + 1][sc])
            out_child[rows] = np.where(fb[s] >= big, 0, fb[s]).astype(np.int32)

    sl_mask = survive[new_depth]
    new_leaf_cc = cc[sl_mask]
    lpx, lpy, lpz = px[sl_mask], py[sl_mask], pz[sl_mask]
    albedo = default_albedo(lpx, lpy, lpz, xp=np).astype(np.float32)
    normal = sampler_normal(scene, lpx, lpy, lpz, xp=np).astype(np.float32)

    new_svo = SVO(
        masks=out_masks, child_base=out_child, leaf_base=out_leaf,
        leaf_albedo=albedo, leaf_normal=normal,
        leaf_density=np.ones(n_leaves, np.float32),
        depth=new_depth,
        level_start=tuple(int(v) for v in level_start),
    )
    return BuildResult(
        svo=new_svo, leaf_coords=new_leaf_cc.astype(np.int32),
        node_coords=node_coords,
        n_candidates=result.n_candidates + [cc.shape[0]],
        frontier_coords=cc.astype(np.int32),
    )


def _morton_of(cc):
    cc = np.asarray(cc)
    from raytracingtest_tpu.ops.morton import morton_encode64
    return morton_encode64(
        cc[:, 0].astype(np.uint64), cc[:, 1].astype(np.uint64),
        cc[:, 2].astype(np.uint64))
