"""SVO data model + hierarchical builder (pointer-free, breadth-first, vectorized).

Replaces the reference's recursive pointer-tree construction
(Assets/Scripts/SVO/CompactSVO/NaiveCreator.cs:52-193) with a TPU-idiomatic
design: the octree is a struct-of-arrays over *levels*, built by a frontier
sweep of vectorized per-level passes instead of 8^depth scalar recursion.

Canonical node layout (SURVEY.md §7.3.8 — one layout, absolute pointers):

  masks[i]      int32  (valid_mask << 8) | leaf_mask   — same 8+8 mask split as
                        the ESVO child descriptor (NaiveCreator.cs:184-187,
                        Trace.cu), but the 16-bit *relative* child pointer is
                        replaced by two absolute int32 indices:
  child_base[i] int32  flat node index of this node's first non-leaf child
  leaf_base[i]  int32  index of this node's first leaf child in the leaf
                        attribute arrays

Children are packed contiguously in Morton child order (x fastest — the
reference's `vfoffsets`, Constants.cs:23-26); a specific child is found with
popcount-rank exactly as in ESVO:

  node_child  k: child_base[i] + popcount(valid & ~leaf & ((1<<k)-1))
  leaf_child  k: leaf_base[i]  + popcount(valid &  leaf & ((1<<k)-1))

Build semantics match the reference (NaiveCreator.cs:52-130): a finest-level
voxel is a leaf iff sample(center) <= 0 AND it has at least one of its six
axis neighbors (probed at one voxel-size distance) with sample > 0; interior
nodes exist iff their subtree contains a leaf; leaf normals are
central-difference gradients of the sampler; leaf colors are position-derived
(the reference's SinColor palette, Misc.cs:120-126).

Scaling: instead of visiting all 8^depth cells, the downward sweep prunes
octants using the scene's Lipschitz bound — an octant is kept only if the
surface *can* pass within it (|f(center)| small enough). This keeps the
frontier O(surface area * 4^level) and makes depth 10-12 tractable.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp

_SQRT3 = float(np.sqrt(3.0))

# Morton child order: slot k -> offset ((k>>0)&1, (k>>1)&1, (k>>2)&1).
CHILD_OFFSETS = np.array(
    [[(k >> 0) & 1, (k >> 1) & 1, (k >> 2) & 1] for k in range(8)], dtype=np.int32
)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SVO:
    """Packed sparse voxel octree as a JAX pytree.

    Array fields are data (device arrays under jit); depth and counts are
    static metadata. The root node is index 0; level l's nodes occupy
    [level_start[l], level_start[l+1]) for l in 0..depth-1. Leaves carry no
    descriptors — only attribute rows.
    """

    masks: Any        # int32 [n_nodes]   (valid<<8)|leaf
    child_base: Any   # int32 [n_nodes]
    leaf_base: Any    # int32 [n_nodes]
    leaf_albedo: Any  # float32 [n_leaves, 3]
    leaf_normal: Any  # float32 [n_leaves, 3]  unit outward normals
    leaf_density: Any  # float32 [n_leaves]    for volumetric/diff rendering
    depth: int = dataclasses.field(metadata=dict(static=True))
    level_start: tuple = dataclasses.field(metadata=dict(static=True))

    @property
    def n_nodes(self) -> int:
        return int(self.level_start[-1])

    @property
    def n_leaves(self) -> int:
        return self.leaf_albedo.shape[0]

    def device(self) -> "SVO":
        """Move arrays to jnp (device) arrays."""
        return SVO(
            masks=jnp.asarray(self.masks),
            child_base=jnp.asarray(self.child_base),
            leaf_base=jnp.asarray(self.leaf_base),
            leaf_albedo=jnp.asarray(self.leaf_albedo),
            leaf_normal=jnp.asarray(self.leaf_normal),
            leaf_density=jnp.asarray(self.leaf_density),
            depth=self.depth,
            level_start=self.level_start,
        )


@dataclasses.dataclass
class BuildResult:
    """Builder output: the SVO plus host-side debris useful for tests/IO.

    frontier_coords is the finest-level *candidate* set (post Lipschitz
    pruning, pre leaf test) — the slice pipeline (stream/slices.py) refines
    it so an incremental extend reproduces a fresh deeper build exactly.
    """

    svo: SVO
    leaf_coords: np.ndarray  # int32 [n_leaves, 3] finest-grid integer coords
    node_coords: list        # per level: int32 [n_l, 3] octant coords
    n_candidates: list       # per level candidate counts (pre-prune), for stats
    frontier_coords: np.ndarray = None  # int32 [n_cand, 3] finest candidates


def default_albedo(px, py, pz, xp=np):
    """Position-derived rainbow palette (reference SinColor, Misc.cs:120-126)."""
    px = xp.asarray(px, xp.float32)
    py = xp.asarray(py, xp.float32)
    pz = xp.asarray(pz, xp.float32)
    t = px * 3.1 + py * 5.3 + pz * 7.9
    r = 0.5 + 0.5 * xp.sin(6.0 * t)
    g = 0.5 + 0.5 * xp.sin(6.0 * t + 2.094)
    b = 0.5 + 0.5 * xp.sin(6.0 * t + 4.188)
    return xp.stack([r, g, b], axis=-1)


def sampler_normal(scene, px, py, pz, h=1e-3, xp=np):
    """Central-difference gradient normal (reference NaiveCreator.cs:58-63,
    which uses one-sided differences at h=0.001; central is strictly better)."""
    fx = scene(px + h, py, pz, xp=xp) - scene(px - h, py, pz, xp=xp)
    fy = scene(px, py + h, pz, xp=xp) - scene(px, py - h, pz, xp=xp)
    fz = scene(px, py, pz + h, xp=xp) - scene(px, py, pz - h, xp=xp)
    n = xp.stack([fx, fy, fz], axis=-1)
    norm = xp.sqrt(xp.sum(n * n, axis=-1, keepdims=True))
    return n / xp.maximum(norm, 1e-12)


def build_svo(scene, depth: int, prune: bool = True) -> BuildResult:
    """Build a packed SVO from a signed-density scene.

    Host-side (numpy) frontier build; per-level passes are fully vectorized.
    With prune=True uses the scene's Lipschitz bound to skip empty/deep-solid
    octants; with prune=False expands every octant (exact, 8^depth work —
    use only for small depths in tests).
    """
    if depth < 1:
        raise ValueError("depth must be >= 1")
    L = float(scene.lipschitz)
    finest = 2.0 ** (-depth)

    # ---- Phase A: downward frontier sweep -------------------------------
    # coords[l]: int32 [n_l, 3] candidate octant coords at level l (Morton-
    # sorted); parent_of[l]: index into coords[l-1]; slot_of[l]: child slot.
    coords = [np.zeros((1, 3), np.int32)]
    parent_of = [np.zeros((1,), np.int64)]
    slot_of = [np.zeros((1,), np.int32)]
    n_candidates = [1]

    for l in range(1, depth + 1):
        p = coords[l - 1]
        n_p = p.shape[0]
        # expand: children in Morton child order, parent-major
        cc = (p[:, None, :] * 2 + CHILD_OFFSETS[None, :, :]).reshape(-1, 3)
        par = np.repeat(np.arange(n_p, dtype=np.int64), 8)
        slot = np.tile(np.arange(8, dtype=np.int32), n_p)
        if prune:
            half = 2.0 ** (-(l + 1))
            center = (cc.astype(np.float64) + 0.5) * (2.0 ** (-l))
            f = np.asarray(
                scene(
                    center[:, 0].astype(np.float32),
                    center[:, 1].astype(np.float32),
                    center[:, 2].astype(np.float32),
                    xp=np,
                ),
                np.float32,
            )
            # Octant can contain a solid voxel center: f(center) <= L*r
            # Octant can contain a voxel with an air neighbor (neighbor probe
            # reaches one voxel size outside): f(center) >= -L*(r + 2*finest)
            r = _SQRT3 * half
            keep = (f <= L * r + 1e-6) & (f >= -(L * (r + 2.0 * finest)) - 1e-6)
            cc, par, slot = cc[keep], par[keep], slot[keep]
        coords.append(cc)
        parent_of.append(par)
        slot_of.append(slot)
        n_candidates.append(cc.shape[0])

    # ---- Phase B: exact leaf test at the finest level -------------------
    cc = coords[depth]
    center = (cc.astype(np.float64) + 0.5) * finest
    px = center[:, 0].astype(np.float32)
    py = center[:, 1].astype(np.float32)
    pz = center[:, 2].astype(np.float32)
    f0 = np.asarray(scene(px, py, pz, xp=np), np.float32)
    solid = f0 <= 0.0
    # six-neighbor air probe at one voxel-size distance
    # (reference IsEdge, NaiveCreator.cs:121-130)
    air = np.zeros_like(solid)
    d = np.float32(finest)
    for ax, sgn in ((0, d), (0, -d), (1, d), (1, -d), (2, d), (2, -d)):
        off = [px, py, pz]
        off[ax] = off[ax] + sgn
        air |= np.asarray(scene(off[0], off[1], off[2], xp=np), np.float32) > 0.0
    survive_leaf = solid & air

    # ---- Phase C: upward pruning + mask/pointer assembly ----------------
    # survive[l]: bool over candidates at level l; masks assembled per level.
    survive = [None] * (depth + 1)
    survive[depth] = survive_leaf
    valid_masks = [None] * depth  # for node levels 0..depth-1
    for l in range(depth - 1, -1, -1):
        n_c = coords[l].shape[0]
        vm = np.zeros(n_c, np.int32)
        s_child = survive[l + 1]
        np.bitwise_or.at(
            vm, parent_of[l + 1][s_child],
            (np.int32(1) << slot_of[l + 1][s_child]),
        )
        valid_masks[l] = vm
        survive[l] = vm != 0
    # Always keep the root (possibly with an empty valid mask) so traversal
    # has a well-formed entry point even for empty scenes.
    survive[0][0] = True

    # Compact per-level node indices.
    new_idx = [None] * (depth + 1)
    level_counts = []
    for l in range(depth):
        s = survive[l]
        ni = np.cumsum(s, dtype=np.int64) - 1
        new_idx[l] = ni
        level_counts.append(int(s.sum()))
    # leaf indices at finest level
    s = survive[depth]
    leaf_idx = np.cumsum(s, dtype=np.int64) - 1
    n_leaves = int(s.sum())

    level_start = np.zeros(depth + 1, np.int64)
    np.cumsum(level_counts, out=level_start[1:])

    n_nodes = int(level_start[-1])
    masks = np.zeros(n_nodes, np.int32)
    child_base = np.zeros(n_nodes, np.int32)
    leaf_base = np.zeros(n_nodes, np.int32)
    node_coords = []

    big = np.int64(1) << 60
    for l in range(depth):
        s = survive[l]
        rows = level_start[l] + new_idx[l][s]
        vm = valid_masks[l][s]
        node_coords.append(coords[l][s])
        if l == depth - 1:
            # all children are leaves
            masks[rows] = (vm << 8) | vm
            # first leaf child's index in the global leaf array
            fb = np.full(coords[l].shape[0], big)
            sc = survive[depth]
            np.minimum.at(fb, parent_of[depth][sc], leaf_idx[sc])
            leaf_base[rows] = np.where(fb[s] >= big, 0, fb[s]).astype(np.int32)
        else:
            masks[rows] = vm << 8
            fb = np.full(coords[l].shape[0], big)
            sc = survive[l + 1]
            np.minimum.at(
                fb, parent_of[l + 1][sc], level_start[l + 1] + new_idx[l + 1][sc]
            )
            child_base[rows] = np.where(fb[s] >= big, 0, fb[s]).astype(np.int32)

    # ---- Leaf attributes -------------------------------------------------
    sl = survive[depth]
    leaf_cc = cc[sl]
    lpx, lpy, lpz = px[sl], py[sl], pz[sl]
    albedo = default_albedo(lpx, lpy, lpz, xp=np).astype(np.float32)
    normal = sampler_normal(scene, lpx, lpy, lpz, xp=np).astype(np.float32)
    density = np.ones(n_leaves, np.float32)

    svo = SVO(
        masks=masks,
        child_base=child_base,
        leaf_base=leaf_base,
        leaf_albedo=albedo,
        leaf_normal=normal,
        leaf_density=density,
        depth=depth,
        level_start=tuple(int(v) for v in level_start),
    )
    return BuildResult(
        svo=svo,
        leaf_coords=leaf_cc.astype(np.int32),
        node_coords=node_coords,
        n_candidates=n_candidates,
        frontier_coords=cc.astype(np.int32),
    )
