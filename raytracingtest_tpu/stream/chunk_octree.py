"""Dynamic chunk octree — the host-side index of resident world chunks.

Parity with the reference's Octree over chunks (Assets/Scripts/Octree/
Octree.cs): the root grows toward out-of-bounds inserts (Octree.cs:11-25),
chunks insert by descent (:28-60), removals prune empty ancestors upward
(:62-80), the root simplifies back down when possible (:82-90), and the
resident set can be extracted as a sparse trunk (ExtractSparseOctree,
:92-113) — here compiled directly into the canonical packed SVO layout with
*chunks as leaves at their own LOD levels* (our format carries a leaf mask
at every level, so mixed-size chunks need no special casing).

This is control-plane code: pure Python/numpy, runs on the host, sized by
the number of resident chunks (hundreds), never by voxels.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import numpy as np

from raytracingtest_tpu.ops.octree import SVO, CHILD_OFFSETS


@dataclasses.dataclass
class ChunkNode:
    position: np.ndarray        # world coords of the low corner
    size: float
    children: Optional[list] = None   # 8 slots or None
    chunk: object = None              # payload for leaf chunks

    @property
    def is_leaf(self):
        return self.children is None


class ChunkOctree:
    """Grow/shrink octree keyed by world-space chunk AABBs (power-of-two
    sizes on a power-of-two lattice)."""

    def __init__(self, origin=(0.0, 0.0, 0.0), size=1.0):
        self.root = ChunkNode(np.asarray(origin, np.float64), float(size))
        self.n_chunks = 0

    # -- insert ----------------------------------------------------------
    def add_chunk(self, position, size, chunk) -> None:
        position = np.asarray(position, np.float64)
        while not self._contains(self.root, position, size):
            self._grow_towards(position)
        self._insert(self.root, position, float(size), chunk)
        self.n_chunks += 1

    def _contains(self, node, position, size):
        eps = 1e-9
        return bool(
            np.all(position >= node.position - eps)
            and np.all(position + size <= node.position + node.size + eps)
        )

    def _grow_towards(self, position):
        # re-root: the old root becomes the child of a 2x larger root whose
        # corner extends toward the target (Octree.cs:11-25)
        r = self.root
        dir_bits = [1 if position[i] < r.position[i] else 0 for i in range(3)]
        new_pos = r.position - np.array(
            [dir_bits[i] * r.size for i in range(3)])
        new_root = ChunkNode(new_pos, r.size * 2.0)
        new_root.children = [None] * 8
        slot = dir_bits[0] | (dir_bits[1] << 1) | (dir_bits[2] << 2)
        new_root.children[slot] = r
        self.root = new_root

    def _insert(self, node, position, size, chunk):
        if abs(node.size - size) < 1e-9:
            if node.chunk is not None:
                raise ValueError(f"chunk already present at {position}")
            node.chunk = chunk
            return
        if node.is_leaf:
            node.children = [None] * 8
        half = node.size * 0.5
        rel = (position - node.position) / half
        slot = (int(rel[0] >= 1.0 - 1e-9)
                | (int(rel[1] >= 1.0 - 1e-9) << 1)
                | (int(rel[2] >= 1.0 - 1e-9) << 2))
        if node.children[slot] is None:
            cpos = node.position + CHILD_OFFSETS[slot] * half
            node.children[slot] = ChunkNode(cpos.astype(np.float64), half)
        self._insert(node.children[slot], position, size, chunk)

    # -- remove ----------------------------------------------------------
    def remove_chunk(self, position, size) -> bool:
        removed = self._remove(self.root, np.asarray(position, np.float64),
                               float(size))
        if removed:
            self.n_chunks -= 1
            self._simplify_root()
        return removed

    def _remove(self, node, position, size):
        if abs(node.size - size) < 1e-9:
            if node.chunk is None:
                return False
            node.chunk = None
            return True
        if node.is_leaf:
            return False
        half = node.size * 0.5
        rel = (position - node.position) / half
        slot = (int(rel[0] >= 1.0 - 1e-9)
                | (int(rel[1] >= 1.0 - 1e-9) << 1)
                | (int(rel[2] >= 1.0 - 1e-9) << 2))
        child = node.children[slot]
        if child is None:
            return False
        ok = self._remove(child, position, size)
        if ok and child.chunk is None and (
                child.is_leaf or all(c is None for c in child.children)):
            node.children[slot] = None
        if ok and not node.is_leaf and all(c is None for c in node.children):
            node.children = None
        return ok

    def _simplify_root(self):
        # shrink the root while it has a single child subtree and no payload
        # (Octree.cs:82-90)
        while (not self.root.is_leaf and self.root.chunk is None):
            kids = [c for c in self.root.children if c is not None]
            if len(kids) != 1:
                break
            self.root = kids[0]

    # -- queries ---------------------------------------------------------
    def find_chunk(self, point):
        """Deepest chunk whose AABB contains the point (FindChunk,
        Octree.cs:115-148)."""
        node = self.root
        found = None
        point = np.asarray(point, np.float64)
        if not self._contains(node, point, 0.0):
            return None
        while node is not None:
            if node.chunk is not None:
                found = node.chunk
            if node.is_leaf:
                break
            half = node.size * 0.5
            rel = (point - node.position) / half
            slot = (int(rel[0] >= 1.0)
                    | (int(rel[1] >= 1.0) << 1)
                    | (int(rel[2] >= 1.0) << 2))
            node = node.children[slot]
        return found

    def chunks(self):
        out = []

        def rec(node):
            if node is None:
                return
            if node.chunk is not None:
                out.append((node.position.copy(), node.size, node.chunk))
            if not node.is_leaf:
                for c in node.children:
                    rec(c)

        rec(self.root)
        return out

    # -- trunk compilation ----------------------------------------------
    def extract_trunk(self) -> Tuple[SVO, list]:
        """Compile the resident-chunk tree into a packed trunk SVO whose
        leaves are the chunks (at their own levels), plus the leaf-aligned
        chunk payload table. The role of ExtractSparseOctree +
        NaiveCreator.Create(root, getLeaf) (Octree.cs:92-113,
        Clipmap.cs:153-169) — but compiled to the canonical absolute-pointer
        layout in one BFS pass."""
        # BFS over levels
        levels = [[self.root]]
        while True:
            nxt = []
            for node in levels[-1]:
                if node is not None and not node.is_leaf:
                    for k in range(8):
                        c = node.children[k]
                        if c is not None:
                            nxt.append(c)
            if not nxt:
                break
            levels.append(nxt)

        depth = len(levels)
        masks, child_base, leaf_base = [], [], []
        chunk_table = []
        level_start = [0]
        # level-order rows; a node with a chunk payload is a LEAF slot in
        # its parent, so the parent marks it in its leaf mask. The root
        # cannot be a leaf in this layout (it has no parent): a chunk on the
        # root is disallowed here (the clipmap never creates one).
        if self.root.chunk is not None:
            raise ValueError("root-level chunk not representable in trunk")

        row_of = {}
        flat = []
        for l, nodes in enumerate(levels):
            interior = [n for n in nodes if not n.is_leaf or n.chunk is None]
            # interior rows: nodes that appear as descriptor rows. A node
            # that is purely a chunk leaf (no children) gets no row.
            for n in nodes:
                if n.is_leaf and n.chunk is not None:
                    continue
                row_of[id(n)] = len(flat)
                flat.append(n)
            level_start.append(len(flat))

        n_rows = len(flat)
        masks = np.zeros(n_rows, np.int32)
        child_base = np.zeros(n_rows, np.int32)
        leaf_base = np.zeros(n_rows, np.int32)

        for n in flat:
            row = row_of[id(n)]
            if n.is_leaf:
                continue
            vm = 0
            lm = 0
            first_child = -1
            first_leaf = -1
            for k in range(8):
                c = n.children[k]
                if c is None:
                    continue
                vm |= 1 << k
                if c.is_leaf and c.chunk is not None:
                    lm |= 1 << k
                    if first_leaf < 0:
                        first_leaf = len(chunk_table)
                    chunk_table.append((c.position.copy(), c.size, c.chunk))
                elif c.chunk is not None:
                    raise ValueError(
                        "chunk on an interior trunk node is unsupported")
                else:
                    if first_child < 0:
                        first_child = row_of[id(c)]
            masks[row] = (vm << 8) | lm
            child_base[row] = max(first_child, 0)
            leaf_base[row] = max(first_leaf, 0)

        n_chunks = len(chunk_table)
        svo = SVO(
            masks=masks, child_base=child_base, leaf_base=leaf_base,
            leaf_albedo=np.zeros((n_chunks, 3), np.float32),
            leaf_normal=np.zeros((n_chunks, 3), np.float32),
            leaf_density=np.ones(n_chunks, np.float32),
            depth=depth,
            level_start=tuple(level_start),
        )
        return svo, chunk_table
