"""Clipmap streaming: camera-centered LOD rings of chunk SVOs in a device
arena, stitched under a trunk SVO and traced in two phases.

Reference parity (SURVEY.md §2.5, §3.4):

  * Arena == the preallocated GPU buffers with offset uploads
    (RaytracingMaster.cs:111-135: one 512 MiB descriptor arena, chunk blocks
    written at fixed offsets). Here: flat device arrays with a bump/free-list
    allocator; uploading a chunk rebases its absolute child/leaf pointers by
    the allocated offsets — offset-patching that the reference does by
    redirecting leaf pointers at compile time (NaiveCreator.cs:156-158).
  * Clipmap == Clipmap.cs: per-LOD chunk size minimumChunkSize * 2^lod,
    camera position snapped to a 2*chunkSize grid (Clipmap.cs:60-68),
    early-out when the snap is unchanged (:70-76), inner-LOD bounds skipped
    at coarser levels (:94-96), eviction of chunks not refreshed this update
    (:104-119,140-151). (The reference's wrapped torus array :98-100 is a
    GPU-address-space trick; the host-side resident set here is a dict keyed
    by lod+chunk coords with identical membership semantics.)
  * trace_clipmap == Clipmap.compute's IntersectClipmap (chunk-offset rays
    into IntersectSVO, loop-capped, Clipmap.compute:10-25) — but as a
    vectorized two-phase traversal: phase 1 traces the trunk SVO whose
    leaves are chunks, phase 2 traces the hit chunk inside the arena with a
    per-ray root; on a chunk miss the ray advances past the chunk's AABB and
    re-enters phase 1 (hard-capped like the reference).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from raytracingtest_tpu.ops import traverse
from raytracingtest_tpu.ops.octree import SVO, build_svo
from raytracingtest_tpu.scenes import Scene
from raytracingtest_tpu.stream.chunk_octree import ChunkOctree




def _alloc_range(free_list, n):
    """First-fit allocation from a sorted (offset, length) free list."""
    for i, (off, length) in enumerate(free_list):
        if length >= n:
            if length == n:
                free_list.pop(i)
            else:
                free_list[i] = (off + n, length - n)
            return off
    raise MemoryError(f"arena exhausted: need {n}")


def _free_range(free_list, off, n):
    free_list.append((off, n))
    # coalesce adjacent ranges
    free_list.sort()
    merged = []
    for o, l in free_list:
        if merged and merged[-1][0] + merged[-1][1] == o:
            merged[-1] = (merged[-1][0], merged[-1][1] + l)
        else:
            merged.append((o, l))
    free_list[:] = merged


@dataclasses.dataclass
class Chunk:
    """Resident chunk record (parity: Chunk.cs:3-12)."""

    position: np.ndarray   # world low corner
    size: float
    lod: int
    creation_time: int
    node_offset: int
    n_nodes: int
    leaf_offset: int
    n_leaves: int
    depth: int
    level_start: tuple
    # brick-arena placement (0-sized when no BrickArena is attached)
    top_offset: int = 0
    n_top: int = 0
    brick_offset: int = 0
    n_bricks: int = 0
    # chunk-local morton occupancy of the brick-cut cells (uint32 bit
    # words; set when a BrickArena is attached) — the per-chunk input to
    # Clipmap.master_tile()'s stitched occupancy pyramid
    cell_occ: Optional[np.ndarray] = None


class Arena:
    """Flat SVO arena: every resident chunk's node/leaf rows live in shared
    arrays so one traversal kernel serves all chunks (per-ray roots)."""

    def __init__(self, node_capacity: int, leaf_capacity: int):
        self.node_capacity = node_capacity
        self.leaf_capacity = leaf_capacity
        self.masks = np.zeros(node_capacity, np.int32)
        self.child_base = np.zeros(node_capacity, np.int32)
        self.leaf_base = np.zeros(node_capacity, np.int32)
        self.leaf_albedo = np.zeros((leaf_capacity, 3), np.float32)
        self.leaf_normal = np.zeros((leaf_capacity, 3), np.float32)
        self.leaf_density = np.zeros(leaf_capacity, np.float32)
        self._free_nodes = [(0, node_capacity)]
        self._free_leaves = [(0, leaf_capacity)]
        # dirty spans since the last DeviceArena.sync(): (node_off, n_nodes,
        # leaf_off, n_leaves)
        self.dirty: list = []

    def _alloc(self, free_list, n):
        return _alloc_range(free_list, n)

    def _free(self, free_list, off, n):
        _free_range(free_list, off, n)

    def upload(self, svo: SVO):
        """Place a chunk SVO into the arena, rebasing its absolute child and
        leaf pointers by the allocated offsets. Returns (node_off, leaf_off)."""
        n_nodes = svo.n_nodes
        n_leaves = svo.n_leaves
        node_off = self._alloc(self._free_nodes, max(n_nodes, 1))
        leaf_off = self._alloc(self._free_leaves, max(n_leaves, 1))
        masks = np.asarray(svo.masks)
        sl = slice(node_off, node_off + n_nodes)
        self.masks[sl] = masks
        self.child_base[sl] = np.where(
            (masks >> 8) & ~masks & 0xFF, np.asarray(svo.child_base) + node_off, 0)
        self.leaf_base[sl] = np.where(
            masks & 0xFF, np.asarray(svo.leaf_base) + leaf_off, 0)
        ll = slice(leaf_off, leaf_off + n_leaves)
        self.leaf_albedo[ll] = np.asarray(svo.leaf_albedo)
        self.leaf_normal[ll] = np.asarray(svo.leaf_normal)
        self.leaf_density[ll] = np.asarray(svo.leaf_density)
        self.dirty.append((node_off, n_nodes, leaf_off, n_leaves))
        return node_off, leaf_off

    def free(self, chunk: Chunk):
        self._free(self._free_nodes, chunk.node_offset, max(chunk.n_nodes, 1))
        self._free(self._free_leaves, chunk.leaf_offset, max(chunk.n_leaves, 1))

    @property
    def nodes_used(self):
        return self.node_capacity - sum(l for _, l in self._free_nodes)


class BrickArena:
    """Brick-decomposed twin of Arena: each resident chunk's BrickSVO
    (ops/brick.py: top tree + 512-bit occupancy bricks) lives in shared
    flat arrays, so the PRODUCTION brick traversal serves every chunk with
    per-ray roots — the streamed world on the hot path (VERDICT r03
    missing 1). Leaf attribute rows stay in the companion Arena; brick
    leaf bases are rebased to its leaf offsets at upload."""

    def __init__(self, top_capacity: int, brick_capacity: int):
        self.top_capacity = top_capacity
        self.brick_capacity = brick_capacity
        self.top_masks = np.zeros(top_capacity, np.int32)
        self.top_child = np.zeros(top_capacity, np.int32)
        self.top_parent = np.zeros(top_capacity, np.int32)
        self.bricks = np.zeros((brick_capacity, 17), np.uint32)
        self._free_top = [(0, top_capacity)]
        self._free_bricks = [(0, brick_capacity)]
        # dirty spans since the last DeviceBrickArena.sync():
        # (top_off, n_top, brick_off, n_bricks)
        self.dirty: list = []

    def upload(self, svo: SVO, leaf_off: int):
        """Brick-decompose a chunk SVO into the arena; absolute pointers are
        rebased by the allocated offsets (interior child rows by top_off,
        cut-level rows by brick_off, brick leaf bases by leaf_off)."""
        from raytracingtest_tpu.ops.brick import make_brick_svo
        bs = make_brick_svo(svo)
        n_top, n_bricks = bs.n_top, bs.n_bricks
        top_off = _alloc_range(self._free_top, max(n_top, 1))
        brick_off = _alloc_range(self._free_bricks, max(n_bricks, 1))
        lo = int(svo.level_start[bs.top_depth - 1])  # cut-level start
        tm = np.asarray(bs.top_masks)
        tc = np.asarray(bs.top_child).copy()
        tc[:lo] += top_off                      # interior: node rows
        tc[lo:] += brick_off                    # cut level: brick ids
        sl = slice(top_off, top_off + n_top)
        self.top_masks[sl] = tm
        self.top_child[sl] = tc
        self.top_parent[sl] = np.asarray(bs.top_parent) + top_off
        bricks = np.asarray(bs.bricks).copy()
        bricks[:, 16] += np.uint32(leaf_off)
        self.bricks[brick_off:brick_off + bricks.shape[0]] = bricks
        self.dirty.append((top_off, n_top, brick_off, bricks.shape[0]))
        return top_off, brick_off, n_top, bricks.shape[0]

    def free(self, top_off, n_top, brick_off, n_bricks):
        _free_range(self._free_top, top_off, max(n_top, 1))
        _free_range(self._free_bricks, brick_off, max(n_bricks, 1))


@partial(jax.jit, donate_argnums=(0, 1, 2, 3))
def _dev_apply_brick_spans(top_m, top_c, top_p, bricks, u_m, u_c, u_p, u_b,
                           t_off, b_off):
    return (
        jax.lax.dynamic_update_slice(top_m, u_m, (t_off,)),
        jax.lax.dynamic_update_slice(top_c, u_c, (t_off,)),
        jax.lax.dynamic_update_slice(top_p, u_p, (t_off,)),
        jax.lax.dynamic_update_slice(bricks, u_b, (b_off, jnp.int32(0))),
    )


def _coalesce_spans(spans, slack, off_idx=0, len_idx=1):
    """Greedy grouping of dirty spans by offset: a span joins the current
    group while the group's bounding range stays within slack x the summed
    span lengths. The single-group fast path covers the append-like common
    case; recycled-slot patterns (two small spans at opposite arena ends)
    split into a few uploads instead of one near-full-arena one
    (ADVICE r04 — shared by DeviceArena and DeviceBrickArena)."""
    spans = sorted(spans, key=lambda s: s[off_idx])
    groups = [[spans[0]]]
    lo = spans[0][off_idx]
    hi = lo + spans[0][len_idx]
    tot = spans[0][len_idx]
    for s in spans[1:]:
        nhi = max(hi, s[off_idx] + s[len_idx])
        if (nhi - lo) <= slack * (tot + s[len_idx]):
            groups[-1].append(s)
            hi, tot = nhi, tot + s[len_idx]
        else:
            groups.append([s])
            lo = s[off_idx]
            hi = lo + s[len_idx]
            tot = s[len_idx]
    return groups


class DeviceBrickArena:
    """Device-resident mirror of a BrickArena (same offset-upload model as
    DeviceArena; one donated program per sync, span-coalesced)."""

    COALESCE_SLACK = 8

    def __init__(self, barena: BrickArena):
        self.barena = barena
        self.top_masks = jnp.asarray(barena.top_masks)
        self.top_child = jnp.asarray(barena.top_child)
        self.top_parent = jnp.asarray(barena.top_parent)
        self.bricks = jnp.asarray(barena.bricks)
        barena.dirty.clear()

    def sync(self) -> int:
        spans = self.barena.dirty
        if not spans:
            return 0
        # group by brick offset (the big axis; top spans track brick spans)
        # so slot recycling can't trigger near-full re-uploads (ADVICE r04)
        groups = _coalesce_spans(spans, self.COALESCE_SLACK, off_idx=2,
                                 len_idx=3)
        n = len(spans)
        a = self.barena

        def _pad(lo, hi, cap):
            # power-of-two upload lengths keep the donated program's shape
            # set small (same scheme as DeviceArena.sync)
            ln = 1
            while ln < hi - lo:
                ln <<= 1
            if ln >= cap:
                return 0, cap
            return (lo if lo + ln <= cap else cap - ln), ln

        for g in groups:
            t0 = min(s[0] for s in g)
            t1 = max(s[0] + s[1] for s in g)
            b0 = min(s[2] for s in g)
            b1 = max(s[2] + s[3] for s in g)
            t0, tl = _pad(t0, max(t1, t0 + 1), self.top_masks.shape[0])
            t1 = t0 + tl
            b0, bl = _pad(b0, max(b1, b0 + 1), self.bricks.shape[0])
            b1 = b0 + bl
            (self.top_masks, self.top_child, self.top_parent,
             self.bricks) = _dev_apply_brick_spans(
                self.top_masks, self.top_child, self.top_parent,
                self.bricks, jnp.asarray(a.top_masks[t0:t1]),
                jnp.asarray(a.top_child[t0:t1]),
                jnp.asarray(a.top_parent[t0:t1]),
                jnp.asarray(a.bricks[b0:b1]), jnp.int32(t0), jnp.int32(b0))
        spans.clear()
        return n


def _chunk_cell_occupancy(svo: SVO, top_depth_c: int) -> np.ndarray:
    """uint32 [max(1, 8^tdc/32)]: which of the chunk's 8^top_depth_c
    brick-cut cells are occupied, as a morton bit array (bit m of word
    m>>5 = cell with chunk-local morton code m). The builder lays
    cut-level nodes out in global morton order, so the k-th set bit (in
    ascending morton) is the chunk's k-th brick — the invariant
    master_tile()'s brickmap relies on (same argument as
    ops/tile.make_tile_svo's cellmap)."""
    from raytracingtest_tpu.ops.brick import _expand_children
    from raytracingtest_tpu.ops.tile import morton3

    masks = np.asarray(svo.masks)
    child_base = np.asarray(svo.child_base)
    rows = np.zeros(1, np.int64)
    coords = np.zeros((1, 3), np.int64)
    for _l in range(top_depth_c):
        rows, pidx, slots = _expand_children(masks, child_base, rows)
        coords = coords[pidx] * 2 + np.stack(
            [slots & 1, (slots >> 1) & 1, (slots >> 2) & 1], axis=1)
    m = morton3(coords[:, 0], coords[:, 1], coords[:, 2])
    words = np.zeros(max(1, (8 ** top_depth_c) // 32), np.uint32)
    np.bitwise_or.at(words, m >> 5,
                     np.uint32(1) << (m & 31).astype(np.uint32))
    return words


def _chunk_scene(world_scene: Scene, origin, size) -> Scene:
    """Restrict a world scene to a chunk AABB in chunk-local [0,1]^3 coords.
    Density is rescaled by 1/size so SDF-like Lipschitz bounds carry over."""
    ox, oy, oz = (float(v) for v in origin)
    s = float(size)

    def fn(x, y, z, xp):
        return world_scene.fn(
            xp.asarray(x) * s + ox, xp.asarray(y) * s + oy,
            xp.asarray(z) * s + oz, xp) / s

    return Scene(f"{world_scene.name}@{origin}/{size}", fn,
                 world_scene.lipschitz)


class Clipmap:
    """Camera-centered nested LOD rings of chunks (Clipmap.cs)."""

    def __init__(self, scene: Scene, arena: Arena,
                 min_chunk_size: float = 0.25, radius: int = 2,
                 lods: int = 2, chunk_depth: int = 4,
                 world_origin=(0.0, 0.0, 0.0), world_size: float = 1.0,
                 brick_arena: Optional[BrickArena] = None):
        if lods > 1 and radius % 2:
            # the finer ring spans 2*radius cells of half the coarse size;
            # only an even radius aligns it to the coarse lattice so the
            # inner-bounds skip produces no overlap and no holes (the
            # reference ships radius=4, Main.unity:244)
            raise ValueError("radius must be even when lods > 1")
        self.scene = scene
        self.arena = arena
        if brick_arena is not None and chunk_depth < 4:
            raise ValueError("brick arena needs chunk_depth >= 4")
        self.brick_arena = brick_arena
        self.min_chunk_size = min_chunk_size
        self.radius = radius
        self.lods = lods
        self.chunk_depth = chunk_depth
        self.world_origin = np.asarray(world_origin, np.float64)
        self.world_size = world_size
        self.octree = ChunkOctree(origin=world_origin, size=world_size)
        self.resident: dict = {}
        self._snapped = [None] * lods
        self._time = 0

    def update(self, camera_pos) -> dict:
        """One streaming update (DoChunkUpdate, Clipmap.cs:45-138).
        Returns stats {added, evicted, resident}."""
        self._time += 1
        camera_pos = np.asarray(camera_pos, np.float64)
        added = 0
        wanted_any = False
        for lod in range(self.lods):
            cs = self.min_chunk_size * (2 ** lod)
            snap = np.floor(camera_pos / (2 * cs)) * (2 * cs)
            if self._snapped[lod] is not None and np.all(
                    snap == self._snapped[lod]):
                continue  # early-out (Clipmap.cs:70-76)
            self._snapped[lod] = snap
            wanted_any = True
            r = self.radius
            for ix in range(-r, r):
                for iy in range(-r, r):
                    for iz in range(-r, r):
                        pos = snap + np.array([ix, iy, iz]) * cs
                        # clamp to world bounds
                        if np.any(pos < self.world_origin - 1e-9) or np.any(
                                pos + cs > self.world_origin + self.world_size
                                + 1e-9):
                            continue
                        # skip cells covered by a finer LOD ring
                        # (inner-bounds skip, Clipmap.cs:94-96)
                        if lod > 0 and self._inside_finer(pos, cs, lod):
                            continue
                        key = (lod, round(pos[0] / cs), round(pos[1] / cs),
                               round(pos[2] / cs))
                        if key in self.resident:
                            self.resident[key].creation_time = self._time
                            continue
                        self._add_chunk(key, pos, cs, lod)
                        added += 1
        evicted = 0
        if wanted_any:
            evicted = self._evict_stale()
        return {"added": added, "evicted": evicted,
                "resident": len(self.resident)}

    def _inside_finer(self, pos, cs, lod):
        for f in range(lod):
            fcs = self.min_chunk_size * (2 ** f)
            snap = self._snapped[f]
            if snap is None:
                continue
            lo = snap - self.radius * fcs
            hi = snap + self.radius * fcs
            if np.all(pos >= lo - 1e-9) and np.all(pos + cs <= hi + 1e-9):
                return True
        return False

    def _add_chunk(self, key, pos, cs, lod):
        sub = _chunk_scene(self.scene, pos, cs)
        # attributes evaluated in WORLD coordinates: streamed chunks are
        # attribute-identical to a monolithic world build (tested)
        result = build_svo(sub, self.chunk_depth,
                           attr_frame=(self.scene, pos, cs))
        node_off, leaf_off = self.arena.upload(result.svo)
        top_off = n_top = brick_off = n_bricks = 0
        cell_occ = None
        if self.brick_arena is not None:
            top_off, brick_off, n_top, n_bricks = self.brick_arena.upload(
                result.svo, leaf_off)
            from raytracingtest_tpu.ops.brick import BRICK_LEVELS
            cell_occ = _chunk_cell_occupancy(
                result.svo, self.chunk_depth - BRICK_LEVELS)
        chunk = Chunk(
            position=pos.copy(), size=cs, lod=lod, creation_time=self._time,
            node_offset=node_off, n_nodes=result.svo.n_nodes,
            leaf_offset=leaf_off, n_leaves=result.svo.n_leaves,
            depth=result.svo.depth, level_start=result.svo.level_start,
            top_offset=top_off, n_top=n_top, brick_offset=brick_off,
            n_bricks=n_bricks, cell_occ=cell_occ)
        self.resident[key] = chunk
        self.octree.add_chunk(pos, cs, chunk)

    def _evict_stale(self):
        evicted = 0
        for key in list(self.resident):
            chunk = self.resident[key]
            if chunk.creation_time != self._time:
                self.octree.remove_chunk(chunk.position, chunk.size)
                self.arena.free(chunk)
                if self.brick_arena is not None:
                    self.brick_arena.free(chunk.top_offset, chunk.n_top,
                                          chunk.brick_offset, chunk.n_bricks)
                del self.resident[key]
                evicted += 1
        return evicted

    def master(self):
        """Compile the trunk SVO + chunk tables for stitched tracing
        (UpdateMasterOctree, Clipmap.cs:153-169)."""
        trunk, table = self.octree.extract_trunk()
        roots = np.array([c.node_offset for _, _, c in table], np.int32)
        origins = np.array([p for p, _, _ in table], np.float32)
        sizes = np.array([s for _, s, _ in table], np.float32)
        return trunk, roots, origins, sizes

    def master_brick(self):
        """master() with BRICK-arena chunk roots: the stitched-trace tables
        for the hot-path device traversal (trace_clipmap_device_brick)."""
        assert self.brick_arena is not None
        trunk, table = self.octree.extract_trunk()
        roots = np.array([c.top_offset for _, _, c in table], np.int32)
        origins = np.array([p for p, _, _ in table], np.float32)
        sizes = np.array([s for _, s, _ in table], np.float32)
        return trunk, roots, origins, sizes

    def master_tile(self):
        """Stitch the resident set into per-LOD TILE-path structures: one
        world-spanning occupancy pyramid + cellmap per LOD (all that LOD's
        chunks' brick cells placed at their world morton positions) plus a
        morton-rank -> arena-brick-id indirection (brickmap), so the
        streamed world renders through ops/tile.trace (the production
        frustum-amortized walk) instead of the per-ray stitched loop —
        the reference's master-octree recompile (Clipmap.cs:153-169 'Q'),
        rebuilt per update on the TPU-native hot path.

        Returns a list of MasterTile (one per LOD with any resident
        chunks' cells; empty LODs yield an all-empty pyramid). Requires
        world_size / chunk_size to be a power of two (the clipmap's own
        snapping already assumes dyadic chunk sizes)."""
        from raytracingtest_tpu.ops.brick import BRICK_LEVELS
        from raytracingtest_tpu.ops.tile import (
            _popcount_np, _pyr_layout, morton3)
        assert self.brick_arena is not None
        tdc = self.chunk_depth - BRICK_LEVELS
        masters = []
        for lod in range(self.lods):
            cs = self.min_chunk_size * (2 ** lod)
            g = np.log2(self.world_size / cs)
            if abs(g - round(g)) > 1e-9:
                raise ValueError(
                    f"tile path needs world_size/chunk_size a power of 2; "
                    f"got {self.world_size}/{cs}")
            g = int(round(g))
            td_eff = g + tdc
            if td_eff > 10:
                raise ValueError("tile path supports top_depth <= 10")
            chunks = [c for c in self.resident.values() if c.lod == lod]

            def cell_m(c, cs=cs):
                cc = np.round((np.asarray(c.position, np.float64)
                               - self.world_origin) / cs).astype(np.int64)
                return int(morton3(cc[0], cc[1], cc[2]))

            chunks.sort(key=cell_m)
            bits = np.zeros(8 ** td_eff, bool)
            bmap_parts = []
            for c in chunks:
                occ = np.asarray(c.cell_occ, np.uint32)
                local = np.flatnonzero(
                    (occ[:, None] >> np.arange(32, dtype=np.uint32)) & 1)
                if local.shape[0] == 0:
                    continue  # empty chunk (one dummy brick row, no cells)
                assert local.shape[0] == c.n_bricks, (local.shape,
                                                     c.n_bricks)
                bits[(cell_m(c) << (3 * tdc)) + local] = True
                bmap_parts.append(c.brick_offset
                                  + np.arange(c.n_bricks, dtype=np.int32))
            bmap = (np.concatenate(bmap_parts).astype(np.int32)
                    if bmap_parts else np.zeros(0, np.int32))
            # pad the brickmap to a power of two so the jitted trace's
            # shape set stays small across streaming updates
            cap = 1
            while cap < max(bmap.shape[0], 1):
                cap <<= 1
            brickmap = np.full(cap, -1, np.int32)
            brickmap[:bmap.shape[0]] = bmap

            # pyramid: OR-downsample the finest bool layer, pack to words
            offs, n_words = _pyr_layout(td_eff)
            pyr = np.zeros(n_words, np.uint32)
            level = bits
            packed = {td_eff: bits}
            for l in range(td_eff - 1, 0, -1):
                level = level.reshape(-1, 8).any(axis=1)
                packed[l] = level
            for l in range(1, td_eff + 1):
                by = np.packbits(packed[l], bitorder="little")
                pad = (-by.shape[0]) % 4
                if pad:
                    by = np.concatenate([by, np.zeros(pad, np.uint8)])
                w = by.view(np.uint32)
                pyr[offs[l]:offs[l] + w.shape[0]] = w

            w_top = pyr[offs[td_eff]:]
            pc = _popcount_np(w_top)
            prefix = np.concatenate(
                [[0], np.cumsum(pc)[:-1]]).astype(np.int32)
            assert int(pc.sum()) == bmap.shape[0], (pc.sum(), bmap.shape)
            cellmap = np.stack([prefix, w_top.astype(np.int32)], axis=1)
            masters.append(MasterTile(
                pyr=pyr, cellmap=cellmap, brickmap=brickmap,
                depth=g + self.chunk_depth, top_depth=td_eff))
        return masters


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MasterTile:
    """One LOD's stitched tile-path structure (Clipmap.master_tile):
    world-spanning occupancy pyramid + cellmap in the clipmap's world
    cube, and the morton-rank -> brick-arena-row indirection."""

    pyr: object        # uint32 [n_words]
    cellmap: object    # int32 [W_top, 2]
    brickmap: object   # int32 [pow2 >= n resident bricks], -1 padded
    depth: int = dataclasses.field(metadata=dict(static=True))
    top_depth: int = dataclasses.field(metadata=dict(static=True))


@partial(jax.jit, static_argnames=("depths", "top_depths", "k_max",
                                   "chunk_tiles", "fb_tiles", "fb_k",
                                   "fb2_tiles"))
def _trace_clipmap_tile(pyrs, cellmaps, brickmaps, bricks, o, d, corners,
                        apex, depths, top_depths, k_max, chunk_tiles,
                        fb_tiles, fb_k, fb2_tiles):
    """Per-LOD tile traces composed by min-t (LOD rings are disjoint in
    space, so along a ray at most one LOD hits at each t; the nearest hit
    wins). All LODs trace in the same world cube, so t values compare."""
    from raytracingtest_tpu.ops import tile as tile_mod
    best_leaf = best_t = unres = None
    for i in range(len(depths)):
        caps = tile_mod._default_caps(top_depths[i], k_max)
        res, un = tile_mod._trace_tile_fb(
            pyrs[i], cellmaps[i], bricks, o, d, corners, apex,
            depths[i], top_depths[i], caps, k_max, chunk_tiles, fb_tiles,
            fb_k, fb2_tiles, 2, brickmaps[i])
        t_eff = jnp.where(res.hit_leaf >= 0, res.hit_t, jnp.inf)
        if best_leaf is None:
            best_leaf, best_t, unres = res.hit_leaf, t_eff, un
        else:
            better = t_eff < best_t
            best_leaf = jnp.where(better, res.hit_leaf, best_leaf)
            best_t = jnp.minimum(t_eff, best_t)
            unres = unres | un
    hit = best_leaf >= 0
    return best_leaf, jnp.where(hit, best_t, 0.0), unres


def trace_clipmap_tile(masters, dev_brick: "DeviceBrickArena", o, d,
                       corners, world_origin=(0.0, 0.0, 0.0),
                       world_size: float = 1.0, k_max=64, chunk_tiles=256,
                       fb_tiles=64, fb_k=192, fb2_tiles=16):
    """Streamed world on the PRODUCTION tile path: per-LOD frustum-
    amortized walks over the stitched pyramids (Clipmap.master_tile), all
    bricks fetched from the device brick arena via the brickmap
    indirection. o/d/corners: tile-major camera rays (tile.tile_rays) in
    WORLD coordinates. Returns (hit_leaf into the companion Arena's leaf
    attribute arrays, hit_t in world units, unresolved mask).

    This replaces the per-ray two-phase stitched loop
    (trace_clipmap_device_brick) as the fly-driver hot path: that loop
    re-traces every ray through the trunk + chunk bricks on each chunk
    crossing (VERDICT r04 weak 3); here chunk structure is baked into the
    pyramid so a frame costs the same as a monolithic tile render."""
    worg = jnp.asarray(world_origin, jnp.float32)
    ws = jnp.float32(world_size)
    o = (jnp.asarray(o, jnp.float32) - worg[None, None, :]) / ws
    d = jnp.asarray(d, jnp.float32)
    leaf, t_cube, un = _trace_clipmap_tile(
        tuple(jnp.asarray(m.pyr) for m in masters),
        tuple(jnp.asarray(m.cellmap) for m in masters),
        tuple(jnp.asarray(m.brickmap) for m in masters),
        dev_brick.bricks, o, d, jnp.asarray(corners, jnp.float32),
        o[0, 0], tuple(m.depth for m in masters),
        tuple(m.top_depth for m in masters), k_max, chunk_tiles, fb_tiles,
        fb_k, fb2_tiles)
    return leaf, t_cube * ws, un


@partial(jax.jit, static_argnames=("depths", "top_depths", "k_max",
                                   "chunk_tiles", "fb_tiles", "fb_k",
                                   "fb2_tiles"),
         donate_argnums=(13,))
def _render_clipmap_tile(pyrs, cellmaps, brickmaps, bricks, albedo, normal,
                         density, o, d, corners, apex, light_dir, depths,
                         acc, sample, top_depths, k_max, chunk_tiles,
                         fb_tiles, fb_k, fb2_tiles):
    from raytracingtest_tpu import diff as diff_mod
    leaf, t_cube, un = _trace_clipmap_tile(
        pyrs, cellmaps, brickmaps, bricks, o, d, corners, apex, depths,
        top_depths, k_max, chunk_tiles, fb_tiles, fb_k, fb2_tiles)
    img = diff_mod.shade_diff(leaf, d.reshape(-1, 3), albedo, normal,
                              density, light_dir, 1.3, 0.08)
    # on-device progressive accumulation (AddShader.shader:42-46: running
    # average with alpha 1/(sample+1); sample==0 replaces — motion reset)
    s = sample.astype(jnp.float32)
    acc = jnp.where(sample == 0, img, acc + (img - acc) / (s + 1.0))
    return acc, jnp.sum(un)


def render_clipmap_tile(masters, dev_brick: "DeviceBrickArena",
                        dev_arena: "DeviceArena", o, d, corners, light_dir,
                        acc=None, sample=0,
                        world_origin=(0.0, 0.0, 0.0), world_size: float = 1.0,
                        k_max=64, chunk_tiles=256, fb_tiles=64, fb_k=192,
                        fb2_tiles=16):
    """One-dispatch streamed-world frame: stitched tile trace + shading
    from the device arena's leaf attributes + on-device progressive
    accumulation, all inside a single jit (a dispatch on the tunnel
    backend costs ~25 ms — an unjitted shade chain costs a dispatch PER
    OP, and fetching the frame costs a megabyte round trip; callers fence
    on the residual scalar and fetch `acc` only when they need pixels).
    acc: previous accumulator ((T*P, 3), donated) or None; sample: frames
    accumulated so far at this pose (0 = replace — camera-motion reset).
    Returns (acc', residual count) as device arrays."""
    worg = jnp.asarray(world_origin, jnp.float32)
    ws = jnp.float32(world_size)
    o = (jnp.asarray(o, jnp.float32) - worg[None, None, :]) / ws
    d = jnp.asarray(d, jnp.float32)
    if acc is None:
        acc = jnp.zeros((o.shape[0] * o.shape[1], 3), jnp.float32)
    return _render_clipmap_tile(
        tuple(jnp.asarray(m.pyr) for m in masters),
        tuple(jnp.asarray(m.cellmap) for m in masters),
        tuple(jnp.asarray(m.brickmap) for m in masters),
        dev_brick.bricks, dev_arena.leaf_albedo, dev_arena.leaf_normal,
        dev_arena.leaf_density, o, d, jnp.asarray(corners, jnp.float32),
        o[0, 0], jnp.asarray(light_dir, jnp.float32),
        tuple(m.depth for m in masters), acc, jnp.int32(sample),
        tuple(m.top_depth for m in masters), k_max, chunk_tiles, fb_tiles,
        fb_k, fb2_tiles)


def trace_clipmap(trunk: SVO, trunk_origin, trunk_size,
                  chunk_roots, chunk_origins, chunk_sizes, chunk_depth,
                  arena: Arena, origin, direction, max_chunks: int = 4):
    """Two-phase stitched traversal (vectorized, numpy).

    Returns (hit_leaf into arena leaf arrays, t_world, hits_chunk id) with
    -1 leaves on miss."""
    o = np.asarray(origin, np.float32)
    d = np.asarray(direction, np.float32)
    n = o.shape[0]
    t_off = np.zeros(n, np.float32)
    done = np.zeros(n, bool)
    hit_leaf = np.full(n, -1, np.int32)
    hit_t = np.zeros(n, np.float32)
    hit_chunk = np.full(n, -1, np.int32)
    t_org = np.asarray(trunk_origin, np.float32)
    t_size = np.float32(trunk_size)
    eps = np.float32(1e-5)

    arena_svo = SVO(
        masks=arena.masks, child_base=arena.child_base,
        leaf_base=arena.leaf_base, leaf_albedo=arena.leaf_albedo,
        leaf_normal=arena.leaf_normal, leaf_density=arena.leaf_density,
        depth=chunk_depth, level_start=(0,) * (chunk_depth + 1))

    for _ in range(max_chunks):
        if done.all():
            break
        # phase 1: trunk trace from the advanced origin
        o_cur = o + t_off[:, None] * d
        o_trunk = (o_cur - t_org[None, :]) / t_size
        r1 = traverse.trace_numpy(trunk, o_trunk, d)
        found = (r1.hit_leaf >= 0) & ~done
        done |= ~found & ~done  # trunk miss -> final miss
        if not found.any():
            break
        cid = np.where(found, r1.hit_leaf, 0)
        c_org = chunk_origins[cid]
        c_size = chunk_sizes[cid]
        roots = chunk_roots[cid]

        # phase 2: chunk-local trace in the arena
        o_loc = (o_cur - c_org) / c_size[:, None]
        r2 = traverse.trace_numpy(arena_svo, o_loc, d, root=roots)
        hit2 = (r2.hit_leaf >= 0) & found
        new = hit2 & ~ (hit_leaf >= 0)
        hit_leaf = np.where(new, r2.hit_leaf, hit_leaf)
        hit_t = np.where(new, t_off + r2.hit_t * c_size, hit_t)
        hit_chunk = np.where(new, cid, hit_chunk)
        done |= hit2

        # chunk miss: advance past the chunk AABB and re-enter phase 1
        adv = found & ~hit2
        t_exit = _aabb_exit(o_cur, d, c_org, c_size)
        t_off = np.where(adv, t_off + t_exit + eps, t_off)

    return hit_leaf, hit_t, hit_chunk


def _aabb_exit(o, d, box_org, box_size):
    """t of exiting the AABB [org, org+size], from origins possibly inside."""
    safe_d = np.where(np.abs(d) < 1e-12, 1e-12, d)
    t0 = (box_org - o) / safe_d
    t1 = (box_org + box_size[:, None] - o) / safe_d
    t_far = np.maximum(t0, t1)
    return np.maximum(t_far.min(axis=1), 0.0).astype(np.float32)


# ---------------------------------------------------------------------------
# device-resident arena + jitted stitched traversal
# ---------------------------------------------------------------------------

@partial(jax.jit, donate_argnums=(0,))
def _dev_update_1d(buf, upd, off):
    return jax.lax.dynamic_update_slice(buf, upd, (off,))


@partial(jax.jit, donate_argnums=(0, 1, 2, 3, 4, 5))
def _dev_apply_spans(masks, child_base, leaf_base, albedo, normal, density,
                     u_masks, u_child, u_leafb, u_alb, u_nrm, u_den,
                     n_off, l_off):
    """One program per sync: all six arena buffers updated in place."""
    return (
        jax.lax.dynamic_update_slice(masks, u_masks, (n_off,)),
        jax.lax.dynamic_update_slice(child_base, u_child, (n_off,)),
        jax.lax.dynamic_update_slice(leaf_base, u_leafb, (n_off,)),
        jax.lax.dynamic_update_slice(albedo, u_alb, (l_off, jnp.int32(0))),
        jax.lax.dynamic_update_slice(normal, u_nrm, (l_off, jnp.int32(0))),
        jax.lax.dynamic_update_slice(density, u_den, (l_off,)),
    )


@partial(jax.jit, donate_argnums=(0,))
def _dev_update_2d(buf, upd, off):
    return jax.lax.dynamic_update_slice(buf, upd, (off, 0))


class DeviceArena:
    """Device-resident mirror of an Arena.

    The TPU analog of the reference's preallocated GPU arena with offset
    uploads (RaytracingMaster.cs:111-135: ComputeBuffer.SetData at chunk
    offsets): the full-capacity buffers live in HBM once; each sync() applies
    only the dirty spans with donated dynamic_update_slice programs, so
    steady-state streaming transfers just the new chunks."""

    def __init__(self, arena: Arena):
        self.arena = arena
        self.masks = jnp.asarray(arena.masks)
        self.child_base = jnp.asarray(arena.child_base)
        self.leaf_base = jnp.asarray(arena.leaf_base)
        self.leaf_albedo = jnp.asarray(arena.leaf_albedo)
        self.leaf_normal = jnp.asarray(arena.leaf_normal)
        self.leaf_density = jnp.asarray(arena.leaf_density)
        arena.dirty.clear()

    def sync(self) -> int:
        """Upload dirty spans (host arena -> device buffers). Returns the
        number of spans applied.

        All spans coalesce into one node range + one leaf range (arena
        allocation is append-like, so the union is tight), padded to a
        power-of-two length (re-uploading a few unchanged rows is free next
        to a dispatch), and applied by ONE donated program — each dispatch
        on this backend costs ~25 ms, so the previous 6-programs-per-span
        scheme paid 6N round-trips per streaming step (VERDICT r02 weak 6).
        """
        spans = self.arena.dirty
        n = len(spans)
        if n == 0:
            return 0
        # the bounding range is tight only under append-like allocation;
        # once the arena recycles slots, two small spans at opposite ends
        # would otherwise trigger a near-full re-upload — group spans so no
        # group's bounding range exceeds COALESCE_SLACK x its summed length
        groups = self._coalesce(spans)
        if len(groups) > 1:
            total = 0
            for g in groups:
                self.arena.dirty = g
                total += self.sync()
            self.arena.dirty = spans
            spans.clear()
            return total
        n0 = min(s[0] for s in spans)
        n1 = max(s[0] + s[1] for s in spans)
        leaf_spans = [s for s in spans if s[3]]
        l0 = min((s[2] for s in leaf_spans), default=0)
        l1 = max((s[2] + s[3] for s in leaf_spans), default=0)

        def _pad(lo, hi, cap):
            ln = 1
            while ln < hi - lo:
                ln <<= 1
            if ln >= cap:
                return 0, cap
            return (lo if lo + ln <= cap else cap - ln), ln

        cap_n = self.masks.shape[0]
        n0, ln = _pad(n0, max(n1, n0 + 1), cap_n)
        cap_l = self.leaf_density.shape[0]
        l0, ll = _pad(l0, max(l1, l0 + 1), cap_l)
        a = self.arena
        (self.masks, self.child_base, self.leaf_base, self.leaf_albedo,
         self.leaf_normal, self.leaf_density) = _dev_apply_spans(
            self.masks, self.child_base, self.leaf_base, self.leaf_albedo,
            self.leaf_normal, self.leaf_density,
            jnp.asarray(a.masks[n0:n0 + ln]),
            jnp.asarray(a.child_base[n0:n0 + ln]),
            jnp.asarray(a.leaf_base[n0:n0 + ln]),
            jnp.asarray(a.leaf_albedo[l0:l0 + ll]),
            jnp.asarray(a.leaf_normal[l0:l0 + ll]),
            jnp.asarray(a.leaf_density[l0:l0 + ll]),
            jnp.int32(n0), jnp.int32(l0))
        spans.clear()
        return n

    # bounding-range slack before sync splits spans into separate uploads
    COALESCE_SLACK = 8

    def _coalesce(self, spans):
        """Greedy grouping of dirty spans by node offset (shared
        _coalesce_spans helper; see its docstring)."""
        return _coalesce_spans(spans, self.COALESCE_SLACK)


@partial(jax.jit, static_argnames=("trunk_depth", "chunk_depth",
                                   "max_chunks"))
def _trace_clipmap_jax(trunk_m, trunk_c, trunk_l, t_org, t_size,
                       chunk_roots, chunk_origins, chunk_sizes,
                       arena_m, arena_c, arena_l, o, d,
                       trunk_depth, chunk_depth, max_chunks):
    """Jitted two-phase stitched traversal (device twin of trace_clipmap;
    same phase structure as parallel.level_sharded's loop)."""
    f32, i32 = jnp.float32, jnp.int32
    trunk_p = traverse.derive_parent_ptr_jnp(trunk_m, trunk_c)
    arena_p = traverse.derive_parent_ptr_jnp(arena_m, arena_c)
    n = o.shape[0]
    t_off = jnp.zeros(n, f32)
    done = jnp.zeros(n, bool)
    hit_leaf = jnp.full(n, -1, i32)
    hit_t = jnp.zeros(n, f32)
    hit_chunk = jnp.full(n, -1, i32)
    eps = f32(1e-5)

    # while-until-all-done under the provable chunk-crossing bound (a ray
    # crosses at most 3*2^trunk_depth occupied trunk cells), so grazing
    # rays never silently miss past a fixed round count; max_chunks caps it
    # lower only when a caller explicitly asks (VERDICT r02 item 6)
    n_max = min(max_chunks or (1 << 30), 3 * (1 << trunk_depth) + 4)

    def _body(carry):
        r, t_off, done, hit_leaf, hit_t, hit_chunk = carry
        o_cur = o + t_off[:, None] * d
        o_trunk = (o_cur - t_org[None, :]) / t_size
        r1 = traverse._trace_core(trunk_m, trunk_c, trunk_l, trunk_p,
                                  o_trunk, d, trunk_depth)
        found = (r1.hit_leaf >= 0) & ~done
        done = done | ~found
        cid = jnp.where(found, r1.hit_leaf, 0)
        c_org = jnp.take(chunk_origins, cid, axis=0)
        c_size = jnp.take(chunk_sizes, cid)
        roots = jnp.take(chunk_roots, cid)

        o_loc = (o_cur - c_org) / c_size[:, None]
        r2 = traverse._trace_core(arena_m, arena_c, arena_l, arena_p,
                                  o_loc, d, chunk_depth, root=roots)
        hit2 = (r2.hit_leaf >= 0) & found
        new = hit2 & (hit_leaf < 0)
        hit_leaf = jnp.where(new, r2.hit_leaf, hit_leaf)
        hit_t = jnp.where(new, t_off + r2.hit_t * c_size, hit_t)
        hit_chunk = jnp.where(new, cid, hit_chunk)
        done = done | hit2

        adv = found & ~hit2
        safe_d = jnp.where(jnp.abs(d) < 1e-12, 1e-12, d)
        t0 = (c_org - o_cur) / safe_d
        t1 = (c_org + c_size[:, None] - o_cur) / safe_d
        t_exit = jnp.maximum(jnp.min(jnp.maximum(t0, t1), axis=1), 0.0)
        t_off = jnp.where(adv, t_off + t_exit + eps, t_off)
        return r + 1, t_off, done, hit_leaf, hit_t, hit_chunk

    def _cond(carry):
        r, _t, done, *_ = carry
        return (r < n_max) & jnp.any(~done)

    _, t_off, done, hit_leaf, hit_t, hit_chunk = jax.lax.while_loop(
        _cond, _body,
        (jnp.int32(0), t_off, done, hit_leaf, hit_t, hit_chunk))
    return hit_leaf, hit_t, hit_chunk, ~done


def trace_clipmap_device(trunk: SVO, trunk_origin, trunk_size,
                         chunk_roots, chunk_origins, chunk_sizes,
                         chunk_depth, dev_arena: DeviceArena, origin,
                         direction, max_chunks: int = 0):
    """Device-resident stitched traversal: the streamed world renders on the
    TPU (VERDICT round-1 item 6; numpy twin: trace_clipmap). Returns
    (hit_leaf, hit_t, hit_chunk, truncated); truncated is all-False unless
    max_chunks (>0) caps the provable crossing bound."""
    return _trace_clipmap_jax(
        jnp.asarray(np.asarray(trunk.masks)),
        jnp.asarray(np.asarray(trunk.child_base)),
        jnp.asarray(np.asarray(trunk.leaf_base)),
        jnp.asarray(trunk_origin, jnp.float32), jnp.float32(trunk_size),
        jnp.asarray(chunk_roots), jnp.asarray(chunk_origins),
        jnp.asarray(chunk_sizes), dev_arena.masks, dev_arena.child_base,
        dev_arena.leaf_base, jnp.asarray(origin, jnp.float32),
        jnp.asarray(direction, jnp.float32), trunk.depth, chunk_depth,
        max_chunks)


@partial(jax.jit, static_argnames=("trunk_depth", "chunk_depth",
                                   "max_chunks"))
def _trace_clipmap_brick_jax(trunk_m, trunk_c, trunk_l, t_org, t_size,
                             chunk_roots, chunk_origins, chunk_sizes,
                             top_m, top_c, top_p, bricks, o, d,
                             trunk_depth, chunk_depth, max_chunks):
    """Stitched device traversal with phase 2 on the PRODUCTION brick path
    (_trace_brick_core, per-ray chunk roots into the brick arena) instead
    of the plain ESVO loop — the streamed world on the hot path."""
    from raytracingtest_tpu.ops import brick as brick_mod
    f32, i32 = jnp.float32, jnp.int32
    trunk_p = traverse.derive_parent_ptr_jnp(trunk_m, trunk_c)
    n = o.shape[0]
    t_off = jnp.zeros(n, f32)
    done = jnp.zeros(n, bool)
    hit_leaf = jnp.full(n, -1, i32)
    hit_t = jnp.zeros(n, f32)
    hit_chunk = jnp.full(n, -1, i32)
    eps = f32(1e-5)
    top_depth = chunk_depth - brick_mod.BRICK_LEVELS

    n_max = min(max_chunks or (1 << 30), 3 * (1 << trunk_depth) + 4)

    def _body(carry):
        r, t_off, done, hit_leaf, hit_t, hit_chunk = carry
        o_cur = o + t_off[:, None] * d
        o_trunk = (o_cur - t_org[None, :]) / t_size
        r1 = traverse._trace_core(trunk_m, trunk_c, trunk_l, trunk_p,
                                  o_trunk, d, trunk_depth)
        found = (r1.hit_leaf >= 0) & ~done
        done = done | ~found
        cid = jnp.where(found, r1.hit_leaf, 0)
        c_org = jnp.take(chunk_origins, cid, axis=0)
        c_size = jnp.take(chunk_sizes, cid)
        roots = jnp.take(chunk_roots, cid)

        o_loc = (o_cur - c_org) / c_size[:, None]
        r2 = brick_mod._trace_brick_core(top_m, top_c, top_p, bricks,
                                         o_loc, d, chunk_depth, top_depth,
                                         root=roots)
        hit2 = (r2.hit_leaf >= 0) & found
        new = hit2 & (hit_leaf < 0)
        hit_leaf = jnp.where(new, r2.hit_leaf, hit_leaf)
        hit_t = jnp.where(new, t_off + r2.hit_t * c_size, hit_t)
        hit_chunk = jnp.where(new, cid, hit_chunk)
        done = done | hit2

        adv = found & ~hit2
        safe_d = jnp.where(jnp.abs(d) < 1e-12, 1e-12, d)
        t0 = (c_org - o_cur) / safe_d
        t1 = (c_org + c_size[:, None] - o_cur) / safe_d
        t_exit = jnp.maximum(jnp.min(jnp.maximum(t0, t1), axis=1), 0.0)
        t_off = jnp.where(adv, t_off + t_exit + eps, t_off)
        return r + 1, t_off, done, hit_leaf, hit_t, hit_chunk

    def _cond(carry):
        r, _t, done, *_ = carry
        return (r < n_max) & jnp.any(~done)

    _, t_off, done, hit_leaf, hit_t, hit_chunk = jax.lax.while_loop(
        _cond, _body,
        (jnp.int32(0), t_off, done, hit_leaf, hit_t, hit_chunk))
    return hit_leaf, hit_t, hit_chunk, ~done


def trace_clipmap_device_brick(trunk: SVO, trunk_origin, trunk_size,
                               chunk_roots, chunk_origins, chunk_sizes,
                               chunk_depth, dev_brick: DeviceBrickArena,
                               origin, direction, max_chunks: int = 0):
    """trace_clipmap_device with phase 2 on the brick hot path (chunk roots
    from Clipmap.master_brick(); hit_leaf ids index the companion Arena's
    leaf attribute arrays — brick leaf bases were rebased at upload)."""
    return _trace_clipmap_brick_jax(
        jnp.asarray(np.asarray(trunk.masks)),
        jnp.asarray(np.asarray(trunk.child_base)),
        jnp.asarray(np.asarray(trunk.leaf_base)),
        jnp.asarray(trunk_origin, jnp.float32), jnp.float32(trunk_size),
        jnp.asarray(chunk_roots), jnp.asarray(chunk_origins),
        jnp.asarray(chunk_sizes), dev_brick.top_masks, dev_brick.top_child,
        dev_brick.top_parent, dev_brick.bricks,
        jnp.asarray(origin, jnp.float32),
        jnp.asarray(direction, jnp.float32), trunk.depth, chunk_depth,
        max_chunks)
