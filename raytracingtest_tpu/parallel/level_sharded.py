"""Level-sharded octree: trees too large for one chip's HBM.

Design (SURVEY.md §2.8 / §7.3.7): the top levels (0..split_level) are
replicated as a *trunk* whose leaves are the occupied octants at the split
level; every such octant's complete subtree (nodes + leaf attributes) is an
independent sub-SVO owned by exactly one device (round-robin). Because the
breadth-first layout stores every subtree as one contiguous row interval per
level, extraction is pure slicing + pointer rebasing — no tree walk.

Tracing runs under shard_map with rays REPLICATED and content sharded:
each device phase-1 traces the replicated trunk, phase-2 traces only the
rays whose hit octant it owns (per-ray roots into its local arena), and a
psum combines per-ray radiance/results (exactly one owner records each
hit). Rays that pass through an octant without hitting advance past its
AABB and re-enter phase 1, bounded like the reference's chunk loop
(Clipmap.compute:10-25). Voxel parameters are sharded with their subtrees,
so fit gradients stay device-local (no cross-shard scatter) and only the
scalar loss is psum'ed.

Three entry points build on the same phase loop:
  * make_sharded_trace     — rays replicated, content sharded (simple/robust)
  * make_sharded_fit_step  — level-sharded TRAINING: voxel params sharded
    with their arenas, per-device backward through the phase-2 trace, only
    the (replicated) scalar loss crosses devices; gradients never leave
    their owner (BASELINE config 5 semantics)
  * make_exchange_trace    — rays sharded AND content sharded: each device
    trunk-traces only its own ray shard, then an all_to_all routes ray
    packets to their hit octant's owner, owners trace their arena, and a
    second all_to_all returns results — per-device deep-trace work drops to
    ~N/n_dev instead of N (the reference has no distribution at all; the
    behavioral spec for octant stitching is Clipmap.cs:153-169)
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List

import numpy as np

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from raytracingtest_tpu.ops import traverse
from raytracingtest_tpu.ops.octree import SVO
from raytracingtest_tpu.parallel.mesh import RAY_AXIS


def extract_subtree(svo: SVO, level: int, index_in_level: int) -> SVO:
    """Extract the standalone sub-SVO rooted at the index_in_level-th node
    of `level` (contiguous-interval slicing; pointers rebased to local)."""
    masks = np.asarray(svo.masks)
    child_base = np.asarray(svo.child_base)
    leaf_base = np.asarray(svo.leaf_base)

    # per-level [lo, hi) node intervals of the subtree
    row = svo.level_start[level] + index_in_level
    intervals = [(row, row + 1)]
    for l in range(level, svo.depth - 1):
        lo, hi = intervals[-1]
        if hi == lo:
            intervals.append((0, 0))
            continue
        vm = (masks[lo:hi] >> 8) & 0xFF
        lm = masks[lo:hi] & 0xFF
        nonleaf = vm & ~lm
        nz = np.nonzero(nonleaf)[0]
        if nz.size == 0:
            intervals.append((0, 0))
            continue
        first = child_base[lo + nz[0]]
        last_row = lo + nz[-1]
        last = child_base[last_row] + int(
            bin(int(nonleaf[nz[-1]])).count("1"))
        intervals.append((int(first), int(last)))

    # leaf interval: scan bottom-most nonempty interval rows' leaf bases
    leaf_lo, leaf_hi = None, None
    for (lo, hi) in intervals:
        if hi == lo:
            continue
        lm = masks[lo:hi] & 0xFF
        nz = np.nonzero(lm)[0]
        if nz.size == 0:
            continue
        first = int(leaf_base[lo + nz[0]])
        last = int(leaf_base[lo + nz[-1]]) + int(
            bin(int(lm[nz[-1]])).count("1"))
        leaf_lo = first if leaf_lo is None else min(leaf_lo, first)
        leaf_hi = last if leaf_hi is None else max(leaf_hi, last)
    if leaf_lo is None:
        leaf_lo = leaf_hi = 0

    new_level_start = [0]
    out_masks, out_child, out_leaf = [], [], []
    offset = 0
    starts = {}
    for li, (lo, hi) in enumerate(intervals):
        starts[li] = offset
        offset += hi - lo
        new_level_start.append(offset)
    for li, (lo, hi) in enumerate(intervals):
        m = masks[lo:hi]
        out_masks.append(m)
        if li + 1 < len(intervals):
            nlo = intervals[li + 1][0]
            out_child.append(
                np.where((m >> 8) & ~m & 0xFF,
                         child_base[lo:hi] - nlo + starts[li + 1], 0)
                .astype(np.int32))
        else:
            out_child.append(np.zeros(hi - lo, np.int32))
        out_leaf.append(
            np.where(m & 0xFF, leaf_base[lo:hi] - leaf_lo, 0).astype(np.int32))

    return SVO(
        masks=np.concatenate(out_masks) if out_masks else np.zeros(0, np.int32),
        child_base=np.concatenate(out_child),
        leaf_base=np.concatenate(out_leaf),
        leaf_albedo=np.asarray(svo.leaf_albedo)[leaf_lo:leaf_hi],
        leaf_normal=np.asarray(svo.leaf_normal)[leaf_lo:leaf_hi],
        leaf_density=np.asarray(svo.leaf_density)[leaf_lo:leaf_hi],
        depth=svo.depth - level,
        level_start=tuple(new_level_start),
    )


@dataclasses.dataclass
class LevelShardedSVO:
    """Replicated trunk + per-device subtree arenas (host-side container;
    device arrays are produced by `device_arrays`)."""

    trunk_masks: np.ndarray
    trunk_child: np.ndarray
    trunk_leaf: np.ndarray
    trunk_depth: int
    trunk_level_start: tuple
    # per-octant (= trunk leaf id) metadata
    octant_owner: np.ndarray    # i32 [n_oct] device id
    octant_root: np.ndarray     # i32 [n_oct] root row in the owner's arena
    octant_leaf_off: np.ndarray  # i32 [n_oct] leaf offset in owner arena
    octant_origin: np.ndarray   # f32 [n_oct, 3] octree-local low corner
    octant_size: float
    sub_depth: int
    # stacked per-device arenas (padded to uniform size)
    arena_masks: np.ndarray     # i32 [n_dev, cap_nodes]
    arena_child: np.ndarray
    arena_leaf: np.ndarray
    arena_albedo: np.ndarray    # f32 [n_dev, cap_leaves, 3]
    arena_normal: np.ndarray
    arena_density: np.ndarray
    # global leaf interval per octant (for mapping arena rows <-> global ids)
    octant_leaf_lo: np.ndarray = None   # i32 [n_oct]
    octant_n_leaves: np.ndarray = None  # i32 [n_oct]

    @property
    def n_devices(self):
        return self.arena_masks.shape[0]


def split_svo(result_or_svo, split_level: int, n_devices: int,
              node_coords_level=None) -> LevelShardedSVO:
    """Split a built SVO at split_level into a replicated trunk + sharded
    subtree arenas. Pass the BuildResult's node_coords[split_level] (or let
    it be derived) for octant origins."""
    svo = getattr(result_or_svo, "svo", result_or_svo)
    if node_coords_level is None:
        nc = getattr(result_or_svo, "node_coords", None)
        if nc is not None:
            node_coords_level = nc[split_level]
        else:
            # derive split-level octant coords by expanding from the root
            # (device-built SVOs carry no build debris)
            from raytracingtest_tpu.ops.brick import _expand_children
            m = np.asarray(svo.masks)
            cb = np.asarray(svo.child_base)
            rows = np.zeros(1, np.int64)
            coords = np.zeros((1, 3), np.int64)
            for _ in range(split_level):
                rows, pidx, slots = _expand_children(m, cb, rows)
                coords = coords[pidx] * 2 + np.stack(
                    [slots & 1, (slots >> 1) & 1, (slots >> 2) & 1], axis=1)
            node_coords_level = coords.astype(np.int32)

    masks = np.asarray(svo.masks)
    lo, hi = svo.level_start[split_level], svo.level_start[split_level + 1]
    n_oct = hi - lo

    # trunk = levels 0..split_level with the split-level nodes as leaves
    t_masks = masks[: svo.level_start[split_level + 1]].copy()
    t_child = np.asarray(svo.child_base)[: hi].copy()
    t_leaf = np.zeros_like(t_child)
    # split-level rows become leaves of their parents: flip parent leaf bits
    plo, phi = svo.level_start[split_level - 1], svo.level_start[split_level]
    pm = t_masks[plo:phi]
    vm = (pm >> 8) & 0xFF
    t_masks[plo:phi] = (vm << 8) | vm  # all children leaves
    # parent leaf_base = rank of first child among split-level rows
    t_leaf[plo:phi] = np.where(vm != 0, t_child[plo:phi] - lo, 0)
    t_child[plo:phi] = 0
    # split-level rows themselves are dropped from the trunk descriptor set
    trunk_masks = t_masks[:phi]
    trunk_child = t_child[:phi]
    trunk_leaf = t_leaf[:phi]

    # extract + distribute subtrees
    subs: List[SVO] = [extract_subtree(svo, split_level, i)
                       for i in range(n_oct)]
    owner = np.arange(n_oct, dtype=np.int32) % n_devices
    roots = np.zeros(n_oct, np.int32)
    leaf_offs = np.zeros(n_oct, np.int32)
    per_dev_nodes = [[] for _ in range(n_devices)]
    per_dev = [dict(masks=[], child=[], leaf=[], albedo=[], normal=[],
                    density=[], n_nodes=0, n_leaves=0)
               for _ in range(n_devices)]
    for i, sub in enumerate(subs):
        dv = per_dev[owner[i]]
        roots[i] = dv["n_nodes"]
        leaf_offs[i] = dv["n_leaves"]
        m = np.asarray(sub.masks)
        dv["masks"].append(m)
        dv["child"].append(
            np.where((m >> 8) & ~m & 0xFF,
                     np.asarray(sub.child_base) + dv["n_nodes"], 0))
        dv["leaf"].append(
            np.where(m & 0xFF, np.asarray(sub.leaf_base) + dv["n_leaves"], 0))
        dv["albedo"].append(np.asarray(sub.leaf_albedo))
        dv["normal"].append(np.asarray(sub.leaf_normal))
        dv["density"].append(np.asarray(sub.leaf_density))
        dv["n_nodes"] += sub.n_nodes
        dv["n_leaves"] += sub.n_leaves

    cap_nodes = max(max(d["n_nodes"] for d in per_dev), 1)
    cap_leaves = max(max(d["n_leaves"] for d in per_dev), 1)
    am = np.zeros((n_devices, cap_nodes), np.int32)
    ac = np.zeros((n_devices, cap_nodes), np.int32)
    al = np.zeros((n_devices, cap_nodes), np.int32)
    aa = np.zeros((n_devices, cap_leaves, 3), np.float32)
    an = np.zeros((n_devices, cap_leaves, 3), np.float32)
    ad = np.zeros((n_devices, cap_leaves), np.float32)
    for dev, dv in enumerate(per_dev):
        if dv["n_nodes"]:
            am[dev, :dv["n_nodes"]] = np.concatenate(dv["masks"])
            ac[dev, :dv["n_nodes"]] = np.concatenate(dv["child"])
            al[dev, :dv["n_nodes"]] = np.concatenate(dv["leaf"])
        if dv["n_leaves"]:
            aa[dev, :dv["n_leaves"]] = np.concatenate(dv["albedo"])
            an[dev, :dv["n_leaves"]] = np.concatenate(dv["normal"])
            ad[dev, :dv["n_leaves"]] = np.concatenate(dv["density"])

    size = 2.0 ** (-split_level)
    origins = node_coords_level.astype(np.float32) * size

    # global leaf interval per octant (octants and leaves are both Morton-
    # ordered, so the ranges tile the leaf array in octant order) — used to
    # map arena-local leaf rows/grads back to global leaf ids
    n_leaves_per = np.array([s.n_leaves for s in subs], np.int64)
    leaf_lo = np.concatenate([[0], np.cumsum(n_leaves_per)[:-1]]).astype(
        np.int32)

    return LevelShardedSVO(
        trunk_masks=trunk_masks, trunk_child=trunk_child,
        trunk_leaf=trunk_leaf, trunk_depth=split_level,
        trunk_level_start=tuple(svo.level_start[: split_level + 1]),
        octant_owner=owner, octant_root=roots, octant_leaf_off=leaf_offs,
        octant_origin=origins, octant_size=size,
        sub_depth=svo.depth - split_level,
        arena_masks=am, arena_child=ac, arena_leaf=al,
        arena_albedo=aa, arena_normal=an, arena_density=ad,
        octant_leaf_lo=leaf_lo, octant_n_leaves=n_leaves_per.astype(np.int32),
    )


def make_sharded_trace(mesh, ls: LevelShardedSVO, max_octants=None):
    """Build a jitted trace over the mesh: rays replicated (every device
    sees the full batch), subtree arenas sharded on the device axis.

    Returns fn(trunk..., octant tables..., arenas..., o, d) ->
    (leaf, t, owner) per ray, where `leaf` indexes the owner device's arena
    leaf arrays (and is only meaningful there; radiance-style consumers
    compute locally and psum, so the per-ray result lives on its owner)."""
    trunk_depth = ls.trunk_depth
    sub_depth = ls.sub_depth
    size = ls.octant_size

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(), P(),
                  P(RAY_AXIS, None), P(RAY_AXIS, None), P(RAY_AXIS, None),
                  P(), P()),
        out_specs=(P(), P(), P(), P()),
        check_vma=True,
    )
    def _trace(trunk_m, trunk_c, trunk_l, oct_owner, oct_root, oct_leaf_off,
               oct_origin, arena_m3, arena_c3, arena_l3, o, d):
        # rays are replicated but each device's trace results are device-
        # local (they depend on the local arena shard): mark the ray inputs
        # varying up front so every downstream carry is vma-consistent
        o = jax.lax.pcast(o, RAY_AXIS, to="varying")
        d = jax.lax.pcast(d, RAY_AXIS, to="varying")
        out_leaf, out_t, out_owner, truncated = _phase_loop_local(
            trunk_m, trunk_c, trunk_l, oct_owner, oct_root, oct_origin,
            arena_m3[0], arena_c3[0], arena_l3[0], o, d, trunk_depth,
            sub_depth, size, max_octants)

        # combine across devices: each ray's record lives on its owner;
        # psum with owner masking produces the global per-ray answer
        my_dev = jax.lax.axis_index(RAY_AXIS)
        has = out_owner == my_dev
        any_owner = jax.lax.psum(has.astype(jnp.int32), RAY_AXIS) > 0
        leaf_sum = jax.lax.psum(jnp.where(has, out_leaf, 0), RAY_AXIS)
        out_leaf = jnp.where(any_owner, leaf_sum, -1)
        out_t = jax.lax.psum(jnp.where(has, out_t, 0.0), RAY_AXIS)
        out_owner = jax.lax.pmax(out_owner, RAY_AXIS)
        # truncated is logically replicated (done depends only on psum'ed
        # state) but the checker can't infer that; the psum also makes the
        # "any device truncated" semantics explicit
        truncated = jax.lax.psum(truncated.astype(jnp.int32), RAY_AXIS) > 0
        return out_leaf, out_t, out_owner, truncated

    return _trace


def _phase_loop_local(trunk_m, trunk_c, trunk_l, oct_owner, oct_root,
                      oct_origin, arena_m, arena_c, arena_l, o, d,
                      trunk_depth, sub_depth, size, max_octants=None):
    """Per-device phase loop (runs inside shard_map): replicated rays against
    the replicated trunk + this device's arena. Returns per-ray
    (leaf_in_my_arena, t_world, owner, truncated).

    Runs a while-until-all-done loop bounded by the provable maximum number
    of occupied split-level octants a segment can cross (3 * 2^trunk_depth
    grid crossings + entry/exit slack), so no ray silently misses because it
    grazed more octants than a fixed round count (VERDICT r02 item 6). The
    trip count is identical on every device (rays are replicated and `done`
    depends only on psum'ed state), so the in-loop psum is safe. `truncated`
    flags rays still pending at the bound (provably none unless a caller
    passes a smaller explicit max_octants, as the multichip dryrun does for
    speed).
    """
    trunk_p = traverse.derive_parent_ptr_jnp(trunk_m, trunk_c)
    arena_p = traverse.derive_parent_ptr_jnp(arena_m, arena_c)
    my_dev = jax.lax.axis_index(RAY_AXIS)
    n = o.shape[0]
    n_max = (3 * (1 << trunk_depth) + 4) if max_octants is None \
        else max_octants
    eps = jnp.float32(1e-5)

    def body(carry):
        r, t_off, done, out_leaf, out_t, out_owner = carry
        o_cur = o + t_off[:, None] * d
        r1 = traverse._trace_core(trunk_m, trunk_c, trunk_l, trunk_p,
                                  o_cur, d, trunk_depth)
        found = (r1.hit_leaf >= 0) & ~done
        oct_id = jnp.where(found, r1.hit_leaf, 0)
        owner = jnp.take(oct_owner, oct_id)
        mine = found & (owner == my_dev)

        c_org = jnp.take(oct_origin, oct_id, axis=0)
        o_loc = (o_cur - c_org) / size
        roots = jnp.take(oct_root, oct_id)
        r2 = traverse._trace_core(arena_m, arena_c, arena_l, arena_p,
                                  o_loc, d, sub_depth, root=roots)
        hit2_mine = (r2.hit_leaf >= 0) & mine

        # did ANY device's owned content stop this ray this phase?
        hit2_any = jax.lax.psum(hit2_mine.astype(jnp.int32), RAY_AXIS) > 0
        new = hit2_mine & ~done
        out_owner = jnp.where(new, my_dev, out_owner)
        out_leaf = jnp.where(new, r2.hit_leaf, out_leaf)
        out_t = jnp.where(new, t_off + r2.hit_t * size, out_t)
        done = done | (hit2_any & found) | ~found

        # found an octant but no content: advance past its AABB
        t_exit = _aabb_exit_jnp(o_cur, d, c_org, size)
        adv = found & ~hit2_any
        t_off = jnp.where(adv, t_off + t_exit + eps, t_off)
        return r + 1, t_off, done, out_leaf, out_t, out_owner

    def cond(carry):
        r, _t, done, *_ = carry
        return (r < n_max) & jnp.any(~done)

    # ray-shaped carry constants derive from the (varying) ray inputs so the
    # while_loop stays vma-consistent under shard_map (traverse.vconst)
    zf = traverse.vconst(o[:, 0])
    zi = zf.astype(jnp.int32)
    carry = (jnp.int32(0), zf, zf != 0.0, zi - 1, zf, zi - 1)
    _, _, done, out_leaf, out_t, out_owner = jax.lax.while_loop(
        cond, body, carry)
    return out_leaf, out_t, out_owner, ~done


def make_sharded_fit_step(mesh, ls: LevelShardedSVO, max_octants=None,
                          light_intensity: float = 1.3,
                          light_ambient: float = 0.08):
    """Level-sharded TRAINING step (BASELINE config 5 semantics): voxel
    parameters stay sharded with their arenas; each device backprops through
    its own phase-2 trace + shading contribution; gradients are device-local
    (out_specs keep them sharded) and only the replicated scalar loss is
    shared.

    Returns fn(arena_albedo, arena_normal, arena_density, trunk..., octant
    tables..., arena structure..., o, d, light_dir, target) ->
    (loss, (d_albedo, d_normal, d_density)) with grads sharded like the
    params. Matches the single-tree diff.loss_and_grads semantics (tested on
    the 8-device CPU mesh)."""
    from raytracingtest_tpu.render import sky_color

    trunk_depth = ls.trunk_depth
    sub_depth = ls.sub_depth
    size = ls.octant_size

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(RAY_AXIS, None, None), P(RAY_AXIS, None, None),
                  P(RAY_AXIS, None),
                  P(), P(), P(), P(), P(), P(),
                  P(RAY_AXIS, None), P(RAY_AXIS, None), P(RAY_AXIS, None),
                  P(), P(), P(), P()),
        out_specs=(P(), (P(RAY_AXIS, None, None), P(RAY_AXIS, None, None),
                         P(RAY_AXIS, None))),
        check_vma=True,
    )
    def _step(alb3, nrm3, den3, trunk_m, trunk_c, trunk_l, oct_owner,
              oct_root, oct_origin, arena_m3, arena_c3, arena_l3, o, d,
              light_dir, target):
        # replicated rays, device-local trace results (see make_sharded_trace)
        d_rep = d           # replicated copy: the sky/loss terms below must
        o = jax.lax.pcast(o, RAY_AXIS, to="varying")
        d = jax.lax.pcast(d, RAY_AXIS, to="varying")
        my_dev = jax.lax.axis_index(RAY_AXIS)
        out_leaf, out_t, out_owner, _truncated = _phase_loop_local(
            trunk_m, trunk_c, trunk_l, oct_owner, oct_root, oct_origin,
            arena_m3[0], arena_c3[0], arena_l3[0], o, d, trunk_depth,
            sub_depth, size, max_octants)
        out_leaf = jax.lax.stop_gradient(out_leaf)
        out_owner = jax.lax.stop_gradient(out_owner)

        mine = out_owner == my_dev
        safe_leaf = jnp.where(mine, out_leaf, 0)
        any_hit = jax.lax.psum(mine.astype(jnp.int32), RAY_AXIS) > 0
        # stay REPLICATED so the final loss (out_specs P()) passes the vma
        # checker: sky depends only on ray directions, identical per device
        sky = sky_color(d_rep, jnp)
        n_rays = o.shape[0]

        # Each ray's error term is owned by exactly one device (its hit's
        # owner) or by nobody (sky). Differentiate ONLY the locally-owned
        # part: the global loss is a disjoint sum over owners, so
        # d(global)/d(my params) == d(my part)/d(my params) exactly — no AD
        # through collectives (whose transpose is unreliable under
        # check_vma=True).
        def local_part(albedo, normal, density):
            alb = jnp.take(albedo[0], safe_leaf, axis=0)
            nrm = jnp.take(normal[0], safe_leaf, axis=0)
            den = jnp.take(density[0], safe_leaf)
            ldir = light_dir / jnp.sqrt(jnp.sum(light_dir * light_dir))
            nn = nrm / jnp.sqrt(
                jnp.maximum(jnp.sum(nrm * nrm, -1, keepdims=True), 1e-12))
            ndotl = jnp.maximum(jnp.sum(nn * (-ldir)[None, :], axis=-1), 0.0)
            lit = alb * (ndotl * light_intensity + light_ambient)[:, None]
            alpha = jnp.clip(den, 0.0, 1.0)[:, None]
            shaded = alpha * lit + (1.0 - alpha) * sky
            err = jnp.sum((shaded - target) ** 2, axis=1)
            return jnp.sum(jnp.where(mine, err, 0.0)) / (3.0 * n_rays)

        part, grads = jax.value_and_grad(local_part, argnums=(0, 1, 2))(
            alb3, nrm3, den3)
        sky_err = jnp.sum(
            jnp.where(~any_hit[:, None], (sky - target) ** 2, 0.0))
        loss = jax.lax.psum(part, RAY_AXIS) + sky_err / (3.0 * n_rays)
        return loss, grads

    return _step


def make_exchange_trace(mesh, ls: LevelShardedSVO, max_rounds: int = 64,
                        cap_factor: int = 2):
    """Ray-exchange level-sharded trace: rays sharded AND content sharded.

    Per round, each device (1) trunk-traces only its LOCAL ray shard,
    (2) buckets pending rays by their hit octant's owner and all_to_all's
    the packets (fixed per-peer capacity cap = cap_factor * ceil(n_local /
    n_dev); overflow rays simply retry next round), (3) traces the received
    rays — all owned by this device — against its local arena, and (4)
    returns results with the mirror all_to_all. Deep-trace work per device
    is ~N/n_dev instead of the replicate-and-mask N of make_sharded_trace.

    The rounds run in a lax.while_loop that DRAINS until every ray on every
    device is resolved (psum'ed pending count — VERDICT r04 item 5: no
    surfaced-but-unhandled truncation at scale); max_rounds is only a
    safety cap, and the returned truncation mask is all-False in every
    validated config. Early exit means a generous cap costs nothing at
    runtime.

    Returns fn(trunk..., octant tables..., arenas..., o_shard, d_shard) ->
    (leaf, t, owner, traced_count) with the per-ray outputs sharded like the
    rays and traced_count (1,) per device = how many rays this device's
    arena actually traced (the load-balance diagnostic)."""
    trunk_depth = ls.trunk_depth
    sub_depth = ls.sub_depth
    size = ls.octant_size
    n_dev = ls.n_devices

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(),
                  P(RAY_AXIS, None), P(RAY_AXIS, None), P(RAY_AXIS, None),
                  P(RAY_AXIS, None), P(RAY_AXIS, None)),
        out_specs=(P(RAY_AXIS), P(RAY_AXIS), P(RAY_AXIS), P(RAY_AXIS),
                   P(RAY_AXIS)),
        check_vma=True,
    )
    def _trace(trunk_m, trunk_c, trunk_l, oct_owner, oct_root, oct_origin,
               arena_m3, arena_c3, arena_l3, o, d):
        i32, f32 = jnp.int32, jnp.float32
        arena_m, arena_c, arena_l = arena_m3[0], arena_c3[0], arena_l3[0]
        trunk_p = traverse.derive_parent_ptr_jnp(trunk_m, trunk_c)
        arena_p = traverse.derive_parent_ptr_jnp(arena_m, arena_c)
        my_dev = jax.lax.axis_index(RAY_AXIS)
        n = o.shape[0]                      # local ray count
        cap = cap_factor * ((n + n_dev - 1) // n_dev)
        eps = f32(1e-5)

        def body(carry):
            r, t_off, done, out_leaf, out_t, out_owner, traced = carry
            o_cur = o + t_off[:, None] * d
            r1 = traverse._trace_core(trunk_m, trunk_c, trunk_l, trunk_p,
                                      o_cur, d, trunk_depth)
            found = (r1.hit_leaf >= 0) & ~done
            done = done | ~found            # trunk miss = final miss
            oct_id = jnp.where(found, r1.hit_leaf, 0)
            owner = jnp.take(oct_owner, oct_id)

            # ---- bucket pending rays by owner: slot = rank within group --
            key = jnp.where(found, owner, n_dev)
            order = jnp.argsort(key)        # stable
            sk = jnp.take(key, order)
            posn = jnp.arange(n, dtype=i32)
            is_first = jnp.concatenate(
                [jnp.ones(1, bool), sk[1:] != sk[:-1]])
            seg_start = jax.lax.cummax(jnp.where(is_first, posn, 0))
            rank = posn - seg_start
            ray_id = order
            ok = (sk < n_dev) & (rank < cap)
            flat = jnp.where(ok, sk * cap + rank, n_dev * cap)
            idx_buf = jnp.full(n_dev * cap + 1, -1, i32).at[flat].set(
                jnp.where(ok, ray_id, -1))
            idx_send = idx_buf[:-1].reshape(n_dev, cap)
            sent = jnp.zeros(n, bool).at[jnp.where(ok, ray_id, n)].set(
                True, mode="drop")

            safe_idx = jnp.maximum(idx_send, 0)
            send_valid = idx_send >= 0
            send_o = jnp.take(o_cur, safe_idx.reshape(-1), axis=0).reshape(
                n_dev, cap, 3)
            send_d = jnp.take(d, safe_idx.reshape(-1), axis=0).reshape(
                n_dev, cap, 3)
            send_oct = jnp.where(
                send_valid,
                jnp.take(oct_id, safe_idx.reshape(-1)).reshape(n_dev, cap), 0)

            # ---- exchange: slice j of recv came from device j ------------
            recv_o = jax.lax.all_to_all(send_o, RAY_AXIS, 0, 0, tiled=False)
            recv_d = jax.lax.all_to_all(send_d, RAY_AXIS, 0, 0, tiled=False)
            recv_oct = jax.lax.all_to_all(send_oct, RAY_AXIS, 0, 0,
                                          tiled=False)
            recv_valid = jax.lax.all_to_all(
                send_valid.astype(i32), RAY_AXIS, 0, 0, tiled=False) != 0

            # ---- owner-side deep trace (every received ray is mine) ------
            ro = recv_o.reshape(n_dev * cap, 3)
            rd = recv_d.reshape(n_dev * cap, 3)
            roct = recv_oct.reshape(n_dev * cap)
            c_org = jnp.take(oct_origin, roct, axis=0)
            o_loc = (ro - c_org) / size
            roots = jnp.take(oct_root, roct)
            r2 = traverse._trace_core(arena_m, arena_c, arena_l, arena_p,
                                      o_loc, rd, sub_depth, root=roots)
            traced = traced + jnp.sum(recv_valid.astype(i32))

            res_leaf = jnp.where(recv_valid.reshape(-1), r2.hit_leaf,
                                 -1).reshape(n_dev, cap)
            res_t = (r2.hit_t * size).reshape(n_dev, cap)

            # ---- results home ------------------------------------------
            back_leaf = jax.lax.all_to_all(res_leaf, RAY_AXIS, 0, 0,
                                           tiled=False)
            back_t = jax.lax.all_to_all(res_t, RAY_AXIS, 0, 0, tiled=False)

            # scatter into local rays: slot order matches idx_send; invalid
            # slots are routed out of bounds and dropped
            flat_idx = idx_send.reshape(-1)
            valid = flat_idx >= 0
            safe = jnp.where(valid, flat_idx, n)
            hit_leaf_r = jnp.zeros(n, i32).at[safe].set(
                back_leaf.reshape(-1), mode="drop")
            hit_t_r = jnp.zeros(n, f32).at[safe].set(
                back_t.reshape(-1), mode="drop")
            got_hit = jnp.zeros(n, bool).at[safe].set(
                back_leaf.reshape(-1) >= 0, mode="drop")

            new = sent & got_hit & ~done
            out_leaf = jnp.where(new, hit_leaf_r, out_leaf)
            out_t = jnp.where(new, t_off + hit_t_r, out_t)
            out_owner = jnp.where(new, owner, out_owner)
            done = done | new

            # sent-but-missed: advance past the octant AABB; overflow
            # (found & ~sent) retries next round at the same t
            c_org_l = jnp.take(oct_origin, oct_id, axis=0)
            t_exit = _aabb_exit_jnp(o_cur, d, c_org_l, size)
            adv = sent & ~got_hit & ~done
            t_off = jnp.where(adv, t_off + t_exit + eps, t_off)
            return r + 1, t_off, done, out_leaf, out_t, out_owner, traced

        def cond(carry):
            r, _t, done, *_ = carry
            # drain until every ray everywhere is resolved (identical on
            # all devices: psum'ed pending count), bounded by max_rounds as
            # a pure safety cap — capacity-overflowed rays retry next round
            # and octant advances are finite, so the loop terminates
            pending = jax.lax.psum(jnp.sum((~done).astype(jnp.int32)),
                                   RAY_AXIS)
            return (r < max_rounds) & (pending > 0)

        # varying-typed carry constants (traverse.vconst) keep the
        # while_loop vma-consistent under the checked shard_map
        zf = traverse.vconst(o[:, 0])
        zi = zf.astype(i32)
        traced0 = jnp.sum(zi)               # varying scalar zero
        carry = (jnp.int32(0), zf, zf != 0.0, zi - 1, zf, zi - 1, traced0)
        _, _, done, out_leaf, out_t, out_owner, traced = jax.lax.while_loop(
            cond, body, carry)

        # rays still pending at the safety cap: reported, never silent
        # (with the drain loop this is 0 in every validated config)
        return out_leaf, out_t, out_owner, traced.reshape(1), ~done

    return _trace


def _aabb_exit_jnp(o, d, box_org, size):
    safe_d = jnp.where(jnp.abs(d) < 1e-12, 1e-12, d)
    t0 = (box_org - o) / safe_d
    t1 = (box_org + size - o) / safe_d
    t_far = jnp.maximum(t0, t1)
    return jnp.maximum(jnp.min(t_far, axis=1), 0.0)
