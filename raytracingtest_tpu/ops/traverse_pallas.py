"""Pallas TPU traversal kernel — the hot forward path.

TPU-native re-design of the reference's per-thread HLSL megakernel loop
(Assets/Shaders/NVIDIASVO.compute:57-156), structured for the hardware
(SURVEY.md §7.3.1-3):

  * rays are tiled (8, 128) VPU-register-shaped batches; the grid walks
    ray tiles, so each tile's while-loop exits as soon as *its* rays
    converge (the XLA whole-batch loop pays the worst ray of the entire
    image; camera-coherent tiles converge together)
  * the packed octree (masks + child pointers) is VMEM-resident — every
    traversal step's descriptor fetch is an on-chip vector gather instead
    of an HBM round-trip (the reference's per-thread `svo[parent]` loads,
    NVIDIASVO.compute:60-62); the node limit is VMEM-bounded (~1M nodes)
  * the 24-entry per-thread stack (NVIDIASVO.compute:13) becomes a
    (depth, 8, 128) register-resident array addressed with masked selects
    (no scatter hardware needed)
  * PUSH/ADVANCE/POP divergence becomes lane masking; POP's
    float-mantissa scale recovery keeps the reference's bit-exact scheme
    via lax.bitcast_convert_type
  * leaf attribute resolution (leaf_base gather + popcount rank) happens
    OUTSIDE the kernel in XLA, halving the kernel's VMEM table footprint

Semantics are bit-identical to ops/traverse.py (tested); that module is the
spec, this one is the speed.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracingtest_tpu.ops.traverse import (
    S_MAX, TraceResult, max_iters_for_depth, popc8,
)

TILE = (8, 128)
TILE_N = TILE[0] * TILE[1]


def _f2i(x):
    return jax.lax.bitcast_convert_type(x, jnp.int32)


def _i2f(x):
    return jax.lax.bitcast_convert_type(x, jnp.float32)


def _kernel(masks_ref, child_ref,
            ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
            parent_out, child_out, t_out, iters_out,
            *, depth):
    f32, i32 = jnp.float32, jnp.int32
    s0 = S_MAX - depth

    o = [ox_ref[0] + f32(1.0), oy_ref[0] + f32(1.0), oz_ref[0] + f32(1.0)]
    d = [dx_ref[0], dy_ref[0], dz_ref[0]]

    eps = f32(2.0 ** -S_MAX)
    d = [jnp.where(jnp.abs(c) < eps, jnp.where(c >= 0, eps, -eps), c)
         for c in d]

    t_coef = [f32(-1.0) / jnp.abs(c) for c in d]
    t_bias = [t_coef[i] * o[i] for i in range(3)]

    octant_mask = jnp.full(TILE, 7, i32)
    for i in range(3):
        pos_dir = d[i] > 0.0
        octant_mask = jnp.where(pos_dir, octant_mask ^ (1 << i), octant_mask)
        t_bias[i] = jnp.where(pos_dir, f32(3.0) * t_coef[i] - t_bias[i],
                              t_bias[i])

    t_min = jnp.maximum(
        jnp.maximum(f32(2.0) * t_coef[0] - t_bias[0],
                    f32(2.0) * t_coef[1] - t_bias[1]),
        f32(2.0) * t_coef[2] - t_bias[2])
    t_max = jnp.minimum(
        jnp.minimum(t_coef[0] - t_bias[0], t_coef[1] - t_bias[1]),
        t_coef[2] - t_bias[2])
    t_min = jnp.maximum(t_min, f32(0.0))

    done = t_min >= t_max
    h = t_max

    idx = jnp.zeros(TILE, i32)
    pos = [jnp.full(TILE, 1.0, f32) for _ in range(3)]
    for i in range(3):
        upper = f32(1.5) * t_coef[i] - t_bias[i] > t_min
        idx = jnp.where(upper, idx ^ (1 << i), idx)
        pos[i] = jnp.where(upper, f32(1.5), pos[i])

    parent = jnp.zeros(TILE, i32)
    scale = jnp.full(TILE, S_MAX - 1, i32)
    scale_exp2 = jnp.full(TILE, 0.5, f32)
    hit_parent = jnp.full(TILE, -1, i32)
    hit_child = jnp.zeros(TILE, i32)
    hit_t = jnp.zeros(TILE, f32)
    stack_node = jnp.zeros((depth,) + TILE, i32)
    stack_tmax = jnp.zeros((depth,) + TILE, f32)
    iters = jnp.zeros(TILE, i32)

    slot_iota = jax.lax.broadcasted_iota(i32, (depth,) + TILE, 0)
    n_max = max_iters_for_depth(depth)

    def cond(carry):
        (it, done, *_rest) = carry
        return (it < n_max) & jnp.any(~done)

    def body(carry):
        (it, done, parent, idx, scale, scale_exp2, t_min, t_max, h,
         pos0, pos1, pos2, hit_parent, hit_child, hit_t,
         stack_node, stack_tmax, iters) = carry
        pos = [pos0, pos1, pos2]
        active = ~done

        desc = jnp.take(masks_ref[:], parent, axis=0)
        vm = (desc >> 8) & 0xFF
        lm = desc & 0xFF

        t_corner = [pos[i] * t_coef[i] - t_bias[i] for i in range(3)]
        tc_max = jnp.minimum(jnp.minimum(t_corner[0], t_corner[1]),
                             t_corner[2])

        child_shift = idx ^ octant_mask ^ 7
        child_valid = ((vm >> child_shift) & 1) != 0
        can = child_valid & (t_min <= t_max) & active

        tv_max = jnp.minimum(t_max, tc_max)
        half = scale_exp2 * f32(0.5)
        enter = can & (t_min <= tv_max)
        below = (jnp.int32(1) << child_shift) - 1
        leaf_bit = ((lm >> child_shift) & 1) != 0

        # ---- leaf hit ----
        hit_now = enter & leaf_bit
        hit_parent = jnp.where(hit_now, parent, hit_parent)
        hit_child = jnp.where(hit_now, child_shift, hit_child)
        hit_t = jnp.where(hit_now, t_min, hit_t)
        done = done | hit_now

        # ---- PUSH ----
        push = enter & ~leaf_bit
        slot = jnp.clip(scale - s0, 0, depth - 1)
        write = push & (tc_max < h)
        sel = (slot_iota == slot[None]) & write[None]
        stack_node = jnp.where(sel, parent[None], stack_node)
        stack_tmax = jnp.where(sel, t_max[None], stack_tmax)
        h = jnp.where(push, tc_max, h)

        node_rank = popc8(vm & ~lm & below, jnp)
        cbase = jnp.take(child_ref[:], parent, axis=0)
        parent = jnp.where(push, cbase + node_rank, parent)

        idx_descend = jnp.zeros(TILE, i32)
        pos_descend = list(pos)
        for i in range(3):
            t_center = half * t_coef[i] + t_corner[i]
            upper = t_center > t_min
            idx_descend = jnp.where(upper, idx_descend ^ (1 << i),
                                    idx_descend)
            pos_descend[i] = jnp.where(upper, pos[i] + half, pos[i])

        idx = jnp.where(push, idx_descend, idx)
        pos = [jnp.where(push, pos_descend[i], pos[i]) for i in range(3)]
        scale = jnp.where(push, scale - 1, scale)
        scale_exp2 = jnp.where(push, half, scale_exp2)
        t_max = jnp.where(push, tv_max, t_max)

        # ---- ADVANCE ----
        adv = active & ~push & ~hit_now
        step_bits = [t_corner[i] <= tc_max for i in range(3)]
        step_mask = jnp.zeros(TILE, i32)
        for i in range(3):
            step_mask = jnp.where(step_bits[i], step_mask ^ (1 << i),
                                  step_mask)
            pos[i] = jnp.where(step_bits[i] & adv, pos[i] - scale_exp2,
                               pos[i])
        t_min = jnp.where(adv, jnp.maximum(t_min, tc_max), t_min)
        idx_adv = jnp.where(adv, idx ^ step_mask, idx)

        # ---- POP ----
        pop = adv & ((idx_adv & step_mask) != 0)
        differing = jnp.zeros(TILE, i32)
        for i in range(3):
            x = _f2i(pos[i]) ^ _f2i(pos[i] + scale_exp2)
            differing = jnp.where(step_bits[i], differing | x, differing)
        differing = differing | 1
        new_scale = (_f2i(differing.astype(f32)) >> 23) - 127
        oob = pop & ((new_scale >= S_MAX) | (new_scale < s0))
        pop_ok = pop & ~oob
        done = done | oob

        scale = jnp.where(pop_ok, new_scale, scale)
        scale_exp2 = jnp.where(
            pop_ok,
            _i2f((jnp.clip(new_scale, s0, S_MAX - 1) - S_MAX + 127) << 23),
            scale_exp2)
        slot2 = jnp.clip(scale - s0, 0, depth - 1)
        sel2 = slot_iota == slot2[None]
        parent = jnp.where(
            pop_ok,
            jnp.sum(jnp.where(sel2, stack_node, 0), axis=0), parent)
        t_max = jnp.where(
            pop_ok,
            jnp.sum(jnp.where(sel2, stack_tmax, f32(0.0)), axis=0), t_max)

        shift = jnp.clip(scale, 0, 31)
        sh = [_f2i(pos[i]) >> shift for i in range(3)]
        pos = [jnp.where(pop_ok, _i2f(sh[i] << shift), pos[i])
               for i in range(3)]
        idx = jnp.where(
            pop_ok,
            (sh[0] & 1) | ((sh[1] & 1) << 1) | ((sh[2] & 1) << 2), idx_adv)
        h = jnp.where(pop_ok, f32(0.0), h)

        iters = iters + active.astype(i32)
        return (it + 1, done, parent, idx, scale, scale_exp2, t_min, t_max,
                h, pos[0], pos[1], pos[2], hit_parent, hit_child, hit_t,
                stack_node, stack_tmax, iters)

    carry = (jnp.int32(0), done, parent, idx, scale, scale_exp2, t_min,
             t_max, h, pos[0], pos[1], pos[2], hit_parent, hit_child, hit_t,
             stack_node, stack_tmax, iters)
    carry = jax.lax.while_loop(cond, body, carry)
    (_, done, parent, idx, scale, scale_exp2, t_min, t_max, h,
     _p0, _p1, _p2, hit_parent, hit_child, hit_t,
     stack_node, stack_tmax, iters) = carry

    parent_out[0] = hit_parent
    child_out[0] = hit_child
    t_out[0] = hit_t
    iters_out[0] = iters


@partial(jax.jit, static_argnames=("depth", "interpret"))
def _trace_pallas(masks, child_base, leaf_base, origin, direction, depth,
                  interpret=False):
    n = origin.shape[0]
    g = n // TILE_N
    comps = []
    for arr, c in ((origin, 0), (origin, 1), (origin, 2),
                   (direction, 0), (direction, 1), (direction, 2)):
        comps.append(arr[:, c].reshape(g, *TILE))

    grid = (g,)
    ray_spec = pl.BlockSpec((1,) + TILE, lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    table_spec = pl.BlockSpec(memory_space=pltpu.VMEM)

    out_shape = [
        jax.ShapeDtypeStruct((g,) + TILE, jnp.int32),
        jax.ShapeDtypeStruct((g,) + TILE, jnp.int32),
        jax.ShapeDtypeStruct((g,) + TILE, jnp.float32),
        jax.ShapeDtypeStruct((g,) + TILE, jnp.int32),
    ]
    hit_parent, hit_child, hit_t, iters = pl.pallas_call(
        partial(_kernel, depth=depth),
        grid=grid,
        in_specs=[table_spec, table_spec] + [ray_spec] * 6,
        out_specs=[ray_spec] * 4,
        out_shape=out_shape,
        interpret=interpret,
    )(masks, child_base, *comps)

    hit_parent = hit_parent.reshape(n)
    hit_child = hit_child.reshape(n)
    hit_t = hit_t.reshape(n)
    iters = iters.reshape(n)

    # leaf-id resolution outside the kernel (single gather + rank)
    hit = hit_parent >= 0
    safe_parent = jnp.where(hit, hit_parent, 0)
    desc = jnp.take(masks, safe_parent)
    vm = (desc >> 8) & 0xFF
    lm = desc & 0xFF
    below = (jnp.int32(1) << hit_child) - 1
    rank = popc8(vm & lm & below, jnp)
    hit_leaf = jnp.where(hit, jnp.take(leaf_base, safe_parent) + rank, -1)
    return TraceResult(hit_leaf, hit_t, hit_parent, hit_child, iters)


def trace_pallas(svo, origin, direction, interpret=False) -> TraceResult:
    """Pallas-kernel trace. Ray count must be a multiple of 1024 (pad
    upstream); origin/direction are (N, 3) float32 in octree-local coords."""
    n = np.asarray(origin).shape[0]
    if n % TILE_N:
        raise ValueError(f"ray count {n} not a multiple of {TILE_N}")
    return _trace_pallas(
        jnp.asarray(svo.masks), jnp.asarray(svo.child_base),
        jnp.asarray(svo.leaf_base),
        jnp.asarray(origin, jnp.float32), jnp.asarray(direction, jnp.float32),
        svo.depth, interpret=interpret)
