"""Interior-node attributes + LOD rendering.

The reference averages child colors/normals into interior nodes at build
time (NaiveCreator.cs:97-114) and its CUDA ground truth terminates descent
when a voxel is smaller than the ray footprint (Trace.cu:135-136
ray_size_coef) — a feature the C#/HLSL ports dropped (SURVEY.md §2.3).
Here both exist: bottom-up averaged fp node attributes and an LOD render
that shades ray-footprint-terminated hits from them.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from raytracingtest_tpu.ops import traverse
from raytracingtest_tpu.ops.codecs import _popc8_np
from raytracingtest_tpu.render import Light, sky_color


def compute_node_attributes(svo):
    """Bottom-up averaged (node_albedo f32 [n_nodes,3],
    node_normal f32 [n_nodes,3]) — the fp analog of build_attachments'
    palette averaging."""
    masks = np.asarray(svo.masks)
    child_base = np.asarray(svo.child_base)
    leaf_base = np.asarray(svo.leaf_base)
    albedo = np.asarray(svo.leaf_albedo)
    normal = np.asarray(svo.leaf_normal)
    n_nodes = masks.shape[0]

    node_albedo = np.zeros((n_nodes, 3), np.float32)
    node_normal = np.zeros((n_nodes, 3), np.float32)
    slots = np.arange(8)
    below = (1 << slots) - 1

    for l in range(svo.depth - 1, -1, -1):
        lo, hi = svo.level_start[l], svo.level_start[l + 1]
        if hi == lo:
            continue
        m = masks[lo:hi]
        vm = (m[:, None] >> 8) & 0xFF
        lm = m[:, None] & 0xFF
        v = ((vm >> slots) & 1).astype(bool)
        lf = ((lm >> slots) & 1).astype(bool) & v
        leaf_rank = _popc8_np(vm & lm & below[None, :])
        node_rank = _popc8_np(vm & ~lm & below[None, :])
        leaf_ids = np.clip(leaf_base[lo:hi, None] + leaf_rank, 0,
                           max(albedo.shape[0] - 1, 0))
        node_ids = np.clip(child_base[lo:hi, None] + node_rank, 0,
                           n_nodes - 1)
        ca = np.where(lf[..., None], albedo[leaf_ids],
                      np.where((v & ~lf)[..., None], node_albedo[node_ids],
                               0.0))
        cn = np.where(lf[..., None], normal[leaf_ids],
                      np.where((v & ~lf)[..., None], node_normal[node_ids],
                               0.0))
        cnt = np.maximum(v.sum(-1, keepdims=True), 1)
        node_albedo[lo:hi] = ca.sum(1) / cnt
        s = cn.sum(1)
        nn = np.linalg.norm(s, axis=-1, keepdims=True)
        node_normal[lo:hi] = s / np.maximum(nn, 1e-12)
    return node_albedo, node_normal


def render_lod(svo, node_albedo, node_normal, o, d, pixel_size_coef,
               light: Light = Light(), xp=jnp):
    """Forward render with LOD early-exit; node hits shade from averaged
    interior attributes, leaf hits from leaf attributes. Returns (N,3)."""
    res = traverse.trace_lod_jax(svo, o, d, pixel_size_coef)
    return shade_lod(svo, node_albedo, node_normal, res, d, light), res


def shade_lod(svo, node_albedo, node_normal, res, d, light: Light = Light()):
    """Shade an LOD TraceResult (from trace_lod_jax or the brick path's
    trace_brick_lod_jax — hit_node rows are original-SVO node rows in both).
    Returns (N,3) radiance."""
    is_node = res.hit_node >= 0
    is_leaf = res.hit_leaf >= 0
    leaf_alb = jnp.take(jnp.asarray(svo.leaf_albedo),
                        jnp.where(is_leaf, res.hit_leaf, 0), axis=0)
    leaf_nrm = jnp.take(jnp.asarray(svo.leaf_normal),
                        jnp.where(is_leaf, res.hit_leaf, 0), axis=0)
    node_alb = jnp.take(jnp.asarray(node_albedo),
                        jnp.where(is_node, res.hit_node, 0), axis=0)
    node_nrm = jnp.take(jnp.asarray(node_normal),
                        jnp.where(is_node, res.hit_node, 0), axis=0)
    alb = jnp.where(is_node[:, None], node_alb, leaf_alb)
    nrm = jnp.where(is_node[:, None], node_nrm, leaf_nrm)

    ldir = jnp.asarray(light.direction, jnp.float32)
    ldir = ldir / jnp.sqrt(jnp.sum(ldir * ldir))
    ndotl = jnp.maximum(jnp.sum(nrm * (-ldir)[None, :], axis=-1), 0.0)
    lit = alb * (ndotl * light.intensity + light.ambient)[:, None]
    sky = sky_color(jnp.asarray(d, jnp.float32), jnp)
    hit_any = is_node | is_leaf
    return jnp.where(hit_any[:, None], lit, sky)
