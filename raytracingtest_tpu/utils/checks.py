"""Runtime validation: checkify-instrumented render/trace entry points.

SURVEY.md §5 books NaN/bounds checking as the framework's analog of the
reference's defensive Debug.LogError calls (Octree.cs:55,67). Production
paths stay check-free (checkify inserts guards into the compiled program);
tests and debug drivers opt in through these wrappers, which assert:

  * traversal outputs in range: hit_leaf in [-1, n_leaves), hit_t finite
    and >= 0
  * shaded radiance finite
  * voxel-parameter gradients finite

Usage:
    err, img = checked_render_diff(albedo, ..., depth=..., light_dir=...)
    err.throw()   # raises with the failed predicate's message
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import checkify

from raytracingtest_tpu import diff
from raytracingtest_tpu.ops import traverse

CHECKS = checkify.user_checks


def _check_trace(res, n_leaves):
    checkify.check(jnp.all(res.hit_leaf >= -1),
                   "traversal produced hit_leaf < -1")
    checkify.check(jnp.all(res.hit_leaf < n_leaves),
                   "traversal produced hit_leaf out of bounds")
    checkify.check(jnp.all(jnp.isfinite(res.hit_t)),
                   "traversal produced non-finite hit_t")
    checkify.check(jnp.all(jnp.where(res.hit_leaf >= 0, res.hit_t, 0.0)
                           >= 0.0), "traversal produced negative hit_t")


@partial(jax.jit, static_argnames=("depth",))
def checked_trace(masks, child_base, leaf_base, parent_ptr, o, d, depth,
                  n_leaves):
    """checkified ESVO trace: returns (err, TraceResult)."""

    def body(masks, child_base, leaf_base, parent_ptr, o, d):
        res = traverse._trace_core(masks, child_base, leaf_base, parent_ptr,
                                   o, d, depth)
        _check_trace(res, n_leaves)
        return res

    return checkify.checkify(body, errors=CHECKS)(
        masks, child_base, leaf_base, parent_ptr, o, d)


@partial(jax.jit, static_argnames=("depth",))
def checked_render_diff(albedo, normal, density, masks, child_base,
                        leaf_base, o, d, depth, light_dir):
    """checkified differentiable render: returns (err, radiance)."""

    def body(albedo, normal, density, masks, child_base, leaf_base, o, d,
             light_dir):
        parent_ptr = traverse.derive_parent_ptr_jnp(masks, child_base)
        res = traverse._trace_jax(masks, child_base, leaf_base, parent_ptr,
                                  o, d, depth)
        _check_trace(res, albedo.shape[0])
        hit_leaf = jax.lax.stop_gradient(res.hit_leaf)
        img = diff.shade_diff(hit_leaf, d, albedo, normal, density,
                              light_dir, 1.3, 0.08)
        checkify.check(jnp.all(jnp.isfinite(img)),
                       "shading produced non-finite radiance")
        return img

    return checkify.checkify(body, errors=CHECKS)(
        albedo, normal, density, masks, child_base, leaf_base, o, d,
        light_dir)


def checked_grads(albedo, normal, density, svo, o, d, light_dir, target):
    """checkified loss gradients: returns (err, (loss, grads)); asserts
    every gradient entry is finite."""

    def body(albedo, normal, density, o, d, light_dir, target):
        loss, grads = jax.value_and_grad(diff.l2_loss, argnums=(0, 1, 2))(
            albedo, normal, density, svo.masks, svo.child_base,
            svo.leaf_base, o, d, svo.depth, light_dir, target)
        for g in grads:
            checkify.check(jnp.all(jnp.isfinite(g)),
                           "non-finite voxel-parameter gradient")
        return loss, grads

    return checkify.checkify(body, errors=CHECKS)(
        albedo, normal, density, o, d, light_dir, target)
