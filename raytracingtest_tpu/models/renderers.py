"""Model-level API: the framework's "model families".

Three renderer models over the same packed SVO representation:

  * SurfaceRenderer    — hard-surface Lambert megakernel path
                         (the reference's RaytraceCompute pipeline)
  * VolumetricRenderer — k-segment emission-absorption path with density
                         (north-star extension; Plenoxels-style)
  * InverseRenderer    — the trainable model: voxel parameter pytree +
                         optax optimizer + sharded train step
                         (BASELINE config 4 fit)

Each wraps the functional ops (ops/, diff.py, parallel/) behind a compact
object API for drivers; everything stateful is an explicit pytree.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
import optax

from raytracingtest_tpu import diff
from raytracingtest_tpu.config import CameraConfig, RenderConfig
from raytracingtest_tpu.ops.camera import Camera, OctreeFrame
from raytracingtest_tpu.ops.octree import SVO
from raytracingtest_tpu.parallel.mesh import make_mesh, ray_sharding
from raytracingtest_tpu.parallel.render_sharded import (
    make_train_step, make_train_step_brick)


def _camera(cfg: CameraConfig) -> Camera:
    return Camera(position=cfg.position, look_at=cfg.look_at, up=cfg.up,
                  fov_y_deg=cfg.fov_y_deg, ortho_height=cfg.ortho_height,
                  width=cfg.width, height=cfg.height)


def _brick_of(obj):
    """Lazy cached brick decomposition of a model's SVO (None when the tree
    is too shallow for bricks — shallow trees use the plain path). Keyed on
    the SVO object identity so reassigning `renderer.svo` invalidates the
    cache instead of silently rendering the stale structure."""
    from raytracingtest_tpu.ops import brick as brick_mod
    cache = getattr(obj, "_bsvo_cache", None)
    if cache is None or cache[0] != id(obj.svo):
        if obj.svo.depth >= brick_mod.BRICK_LEVELS + 1:
            bsvo = brick_mod.make_brick_svo(obj.svo).device()
        else:
            bsvo = None
        cache = (id(obj.svo), bsvo)
        object.__setattr__(obj, "_bsvo_cache", cache)
    return cache[1]


def _tile_of(obj):
    """Lazy cached tile decomposition (pyramid + bricks), keyed like
    _brick_of; None when the tree is too shallow."""
    from raytracingtest_tpu.ops import tile as tile_mod
    cache = getattr(obj, "_tsvo_cache", None)
    if cache is None or cache[0] != id(obj.svo):
        bsvo = _brick_of(obj)
        tsvo = (tile_mod.make_tile_svo(obj.svo, bsvo=None).device()
                if bsvo is not None else None)
        cache = (id(obj.svo), tsvo)
        object.__setattr__(obj, "_tsvo_cache", cache)
    return cache[1]


@dataclasses.dataclass
class SurfaceRenderer:
    svo: SVO

    def render(self, camera_cfg: CameraConfig, render_cfg: RenderConfig,
               jitter=None) -> np.ndarray:
        cam = _camera(camera_cfg)
        # pinhole cameras with tile-aligned resolutions ride the tile-
        # amortized hot path (exact: in-jit fallback + host-side residual
        # retrace); everything else falls back to the per-ray brick path
        if (cam.ortho_height <= 0.0 and camera_cfg.width % 16 == 0
                and camera_cfg.height % 16 == 0):
            tsvo = _tile_of(self)
            if tsvo is not None:
                from raytracingtest_tpu.ops import tile as tile_mod
                o_t, d_t, corners, grid = tile_mod.tile_rays(
                    cam, np, jitter=jitter)
                light = jnp.asarray(render_cfg.light_direction, jnp.float32)
                res = tile_mod.trace_tile_exact(
                    tsvo, jnp.asarray(o_t), jnp.asarray(d_t),
                    jnp.asarray(corners))
                img = diff.shade_diff(
                    jax.lax.stop_gradient(res.hit_leaf),
                    jnp.asarray(d_t.reshape(-1, 3)),
                    jnp.asarray(self.svo.leaf_albedo),
                    jnp.asarray(self.svo.leaf_normal),
                    jnp.asarray(self.svo.leaf_density), light,
                    render_cfg.light_intensity, render_cfg.light_ambient)
                img = tile_mod.untile_image(np.asarray(img), grid)
                return img.reshape(camera_cfg.height, camera_cfg.width, 3)
        o, d = cam.rays(np, jitter=jitter)
        light = jnp.asarray(render_cfg.light_direction, jnp.float32)
        bsvo = _brick_of(self)
        if bsvo is not None:
            img = diff.render_diff_brick(
                jnp.asarray(self.svo.leaf_albedo),
                jnp.asarray(self.svo.leaf_normal),
                jnp.asarray(self.svo.leaf_density),
                bsvo.top_masks, bsvo.top_child, bsvo.top_parent, bsvo.bricks,
                jnp.asarray(o), jnp.asarray(d), self.svo.depth,
                bsvo.top_depth, light,
                render_cfg.light_intensity, render_cfg.light_ambient)
        else:
            img = diff.render_diff(
                jnp.asarray(self.svo.leaf_albedo),
                jnp.asarray(self.svo.leaf_normal),
                jnp.asarray(self.svo.leaf_density),
                self.svo.masks, self.svo.child_base, self.svo.leaf_base,
                jnp.asarray(o), jnp.asarray(d), self.svo.depth, light,
                render_cfg.light_intensity, render_cfg.light_ambient)
        return np.asarray(img).reshape(camera_cfg.height, camera_cfg.width, 3)

    def render_progressive(self, camera_cfg: CameraConfig,
                           render_cfg: RenderConfig, seed=0) -> np.ndarray:
        rng = np.random.default_rng(seed)
        acc = None
        for s in range(max(render_cfg.samples, 1)):
            img = self.render(camera_cfg, render_cfg,
                              jitter=rng.random(2, dtype=np.float32))
            acc = img if acc is None else acc + (img - acc) / (s + 1)
        return acc


@dataclasses.dataclass
class VolumetricRenderer:
    svo: SVO
    k: int = 4
    density_scale: float = 64.0

    def render(self, camera_cfg: CameraConfig, render_cfg: RenderConfig,
               jitter=None) -> np.ndarray:
        cam = _camera(camera_cfg)
        o, d = cam.rays(np, jitter=jitter)
        light = jnp.asarray(render_cfg.light_direction, jnp.float32)
        bsvo = _brick_of(self)
        if bsvo is not None:
            img = diff.render_volumetric_brick(
                jnp.asarray(self.svo.leaf_albedo),
                jnp.asarray(self.svo.leaf_normal),
                jnp.asarray(self.svo.leaf_density),
                bsvo.top_masks, bsvo.top_child, bsvo.top_parent, bsvo.bricks,
                jnp.asarray(o), jnp.asarray(d), self.svo.depth,
                bsvo.top_depth, light,
                k=self.k, light_intensity=render_cfg.light_intensity,
                light_ambient=render_cfg.light_ambient,
                density_scale=self.density_scale)
        else:
            img = diff.render_volumetric(
                jnp.asarray(self.svo.leaf_albedo),
                jnp.asarray(self.svo.leaf_normal),
                jnp.asarray(self.svo.leaf_density),
                self.svo.masks, self.svo.child_base, self.svo.leaf_base,
                jnp.asarray(o), jnp.asarray(d), self.svo.depth, light,
                k=self.k, light_intensity=render_cfg.light_intensity,
                light_ambient=render_cfg.light_ambient,
                density_scale=self.density_scale)
        return np.asarray(img).reshape(camera_cfg.height, camera_cfg.width, 3)


@dataclasses.dataclass
class InverseRenderer:
    """Trainable voxel-parameter model with a sharded train step."""

    svo: SVO
    optimize: tuple = ("albedo",)
    learning_rate: float = 5e-2
    n_devices: Optional[int] = None

    def __post_init__(self):
        self.mesh = make_mesh(self.n_devices)
        labels = {
            "albedo": "train" if "albedo" in self.optimize else "freeze",
            "normal": "train" if "normal" in self.optimize else "freeze",
            "density": "train" if "density" in self.optimize else "freeze",
        }
        self.optimizer = optax.multi_transform(
            {"train": optax.adam(self.learning_rate),
             "freeze": optax.set_to_zero()}, labels)
        # the fit runs on the production brick traversal when the tree is
        # deep enough (bit-identical hits -> identical loss/grads; tested)
        self._bsvo = _brick_of(self)
        if self._bsvo is not None:
            self._step = make_train_step_brick(
                self.mesh, self.svo.depth, self._bsvo.top_depth,
                self.optimizer)
        else:
            self._step = make_train_step(self.mesh, self.svo.depth,
                                         self.optimizer)

    def init_params(self, seed: int = 0, randomize=("albedo",)):
        rng = np.random.default_rng(seed)
        params = {
            "albedo": jnp.asarray(self.svo.leaf_albedo),
            "normal": jnp.asarray(self.svo.leaf_normal),
            "density": jnp.asarray(self.svo.leaf_density),
        }
        for name in randomize:
            params[name] = jnp.asarray(
                rng.random(params[name].shape, dtype=np.float32))
        return params, self.optimizer.init(params)

    def shard_rays(self, o, d, target=None):
        sh = ray_sharding(self.mesh)
        o = jax.device_put(jnp.asarray(o), sh)
        d = jax.device_put(jnp.asarray(d), sh)
        if target is None:
            return o, d
        return o, d, jax.device_put(jnp.asarray(target), sh)

    def step(self, params, opt_state, o, d, light, target):
        if self._bsvo is not None:
            b = self._bsvo
            return self._step(params, opt_state, b.top_masks, b.top_child,
                              b.top_parent, b.bricks, o, d, light, target)
        return self._step(params, opt_state, self.svo.masks,
                          self.svo.child_base, self.svo.leaf_base, o, d,
                          light, target)
