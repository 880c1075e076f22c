"""StreamingRenderer: the streamed-world model — a camera-driven clipmap
of chunk SVOs in device arenas, rendered through the production tile path
with on-device progressive accumulation.

This is the model-level wrapper over stream/clipmap.py for what the
reference's Main scene wires out of MonoBehaviours (Clipmap + Octree +
RaytracingMaster + AddShader + GhostFreeRoamCamera: per-frame chunk
update -> offset upload -> dispatch -> accumulate blit; Clipmap.cs:34-43,
RaytracingMaster.cs:55-74). `cli fly` drives it.

Usage:
    sr = StreamingRenderer(get_scene("terrain"))
    sr.update(camera_pos)                       # stream chunks
    img = sr.render(camera)                     # (H, W, 3), accumulated
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from raytracingtest_tpu.ops import tile as tile_mod
from raytracingtest_tpu.ops.camera import Camera
from raytracingtest_tpu.render import Light
from raytracingtest_tpu.scenes import Scene
from raytracingtest_tpu.stream.clipmap import (
    Arena, BrickArena, Clipmap, DeviceArena, DeviceBrickArena,
    render_clipmap_tile)


class StreamingRenderer:
    """Streamed-world renderer: clipmap LOD rings -> device arenas ->
    stitched per-LOD pyramids -> one-dispatch tile render per frame.

    Progressive accumulation follows the reference's _Sample semantics
    (RaytracingMaster.cs:43-47): while consecutive render() calls use the
    same camera pose, jittered frames average on-device; any pose change
    (or streaming update that changed the resident set) resets."""

    def __init__(self, scene: Scene, min_chunk_size: float = 0.25,
                 radius: int = 2, lods: int = 2, chunk_depth: int = 5,
                 node_capacity: int = 2_000_000,
                 leaf_capacity: int = 4_000_000,
                 world_origin=(0.0, 0.0, 0.0), world_size: float = 1.0,
                 light: Light = Light(), seed: int = 0):
        self.arena = Arena(node_capacity=node_capacity,
                           leaf_capacity=leaf_capacity)
        self.brick_arena = BrickArena(top_capacity=node_capacity,
                                      brick_capacity=leaf_capacity // 2)
        self.clipmap = Clipmap(scene, self.arena,
                               min_chunk_size=min_chunk_size,
                               radius=radius, lods=lods,
                               chunk_depth=chunk_depth,
                               world_origin=world_origin,
                               world_size=world_size,
                               brick_arena=self.brick_arena)
        self.device_arena = DeviceArena(self.arena)
        self.device_bricks = DeviceBrickArena(self.brick_arena)
        self.light = light
        self._rng = np.random.default_rng(seed)
        self._masters = None
        self._acc = None
        self._sample = 0
        self._pose = None

    def update(self, camera_pos) -> dict:
        """One streaming step: clipmap rings follow the camera, dirty
        arena spans sync to the device, and the stitched per-LOD pyramids
        recompile when the resident set changed. Returns the clipmap
        stats dict (+ spans synced)."""
        st = self.clipmap.update(camera_pos)
        st["node_spans"] = self.device_arena.sync()
        st["brick_spans"] = self.device_bricks.sync()
        if st["added"] or st["evicted"]:
            self._masters = None    # stitched lazily at the next render
            self._acc = None        # resident set changed: restart accum
            self._sample = 0
        return st

    @property
    def sample_count(self) -> int:
        """Frames accumulated at the current pose (the _Sample counter)."""
        return self._sample

    def render(self, camera: Camera, accumulate: bool = True,
               fetch: bool = True, k_max: int = 64, fb_tiles: int = 64,
               fb_k: int = 192, fb2_tiles: int = 16):
        """Render one frame. Returns ((H, W, 3) float32, residual count)
        when fetch=True, else (device accumulator (T*P, 3), residual) —
        fetching costs a host round trip; pure animation loops fence on
        the residual and fetch only frames they keep. NOTE: with
        fetch=False the returned accumulator's buffer is DONATED to the
        next render() call — read or np.asarray it before rendering again,
        not after."""
        if self.clipmap.resident == {}:
            self.update(camera.position)
        if self._masters is None:
            # lazy stitch: streaming updates invalidate, the first tile
            # render after a change rebuilds (keeps non-tile consumers of
            # update() from paying the pyramid stitch)
            self._masters = self.clipmap.master_tile()
        pose = (tuple(np.asarray(camera.position, np.float64)),
                tuple(np.asarray(camera.look_at, np.float64)),
                camera.width, camera.height, camera.fov_y_deg)
        if pose != self._pose or not accumulate:
            self._acc = None
            self._sample = 0
            self._pose = pose
        jitter = (self._rng.random(2, dtype=np.float32)
                  if self._sample > 0 else None)
        o, d, corners, grid = tile_mod.tile_rays(camera, np, jitter=jitter)
        self._acc, un = render_clipmap_tile(
            self._masters, self.device_bricks, self.device_arena,
            o, d, corners,
            jnp.asarray(self.light.direction, jnp.float32),
            acc=self._acc, sample=self._sample,
            world_origin=tuple(self.clipmap.world_origin),
            world_size=self.clipmap.world_size,
            k_max=k_max, fb_tiles=fb_tiles, fb_k=fb_k,
            fb2_tiles=fb2_tiles)
        self._sample += 1
        if not fetch:
            return self._acc, un
        img = tile_mod.untile_image(np.asarray(self._acc), grid)
        return (img.reshape(camera.height, camera.width, 3),
                int(np.asarray(un)))
