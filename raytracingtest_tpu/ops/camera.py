"""Camera ray generation (perspective + orthographic) and the canonical
world<->octree transform.

Parity: the reference builds per-pixel rays from inverse camera/projection
matrices in HLSL (Assets/Shaders/RaytraceCompute.compute:129-141, host side
Assets/Scripts/SVO/GPU/RaytracingMaster.cs:32-41) with a jittered
`_PixelOffset` for progressive accumulation. Here ray gen is a vectorized
function of an explicit camera dataclass — no matrices round-tripped through
a scene graph — producing (N,3) origin/direction arrays.

The single world<->octree transform (octree unit cube at `origin` with edge
`size`) replaces the reference's inconsistent SVO_SCALE=1/32-in, x64-out
constants (Assets/Shaders/NVIDIASVO.compute:4-6,163,171-174; SURVEY.md
§7.3.8).
"""

from __future__ import annotations

import dataclasses

import numpy as np


def _normalize(v, xp, axis=-1):
    n = xp.sqrt(xp.sum(v * v, axis=axis, keepdims=True))
    return v / xp.maximum(n, 1e-12)


@dataclasses.dataclass(frozen=True)
class OctreeFrame:
    """Placement of the octree's unit cube in world space."""

    origin: tuple = (0.0, 0.0, 0.0)
    size: float = 1.0

    def world_to_local(self, o, d, xp):
        org = xp.asarray(self.origin, xp.float32)
        o_l = (xp.asarray(o, xp.float32) - org) / xp.float32(self.size)
        return o_l, xp.asarray(d, xp.float32)

    def t_world(self, t_local, xp):
        # world_to_local divides origins by `size` but leaves directions
        # unscaled, so a local ray parameter t_l satisfies
        #   (o_world + t_w * d - origin) / size = o_local + t_l * d
        # i.e. t_w = size * t_l (the same factor stream/clipmap.py and
        # parallel/level_sharded.py apply for their per-chunk frames)
        return xp.float32(self.size) * t_local


@dataclasses.dataclass(frozen=True)
class Camera:
    """Pinhole or orthographic camera."""

    position: tuple
    look_at: tuple
    up: tuple = (0.0, 1.0, 0.0)
    fov_y_deg: float = 45.0       # perspective vertical FOV
    ortho_height: float = 0.0     # if > 0: orthographic with this extent
    width: int = 256
    height: int = 256

    def basis(self, xp=np):
        pos = xp.asarray(self.position, xp.float32)
        fwd = _normalize(xp.asarray(self.look_at, xp.float32) - pos, xp, axis=0)
        up0 = xp.asarray(self.up, xp.float32)
        right = _normalize(xp.cross(fwd, up0), xp, axis=0)
        up = xp.cross(right, fwd)
        return pos, fwd, right, up

    def rays(self, xp=np, jitter=None):
        """Per-pixel rays, row-major (H, W) flattened to (H*W, 3).

        jitter: optional (2,) or (H*W, 2) pixel offsets in [0,1) (the
        reference's `_PixelOffset`, RaytracingMaster.cs:38); default 0.5
        (pixel centers).
        """
        H, W = self.height, self.width
        pos, fwd, right, up = self.basis(xp)
        jy = jx = xp.float32(0.5)
        if jitter is not None:
            j = xp.asarray(jitter, xp.float32)
            jx, jy = j[..., 0], j[..., 1]
        ii = xp.arange(H, dtype=xp.float32)[:, None]  # row (y, top to bottom)
        jj = xp.arange(W, dtype=xp.float32)[None, :]
        u = xp.broadcast_to((jj + jx) / W * 2.0 - 1.0, (H, W))
        v = xp.broadcast_to(1.0 - (ii + jy) / H * 2.0, (H, W))  # +v is up
        aspect = W / H

        if self.ortho_height > 0.0:
            hh = xp.float32(self.ortho_height * 0.5)
            o = (
                pos[None, None, :]
                + right[None, None, :] * (u * aspect * hh)[..., None]
                + up[None, None, :] * (v * hh)[..., None]
            )
            d = xp.broadcast_to(fwd[None, None, :], o.shape)
            return o.reshape(-1, 3), xp.asarray(d).reshape(-1, 3)

        tan_half = float(np.tan(np.radians(self.fov_y_deg) * 0.5))
        d = (
            fwd[None, None, :]
            + right[None, None, :] * (u * aspect * tan_half)[..., None]
            + up[None, None, :] * (v * tan_half)[..., None]
        )
        d = _normalize(d, xp)
        o = xp.broadcast_to(pos[None, None, :], d.shape)
        return xp.asarray(o).reshape(-1, 3), d.reshape(-1, 3)

    def project(self, pts, xp=np):
        """World points -> (pixel xy (N,2), in_front (N,)) — the exact
        inverse of rays()'s pixel mapping; used by viz.draw_boxes (the
        gizmo-rasterization analog of the reference's scene-view boxes)."""
        pts = xp.asarray(pts, xp.float32)
        pos, fwd, right, up = self.basis(xp)
        rel = pts - pos[None, :]
        z = rel @ fwd
        x = rel @ right
        y = rel @ up
        aspect = self.width / self.height
        if self.ortho_height > 0.0:
            hh = self.ortho_height * 0.5
            u = x / (aspect * hh)
            v = y / hh
            in_front = z > 0.0
        else:
            tan_half = float(np.tan(np.radians(self.fov_y_deg) * 0.5))
            zs = xp.where(xp.abs(z) < 1e-9, 1e-9, z)
            u = x / (zs * aspect * tan_half)
            v = y / (zs * tan_half)
            in_front = z > 1e-6
        px = (u + 1.0) * 0.5 * self.width - 0.5
        py = (1.0 - v) * 0.5 * self.height - 0.5
        return xp.stack([px, py], axis=-1), in_front
