"""Debug visualization: node-box overlays and ray-probe dumps.

The reference's visual debugging surface (SURVEY.md §2.7): SVODriver's
draggable ray probe drawing intersected nodes (SVODriver.cs:74-90),
per-level gizmo bounds (OnDrawGizmos, SVO/RTUtility/Structs.cs ColoredBox),
and OctreeDebugger's box drawing. Headless equivalents: wireframe AABB
overlays rasterized onto a render, and a textual trace of every node a ray
passes through (the scalar oracle in verbose mode).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from raytracingtest_tpu.ops.camera import Camera
from raytracingtest_tpu.ops.octree import SVO, CHILD_OFFSETS


def node_boxes(svo: SVO, level: int):
    """(origins, size) of every node AABB at `level` (octree-local coords).
    Derived by walking masks/child_base level by level — works for any SVO
    with the canonical layout, no BuildResult needed."""
    masks = np.asarray(svo.masks)
    child_base = np.asarray(svo.child_base)
    if level >= svo.depth:
        raise ValueError(f"level {level} >= depth {svo.depth}")
    coords = np.zeros((1, 3), np.int64)
    rows = np.zeros(1, np.int64)
    for l in range(level):
        m = masks[rows]
        nl = ((m >> 8) & 0xFF) & ~(m & 0xFF)
        hit = ((nl[:, None] >> np.arange(8)) & 1).astype(bool)
        ranks = np.cumsum(hit, axis=1) - 1
        pidx, slots = np.nonzero(hit)
        rows = child_base[rows][pidx] + ranks[pidx, slots]
        coords = coords[pidx] * 2 + CHILD_OFFSETS[slots]
    size = 2.0 ** (-level)
    return coords.astype(np.float32) * size, size


_BOX_EDGES = [(0, 1), (0, 2), (1, 3), (2, 3),
              (4, 5), (4, 6), (5, 7), (6, 7),
              (0, 4), (1, 5), (2, 6), (3, 7)]


def draw_boxes(image: np.ndarray, camera: Camera, origins, size,
               color=(1.0, 1.0, 1.0), max_boxes: int = 4096):
    """Rasterize wireframe AABBs over an (H, W, 3) image in place (the gizmo
    DrawWireCube analog). Returns the image."""
    h, w = image.shape[:2]
    origins = np.asarray(origins, np.float32)[:max_boxes]
    corners = origins[:, None, :] + size * CHILD_OFFSETS[None, :, :]
    pts, in_front = camera.project(corners.reshape(-1, 3))
    pts = pts.reshape(-1, 8, 2)
    in_front = in_front.reshape(-1, 8)
    col = np.asarray(color, np.float32)
    for bi in range(pts.shape[0]):
        for a, b in _BOX_EDGES:
            if not (in_front[bi, a] and in_front[bi, b]):
                continue
            _draw_line(image, pts[bi, a], pts[bi, b], col, h, w)
    return image


def _draw_line(image, p0, p1, col, h, w):
    n = int(max(abs(p1[0] - p0[0]), abs(p1[1] - p0[1]), 1))
    n = min(n, 4 * max(h, w))
    ts = np.linspace(0.0, 1.0, n + 1)
    xs = np.clip((p0[0] + (p1[0] - p0[0]) * ts).astype(np.int64), 0, w - 1)
    ys = np.clip((p0[1] + (p1[1] - p0[1]) * ts).astype(np.int64), 0, h - 1)
    ok = ((xs > 0) & (xs < w - 1) & (ys > 0) & (ys < h - 1))
    image[ys[ok], xs[ok]] = col


def draw_segment(image: np.ndarray, camera: Camera, p0, p1,
                 color=(1.0, 0.2, 0.2), endpoint_px: int = 2):
    """Rasterize a world-space segment (the probe ray between its two
    draggable endpoints, SVODriver.cs:30-33) with small endpoint markers.
    Returns the image (modified in place)."""
    h, w = image.shape[:2]
    pts, in_front = camera.project(np.asarray([p0, p1], np.float32))
    col = np.asarray(color, np.float32)
    if in_front[0] and in_front[1]:
        _draw_line(image, pts[0], pts[1], col, h, w)
    for i, pt in enumerate(pts):
        if not in_front[i]:
            continue
        x, y = int(pt[0]), int(pt[1])
        r = endpoint_px
        y0, y1 = max(y - r, 0), min(y + r + 1, h)
        x0, x1 = max(x - r, 0), min(x + r + 1, w)
        if y0 >= y1 or x0 >= x1:
            continue  # endpoint off-screen
        image[y0:y1, x0:x1] = col if i == 0 else np.asarray(
            (0.2, 1.0, 0.2), np.float32)
    return image


@dataclasses.dataclass
class RayProbeEntry:
    node_row: int
    level: int
    t_enter: float
    is_leaf_hit: bool
    leaf_id: int


def ray_probe(svo: SVO, origin, direction, max_hits: int = 64):
    """Textual SVODriver: every leaf voxel a ray intersects, in t-order
    (the reference draws the Trace() result list; SVODriver.cs:74-87).
    Returns a list of RayProbeEntry using the multi-hit scalar semantics."""
    from raytracingtest_tpu.ops import traverse
    import jax.numpy as jnp

    o = np.asarray(origin, np.float32).reshape(1, 3)
    d = np.asarray(direction, np.float32).reshape(1, 3)
    svo_d = svo.device() if not hasattr(svo.masks, "device") else svo
    res = traverse.trace_multi_jax(svo_d, jnp.asarray(o), jnp.asarray(d),
                                   k=max_hits)
    entries = []
    count = int(np.asarray(res.count)[0])
    leafs = np.asarray(res.hit_leaf)[0]
    tins = np.asarray(res.t_in)[0]
    for i in range(count):
        entries.append(RayProbeEntry(
            node_row=-1, level=svo.depth, t_enter=float(tins[i]),
            is_leaf_hit=True, leaf_id=int(leafs[i])))
    return entries


def format_probe(entries) -> str:
    if not entries:
        return "(no intersections)"
    lines = [f"{i:3d}: leaf {e.leaf_id:8d}  t={e.t_enter:.6f}"
             for i, e in enumerate(entries)]
    return "\n".join(lines)
