"""Forward renderer: camera rays -> traversal -> shading -> image.

Replaces the reference megakernel pipeline (Assets/Shaders/
RaytraceCompute.compute:143-168: CreateCameraRay -> Trace/IntersectSVO ->
Shade -> skybox miss) and the progressive-accumulation blit
(Assets/Shaders/AddShader.shader:42-46, sample-counted running average).

Shading parity: Lambert diffuse N.L x light intensity x albedo on hit
(RaytraceCompute.compute:93-116 — whose specular bounce path is dead code,
energy *= 0, so the effective model is one diffuse bounce), procedural sky
gradient on miss (stand-in for the reference's skybox texture sample,
RaytraceCompute.compute:117-126).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from raytracingtest_tpu.ops.camera import Camera, OctreeFrame
from raytracingtest_tpu.ops import traverse


@dataclasses.dataclass(frozen=True)
class Light:
    """Directional light (reference: RaytracingMaster.cs:36-41 passes the
    scene light's direction + intensity to the shader)."""

    direction: tuple = (-0.5, -1.0, -0.3)
    intensity: float = 1.3
    ambient: float = 0.08


SKY_HORIZON = np.array([0.71, 0.82, 0.95], np.float32)
SKY_ZENITH = np.array([0.22, 0.42, 0.80], np.float32)


def sky_color(d, xp):
    """Procedural vertical-gradient skybox (miss shading)."""
    t = xp.clip(d[..., 1] * 0.5 + 0.5, 0.0, 1.0)[..., None]
    hor = xp.asarray(SKY_HORIZON)
    zen = xp.asarray(SKY_ZENITH)
    return hor * (1.0 - t) + zen * t


def sky_texture(d, tex, xp):
    """Equirectangular skybox texture sample on miss — the reference's
    _SkyboxTexture.SampleLevel(sampler, uv, 0) path
    (Assets/Shaders/RaytraceCompute.compute:117-126: theta/phi from the ray
    direction, here with bilinear filtering). tex: (H, W, 3) float32."""
    h, w = tex.shape[0], tex.shape[1]
    dx, dy, dz = d[..., 0], d[..., 1], d[..., 2]
    # equirect convention: v=0 at zenith (+y), u wraps with azimuth (the
    # reference's acos(dir.y)/atan2(dir.x,-dir.z) mapping,
    # RaytraceCompute.compute:121-125, with v oriented top-down)
    u = (xp.arctan2(dx, -dz) / (2.0 * np.pi)) + 0.5
    v = xp.arccos(xp.clip(dy, -1.0, 1.0)) / np.pi
    fu = u * (w - 1)
    fv = v * (h - 1)
    u0 = xp.clip(xp.floor(fu).astype(xp.int32), 0, w - 1)
    v0 = xp.clip(xp.floor(fv).astype(xp.int32), 0, h - 1)
    u1 = xp.minimum(u0 + 1, w - 1)
    v1 = xp.minimum(v0 + 1, h - 1)
    au = (fu - u0)[..., None]
    av = (fv - v0)[..., None]
    flat = tex.reshape(-1, 3)
    c00 = xp.take(flat, v0 * w + u0, axis=0)
    c01 = xp.take(flat, v0 * w + u1, axis=0)
    c10 = xp.take(flat, v1 * w + u0, axis=0)
    c11 = xp.take(flat, v1 * w + u1, axis=0)
    top = c00 * (1 - au) + c01 * au
    bot = c10 * (1 - au) + c11 * au
    return top * (1 - av) + bot * av


def make_gradient_skybox(height: int = 64, width: int = 128) -> np.ndarray:
    """Bake the procedural gradient into an equirect texture (a stand-in
    skybox asset for tests/demos; users load any (H,W,3) float image)."""
    v = (np.arange(height, dtype=np.float32) + 0.5) / height  # polar angle/pi
    y = np.cos(v * np.pi)  # direction.y for this row
    t = np.clip(y * 0.5 + 0.5, 0.0, 1.0)[:, None]
    row = SKY_HORIZON[None, :] * (1 - t) + SKY_ZENITH[None, :] * t
    return np.broadcast_to(row[:, None, :], (height, width, 3)).copy()


def shade(res: traverse.TraceResult, direction, leaf_albedo, leaf_normal,
          light: Light, xp, skybox=None):
    """Shade traced rays: Lambert + ambient on hit, sky on miss. (N,3)."""
    hit = res.hit_leaf >= 0
    safe_leaf = xp.where(hit, res.hit_leaf, 0)
    if leaf_albedo.shape[0] == 0:  # empty scene: no leaf can be hit
        leaf_albedo = xp.zeros((1, 3), xp.float32)
        leaf_normal = xp.zeros((1, 3), xp.float32)
    alb = xp.take(leaf_albedo, safe_leaf, axis=0)
    nrm = xp.take(leaf_normal, safe_leaf, axis=0)
    ldir = xp.asarray(light.direction, xp.float32)
    ldir = ldir / xp.sqrt(xp.sum(ldir * ldir))
    ndotl = xp.maximum(xp.sum(nrm * (-ldir)[None, :], axis=-1), 0.0)
    lit = alb * (ndotl * light.intensity + light.ambient)[:, None]
    d = xp.asarray(direction, xp.float32)
    if skybox is not None:
        sky = sky_texture(d, xp.asarray(skybox, xp.float32), xp)
    else:
        sky = sky_color(d, xp)
    return xp.where(hit[:, None], lit, sky)


def render_numpy(svo, camera: Camera, light: Light = Light(),
                 frame: OctreeFrame = OctreeFrame(), jitter=None,
                 skybox=None):
    """CPU reference image (numpy traversal). Returns (H, W, 3) float32."""
    o, d = camera.rays(np, jitter=jitter)
    o, d = frame.world_to_local(o, d, np)
    res = traverse.trace_numpy(svo, o, d)
    img = shade(res, d, np.asarray(svo.leaf_albedo), np.asarray(svo.leaf_normal),
                light, np, skybox=skybox)
    return img.reshape(camera.height, camera.width, 3).astype(np.float32)


@partial(jax.jit, static_argnames=("depth", "height", "width", "use_tex"))
def _render_jax(masks, child_base, leaf_base, parent_ptr, leaf_albedo,
                leaf_normal, o, d, depth, height, width, light_dir,
                light_intensity, light_ambient, skybox_tex, use_tex):
    res = traverse._trace_jax(masks, child_base, leaf_base, parent_ptr, o, d,
                              depth)
    hit = res.hit_leaf >= 0
    safe_leaf = jnp.where(hit, res.hit_leaf, 0)
    if leaf_albedo.shape[0] == 0:  # empty scene: no leaf can be hit
        leaf_albedo = jnp.zeros((1, 3), jnp.float32)
        leaf_normal = jnp.zeros((1, 3), jnp.float32)
    alb = jnp.take(leaf_albedo, safe_leaf, axis=0)
    nrm = jnp.take(leaf_normal, safe_leaf, axis=0)
    ldir = light_dir / jnp.sqrt(jnp.sum(light_dir * light_dir))
    ndotl = jnp.maximum(jnp.sum(nrm * (-ldir)[None, :], axis=-1), 0.0)
    lit = alb * (ndotl * light_intensity + light_ambient)[:, None]
    if use_tex:
        sky = sky_texture(d, skybox_tex, jnp)
    else:
        sky = sky_color(d, jnp)
    img = jnp.where(hit[:, None], lit, sky)
    return img.reshape(height, width, 3)


def render_jax(svo, camera: Camera, light: Light = Light(),
               frame: OctreeFrame = OctreeFrame(), jitter=None, skybox=None):
    """Jitted single-device render. Returns (H, W, 3) float32 device array.
    skybox: optional (H, W, 3) equirect texture sampled on miss."""
    o, d = camera.rays(np, jitter=jitter)
    o, d = frame.world_to_local(o, d, np)
    use_tex = skybox is not None
    tex = jnp.asarray(skybox, jnp.float32) if use_tex else jnp.zeros(
        (1, 1, 3), jnp.float32)
    return _render_jax(
        jnp.asarray(svo.masks), jnp.asarray(svo.child_base),
        jnp.asarray(svo.leaf_base), traverse.parent_ptr_of(svo),
        jnp.asarray(svo.leaf_albedo),
        jnp.asarray(svo.leaf_normal),
        jnp.asarray(o), jnp.asarray(d), svo.depth,
        camera.height, camera.width,
        jnp.asarray(light.direction, jnp.float32),
        jnp.float32(light.intensity), jnp.float32(light.ambient),
        tex, use_tex,
    )


def render_progressive(svo, camera: Camera, n_samples: int = 8,
                       light: Light = Light(),
                       frame: OctreeFrame = OctreeFrame(), seed: int = 0,
                       backend: str = "jax", skybox=None):
    """Progressive jittered accumulation — the AddShader running average
    (AddShader.shader:42-46: each frame blended with alpha 1/(sample+1))."""
    rng = np.random.default_rng(seed)
    acc = None
    render = render_jax if backend == "jax" else render_numpy
    for s in range(n_samples):
        jitter = rng.random(2, dtype=np.float32)
        img = render(svo, camera, light=light, frame=frame, jitter=jitter,
                     skybox=skybox)
        img = np.asarray(img)
        acc = img if acc is None else acc + (img - acc) / (s + 1)
    return acc


def render_attachment(svo, word_a, word_b, origin, direction,
                      light: Light = Light(), skybox=None):
    """Shade hits from the COMPRESSED 64-bit node attachments — the
    reference's production shading path (NVIDIASVO.compute:176-186 decodes
    albedo via decodeDXTColor(blockA, blockB, hit_idx) and the normal from
    attachment word B's high 16 bits, AttachmentLookup.compute:9-61). The
    fp leaf arrays are not touched: albedo = the hit child's 2-bit palette
    entry of its parent's R5G6B5 endpoint pair; normal = the parent's
    cube-face normal16. Returns (N, 3) radiance.

    word_a/word_b: per-node attachment words from codecs.build_attachments.
    """
    import jax.numpy as jnp
    from raytracingtest_tpu.ops import codecs

    o = jnp.asarray(origin, jnp.float32)
    d = jnp.asarray(direction, jnp.float32)
    res = traverse.trace_jax(svo, o, d)
    hit = res.hit_leaf >= 0
    parent = jnp.where(hit, res.hit_parent, 0)
    wa = jnp.take(jnp.asarray(word_a, jnp.uint32), parent)
    wb = jnp.take(jnp.asarray(word_b, jnp.uint32), parent)
    ca = wa & jnp.uint32(0xFFFF)
    cb = wa >> jnp.uint32(16)
    choices = wb & jnp.uint32(0xFFFF)
    n16 = wb >> jnp.uint32(16)
    alb = codecs.decode_child_palette(ca, cb, choices, res.hit_child,
                                      xp=jnp)
    nrm = codecs.unpack_normal16(n16, xp=jnp)

    ldir = jnp.asarray(light.direction, jnp.float32)
    ldir = ldir / jnp.sqrt(jnp.sum(ldir * ldir))
    ndotl = jnp.maximum(jnp.sum(nrm * (-ldir)[None, :], axis=-1), 0.0)
    lit = alb * (ndotl * light.intensity + light.ambient)[:, None]
    if skybox is not None:
        sky = sky_texture(d, jnp.asarray(skybox, jnp.float32), jnp)
    else:
        sky = sky_color(d, jnp)
    return jnp.where(hit[:, None], lit, sky)


# ---------------------------------------------------------------------------
# bounce loop: mirror-reflection continuation with energy attenuation
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("depth", "top_depth", "bounces"))
def _render_bounce_brick(top_masks, top_child, top_parent, bricks,
                         leaf_albedo, leaf_normal, o, d, depth, top_depth,
                         light_dir, light_intensity, light_ambient,
                         specular, bounces):
    from raytracingtest_tpu.ops import brick as brick_mod
    f32 = jnp.float32
    n = o.shape[0]
    energy = jnp.ones((n, 3), f32)
    result = jnp.zeros((n, 3), f32)
    ldir = light_dir / jnp.sqrt(jnp.sum(light_dir * light_dir))
    eps = f32(2.0 ** -(depth + 2))

    for _b in range(bounces):
        res = brick_mod._trace_brick_jax(top_masks, top_child, top_parent,
                                         bricks, o, d, depth, top_depth)
        hit = res.hit_leaf >= 0
        safe = jnp.where(hit, res.hit_leaf, 0)
        alb = jnp.take(leaf_albedo, safe, axis=0)
        nrm = jnp.take(leaf_normal, safe, axis=0)
        nrm = nrm / jnp.sqrt(
            jnp.maximum(jnp.sum(nrm * nrm, -1, keepdims=True), 1e-12))
        ndotl = jnp.maximum(jnp.sum(nrm * (-ldir)[None, :], axis=-1), 0.0)
        local = alb * (ndotl * light_intensity + light_ambient)[:, None]
        sky = sky_color(d, jnp)
        shade_b = jnp.where(hit[:, None], local * (1.0 - specular), sky)
        result = result + energy * shade_b

        # continuation: mirror reflect at the hit, attenuate by specular
        # (RaytraceCompute.compute:97-116 energy *= specular; the reference
        # ships specular=0 so its 8-bounce loop is effectively one bounce —
        # here the machinery is live for specular > 0)
        energy = energy * jnp.where(hit[:, None], f32(specular), f32(0.0))
        hp = o + res.hit_t[:, None] * d
        d_ref = d - 2.0 * jnp.sum(d * nrm, -1, keepdims=True) * nrm
        o = jnp.where(hit[:, None], hp + nrm * eps, o)
        d = jnp.where(hit[:, None], d_ref, d)
    return result


def render_bounce(bsvo, leaf_albedo, leaf_normal, camera: Camera,
                  light: Light = Light(), specular: float = 0.0,
                  bounces: int = 1) -> np.ndarray:
    """Multi-bounce mirror-reflection render on the brick path.

    Parity role: the reference megakernel's bounce loop + energy plumbing
    (RaytraceCompute.compute:159-166 with Shade's specular attenuation at
    :93-116) — dead in the reference (specular = 0 zeroes ray energy after
    the first hit), implemented live here. specular=0.0, bounces=1
    reproduces the reference's effective single-diffuse-bounce image."""
    o, d = camera.rays(np)
    img = _render_bounce_brick(
        jnp.asarray(bsvo.top_masks), jnp.asarray(bsvo.top_child),
        jnp.asarray(bsvo.top_parent), jnp.asarray(bsvo.bricks),
        jnp.asarray(leaf_albedo), jnp.asarray(leaf_normal),
        jnp.asarray(o), jnp.asarray(d), bsvo.depth, bsvo.top_depth,
        jnp.asarray(light.direction, jnp.float32),
        float(light.intensity), float(light.ambient), float(specular),
        int(bounces))
    return np.asarray(img).reshape(camera.height, camera.width, 3)
