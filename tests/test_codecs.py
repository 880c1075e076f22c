"""Codec round-trip unit tests (role of the reference's pack/unpack tests,
SliceTests.TestChildDescriptor Assets/Tests/SliceTests.cs:12-19 and the
NaiveCreator static self-tests NaiveCreator.cs:295-345,597-645)."""

import numpy as np
import pytest

from raytracingtest_tpu.ops import codecs
from raytracingtest_tpu.ops.octree import build_svo
from raytracingtest_tpu.scenes import get_scene


def test_r5g6b5_roundtrip():
    rng = np.random.default_rng(0)
    c = rng.random((1000, 3), dtype=np.float32)
    packed = codecs.pack_r5g6b5(c)
    assert packed.dtype == np.uint32
    assert packed.max() <= 0xFFFF
    out = codecs.unpack_r5g6b5(packed)
    # 5-bit channels: max quantization error 1/32 of half a step
    assert np.abs(out - c).max() <= 1.0 / 32.0


def test_r5g6b5_extremes():
    c = np.array([[0, 0, 0], [1, 1, 1]], np.float32)
    p = codecs.pack_r5g6b5(c)
    assert int(p[0]) == 0
    assert int(p[1]) == 0xFFFF


def test_normal16_roundtrip():
    rng = np.random.default_rng(1)
    n = rng.normal(size=(2000, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    packed = codecs.pack_normal16(n)
    assert packed.max() <= 0xFFFF
    out = codecs.unpack_normal16(packed)
    dots = np.sum(out * n, axis=1)
    assert dots.min() > 0.995  # < ~6 degrees error
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-5)


def test_normal16_axes():
    n = np.eye(3, dtype=np.float32)
    out = codecs.unpack_normal16(codecs.pack_normal16(n))
    assert np.sum(out * n, axis=1).min() > 0.999
    out_neg = codecs.unpack_normal16(codecs.pack_normal16(-n))
    assert np.sum(out_neg * (-n), axis=1).min() > 0.999


def test_child_palette_roundtrip_two_colors():
    # two distinct colors among children must decode near-exactly
    n = 16
    rng = np.random.default_rng(2)
    a = rng.random(3).astype(np.float32)
    b = rng.random(3).astype(np.float32)
    colors = np.zeros((n, 8, 3), np.float32)
    valid = np.zeros((n, 8), bool)
    pick = rng.random((n, 8)) < 0.5
    for i in range(n):
        for k in range(8):
            valid[i, k] = k != 3
            colors[i, k] = a if pick[i, k] else b
    ca, cb, ch = codecs.encode_child_palette(colors, valid)
    for i in range(n):
        for k in range(8):
            if not valid[i, k]:
                continue
            dec = codecs.decode_child_palette(ca[i], cb[i], ch[i], k)
            want = colors[i, k]
            assert np.abs(dec - want).max() < 1.0 / 32.0 + 1e-6


def test_child_palette_interpolants():
    # a child exactly at 2/3A+1/3B should select choice 1
    a = np.array([1.0, 0.0, 0.0], np.float32)
    b = np.array([0.0, 0.0, 1.0], np.float32)
    colors = np.zeros((1, 8, 3), np.float32)
    valid = np.ones((1, 8), bool)
    colors[0, 0] = a
    colors[0, 1] = b
    colors[0, 2] = a * (2 / 3) + b * (1 / 3)
    colors[0, 3] = a * (1 / 3) + b * (2 / 3)
    colors[0, 4:] = a
    ca, cb, ch = codecs.encode_child_palette(colors, valid)
    for k, want in [(0, colors[0, 0]), (1, colors[0, 1]),
                    (2, colors[0, 2]), (3, colors[0, 3])]:
        dec = codecs.decode_child_palette(ca[0], cb[0], ch[0], k)
        assert np.abs(dec - want).max() < 0.07, (k, dec, want)


@pytest.fixture(scope="module")
def sphere5():
    return build_svo(get_scene("sphere"), 5).svo


def test_attachments_shapes_and_leaf_colors(sphere5):
    wa, wb = codecs.build_attachments(sphere5)
    assert wa.shape == (sphere5.n_nodes,)
    assert wb.shape == (sphere5.n_nodes,)
    # decode a leaf child's color via its parent's palette and compare to
    # the stored float albedo
    masks = np.asarray(sphere5.masks)
    leaf_base = np.asarray(sphere5.leaf_base)
    albedo = np.asarray(sphere5.leaf_albedo)
    lo, hi = sphere5.level_start[sphere5.depth - 1], sphere5.level_start[sphere5.depth]
    errs = []
    for row in range(lo, min(lo + 50, hi)):
        vm = (masks[row] >> 8) & 0xFF
        lm = masks[row] & 0xFF
        ca = wa[row] & 0xFFFF
        cb = (wa[row] >> 16) & 0xFFFF
        ch = wb[row] & 0xFFFF
        for k in range(8):
            if not ((lm >> k) & 1):
                continue
            rank = bin(vm & lm & ((1 << k) - 1)).count("1")
            leaf_id = leaf_base[row] + rank
            dec = codecs.decode_child_palette(
                np.uint32(ca), np.uint32(cb), np.uint32(ch), k)
            errs.append(np.abs(dec - albedo[leaf_id]).max())
    # palette is 2-endpoint lossy; mean error must still be small
    assert np.mean(errs) < 0.22, np.mean(errs)


def test_attachment_normal_decode(sphere5):
    wa, wb = codecs.build_attachments(sphere5)
    n16 = (wb >> 16) & 0xFFFF
    normals = codecs.unpack_normal16(n16.astype(np.uint32))
    # bottom-level node normals approximate the averaged leaf normals; for a
    # sphere they should point roughly away from the centre
    lo, hi = sphere5.level_start[sphere5.depth - 1], sphere5.level_start[sphere5.depth]
    masks = np.asarray(sphere5.masks)
    leaf_base = np.asarray(sphere5.leaf_base)
    sn = np.asarray(sphere5.leaf_normal)
    ok = 0
    tot = 0
    for row in range(lo, min(lo + 100, hi)):
        lm = masks[row] & 0xFF
        if lm == 0:
            continue
        ref_n = sn[leaf_base[row]]
        tot += 1
        if np.dot(normals[row], ref_n) > 0.8:
            ok += 1
    assert ok / tot > 0.9


def test_esvo_pack_roundtrip(sphere5):
    packed = codecs.pack_esvo_descriptors(sphere5)
    assert packed.dtype == np.int32
    masks, child_base, leaf_base = codecs.unpack_esvo_descriptors(
        packed, sphere5.level_start, sphere5.depth)
    np.testing.assert_array_equal(masks, np.asarray(sphere5.masks))
    np.testing.assert_array_equal(child_base, np.asarray(sphere5.child_base))
    np.testing.assert_array_equal(leaf_base, np.asarray(sphere5.leaf_base))


def test_esvo_pack_bit_layout(sphere5):
    packed = codecs.pack_esvo_descriptors(sphere5)
    masks = np.asarray(sphere5.masks)
    vm = (masks >> 8) & 0xFF
    lm = masks & 0xFF
    np.testing.assert_array_equal((packed >> 8) & 0xFF, vm)
    np.testing.assert_array_equal(packed & 0xFF, vm & ~lm)


def test_attachment_render_matches_decoded_fp_shading():
    """The attachment-shaded render (render.render_attachment, the
    AttachmentLookup.compute analog) equals fp shading on the QUANTIZED
    attributes: per-leaf decoded palette color + parent's decoded normal16
    fed through the ordinary fp shade path."""
    import raytracingtest_tpu as rt
    from raytracingtest_tpu import render as render_mod
    from raytracingtest_tpu.ops import codecs, traverse
    from raytracingtest_tpu.ops.camera import Camera
    import jax.numpy as jnp

    res = rt.build_svo(rt.get_scene("terrain"), 6)
    svo = res.svo.device()
    wa, wb = codecs.build_attachments(res.svo)

    # host-side per-leaf decoded attribute tables
    masks = np.asarray(res.svo.masks)
    child_base = np.asarray(res.svo.child_base)
    leaf_base = np.asarray(res.svo.leaf_base)
    n_leaves = res.svo.n_leaves
    dec_alb = np.zeros((n_leaves, 3), np.float32)
    dec_nrm = np.zeros((n_leaves, 3), np.float32)
    depth = res.svo.depth
    lo, hi = res.svo.level_start[depth - 1], res.svo.level_start[depth]
    for row in range(lo, hi):
        m = masks[row]
        vm, lm = (m >> 8) & 0xFF, m & 0xFF
        for slot in range(8):
            if (vm >> slot) & (lm >> slot) & 1:
                rank = bin(vm & lm & ((1 << slot) - 1)).count("1")
                leaf = leaf_base[row] + rank
                ca = np.uint32(wa[row] & 0xFFFF)
                cb = np.uint32(wa[row] >> 16)
                ch = np.uint32(wb[row] & 0xFFFF)
                dec_alb[leaf] = codecs.decode_child_palette(
                    ca, cb, ch, np.uint32(slot), xp=np)
                dec_nrm[leaf] = codecs.unpack_normal16(
                    np.uint32(wb[row] >> 16), xp=np)

    cam = Camera(position=(0.5, 0.85, -0.6), look_at=(0.5, 0.4, 0.5),
                 fov_y_deg=50.0, width=64, height=64)
    o, d = cam.rays(np)
    img_att = np.asarray(render_mod.render_attachment(
        svo, wa, wb, o, d))
    tr = traverse.trace_jax(svo, jnp.asarray(o), jnp.asarray(d))
    img_fp = np.asarray(render_mod.shade(
        tr, jnp.asarray(d), jnp.asarray(dec_alb), jnp.asarray(dec_nrm),
        render_mod.Light(), jnp))
    assert (np.asarray(tr.hit_leaf) >= 0).sum() > 500
    np.testing.assert_allclose(img_att, img_fp, atol=1e-5)
