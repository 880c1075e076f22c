"""Compressed attribute + descriptor codecs (vectorized, numpy/jnp-agnostic).

Parity with the reference's packed formats — kept for interchange and
memory-lean serving; the differentiable path uses float voxel params
(diff.py) and these codecs quantize to/from them.

  * R5G6B5 color pack/unpack
    (CompressColor, NaiveCreator.cs:351-362; decodeDXTColor replica
    NaiveCreator.cs:373-385, AttachmentLookup.compute:1-18)
  * DXT-style two-endpoint palette: per-node colors A,B + per-child 2-bit
    choice among {A, 2/3A+1/3B, 1/3A+2/3B, B}
    (GetAttachment, NaiveCreator.cs:197-257 — including fixing its known
    farthest-color selection bug where bdist is never updated,
    NaiveCreator.cs:222-227 / SURVEY.md §7.3.8)
  * 16-bit cube-face normal: 1 sign + 2 axis + 7u + 6v bits
    (encodeRawNormal16 / decode, NaiveCreator.cs:547-595,
    AttachmentLookup.compute:37-61)
  * 64-bit node attachment = colorA(16) | colorB(16) | choices(16) |
    normal(16), stored as two uint32 words (CompactSVO.cs:24-28)
  * ESVO 16|8|8 child descriptor with *relative* child pointers
    (NaiveCreator.cs:184-187) — export/import of our absolute-pointer
    layout to the reference wire format.
"""

from __future__ import annotations

import numpy as np


# ---------------------------------------------------------------------------
# R5G6B5
# ---------------------------------------------------------------------------

def pack_r5g6b5(rgb, xp=np):
    """float [N,3] in [0,1] -> uint32 [N] with R in bits 11-15, G 5-10, B 0-4."""
    c = xp.clip(xp.asarray(rgb, xp.float32), 0.0, 1.0)
    r = xp.minimum((c[..., 0] * 32.0).astype(xp.uint32), xp.uint32(31))
    g = xp.minimum((c[..., 1] * 64.0).astype(xp.uint32), xp.uint32(63))
    b = xp.minimum((c[..., 2] * 32.0).astype(xp.uint32), xp.uint32(31))
    return (r << xp.uint32(11)) | (g << xp.uint32(5)) | b


def unpack_r5g6b5(packed, xp=np):
    """uint32 [N] -> float [N,3]; midpoint reconstruction like the
    reference's decodeDXTColor float-of-shifted-bits arithmetic."""
    p = xp.asarray(packed, xp.uint32)
    r = ((p >> xp.uint32(11)) & xp.uint32(31)).astype(xp.float32)
    g = ((p >> xp.uint32(5)) & xp.uint32(63)).astype(xp.float32)
    b = (p & xp.uint32(31)).astype(xp.float32)
    return xp.stack(
        [(r + 0.5) / 32.0, (g + 0.5) / 64.0, (b + 0.5) / 32.0], axis=-1
    )


# ---------------------------------------------------------------------------
# 16-bit cube-face normal
# ---------------------------------------------------------------------------

def pack_normal16(n, xp=np):
    """unit normal [N,3] -> uint32 [N] 16-bit cube-face encoding:
    bit 15 sign, bits 13-14 dominant axis, bits 6-12 u (7b), bits 0-5 v (6b).
    """
    n = xp.asarray(n, xp.float32)
    an = xp.abs(n)
    axis = xp.argmax(an, axis=-1).astype(xp.int32)
    dom = xp.take_along_axis(n, axis[..., None], axis=-1)[..., 0]
    sign = (dom < 0).astype(xp.uint32)
    # u, v = the other two components scaled by 1/|dominant|
    idx_u = (axis + 1) % 3
    idx_v = (axis + 2) % 3
    cu = xp.take_along_axis(n, idx_u[..., None], axis=-1)[..., 0]
    cv = xp.take_along_axis(n, idx_v[..., None], axis=-1)[..., 0]
    inv = 1.0 / xp.maximum(xp.abs(dom), 1e-12)
    u = xp.clip(cu * inv, -1.0, 1.0)
    v = xp.clip(cv * inv, -1.0, 1.0)
    uq = xp.minimum(((u * 0.5 + 0.5) * 128.0).astype(xp.uint32), xp.uint32(127))
    vq = xp.minimum(((v * 0.5 + 0.5) * 64.0).astype(xp.uint32), xp.uint32(63))
    return (
        (sign << xp.uint32(15))
        | (axis.astype(xp.uint32) << xp.uint32(13))
        | (uq << xp.uint32(6))
        | vq
    )


def unpack_normal16(packed, xp=np):
    p = xp.asarray(packed, xp.uint32)
    sign = ((p >> xp.uint32(15)) & xp.uint32(1)).astype(xp.float32) * -2.0 + 1.0
    axis = ((p >> xp.uint32(13)) & xp.uint32(3)).astype(xp.int32)
    u = (((p >> xp.uint32(6)) & xp.uint32(127)).astype(xp.float32) + 0.5) / 128.0 * 2.0 - 1.0
    v = ((p & xp.uint32(63)).astype(xp.float32) + 0.5) / 64.0 * 2.0 - 1.0
    comps = []
    for a in range(3):
        is_dom = axis == a
        is_u = ((axis + 1) % 3) == a
        # u/v carry their own signs (they were divided by |dominant|)
        c = xp.where(is_dom, sign, xp.where(is_u, u, v))
        comps.append(c)
    n = xp.stack(comps, axis=-1)
    norm = xp.sqrt(xp.sum(n * n, axis=-1, keepdims=True))
    return n / xp.maximum(norm, 1e-12)


# ---------------------------------------------------------------------------
# DXT-style per-node child palette
# ---------------------------------------------------------------------------

_DXT_WEIGHTS = np.array([1.0, 2.0 / 3.0, 1.0 / 3.0, 0.0], np.float32)


def encode_child_palette(child_colors, child_valid, xp=np):
    """Per-node palette encode: [N,8,3] child colors + [N,8] validity ->
    (colorA u32 [N], colorB u32 [N], choices u32 [N] (2 bits per child)).

    Endpoint selection: A = first valid child's color, B = the valid child
    color farthest from A (with the running-max actually updated — the
    reference forgets to update bdist, NaiveCreator.cs:222-227). Each child
    then picks the nearest of the 4 palette entries.
    """
    cc = xp.asarray(child_colors, xp.float32)
    valid = xp.asarray(child_valid, bool)
    big = xp.float32(1e9)

    # A: first valid child
    first_idx = xp.argmax(valid, axis=-1)
    a = xp.take_along_axis(cc, first_idx[:, None, None], axis=1)[:, 0, :]
    # B: farthest valid child from A
    d2 = xp.sum((cc - a[:, None, :]) ** 2, axis=-1)
    d2 = xp.where(valid, d2, -1.0)
    far_idx = xp.argmax(d2, axis=-1)
    b = xp.take_along_axis(cc, far_idx[:, None, None], axis=1)[:, 0, :]

    # quantize endpoints first so choices optimize the decoded error
    a_q = unpack_r5g6b5(pack_r5g6b5(a, xp), xp)
    b_q = unpack_r5g6b5(pack_r5g6b5(b, xp), xp)

    w = xp.asarray(_DXT_WEIGHTS)
    palette = (
        a_q[:, None, :] * w[None, :, None] + b_q[:, None, :] * (1.0 - w)[None, :, None]
    )  # [N,4,3]
    err = xp.sum((cc[:, :, None, :] - palette[:, None, :, :]) ** 2, axis=-1)
    choice = xp.argmin(err, axis=-1).astype(xp.uint32)  # [N,8]
    shifts = (xp.arange(8) * 2).astype(xp.uint32)
    choices = xp.sum(
        xp.where(valid, choice, xp.uint32(0)) << shifts[None, :],
        axis=-1, dtype=xp.uint32,
    )
    return pack_r5g6b5(a, xp), pack_r5g6b5(b, xp), choices


def decode_child_palette(color_a, color_b, choices, child_slot, xp=np):
    """Decode one child's color: palette entry selected by its 2-bit choice
    (the GPU decode path, AttachmentLookup.compute:9-18 /
    NVIDIASVO.compute:186)."""
    a = unpack_r5g6b5(color_a, xp)
    b = unpack_r5g6b5(color_b, xp)
    sel = (
        xp.asarray(choices, xp.uint32)
        >> (xp.asarray(child_slot, xp.uint32) * xp.uint32(2))
    ) & xp.uint32(3)
    w = xp.take(xp.asarray(_DXT_WEIGHTS), sel.astype(xp.int32))
    return a * w[..., None] + b * (1.0 - w)[..., None]


# ---------------------------------------------------------------------------
# 64-bit node attachments
# ---------------------------------------------------------------------------

def build_attachments(svo, leaf_albedo=None, leaf_normal=None, xp=np):
    """Build the reference's per-node 64-bit attachments for every node:
    word A = colorA | colorB<<16, word B = choices | normal16<<16
    (CompactSVO.cs:24-28). Child colors come from leaf albedo for leaf
    children and from recursively-averaged colors for node children
    (interior averaging, NaiveCreator.cs:97-114). Returns (wordA u32 [N],
    wordB u32 [N])."""
    masks = np.asarray(svo.masks)
    child_base = np.asarray(svo.child_base)
    leaf_base = np.asarray(svo.leaf_base)
    albedo = np.asarray(leaf_albedo if leaf_albedo is not None else svo.leaf_albedo)
    normal = np.asarray(leaf_normal if leaf_normal is not None else svo.leaf_normal)
    n_nodes = masks.shape[0]
    depth = svo.depth

    node_color = np.zeros((n_nodes, 3), np.float32)
    node_normal = np.zeros((n_nodes, 3), np.float32)
    child_colors = np.zeros((n_nodes, 8, 3), np.float32)
    valid = ((masks[:, None] >> (8 + np.arange(8))) & 1).astype(bool)
    leaf_bits = ((masks[:, None] >> np.arange(8)) & 1).astype(bool)

    # bottom-up: fill child colors, then average into the node
    for l in range(depth - 1, -1, -1):
        lo, hi = svo.level_start[l], svo.level_start[l + 1]
        if hi == lo:
            continue
        m = masks[lo:hi]
        v = valid[lo:hi]
        lb = leaf_bits[lo:hi]
        # leaf children: rank into leaf arrays
        below = (1 << np.arange(8)) - 1
        vm = (m[:, None] >> 8) & 0xFF
        lm = m[:, None] & 0xFF
        leaf_rank = _popc8_np(vm & lm & below[None, :])
        node_rank = _popc8_np(vm & ~lm & below[None, :])
        leaf_ids = np.clip(leaf_base[lo:hi, None] + leaf_rank, 0,
                           max(albedo.shape[0] - 1, 0))
        node_ids = np.clip(child_base[lo:hi, None] + node_rank, 0, n_nodes - 1)
        cc = np.where(
            (lb & v)[..., None], albedo[leaf_ids],
            np.where((v & ~lb)[..., None], node_color[node_ids], 0.0),
        )
        child_colors[lo:hi] = cc
        nrm = np.where(
            (lb & v)[..., None], normal[leaf_ids],
            np.where((v & ~lb)[..., None], node_normal[node_ids], 0.0),
        )
        cnt = np.maximum(v.sum(-1, keepdims=True), 1)
        node_color[lo:hi] = cc.sum(1) / cnt
        avg_n = nrm.sum(1)
        nn = np.linalg.norm(avg_n, axis=-1, keepdims=True)
        node_normal[lo:hi] = avg_n / np.maximum(nn, 1e-12)

    ca, cb, choices = encode_child_palette(child_colors, valid, np)
    n16 = pack_normal16(node_normal, np)
    word_a = (ca & np.uint32(0xFFFF)) | ((cb & np.uint32(0xFFFF)) << np.uint32(16))
    word_b = (choices & np.uint32(0xFFFF)) | (n16 << np.uint32(16))
    return word_a, word_b


def _popc8_np(v):
    v = v & 0xFF
    v = v - ((v >> 1) & 0x55)
    v = (v & 0x33) + ((v >> 2) & 0x33)
    return (v + (v >> 4)) & 0x0F


# ---------------------------------------------------------------------------
# ESVO 16|8|8 wire format (relative pointers)
# ---------------------------------------------------------------------------

def pack_esvo_descriptors(svo):
    """Export to the reference wire format: one int32 per node,
    (childPointer << 16) | (validMask << 8) | nonLeafMask, childPointer =
    *relative* offset from this node's index to its first non-leaf child
    (NaiveCreator.cs:164-187). Raises if an offset exceeds 15 bits (the
    reference's far-pointer limitation it never implemented,
    SURVEY.md §7.3.8)."""
    masks = np.asarray(svo.masks)
    child_base = np.asarray(svo.child_base)
    vm = (masks >> 8) & 0xFF
    lm = masks & 0xFF
    nonleaf = vm & ~lm
    idx = np.arange(masks.shape[0], dtype=np.int64)
    rel = np.where(nonleaf != 0, child_base.astype(np.int64) - idx, 0)
    if rel.size and (rel.min() < 0 or rel.max() > 0x7FFF):
        raise ValueError(
            f"relative child pointer out of 15-bit range: max {rel.max()}"
        )
    return ((rel.astype(np.int32) << 16) | (vm << 8) | nonleaf).astype(np.int32)


def unpack_esvo_descriptors(packed, level_start, depth):
    """Import the reference wire format back into our absolute-pointer
    layout (masks, child_base, leaf_base)."""
    packed = np.asarray(packed, np.int32)
    rel = packed >> 16
    vm = (packed >> 8) & 0xFF
    nonleaf = packed & 0xFF
    lm = vm & ~nonleaf
    idx = np.arange(packed.shape[0], dtype=np.int64)
    child_base = np.where(nonleaf != 0, idx + rel, 0).astype(np.int32)
    # leaf_base: leaves are enumerated in node order by leaf-mask popcount
    leaf_counts = _popc8_np(lm)
    leaf_base_all = np.concatenate([[0], np.cumsum(leaf_counts)[:-1]]).astype(np.int32)
    leaf_base = np.where(lm != 0, leaf_base_all, 0).astype(np.int32)
    masks = ((vm << 8) | lm).astype(np.int32)
    return masks, child_base, leaf_base
