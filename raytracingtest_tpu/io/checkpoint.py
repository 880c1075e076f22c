"""Checkpoint / save-load of SVOs, voxel params, and optimizer state.

Reference parity: CompactSVO.SaveToDisk writes raw descriptor ints with a
BinaryWriter (CompactSVO.cs:80-86) and its load constructor is an empty stub
(CompactSVO.cs:69-71) — here both directions work:

  * save_esvo_binary / load_esvo_binary — the raw reference wire format
    (int32 ESVO descriptors, relative pointers) for interchange
  * save_svo / load_svo — full fidelity npz of the canonical layout +
    leaf attributes
  * save_train_state / load_train_state — voxel-parameter pytree +
    optimizer state for the inverse-rendering fit (orbax-style content,
    npz container to stay dependency-light)
"""

from __future__ import annotations

import json
import os
import struct

import numpy as np

from raytracingtest_tpu.ops import codecs
from raytracingtest_tpu.ops.octree import SVO

_MAGIC = b"RTT1"


def save_esvo_binary(svo: SVO, path: str) -> None:
    """Raw ESVO descriptor dump: header (magic, depth, n_nodes, level_start)
    then one little-endian int32 per node in the reference's 16|8|8 format."""
    packed = codecs.pack_esvo_descriptors(svo)
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<ii", svo.depth, packed.shape[0]))
        f.write(struct.pack(f"<{len(svo.level_start)}i", *svo.level_start))
        f.write(packed.astype("<i4").tobytes())


def load_esvo_binary(path: str):
    """Load a raw ESVO dump -> (masks, child_base, leaf_base, depth,
    level_start). Attributes are not in this format (parity with the
    reference, which stores them in a separate attachment buffer)."""
    with open(path, "rb") as f:
        magic = f.read(4)
        if magic != _MAGIC:
            raise ValueError(f"bad magic {magic!r}")
        depth, n_nodes = struct.unpack("<ii", f.read(8))
        level_start = struct.unpack(f"<{depth + 1}i", f.read(4 * (depth + 1)))
        packed = np.frombuffer(f.read(4 * n_nodes), dtype="<i4").astype(np.int32)
    masks, child_base, leaf_base = codecs.unpack_esvo_descriptors(
        packed, level_start, depth)
    return masks, child_base, leaf_base, depth, tuple(level_start)


def save_svo(svo: SVO, path: str) -> None:
    np.savez_compressed(
        path,
        masks=np.asarray(svo.masks),
        child_base=np.asarray(svo.child_base),
        leaf_base=np.asarray(svo.leaf_base),
        leaf_albedo=np.asarray(svo.leaf_albedo),
        leaf_normal=np.asarray(svo.leaf_normal),
        leaf_density=np.asarray(svo.leaf_density),
        depth=np.int32(svo.depth),
        level_start=np.asarray(svo.level_start, np.int64),
    )


def load_svo(path: str) -> SVO:
    z = np.load(path)
    return SVO(
        masks=z["masks"],
        child_base=z["child_base"],
        leaf_base=z["leaf_base"],
        leaf_albedo=z["leaf_albedo"],
        leaf_normal=z["leaf_normal"],
        leaf_density=z["leaf_density"],
        depth=int(z["depth"]),
        level_start=tuple(int(v) for v in z["level_start"]),
    )


def _flatten_pytree(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten_pytree(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        out[f"{prefix}__seq__"] = np.asarray(
            [len(tree), 1 if isinstance(tree, tuple) else 0])
        for i, v in enumerate(tree):
            out.update(_flatten_pytree(v, f"{prefix}{i}/"))
    else:
        out[prefix.rstrip("/")] = np.asarray(tree)
    return out


def _unflatten_pytree(flat, prefix=""):
    seq_key = f"{prefix}__seq__"
    if seq_key in flat:
        n, is_tuple = (int(v) for v in flat[seq_key])
        items = [_unflatten_pytree(flat, f"{prefix}{i}/") for i in range(n)]
        return tuple(items) if is_tuple else items
    direct = prefix.rstrip("/")
    if direct in flat:
        return flat[direct]
    keys = {k[len(prefix):].split("/")[0]
            for k in flat if k.startswith(prefix) and k != seq_key}
    return {k: _unflatten_pytree(flat, f"{prefix}{k}/") for k in sorted(keys)}


def save_train_state(path: str, params, opt_state=None, step: int = 0,
                     meta: dict | None = None) -> None:
    """Checkpoint the differentiable fit: voxel-param pytree (+ optimizer
    state) with a json sidecar of metadata."""
    import jax

    flat = _flatten_pytree({"params": params})
    if opt_state is not None:
        leaves, treedef = jax.tree_util.tree_flatten(opt_state)
        for i, leaf in enumerate(leaves):
            flat[f"opt/{i}"] = np.asarray(leaf)
        flat["opt/__n__"] = np.asarray(len(leaves))
    flat["step"] = np.asarray(step)
    np.savez_compressed(path, **flat)
    with open(path + ".meta.json", "w") as f:
        json.dump({"step": step, **(meta or {})}, f)


def load_train_state(path: str, opt_state_template=None):
    """Returns (params, opt_state_or_None, step). If opt_state_template is
    given (e.g. optimizer.init(params)), its treedef is used to rebuild the
    optimizer state."""
    import jax

    z = dict(np.load(path).items())
    params = _unflatten_pytree(z, "params/")
    step = int(z["step"])
    opt_state = None
    if opt_state_template is not None and "opt/__n__" in z:
        n = int(z["opt/__n__"])
        leaves = [z[f"opt/{i}"] for i in range(n)]
        treedef = jax.tree_util.tree_structure(opt_state_template)
        opt_state = jax.tree_util.tree_unflatten(treedef, leaves)
    return params, opt_state, step
