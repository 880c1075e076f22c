"""2-process multi-host integration: the wiring VERDICT r02 item 5 demands.

Spawns two real processes that join one jax.distributed job on CPU
(4 virtual devices each -> an 8-device global mesh), generate only their
own pixel rows, assemble global sharded arrays, and run the sharded
forward render. The union of both processes' output rows must equal the
single-process reference render exactly.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import jax.numpy as jnp
import pytest

import raytracingtest_tpu as rt
from raytracingtest_tpu import diff
from raytracingtest_tpu.ops.camera import Camera

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_render_matches_single(tmp_path):
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers set their own device count
    env["JAX_PLATFORMS"] = ""   # worker pins cpu via jax.config
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(_REPO, "tests",
                                          "_multihost_worker.py"),
             coord, "2", str(pid), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=540)[0].decode() for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"

    # reference: single-process render of the full image
    res = rt.build_svo(rt.get_scene("sphere"), 4)
    svo = res.svo.device()
    H = W = 32
    cam = Camera(position=(0.5, 0.85, -0.6), look_at=(0.5, 0.4, 0.5),
                 fov_y_deg=50.0, width=W, height=H)
    o, d = cam.rays(np)
    light = jnp.asarray([-0.5, -1.0, -0.3], jnp.float32)
    ref = np.asarray(diff.render_diff(
        jnp.asarray(svo.leaf_albedo), jnp.asarray(svo.leaf_normal),
        jnp.asarray(svo.leaf_density), svo.masks, svo.child_base,
        svo.leaf_base, jnp.asarray(o), jnp.asarray(d), svo.depth, light))

    got = np.full_like(ref, np.nan)
    for pid in range(2):
        data = np.load(tmp_path / f"out_p{pid}.npz")
        for start, rows in data.items():
            got[int(start):int(start) + rows.shape[0]] = rows
    assert not np.isnan(got).any(), "missing output rows"
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-6)
