"""Multi-host scaffolding: single-host degradation + process-local ray
bookkeeping (the real multi-host path needs a pod; this pins the seams)."""

import numpy as np
import pytest

import jax

from raytracingtest_tpu.ops.camera import Camera
from raytracingtest_tpu.parallel import multihost
from raytracingtest_tpu.parallel.mesh import make_mesh


def test_init_single_host_noop(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("RAYT_MULTIHOST", raising=False)
    info = multihost.init_from_env()
    assert info["initialized"] is False
    assert info["process_count"] == 1


def test_process_rows_partition():
    prs = [multihost.process_rows(64, 32, process_index=i, process_count=4)
           for i in range(4)]
    assert [p.row_start for p in prs] == [0, 16, 32, 48]
    assert all(p.n_local == 16 * 32 for p in prs)
    with pytest.raises(ValueError):
        multihost.process_rows(65, 32, process_index=0, process_count=4)


def test_local_rays_tile_the_image():
    cam = Camera(position=(0.5, 0.85, -0.6), look_at=(0.5, 0.4, 0.5),
                 fov_y_deg=50.0, width=16, height=16)
    o_full, d_full = cam.rays(np)
    parts_o = []
    for i in range(4):
        pr = multihost.process_rows(16, 16, process_index=i, process_count=4)
        o, d = multihost.local_camera_rays(cam, pr)
        parts_o.append(o)
    np.testing.assert_array_equal(np.concatenate(parts_o), o_full)


def test_global_ray_array_single_process():
    cam = Camera(position=(0.5, 0.85, -0.6), look_at=(0.5, 0.4, 0.5),
                 fov_y_deg=50.0, width=16, height=16)
    pr = multihost.process_rows(16, 16, process_index=0, process_count=1)
    o, d = multihost.local_camera_rays(cam, pr)
    mesh = make_mesh()
    arr = multihost.global_ray_array(mesh, pr, o)
    assert arr.shape == (256, 3)
    np.testing.assert_allclose(np.asarray(arr), o)
