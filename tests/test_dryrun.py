"""Driver-identical multichip dryrun test (VERDICT r04 item 1).

Round 4 shipped with MULTICHIP_r04.json FAILING on a custom-VJP
varying-manual-axes error that no in-process test caught: the failure only
fires when JAX's backward-pass type checks are enabled
(jax_disable_bwd_checks=False, the default), and this image's axon
sitecustomize flips that flag on at interpreter startup whenever the TPU
tunnel is configured — so the in-process pytest run (axon active) passed
while the driver's clean-CPU subprocess failed.

This test reproduces the driver's exact interpreter startup in a
subprocess: sitecustomize active but PALLAS_AXON_POOL_IPS removed (so no
axon registration, bwd checks stay at their default ON), JAX_PLATFORMS=cpu,
an 8-device forced host platform, and no pytest conftest. It then runs the
same entry the driver records as the round's multi-chip artifact
(`__graft_entry__.dryrun_multichip(8)` — the dispatch-boundary analog of
the reference's RaytracingMaster.cs:66-68).

The full dryrun includes a depth-12 2048^2 level-sharded render (~3-5 min
on host devices); RTT_DRYRUN_FAST=1 skips that scale section while keeping
every shard_mapped grad path (where the recorded failure mode lives).
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_driver_env():
    env = dict(os.environ)
    # no axon: bwd-pass checks stay ON (the driver's config)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    # keep every shard_mapped fwd+bwd path but skip the depth-12 scale
    # section so the whole suite stays runnable; the scale section is
    # exercised by the driver itself every round (MULTICHIP_r*.json)
    env["RTT_DRYRUN_FAST"] = "1"
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1100)
    assert proc.returncode == 0, (
        f"driver-identical dryrun failed (rc={proc.returncode}):\n"
        f"--- stdout ---\n{proc.stdout[-4000:]}\n"
        f"--- stderr ---\n{proc.stderr[-4000:]}")
    assert "train step ok" in proc.stdout
