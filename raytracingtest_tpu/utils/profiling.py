"""Profiling harness: wall-clock rays/s counters, jax.profiler traces, and
a first-order roofline account for the traversal loop.

The reference's only instrumentation is Stopwatch logging of clipmap updates
(Clipmap.cs:46-47,128-137) and an uncapped frame counter
(RaytracingMaster.cs:21-22); SURVEY.md §5 mandates real traces + rays/s +
roofline accounting for the TPU build.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time

import numpy as np


@dataclasses.dataclass
class RaysPerSecond:
    """Accumulating rays/s counter (the FPS counter analog)."""

    rays: int = 0
    seconds: float = 0.0
    frames: int = 0

    @contextlib.contextmanager
    def frame(self, n_rays: int):
        t0 = time.perf_counter()
        yield
        self.seconds += time.perf_counter() - t0
        self.rays += n_rays
        self.frames += 1

    @property
    def rays_per_s(self) -> float:
        return self.rays / self.seconds if self.seconds else 0.0

    def summary(self) -> str:
        return (f"{self.frames} frames, {self.rays:.3g} rays in "
                f"{self.seconds:.2f}s = {self.rays_per_s/1e6:.2f} Mrays/s")


@contextlib.contextmanager
def device_trace(logdir: str):
    """jax.profiler trace context (view with tensorboard/xprof)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def traversal_roofline(n_rays: int, depth: int, mean_iters: float,
                       hbm_gbps: float = 819.0):
    """First-order cost model of the traversal loop per frame.

    Memory per iteration: one packed (8 B) node fetch per active ray plus
    ~32 B of state traffic per ray when the loop spills; compute is ~60 VPU
    ops/ray/iter — strongly memory-bound, so the bound is modeled from
    bytes over HBM bandwidth. Returns a dict with the ideal frame time and
    implied rays/s ceiling."""
    bytes_per_iter = 8 + 32
    total_bytes = n_rays * mean_iters * bytes_per_iter
    t_ideal = total_bytes / (hbm_gbps * 1e9)
    return {
        "bytes": total_bytes,
        "ideal_s": t_ideal,
        "rays_per_s_ceiling": n_rays / t_ideal if t_ideal else float("inf"),
    }


def iter_stats(iters) -> dict:
    it = np.asarray(iters)
    return {
        "mean": float(it.mean()),
        "p50": float(np.percentile(it, 50)),
        "p99": float(np.percentile(it, 99)),
        "max": int(it.max()),
    }
