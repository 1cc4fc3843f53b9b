"""Observability: per-phase timers, rays/s, and XLA profiler traces.

The reference's only observability is printf row-progress and external
`time ./ray_tracer` (SURVEY.md §5; renderer.c:235,313). TPU-native
equivalent: structured phase timers around the compile/photon/render
phases, rays-per-second accounting, and `jax.profiler` trace capture for
xprof/tensorboard.
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Dict, List, Optional

import jax


class PhaseTimer:
    """Wall-clock phase timing with a JSON-line report.

    >>> t = PhaseTimer()
    >>> with t.phase("compile"): ...
    >>> with t.phase("render"): ...
    >>> t.report()                       # prints one JSON line per phase
    """

    def __init__(self):
        self.phases: List[Dict] = []

    @contextlib.contextmanager
    def phase(self, name: str, **extra):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.phases.append({"phase": name, "seconds": dt, **extra})

    def total(self) -> float:
        return sum(p["seconds"] for p in self.phases)

    def report(self, out=None) -> None:
        for p in self.phases:
            line = json.dumps(p)
            if out is None:
                print(line, flush=True)
            else:
                out.write(line + "\n")


def rays_per_second(n_pixels: int, samples_per_pixel: int,
                    rays_per_sample: int, seconds: float) -> float:
    """Nominal throughput: the full wavefront expansion both this renderer
    and the reference evaluate (trace + shadow rays per camera sample)."""
    return n_pixels * samples_per_pixel * rays_per_sample / max(seconds, 1e-12)


def enable_compile_cache(path: Optional[str] = None) -> None:
    """Persistent XLA compilation cache. Remote-compile backends (the axon
    TPU tunnel) take minutes per cold compile of a full render program;
    the on-disk cache cuts warm starts to ~1s. Safe to call repeatedly."""
    import os
    path = path or os.environ.get(
        "FRT_COMPILE_CACHE", os.path.expanduser("~/.cache/jax_comp"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@contextlib.contextmanager
def trace_context(log_dir: Optional[str]):
    """jax.profiler trace capture (view with xprof/tensorboard). No-op when
    log_dir is None so call sites can leave it wired in."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
