"""Tracing / profiling: scoped stage timers + XLA cost analysis.

Replaces the reference's TS/TE tick-count macro pair
(VINS_ios/global_param.hpp:85-92, used around the Ceres solve
VINS.cpp:657-662, marginalization VINS.cpp:753-758, feature tracking
ViewController.mm:443,459) with:

  * `stage(name)` — a context manager that accumulates wall time per
    stage, blocking on device results so the number means what it says;
  * `StageTimers.report()` — the live metrics dashboard role of the
    reference's UI labels (ViewController.mm:1176-1276);
  * `trace(dir)` — wraps `jax.profiler.trace` for TensorBoard-level XLA
    traces;
  * `cost_analysis(fn, *args)` — compiled FLOP/byte counts from XLA, the
    speed-of-light denominator for kernel efficiency checks
    (SURVEY.md §5.1: "XLA cost analysis for speed-of-light checks").
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Any, Callable, Dict, Optional

import jax


class StageTimers:
    """Accumulating per-stage wall timers (TS/TE equivalent)."""

    def __init__(self, sync: bool = True):
        self.total_s: Dict[str, float] = defaultdict(float)
        self.count: Dict[str, int] = defaultdict(int)
        self.last_s: Dict[str, float] = {}
        self.sync = sync

    @contextlib.contextmanager
    def stage(self, name: str, result: Any = None):
        t0 = time.perf_counter()
        box = {}
        try:
            yield box
        finally:
            out = box.get("result", result)
            if self.sync and out is not None:
                jax.block_until_ready(out)
            dt = time.perf_counter() - t0
            self.total_s[name] += dt
            self.count[name] += 1
            self.last_s[name] = dt

    def mean_ms(self, name: str) -> float:
        c = self.count.get(name, 0)
        return 1e3 * self.total_s[name] / c if c else 0.0

    def report(self) -> str:
        rows = [f"{'stage':24s} {'calls':>6s} {'mean ms':>9s} {'last ms':>9s}"]
        for name in sorted(self.total_s, key=lambda n: -self.total_s[n]):
            rows.append(
                f"{name:24s} {self.count[name]:6d} "
                f"{self.mean_ms(name):9.3f} "
                f"{1e3 * self.last_s.get(name, 0.0):9.3f}")
        return "\n".join(rows)

    def as_dict(self) -> Dict[str, Dict[str, float]]:
        return {n: {"calls": self.count[n], "mean_ms": self.mean_ms(n),
                    "total_s": self.total_s[n]} for n in self.total_s}


# Module-level default registry (the reference's macros are global too).
timers = StageTimers()


@contextlib.contextmanager
def trace(log_dir: str):
    """XLA/TPU trace for TensorBoard (`jax.profiler.trace` wrapper)."""
    with jax.profiler.trace(log_dir):
        yield


def cost_analysis(fn: Callable, *args, static_argnums=()) -> Dict[str, float]:
    """Compiled-program cost counters from XLA.

    Returns a dict with at least `flops` and `bytes accessed` when the
    backend reports them (CPU and TPU both do). Use as the numerator-free
    side of a speed-of-light estimate: achieved_time vs
    flops/peak_flops and bytes/peak_bw.
    """
    jfn = jax.jit(fn, static_argnums=static_argnums)
    compiled = jfn.lower(*args).compile()
    costs = compiled.cost_analysis()
    if isinstance(costs, (list, tuple)):  # older jax returns [dict]
        costs = costs[0] if costs else {}
    return dict(costs) if costs else {}


def speed_of_light(fn: Callable, *args, peak_tflops: float = 197.0,
                   peak_hbm_gbs: float = 819.0,
                   measured_s: Optional[float] = None) -> Dict[str, float]:
    """Roofline bound for a jitted fn on the current chip.

    Defaults are TPU v5e bf16 peak (197 TFLOP/s) and HBM bandwidth
    (819 GB/s); fp32 MXU peak is ~1/2 that. Returns the compute- and
    memory-bound time lower bounds and, when `measured_s` is given, the
    fraction of speed-of-light achieved.
    """
    costs = cost_analysis(fn, *args)
    flops = float(costs.get("flops", 0.0))
    nbytes = float(costs.get("bytes accessed", 0.0))
    t_compute = flops / (peak_tflops * 1e12)
    t_memory = nbytes / (peak_hbm_gbs * 1e9)
    bound = max(t_compute, t_memory)
    out = {"flops": flops, "bytes": nbytes,
           "t_compute_s": t_compute, "t_memory_s": t_memory,
           "t_bound_s": bound}
    if measured_s is not None and bound > 0:
        out["sol_fraction"] = bound / measured_s
    return out
