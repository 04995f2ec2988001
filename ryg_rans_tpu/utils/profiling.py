"""Tracing and benchmarking utilities.

The reference instruments with __rdtsc + wall clock, 5 repetitions, printing
clocks/symbol and MiB/s (main.cpp:169-186, platform.h:32-55).  The TPU-native
equivalents here:

* ``timed_runs``: best-of-N wall-clock timing with ``block_until_ready``
  (the reference's 5-run loop);
* ``trace``: `jax.profiler` trace context for xprof-style kernel timelines
  (the rdtsc analog);
* ``dispatch_slope``: the remote-runtime-safe method bench.py uses -- chain
  repetitions inside one jit via lax.scan and time the *slope* between two
  rep counts, excluding host/tunnel round-trip latency (docs/DESIGN.md
  "Benchmarking on this hardware").
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable


def timed_runs(fn: Callable[[], object], runs: int = 5):
    """Run ``fn`` ``runs`` times; returns (best_seconds, all_seconds).

    ``fn`` must block on its own result (or return a jax array, which is
    blocked on here).
    """
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        out = fn()
        if hasattr(out, "block_until_ready"):
            out.block_until_ready()
        times.append(time.perf_counter() - t0)
    return min(times), times


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace scope (view with xprof/tensorboard)."""
    import jax
    with jax.profiler.trace(log_dir):
        yield


def dispatch_slope(make_chained: Callable[[int], Callable[[], object]],
                   lo: int = 2, hi: int = 14, tries: int = 3) -> float:
    """Seconds per repetition via the slope between chained-rep dispatches.

    ``make_chained(reps)`` returns a zero-arg callable executing ``reps``
    data-dependent repetitions in ONE dispatch (e.g. a jitted lax.scan) and
    blocking on a scalar.  Robust against runtimes that elide unconsumed
    dispatches or add per-dispatch round-trips.
    """
    run_lo = make_chained(lo)
    run_hi = make_chained(hi)
    run_lo(), run_hi()  # warm both compilations

    def best(f):
        ts = []
        for _ in range(tries):
            t0 = time.perf_counter()
            f()
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return (best(run_hi) - best(run_lo)) / (hi - lo)


def report_line(name: str, n_bytes: int, seconds: float) -> str:
    """Reference-style report: 'name: X ns/symbol (Y MiB/s)'
    (main.cpp:184-186 prints clocks/symbol + MB/s)."""
    return (f"{name}: {seconds * 1e9 / max(n_bytes, 1):.2f} ns/symbol "
            f"({n_bytes / max(seconds, 1e-12) / 1048576:.1f} MiB/s)")
