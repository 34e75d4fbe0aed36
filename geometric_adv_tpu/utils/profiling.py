"""Tracing / profiling utilities.

The reference's observability is wall-clock prints per epoch/batch
(reference: src/autoencoder.py:209, src/adv_ae.py:167-183). TPU-native
equivalents: ``jax.profiler`` traces viewable in TensorBoard/Perfetto plus a
throughput meter that forces device completion before reading the clock.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace: ``with trace("/tmp/trace"): step()``.

    Open with TensorBoard's profile plugin or ui.perfetto.dev.
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class ThroughputMeter:
    """items/sec counter that blocks on device results before timing.

    Usage:
        meter = ThroughputMeter("pair-iters")
        with meter.measure(n_items=batch * iters):
            out = attack_fn(...)
            jax.block_until_ready(out)
        print(meter)
    """

    def __init__(self, unit: str = "items"):
        self.unit = unit
        self.total_items = 0
        self.total_seconds = 0.0
        self.calls = 0

    @contextlib.contextmanager
    def measure(self, n_items: int):
        t0 = time.perf_counter()
        yield
        self.total_seconds += time.perf_counter() - t0
        self.total_items += n_items
        self.calls += 1

    @property
    def rate(self) -> float:
        return self.total_items / max(self.total_seconds, 1e-12)

    def __str__(self) -> str:
        return (
            f"{self.rate:,.0f} {self.unit}/s "
            f"({self.total_items} over {self.total_seconds:.2f}s, "
            f"{self.calls} calls)"
        )


def log_compile_time(fn, *args, label: str = "fn", **kwargs):
    """Compile (lower+compile) a jitted function and report the time."""
    t0 = time.perf_counter()
    lowered = jax.jit(fn).lower(*args, **kwargs)
    compiled = lowered.compile()
    dt = time.perf_counter() - t0
    print(f"[profiling] {label}: compile {dt:.1f}s")
    return compiled
