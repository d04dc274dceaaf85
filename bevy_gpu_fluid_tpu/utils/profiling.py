"""Timing / throughput observability.

The reference logged per-dispatch ``info!`` lines and measured FPS through
Bevy's FrameTimeDiagnosticsPlugin (reference: examples/gpu_demo.rs:150-161,
examples/bench_gpu.rs:88-95) and explicitly skipped GPU timestamps
(timestamp_writes: None, src/gpu/pipeline.rs:481).  The TPU equivalents:
wall-clock deltas around ``jax.block_until_ready`` for steady-state rates, and
``jax.profiler`` traces when kernel-level attribution is needed.
"""

from __future__ import annotations

import contextlib
import time

import jax


class StepTimer:
    """Accumulates wall time and step counts; reports steps/s and
    particle-steps/s (the bench metric, BASELINE.json)."""

    def __init__(self, n_particles: int):
        self.n = n_particles
        self.steps = 0
        self.seconds = 0.0

    @contextlib.contextmanager
    def measure(self, n_steps: int, result=None):
        t0 = time.perf_counter()
        yield
        if result is not None:
            jax.block_until_ready(result)
        self.seconds += time.perf_counter() - t0
        self.steps += n_steps

    def time_block(self, fn, *args):
        """Run fn(*args) -> result counted as one call of `steps` steps."""
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        self.seconds += time.perf_counter() - t0
        return out

    @property
    def steps_per_sec(self) -> float:
        return self.steps / self.seconds if self.seconds else 0.0

    @property
    def particle_steps_per_sec(self) -> float:
        return self.steps_per_sec * self.n

    def summary(self) -> str:
        return (f"{self.steps} steps in {self.seconds:.3f}s = "
                f"{self.steps_per_sec:.1f} steps/s, "
                f"{self.particle_steps_per_sec / 1e6:.2f}M particle-steps/s")


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """jax.profiler trace context — open with xprof/tensorboard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
