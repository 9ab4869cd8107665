"""Tracing/profiling (SURVEY.md SS5.1): jax.profiler capture + MLUPS.

The reference times with printf/cudaEvent; here `trace()` wraps a code
region in a jax.profiler capture (Perfetto/XProf-readable), and
`Timer` gives fetch-synchronized wall timings (plain block_until_ready
returns early on remote-attached runtimes - see Simulation._sync).
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a profiler trace viewable with XProf/TensorBoard:
    `with profiling.trace('/tmp/trace'): sim.run(100)`."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Fetch-synchronized region timer: `with Timer() as t: ...`;
    t.seconds after the block. Pass a pytree via sync= to wait on."""

    def __init__(self, sync=None):
        self._sync = sync
        self.seconds = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self._sync is not None:
            leaf = jax.tree.leaves(self._sync)[0]
            jax.device_get(leaf.ravel()[0] if hasattr(leaf, "ravel") else leaf)
        self.seconds = time.perf_counter() - self._t0
        return False


def mlups(nx: int, ny: int, steps: int, seconds: float) -> float:
    """Million lattice-site updates per second - the domain's headline
    throughput metric (SURVEY SS6)."""
    return nx * ny * steps / seconds / 1e6
