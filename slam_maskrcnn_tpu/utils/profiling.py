"""Tracing / profiling / observability utilities.

The reference has none (SURVEY §5.1 — only eval-time wall clocks and a
``log()`` tensor-stats helper, model.py:48-59). Here: per-stage wall timers
with forced device readback (block_until_ready is unreliable on the axon
platform — PERFORMANCE.md), a jax.profiler trace context for perfetto
dumps, and the reference's log() equivalent.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class StageTimer:
    """Accumulating per-stage timer.

    with timer("fuse"): ...  — forces readback of `sync` arrays on exit so
    async dispatch doesn't hide device time.
    """

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, stage: str, sync=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                import jax.numpy as jnp

                leaves = sync if isinstance(sync, (list, tuple)) else [sync]
                for x in leaves:
                    try:
                        float(jnp.sum(x))
                    except TypeError:
                        pass
            dt = time.perf_counter() - t0
            self.totals[stage] += dt
            self.counts[stage] += 1

    def report(self) -> str:
        lines = []
        for k in sorted(self.totals, key=self.totals.get, reverse=True):
            n = self.counts[k]
            lines.append(f"{k:24s} {self.totals[k] * 1000:9.1f} ms total  "
                         f"{self.totals[k] / n * 1000:8.2f} ms/call x{n}")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """jax.profiler trace (perfetto-compatible dump)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def log_tensor(text: str, array=None):
    """= the reference's log() (model.py:48-59): text + tensor stats."""
    if array is not None:
        import numpy as np

        a = np.asarray(array)
        text = text.ljust(25)
        text += (f"shape: {str(a.shape):20}  "
                 f"min: {a.min():10.5f}  max: {a.max():10.5f}  {a.dtype}"
                 if a.size else f"shape: {str(a.shape):20}  empty")
    print(text)
