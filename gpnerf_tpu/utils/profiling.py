"""Profiling / tracing.

The reference's instrumentation is (a) per-stage cuda-synchronized wall
timing in the demo renderer (`time_slots`, /root/reference/libs/renders/
demo_render.py:97-357) and (b) MetricLogger iteration/data timing + peak
device memory (libs/utils/misc.py:198-263). TPU equivalents:

  * `StageTimer` — block-until-ready wall timing with the same dict shape;
  * `trace` — context manager around jax.profiler for full XLA traces
    (viewable in TensorBoard/Perfetto offline);
  * `device_memory_stats` — live/peak HBM from the device allocator.
"""

from __future__ import annotations

import contextlib
import time

import jax


class StageTimer:
    """Accumulates named stage durations; `stop` blocks on the given
    arrays so device work is attributed to its stage (the reference's
    torch.cuda.synchronize + time.time brackets)."""

    def __init__(self):
        self.time_slots = {}
        self._t0 = None

    def start(self):
        self._t0 = time.time()

    def stop(self, name, *block_on):
        for x in block_on:
            jax.block_until_ready(x)
        self.time_slots[name] = self.time_slots.get(name, 0.0) + (
            time.time() - self._t0
        )
        self._t0 = time.time()


@contextlib.contextmanager
def trace(log_dir="/tmp/gpnerf_trace"):
    """XLA profiler trace (jax.profiler); inspect offline."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def device_memory_stats(device=None):
    dev = device or jax.devices()[0]
    stats = getattr(dev, "memory_stats", lambda: None)()
    if not stats:
        return {}
    return {
        "bytes_in_use": stats.get("bytes_in_use", 0),
        "peak_bytes_in_use": stats.get("peak_bytes_in_use", 0),
        "bytes_limit": stats.get("bytes_limit", 0),
    }
