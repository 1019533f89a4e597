"""Profiling / tracing helpers (SURVEY.md §5 tracing slot).

The reference's only observability is wall-clock logs and
torch.cuda.max_memory_allocated (reference train_model.py:145-148,157).
Here: a jax.profiler trace context that writes TensorBoard-viewable traces,
and a device memory snapshot helper that works across backends.
"""

from __future__ import annotations

import contextlib
import logging
import os
import time
from typing import Dict, Optional

import jax

log = logging.getLogger(__name__)


@contextlib.contextmanager
def trace(log_dir: str, name: str = "trace"):
    """Capture a device trace around the enclosed block:

        with trace("logs/profile"):
            train_step(...)

    View with TensorBoard's profile plugin (or xprof)."""
    path = os.path.join(log_dir, name)
    os.makedirs(path, exist_ok=True)
    t0 = time.time()
    try:
        jax.profiler.start_trace(path)
        started = True
    except Exception as e:  # pragma: no cover - some backends lack profiling
        log.warning("profiler unavailable: %s", e)
        started = False
    try:
        yield path
    finally:
        if started:
            jax.profiler.stop_trace()
            log.info("trace (%.2fs) written to %s", time.time() - t0, path)


def device_memory_stats(device=None) -> Optional[Dict[str, int]]:
    """Peak/current device memory, or None when the backend has no stats
    (CPU). Keys follow PJRT: bytes_in_use, peak_bytes_in_use, ..."""
    d = device or jax.local_devices()[0]
    try:
        stats = d.memory_stats()
    except Exception:
        return None
    return dict(stats) if stats else None


def step_memory_analysis(fn, *args, donate_argnums=()) -> Dict[str, int]:
    """Compile-time memory footprint of a jitted function: argument/output/
    temp/generated-code sizes in bytes (XLA memory analysis — how the
    RevPHiSeg savings are measured deterministically, cf. bench_memory.py)."""
    lowered = jax.jit(fn, donate_argnums=donate_argnums).lower(*args)
    m = lowered.compile().memory_analysis()
    return {
        "argument_bytes": int(m.argument_size_in_bytes),
        "output_bytes": int(m.output_size_in_bytes),
        "temp_bytes": int(m.temp_size_in_bytes),
        "generated_code_bytes": int(m.generated_code_size_in_bytes),
        "peak_bytes": int(m.temp_size_in_bytes + m.argument_size_in_bytes),
    }
