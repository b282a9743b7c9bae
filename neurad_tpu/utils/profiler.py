"""Profiling: wall-time running means + jax.profiler traces.

TPU-native counterpart of `nerfstudio/utils/profiler.py` (time_function 53-117,
torch-profiler Chrome traces 134-179). `trace_steps` wraps chosen steps in a
jax.profiler trace viewable in XProf/TensorBoard instead of torch.profiler.
"""

from __future__ import annotations

import atexit
import functools
import time
from collections import defaultdict
from contextlib import contextmanager
from typing import Dict, Optional

_TIMES: Dict[str, list] = defaultdict(lambda: [0.0, 0])
_enabled = True


def time_function(fn=None, *, name: Optional[str] = None):
    """Decorator/context recording running-mean wall time (`profiler.py:53-117`)."""
    if fn is None:
        return _TimeBlock(name or "block")

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        if not _enabled:
            return fn(*args, **kwargs)
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        rec = _TIMES[name or fn.__qualname__]
        rec[0] += time.perf_counter() - t0
        rec[1] += 1
        return out

    return wrapper


class _TimeBlock:
    def __init__(self, name: str):
        self.name = name

    def __enter__(self):
        self._t0 = time.perf_counter()

    def __exit__(self, *exc):
        rec = _TIMES[self.name]
        rec[0] += time.perf_counter() - self._t0
        rec[1] += 1


def flush_profiler() -> Dict[str, float]:
    """Mean seconds per call, printed at exit (`profiler.py:182-215`)."""
    means = {k: total / max(count, 1) for k, (total, count) in _TIMES.items()}
    if means:
        print("[profiler] mean seconds per call:")
        for k, v in sorted(means.items(), key=lambda kv: -kv[1]):
            print(f"  {k}: {v:.4f}s")
    return means


atexit.register(flush_profiler)


@contextmanager
def trace(log_dir: str):
    """jax.profiler trace context (replaces torch.profiler Chrome traces,
    `profiler.py:134-179`); open with XProf / TensorBoard."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
