"""Profiling hooks: jax.profiler traces around engine hot paths.

SURVEY.md §5: the reference has only ad-hoc wall-clock step timings; the
rebuild keeps those (chain ``step_timings``, engine ``last_timings``) and
adds real device traces — a captured trace opens in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import time
from pathlib import Path
from typing import Any, Dict, Iterator, Optional


@contextlib.contextmanager
def device_trace(trace_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace for the enclosed block."""
    import jax

    Path(trace_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def profile_retrieval(engine, query: str, trace_dir: Optional[str] = None,
                      **retrieve_kwargs) -> Dict[str, Any]:
    """Run one retrieval under a device trace; returns timings + trace path."""
    t0 = time.perf_counter()
    if trace_dir:
        with device_trace(trace_dir):
            ranked = engine.retrieve(query, **retrieve_kwargs)
    else:
        ranked = engine.retrieve(query, **retrieve_kwargs)
    return {
        "query": query,
        "results": len(ranked),
        "wall_s": round(time.perf_counter() - t0, 4),
        "stage_timings": engine.last_timings,
        "trace_dir": trace_dir,
    }
