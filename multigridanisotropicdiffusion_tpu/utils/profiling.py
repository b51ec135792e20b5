"""Profiling hooks: jax.profiler traces around solver phases.

The reference's only instrumentation is the ``#ifdef BENCHMARK`` wall-clock
logging (reproduced in :mod:`.benchlog`).  On TPU the right tool is the XLA
profiler: wrap any solve in :func:`trace` to capture a TensorBoard-viewable
trace (HLO op timeline, HBM traffic, fusion boundaries)."""

from __future__ import annotations

import contextlib
import time
from typing import Iterator


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/madtpu_profile") -> Iterator[None]:
    """Capture a jax.profiler trace of the enclosed block."""
    import jax

    with jax.profiler.trace(log_dir):
        yield


@contextlib.contextmanager
def timed(label: str, sink=print) -> Iterator[None]:
    """Wall-clock a block (host-side; call ``block_until_ready`` inside)."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        sink(f"[{label}] {time.perf_counter() - t0:.3f}s")
