"""Profiling / tracing hooks (SURVEY.md §5.1).

The reference's closest analogue is ``tf.name_scope`` labels on every op
(e.g. ``KernelBasics/BaseKernels.py:281``). TPU-native equivalent:
``jax.named_scope`` annotations plus a Perfetto/XProf trace context and
structured per-step telemetry (loss, grad-norm, step time — the reference's
only training telemetry is the (pre-fit, post-fit) metric pair,
``Optimizer/Fitter.py:167-170``).
"""
from __future__ import annotations

import contextlib
import json
import logging
import time
from typing import Optional

import jax

log = logging.getLogger("gpf_tpu")


@contextlib.contextmanager
def trace(profile_dir: Optional[str] = None):
    """Capture an XProf/Perfetto trace of the enclosed block when
    ``profile_dir`` is set (view with TensorBoard or ui.perfetto.dev)."""
    if profile_dir:
        jax.profiler.start_trace(profile_dir)
    try:
        yield
    finally:
        if profile_dir:
            jax.profiler.stop_trace()


named_scope = jax.named_scope


@contextlib.contextmanager
def timed(label: str):
    t0 = time.perf_counter()
    yield
    log.info("%s took %.3fs", label, time.perf_counter() - t0)


class StepLogger:
    """Structured per-step fit telemetry: JSON lines of
    {step, loss, grad_norm, dt}."""

    def __init__(self, every: int = 10, sink=None):
        self.every = every
        self.sink = sink or (lambda s: log.info("%s", s))
        self._t = time.perf_counter()

    def __call__(self, step: int, loss: float, grad_norm: Optional[float] = None):
        if step % self.every:
            return
        now = time.perf_counter()
        rec = {"step": step, "loss": float(loss), "dt": now - self._t}
        if grad_norm is not None:
            rec["grad_norm"] = float(grad_norm)
        self._t = now
        self.sink(json.dumps(rec))


def enable_debug_checks(nans: bool = True) -> None:
    """Debug toggles (SURVEY.md §5.2): NaN checking across all jitted code."""
    if nans:
        jax.config.update("jax_debug_nans", True)


def enable_persistent_cache(path: str = "/root/repo/.jax_cache") -> bool:
    """Persistent XLA compilation cache: the dominant user-visible cost of a
    fit on a tunnel-attached chip is the remote compile (minutes for large
    programs, BENCHMARKS.md), and it is identical across runs of the same
    program. Caching serialized executables on disk makes every run after the
    first start in seconds. Returns False if the backend rejects it (older
    plugins) — callers proceed uncached."""
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        # cache everything, however fast it compiled: through the tunnel even
        # "fast" compiles carry seconds of round-trip latency
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        return True
    except Exception:  # noqa: BLE001 — unsupported flag names on old jax
        return False
