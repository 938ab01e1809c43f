"""Structured metrics/observability (SURVEY.md §5 metrics/logging).

Design rule: the hot loop is callback-free — metrics are accumulated on
device inside the scan carry and fetched every ``log_every`` steps; this
module only formats/emits what the driver fetched.  JSONL on process 0.
"""

from __future__ import annotations

import json
import time

import jax

__all__ = ["MetricsLogger", "named_scope"]

named_scope = jax.named_scope  # re-export: annotate L4 phases for profiles


class MetricsLogger:
    """JSONL emitter (process-0 only in multi-host runs), with the optional
    TensorBoard scalar writer promised by SURVEY.md §5 (``tensorboard_dir=``
    — degrades to JSONL-only if no writer backend is importable)."""

    def __init__(self, path=None, stream=None, enabled=None,
                 tensorboard_dir=None):
        if enabled is None:
            enabled = jax.process_index() == 0
        self.enabled = enabled
        self._file = open(path, "a") if (path and enabled) else None
        self._stream = stream
        self._tb = None
        if tensorboard_dir and enabled:
            try:
                from flax.metrics import tensorboard as _tb

                self._tb = _tb.SummaryWriter(tensorboard_dir)
            except Exception:  # noqa: BLE001 — optional dependency
                self._tb = None
        self._t0 = time.time()

    def log(self, step, **scalars):
        if not self.enabled:
            return
        rec = {"step": int(step), "t": round(time.time() - self._t0, 3)}
        for k, v in scalars.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                rec[k] = str(v)
        line = json.dumps(rec)
        if self._file:
            self._file.write(line + "\n")
            self._file.flush()
        if self._stream:
            print(line, file=self._stream)
        if self._tb is not None:
            for k, v in rec.items():
                if k not in ("step", "t") and isinstance(v, float):
                    self._tb.scalar(k, v, int(step))

    def close(self):
        if self._file:
            self._file.close()
        if self._tb is not None:
            self._tb.flush()
            self._tb.close()


def profile_trace(logdir):
    """Context manager: jax.profiler trace into ``logdir`` (TensorBoard /
    Perfetto), SURVEY.md §5 tracing — wired behind --profile in the bench
    harness."""
    import contextlib

    @contextlib.contextmanager
    def ctx():
        jax.profiler.start_trace(logdir)
        try:
            yield
        finally:
            jax.profiler.stop_trace()

    return ctx()
