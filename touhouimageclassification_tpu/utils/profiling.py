"""Tracing/profiling.

The reference exposes profiling as a disabled-by-default trainer knob
(``MOE_PROFILER = None`` -> ``L.Trainer(profiler=...)``,
``TIC/ResMoE/parameter.py:14`` / ``train.py:147``). The TPU equivalents
(SURVEY §5 tracing): ``jax.profiler`` traces viewable in XProf/Perfetto/
TensorBoard, plus ``block_until_ready``-based step timers. Exposed the same
way — a config flag (``TrainConfig.profile_dir``) the trainer consults.
"""
from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(logdir: str | None):
    """jax.profiler trace context; no-op when logdir is falsy."""
    if not logdir:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step statistics with device-completion accounting.

    Call ``lap(result)`` once per step with any device value from the step;
    the timer blocks on it so the measurement covers device execution, not
    just dispatch.
    """

    def __init__(self):
        self.times: list[float] = []
        self._last = None

    def start(self):
        self._last = time.perf_counter()

    def lap(self, device_value=None) -> float:
        if device_value is not None:
            import jax

            jax.block_until_ready(device_value)
        now = time.perf_counter()
        dt = now - (self._last if self._last is not None else now)
        self._last = now
        self.times.append(dt)
        return dt

    def summary(self) -> dict:
        if not self.times:
            return {}
        import statistics

        xs = sorted(self.times)
        return {
            "steps": len(xs),
            "mean_s": statistics.fmean(xs),
            "p50_s": xs[len(xs) // 2],
            "p95_s": xs[int(len(xs) * 0.95)],
            "max_s": xs[-1],
        }
