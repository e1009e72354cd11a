"""Per-stage wall-clock timing + optional jax.profiler tracing.

The reference has no profiling subsystem (SURVEY.md §5.1: timing was
done ad hoc); this is the rebuild-plan's replacement: pipelines carry
a ``StageTimer`` whose ``time('stage')`` context records wall seconds
per named stage (re-entries accumulate), ``report()`` renders a
table, and ``trace()`` wraps a block in a ``jax.profiler`` trace dump
for xprof/tensorboard.

Wall-clock caveat on TPU: a stage's time includes device work only up
to the last blocking call — stages that end with `block_until_ready`
(or a host transfer) are accurate; purely-async dispatch is attributed
to whichever later stage blocks.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional


class StageTimer:
    def __init__(self) -> None:
        self.seconds: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    def reset(self) -> None:
        self.seconds.clear()
        self.counts.clear()

    def add(self, stage: str, seconds: float) -> None:
        """Manually accumulate seconds measured elsewhere (e.g. inside
        a worker thread, where the context manager can't wrap the
        caller's loop)."""
        self.seconds[stage] = self.seconds.get(stage, 0.0) + seconds
        self.counts[stage] = self.counts.get(stage, 0) + 1

    @contextlib.contextmanager
    def time(self, stage: str) -> Iterator[None]:
        t0 = time.time()
        try:
            yield
        finally:
            dt = time.time() - t0
            self.seconds[stage] = self.seconds.get(stage, 0.0) + dt
            self.counts[stage] = self.counts.get(stage, 0) + 1

    def report(self) -> str:
        if not self.seconds:
            return '(no stages timed)'
        total = sum(self.seconds.values())
        width = max(len(s) for s in self.seconds)
        lines = [f'{"stage".ljust(width)}    seconds   calls   share']
        for stage, sec in self.seconds.items():
            n = self.counts[stage]
            share = 100.0 * sec / total if total else 0.0
            lines.append(f'{stage.ljust(width)}  {sec:9.3f}  {n:6d}  '
                         f'{share:5.1f}%')
        lines.append(f'{"TOTAL".ljust(width)}  {total:9.3f}')
        return '\n'.join(lines)


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """jax.profiler trace dump (viewable with xprof / tensorboard).
    No-op when log_dir is falsy."""
    if not log_dir:
        yield
        return
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
