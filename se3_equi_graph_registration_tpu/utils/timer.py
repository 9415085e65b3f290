"""Timing / averaging utilities (capability parity with
/root/reference/utils/timer.py:28-55 `Timer` / `AverageMeter`) plus an
accelerator-honest `device_timer` that forces a host fetch — on remote/async
runtimes `block_until_ready` can return at dispatch-ack, so only fetching a
dependent value measures real device time (see bench.py)."""
from __future__ import annotations

import time
from contextlib import contextmanager


class Timer:
    def __init__(self):
        self.reset()

    def reset(self):
        self.total_time = 0.0
        self.calls = 0
        self.start_time = 0.0
        self.diff = 0.0
        self.avg = 0.0

    def tic(self):
        self.start_time = time.perf_counter()

    def toc(self, average: bool = True) -> float:
        self.diff = time.perf_counter() - self.start_time
        self.total_time += self.diff
        self.calls += 1
        self.avg = self.total_time / self.calls
        return self.avg if average else self.diff


class AverageMeter:
    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.sq_sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count
        self.sq_sum += val ** 2 * n
        self.var = self.sq_sum / self.count - self.avg ** 2


@contextmanager
def device_timer(label: str, result_fn=None, sink=print):
    """Context manager that times a device computation honestly: `result_fn`
    (if given) must return a jax array depending on the computation; its host
    fetch is included before the clock stops."""
    t0 = time.perf_counter()
    yield
    if result_fn is not None:
        import numpy as np
        np.asarray(result_fn())
    sink(f"{label}: {(time.perf_counter() - t0) * 1e3:.2f} ms")
