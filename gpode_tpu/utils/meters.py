"""Optimization-trace meters (reference: `src/misc/meter_utils.py:1-83`).

Host-side scalar accumulators: plain averages and EMA running averages, each
with an optional cached per-iteration history for trace plots.
"""

from __future__ import annotations


class AverageMeter:
    """Running mean of scalar updates."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count


class CachedAverageMeter(AverageMeter):
    """AverageMeter that also records (iteration, value) history."""

    def reset(self):
        super().reset()
        self.vals = []
        self.iters = []

    def update(self, val, iteration, n: int = 1):
        super().update(val, n)
        self.vals.append(val)
        self.iters.append(iteration)


class RunningAverageMeter:
    """Exponential moving average (momentum per `meter_utils.py:44-58`)."""

    def __init__(self, momentum: float = 0.99):
        self.momentum = momentum
        self.reset()

    def reset(self):
        self.val = None
        self.avg = 0.0

    def update(self, val):
        self.avg = val if self.val is None else (
            self.avg * self.momentum + val * (1.0 - self.momentum))
        self.val = val


class CachedRunningAverageMeter(RunningAverageMeter):
    """EMA meter with per-iteration history (`meter_utils.py:62-83`)."""

    def reset(self):
        super().reset()
        self.vals = []
        self.iters = []

    def update(self, val, iteration):
        super().update(val)
        self.vals.append(val)
        self.iters.append(iteration)
