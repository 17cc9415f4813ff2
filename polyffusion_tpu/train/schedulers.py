"""Training-time parameter schedulers (teacher forcing etc.).

Counterpart of reference ``train/scheduler.py:6-104``: sigmoid-annealed scheduled
sampling for teacher forcing, constant schedules, and a dict-of-schedulers container
with train/eval modes.  Values are plain Python floats fed into the jitted step as
dynamic scalars (no recompilation).
"""

from __future__ import annotations

from typing import Dict


def scheduled_sampling(i: float) -> float:
    """Sigmoid decay x = 10^(3(1-2i)); y = x/(1+x) (reference scheduler.py:6-11)."""
    x = 10 ** (3 * (1 - 2 * i))
    return x / (1 + x)


class ConstantScheduler:
    def __init__(self, value: float):
        self.value = value

    def step(self, global_step: int) -> float:
        return self.value


class TeacherForcingScheduler:
    """Anneal from ``high`` to ``low`` over ``scaled_steps`` via scheduled_sampling
    (reference scheduler.py:47-61)."""

    def __init__(self, high: float, low: float, scaled_steps: int = 40000):
        self.high = high
        self.low = low
        self.scaled_steps = scaled_steps
        self._eval_value = low

    def step(self, global_step: int) -> float:
        ratio = scheduled_sampling(global_step / self.scaled_steps)
        return self.low + (self.high - self.low) * ratio


class ParameterScheduler:
    """Named bundle of schedulers; eval mode pins teacher forcing to its floor
    (reference scheduler.py:83-104)."""

    def __init__(self, **schedulers):
        self.schedulers = schedulers
        self.training = True

    def train(self):
        self.training = True

    def eval(self):
        self.training = False

    def keys(self):
        return tuple(self.schedulers.keys())

    def step(self, global_step: int) -> Dict[str, float]:
        out = {}
        for name, sch in self.schedulers.items():
            if not self.training and isinstance(sch, TeacherForcingScheduler):
                out[name] = sch.low
            else:
                out[name] = sch.step(global_step)
        return out
