"""Training callbacks: BEFORE/AFTER-iteration hooks.

TPU-native counterpart of `nerfstudio/engine/callbacks.py:35-76`
(TrainingCallback + TrainingCallbackLocation). The reference mutates module
state from callbacks; here a callback is a pure-ish host function
`fn(state, step) -> state | None` (returning None keeps the state), which is
how the SplatAD pipelines already run their densification refines between jit'd
steps. `update_every_num_iters` gates invocation like the reference's.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Callable, List, Optional, Sequence


class TrainingCallbackLocation(enum.Enum):
    BEFORE_TRAIN_ITERATION = "before"
    AFTER_TRAIN_ITERATION = "after"
    AFTER_TRAIN = "end"


@dataclasses.dataclass
class TrainingCallback:
    """One hook (`callbacks.py:55-76`): fn(state, step) -> new state or None."""

    where_to_run: Sequence[TrainingCallbackLocation]
    func: Callable
    update_every_num_iters: Optional[int] = 1
    iters: Optional[Sequence[int]] = None  # explicit steps (e.g. (12, 17) profiler traces)

    def run_callback_at_location(self, state, step: int, location: TrainingCallbackLocation):
        if location not in self.where_to_run:
            return state
        due = False
        if self.iters is not None:
            due = step in self.iters
        elif self.update_every_num_iters:
            due = step % self.update_every_num_iters == 0
        if not due:
            return state
        out = self.func(state, step)
        return state if out is None else out


def run_callbacks(callbacks: List[TrainingCallback], state, step: int, location: TrainingCallbackLocation):
    for cb in callbacks:
        state = cb.run_callback_at_location(state, step, location)
    return state
