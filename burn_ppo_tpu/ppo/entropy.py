"""Adaptive entropy-coefficient controller.

Bang-bang control steering the policy entropy toward a scheduled target
expressed as a ratio of max entropy ln(A). Behavioral parity with the
reference (src/entropy.rs:14-105): coefficient moves by +/-delta in the
direction of (target - last_entropy), clamped to [min, max]; no
adjustment until the first entropy observation. Host-side (runs once per
update), so plain Python.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

from burn_ppo_tpu.schedule import Schedule


class AdaptiveEntropyController:
    def __init__(
        self,
        target_schedule: Schedule,
        num_actions: int,
        initial_coef: float,
        min_coef: float = 0.001,
        max_coef: float = 0.1,
        delta: float = 0.001,
    ):
        self.target_schedule = target_schedule
        self.min_coef = min_coef
        self.max_coef = max_coef
        self.delta = delta
        self.max_entropy = math.log(num_actions)
        self.current_coef = initial_coef
        self.last_entropy: Optional[float] = None

    def record_entropy(self, entropy: float) -> None:
        self.last_entropy = float(entropy)

    def target_entropy(self, step: int) -> float:
        return self.target_schedule.get(step) * self.max_entropy

    def get_coefficient(self, step: int) -> Tuple[float, float]:
        """(coefficient, target_entropy); adjusts by the error sign."""
        target = self.target_entropy(step)
        if self.last_entropy is not None:
            error = target - self.last_entropy
            sign = 0.0 if error == 0.0 else math.copysign(1.0, error)
            self.current_coef = min(
                self.max_coef, max(self.min_coef, self.current_coef + self.delta * sign)
            )
        return self.current_coef, target
