"""Learning-rate schedules.

- Cosine: lr_end + (lr_start - lr_end) * (1 + cos(min(1, t/T) * pi)) / 2 —
  the schedule the reference constructs (model_base.py:809-820). (Note: the
  TF1/py2 graph divides two integers there, which floors t/T to 0 until the
  final step; we implement the evidently intended float cosine.)
- Legacy: constant LR halved every `lr_reduce_every_n_epochs` epochs
  (model_base.py:792-806, train_fn.py:310-317).
"""

from __future__ import annotations

import math
from typing import Callable

import jax.numpy as jnp


def cosine_schedule(lr_start: float, lr_end: float, max_step: int
                    ) -> Callable[[jnp.ndarray], jnp.ndarray]:
    def fn(step):
        frac = jnp.minimum(1.0, step.astype(jnp.float32) / max(max_step, 1))
        cos_term = 1.0 + jnp.cos(frac * math.pi)
        return (lr_start - lr_end) * cos_term / 2.0 + lr_end

    return fn


def legacy_halving_schedule(lr_start: float, steps_per_epoch: int,
                            reduce_every_n_epochs: int,
                            lr_end: float = 0.0
                            ) -> Callable[[jnp.ndarray], jnp.ndarray]:
    def fn(step):
        epoch = step // max(steps_per_epoch, 1)
        n_halvings = epoch // max(reduce_every_n_epochs, 1)
        lr = lr_start * jnp.power(0.5, n_halvings.astype(jnp.float32))
        # _lr_reduce_check clamps at lr_end (train_fn.py:310-317): the
        # reference stops halving once the LR reaches the floor
        return jnp.maximum(lr, lr_end)

    return fn
