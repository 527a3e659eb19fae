"""LR schedules: cosine annealing with warm restarts (SGDR).

Parity target: the reference's CosineAnnealingWarmRestarts(T_0=10, T_mult=2,
eta_min=1e-6) stepped once per epoch (reference train.py:126-128, 298).
Implemented as optax.join_schedules of per-cycle cosine decays measured in
optimizer steps.
"""

from __future__ import annotations

import optax


def sgdr_schedule(
    base_lr: float,
    steps_per_epoch: int,
    total_epochs: int,
    t0_epochs: int = 10,
    t_mult: int = 2,
    eta_min: float = 1e-6,
):
    """Cosine warm restarts; each cycle k spans t0*t_mult^k epochs."""
    schedules = []
    boundaries = []
    start = 0
    cycle = t0_epochs
    while start < total_epochs:
        seg_epochs = cycle
        seg_steps = max(1, seg_epochs * steps_per_epoch)
        schedules.append(
            optax.cosine_decay_schedule(
                init_value=base_lr,
                decay_steps=seg_steps,
                alpha=eta_min / base_lr,
            )
        )
        start += seg_epochs
        boundaries.append(start * steps_per_epoch)
        cycle *= t_mult
    return optax.join_schedules(schedules, boundaries[:-1])
