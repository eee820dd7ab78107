"""Learning-rate schedules: Eden and fixed.

Rebuild of ref zipvoice/utils/lr_scheduler.py:125-205.  Pure functions of
(batch, epoch) so they compose with jit; `epoch` may be re-keyed to hours of
seen speech like the reference's --lr-hours mode (ref train_zipvoice.py:626-632
steps `epoch` as seen_hours / 1000... actually epoch_fraction; we expose the
same knob by letting the caller pass any float).
"""

from __future__ import annotations

import jax.numpy as jnp


def eden_lr(
    base_lr: float,
    batch,
    epoch,
    lr_batches: float = 5000.0,
    lr_epochs: float = 6.0,
    warmup_batches: float = 500.0,
    warmup_start: float = 0.5,
):
    """lr = base * ((b^2+B^2)/B^2)^-0.25 * ((e^2+E^2)/E^2)^-0.25 * warmup."""
    batch = jnp.asarray(batch, jnp.float32)
    epoch = jnp.asarray(epoch, jnp.float32)
    factor = ((batch**2 + lr_batches**2) / lr_batches**2) ** -0.25 * (
        (epoch**2 + lr_epochs**2) / lr_epochs**2
    ) ** -0.25
    warmup = jnp.where(
        batch >= warmup_batches,
        1.0,
        warmup_start + (1.0 - warmup_start) * (batch / warmup_batches),
    )
    return base_lr * factor * warmup


def fixed_lr(base_lr: float, batch=None, epoch=None):
    return jnp.asarray(base_lr, jnp.float32)
