"""Learning-rate and teacher-momentum schedules.

Parity targets (/root/reference/src/training/scheduler.py):
  - const_lr (:13), const_lr_cooldown (:24), cosine_lr (:43) — note the
    reference's warmup is base_lr*(step+1)/warmup_length.
  - cosine_scheduler (:56) — value schedule used for the teacher momentum
    ramp momentum→1.0 over training (main.py:469-470).

All schedules here are pure functions of a (possibly traced) step so they
live INSIDE the jitted train step — no host-side per-step assignment like
the reference's assign_learning_rate.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

Schedule = Callable[[jnp.ndarray], jnp.ndarray]


def _warmup(base: float, warmup_length: int, step):
    return base * (step + 1.0) / max(warmup_length, 1)


def const_lr(base_lr: float, warmup_length: int, steps: int) -> Schedule:
    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        return jnp.where(
            step < warmup_length, _warmup(base_lr, warmup_length, step), base_lr
        )

    return fn


def const_lr_cooldown(
    base_lr: float,
    warmup_length: int,
    steps: int,
    cooldown_steps: int,
    cooldown_power: float = 1.0,
    cooldown_end_lr: float = 0.0,
) -> Schedule:
    start_cooldown = steps - cooldown_steps

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        e = step - start_cooldown
        es = float(steps - start_cooldown)
        decay = (1.0 - e / es) ** cooldown_power
        cooled = decay * (base_lr - cooldown_end_lr) + cooldown_end_lr
        lr = jnp.where(step < start_cooldown, base_lr, cooled)
        return jnp.where(step < warmup_length, _warmup(base_lr, warmup_length, step), lr)

    return fn


def cosine_lr(base_lr: float, warmup_length: int, steps: int) -> Schedule:
    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        e = step - warmup_length
        es = float(max(steps - warmup_length, 1))
        cos = 0.5 * (1.0 + jnp.cos(jnp.pi * e / es)) * base_lr
        return jnp.where(step < warmup_length, _warmup(base_lr, warmup_length, step), cos)

    return fn


def cosine_scheduler(
    base_value: float, final_value: float, warmup_length: int, steps: int
) -> Schedule:
    """Value schedule (teacher momentum: base -> final over training)."""

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        e = step - warmup_length
        es = float(max(steps - warmup_length, 1))
        val = final_value + 0.5 * (1.0 + jnp.cos(jnp.pi * e / es)) * (
            base_value - final_value
        )
        if warmup_length > 0:
            return jnp.where(
                step < warmup_length, _warmup(base_value, warmup_length, step), val
            )
        return val

    return fn


def get_lr_scheduler(name: str, base_lr: float, warmup: int, steps: int,
                     cooldown_steps: int = 0, cooldown_power: float = 1.0,
                     cooldown_end_lr: float = 0.0) -> Schedule:
    if name == "cosine":
        return cosine_lr(base_lr, warmup, steps)
    if name == "const":
        return const_lr(base_lr, warmup, steps)
    if name == "const-cooldown":
        return const_lr_cooldown(
            base_lr, warmup, steps, cooldown_steps, cooldown_power, cooldown_end_lr
        )
    raise ValueError(
        f"Unknown scheduler {name}; available: cosine, const, const-cooldown"
    )
