"""Learning-rate schedules (jit-traceable).

Parity target: /root/reference/utils/general_utils.py:29-62 (get_expon_lr_func,
the Plenoxels/JaxNeRF log-lerp schedule with optional sine delay). Unlike the
reference's host-side closure mutating optimizer param groups per step, these
are pure functions of the step so they live inside the jitted train step.
"""
from __future__ import annotations

import jax.numpy as jnp


def expon_lr(step, lr_init: float, lr_final: float, lr_delay_steps: int = 0,
             lr_delay_mult: float = 1.0, max_steps: int = 1_000_000):
    """Log-linear interpolation from lr_init to lr_final with sine-eased delay.

    Returns 0 for step<0 or when both endpoints are 0 (reference's "disable"
    convention).
    """
    if lr_init == 0.0 and lr_final == 0.0:
        return jnp.zeros_like(jnp.asarray(step, jnp.float32))
    step = jnp.asarray(step, jnp.float32)
    if lr_delay_steps > 0:
        delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0.0, 1.0))
    else:
        delay_rate = 1.0
    t = jnp.clip(step / max_steps, 0.0, 1.0)
    log_lerp = jnp.exp(jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t)
    return jnp.where(step < 0, 0.0, delay_rate * log_lerp)


def make_expon_lr_fn(lr_init, lr_final, lr_delay_steps=0, lr_delay_mult=1.0,
                     max_steps=1_000_000):
    def fn(step):
        return expon_lr(step, lr_init, lr_final, lr_delay_steps, lr_delay_mult,
                        max_steps)
    return fn
