"""LR and EMA schedules as pure closed-form functions of the step count.

Behavior parity: reference utils.py:107-264 (EMAWarmup, InverseLR,
ExponentialLR, ConstantLRWithWarmup). The torch schedulers mutate optimizer
state; here each is a pure ``step -> lr`` schedule usable with optax
(``optax.scale_by_learning_rate(schedule)``) or directly inside a jitted train
step, so the schedule math lives on-device with no host sync.
"""

import jax.numpy as jnp


def _warmup_factor(step, warmup):
    # Exponential warmup `1 - warmup**(step+1)`; warmup=0 disables (factor 1).
    if warmup == 0.0:
        return jnp.ones_like(jnp.asarray(step, jnp.float32))
    return 1.0 - warmup ** (jnp.asarray(step, jnp.float32) + 1.0)


def inverse_lr(base_lr, inv_gamma=1.0, power=1.0, warmup=0.0, min_lr=0.0):
    """Inverse decay schedule with exponential warmup (reference utils.py:155-193)."""
    if not 0.0 <= warmup < 1:
        raise ValueError("Invalid value for warmup")

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        lr_mult = (1.0 + step / inv_gamma) ** -power
        return _warmup_factor(step, warmup) * jnp.maximum(min_lr, base_lr * lr_mult)

    return schedule


def exponential_lr(base_lr, num_steps, decay=0.5, warmup=0.0, min_lr=0.0):
    """Continuous exponential decay by ``decay`` every ``num_steps`` steps
    (reference utils.py:196-234)."""
    if not 0.0 <= warmup < 1:
        raise ValueError("Invalid value for warmup")

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        lr_mult = (decay ** (1.0 / num_steps)) ** step
        return _warmup_factor(step, warmup) * jnp.maximum(min_lr, base_lr * lr_mult)

    return schedule


def constant_lr_with_warmup(base_lr, warmup=0.0):
    """Constant schedule with exponential warmup (reference utils.py:237-264)."""
    if not 0.0 <= warmup < 1:
        raise ValueError("Invalid value for warmup")

    def schedule(step):
        return _warmup_factor(step, warmup) * base_lr

    return schedule


class EMAWarmup:
    """Inverse-decay EMA warmup schedule (reference utils.py:107-152).

    Stateless math plus a tiny step counter; ``get_value`` is a pure function of
    ``last_epoch`` so it checkpoints as a single int.
    """

    def __init__(self, inv_gamma=1.0, power=1.0, min_value=0.0, max_value=1.0,
                 start_at=0, last_epoch=0):
        self.inv_gamma = inv_gamma
        self.power = power
        self.min_value = min_value
        self.max_value = max_value
        self.start_at = start_at
        self.last_epoch = last_epoch

    def state_dict(self):
        return dict(self.__dict__.items())

    def load_state_dict(self, state_dict):
        self.__dict__.update(state_dict)

    def get_value(self):
        epoch = max(0, self.last_epoch - self.start_at)
        value = 1 - (1 + epoch / self.inv_gamma) ** -self.power
        return 0.0 if epoch < 0 else min(self.max_value, max(self.min_value, value))

    def step(self):
        self.last_epoch += 1
