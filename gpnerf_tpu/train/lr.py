"""Learning-rate schedule.

The reference steps `ExponentialLR` once per epoch with a continuous
exponent: lr = base * gamma ** (epoch / decay_epochs)
(/root/reference/libs/utils/lr_scheduler.py:80-89; gamma 0.1 over 1000
epochs). An epoch is `ep_iter` optimizer steps, so the optax schedule is a
function of the step count with the same per-epoch staircase.
"""

from __future__ import annotations


def exponential_epoch_schedule(base_lr, gamma, decay_epochs, ep_iter):
    def schedule(step):
        epoch = step // ep_iter
        return base_lr * gamma ** (epoch / decay_epochs)

    return schedule
