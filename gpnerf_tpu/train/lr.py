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


def multistep_epoch_schedule(base_lr, milestones, gamma, ep_iter):
    """lr = base * gamma^(#milestones passed) — the reference's MultiStepLR
    (lr_scheduler.py:66-77; unused by the shipped configs, kept for API
    surface)."""
    import numpy as np

    ms = np.asarray(sorted(milestones))

    def schedule(step):
        epoch = step // ep_iter
        return base_lr * gamma ** int((ms <= epoch).sum())

    return schedule


def warmup_multistep_epoch_schedule(
    base_lr, milestones, gamma, warmup_factor, warmup_iters, ep_iter,
    warmup_method="linear",
):
    """The reference's WarmupMultiStepLR (lr_scheduler.py:21-63; unused by
    the shipped configs, kept for API surface)."""
    import numpy as np

    ms = np.asarray(sorted(milestones))

    def schedule(step):
        epoch = step // ep_iter
        wf = 1.0
        if epoch < warmup_iters:
            if warmup_method == "constant":
                wf = warmup_factor
            else:
                alpha = epoch / warmup_iters
                wf = warmup_factor * (1 - alpha) + alpha
        return base_lr * wf * gamma ** int((ms <= epoch).sum())

    return schedule
