"""Learning-rate range test (the reference exposes Lightning's
``trainer.tuner.lr_find`` behind ``find_best_lr``, test.py:77-83).

Sweeps the LR exponentially between two bounds over one pass of batches,
tracks the (smoothed) training loss, and suggests the LR at the steepest
descent — the standard Smith (2015) range-test recipe.
"""

from __future__ import annotations

from typing import Callable, Iterable

import numpy as np
import optax


def lr_find(
    make_state: Callable[[optax.GradientTransformation], object],
    make_steps: Callable,
    batches: Iterable[dict],
    min_lr: float = 1e-7,
    max_lr: float = 1.0,
    num_steps: int = 100,
    smoothing: float = 0.05,
    divergence_factor: float = 4.0,
):
    """Run the range test.

    Args:
        make_state: fn(optimizer) → TrainState (fresh params).
        make_steps: fn() → (train_step, eval_step).
        batches: iterable of training batches (cycled up to num_steps).

    Returns:
        (suggested_lr, lrs, losses)
    """
    schedule = optax.exponential_decay(
        init_value=min_lr,
        transition_steps=1,
        decay_rate=(max_lr / min_lr) ** (1.0 / max(num_steps - 1, 1)),
    )
    tx = optax.inject_hyperparams(optax.adam)(learning_rate=schedule)
    state = make_state(tx)
    train_step, _ = make_steps()

    lrs, losses_log = [], []
    avg = None
    best = np.inf
    it = iter(batches)
    pool = []
    for step in range(num_steps):
        try:
            batch = next(it)
        except StopIteration:
            if not pool:
                break
            batch = pool[step % len(pool)]
        else:
            pool.append(batch)
        state, metrics = train_step(state, batch)
        loss = float(metrics["loss"])
        if not np.isfinite(loss):
            break
        avg = loss if avg is None else (1 - smoothing) * avg + smoothing * loss
        lr = float(schedule(step))
        lrs.append(lr)
        losses_log.append(avg)
        best = min(best, avg)
        if avg > divergence_factor * best:
            break

    if len(lrs) < 3:
        return min_lr, lrs, losses_log
    grads = np.gradient(np.asarray(losses_log), np.log(np.asarray(lrs)))
    suggested = lrs[int(np.argmin(grads))]
    return float(suggested), lrs, losses_log
