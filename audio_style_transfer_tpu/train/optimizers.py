"""Optimizer factory (reference nsynth/utils.py:178-203 ``get_optimizer``).

Maps the reference's optimizer-name strings to optax transforms with the
same hyperparameter conventions (rmsprop decay 0.95 / eps 1e-4, adam
beta1 0.9 / beta2 0.999 / eps 1e-8, adagrad init accumulator 1.0, ...).
"""

from __future__ import annotations

import optax


def get_optimizer(learning_rate, hparams=None, name: str | None = None):
    """Build an optax optimizer by name.

    Args:
      learning_rate: float or schedule.
      hparams: object with ``optimizer`` and ``momentum`` attributes (the
        reference's HParams shape), or None when ``name`` is given.
      name: direct optimizer name overriding hparams.
    """
    momentum = getattr(hparams, "momentum", 0.9)
    name = name or getattr(hparams, "optimizer", "adam")
    table = {
        "rmsprop": lambda: optax.rmsprop(
            learning_rate, decay=0.95, momentum=momentum, eps=1e-4
        ),
        "adam": lambda: optax.adam(learning_rate, b1=0.9, b2=0.999, eps=1e-8),
        "adagrad": lambda: optax.adagrad(
            learning_rate, initial_accumulator_value=1.0
        ),
        "mom": lambda: optax.sgd(learning_rate, momentum=momentum),
        "sgd": lambda: optax.sgd(learning_rate),
    }
    if name not in table:
        raise KeyError(f"unknown optimizer {name!r}; options: {sorted(table)}")
    return table[name]()
