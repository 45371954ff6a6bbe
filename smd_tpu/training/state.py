"""Training state: a single pytree holding everything a step mutates.

Replaces the reference's loose ``(optimizer, ema_helper, early_stop)``
checkpoint tuple (``train_ncsn.py:397-399``) with one flax struct so Orbax
can save/restore it atomically and pjit can donate it through the step.
EMA (reference ``utils/train_utils.py:62-78``) updates inside the jitted step
rather than as a separate jitted call per batch.
"""
from __future__ import annotations

import math
from typing import Any, Optional

import jax
import optax
from flax import struct

__all__ = ["TrainState", "EarlyStopping"]


@struct.dataclass
class EarlyStopping:
    """Early-stopping state (reference ``utils/train_utils.py:26-59``)."""
    min_delta: float = 0.0
    patience: int = 0
    best_metric: float = float("inf")
    patience_count: int = 0
    should_stop: bool = False

    def update(self, metric):
        if math.isinf(self.best_metric) or \
                self.best_metric - metric > self.min_delta:
            return True, self.replace(best_metric=metric, patience_count=0)
        should_stop = self.patience_count >= self.patience or self.should_stop
        return False, self.replace(patience_count=self.patience_count + 1,
                                   should_stop=should_stop)


@struct.dataclass
class TrainState:
    """Parameters + optimizer + EMA in one donatable pytree."""
    step: jax.Array
    params: Any
    opt_state: Any
    ema_params: Optional[Any]
    ema_mu: float = struct.field(pytree_node=False, default=0.999)
    tx: optax.GradientTransformation = struct.field(pytree_node=False,
                                                    default=None)

    @classmethod
    def create(cls, params, tx, ema: bool = True, ema_mu: float = 0.999):
        import jax.numpy as jnp
        # EMA starts as a *copy* of params: aliased leaves would be donated
        # twice by the state-donating train step.
        ema_params = jax.tree_util.tree_map(jnp.copy, params) if ema else None
        return cls(step=jnp.zeros((), jnp.int32),
                   params=params,
                   opt_state=tx.init(params),
                   ema_params=ema_params,
                   ema_mu=ema_mu,
                   tx=tx)

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(grads, self.opt_state,
                                                self.params)
        new_params = optax.apply_updates(self.params, updates)
        if self.ema_params is not None:
            mu = self.ema_mu
            new_ema = jax.tree_util.tree_map(
                lambda e, p: e * mu + p * (1 - mu), self.ema_params,
                new_params)
        else:
            new_ema = None
        return self.replace(step=self.step + 1, params=new_params,
                            opt_state=new_opt_state, ema_params=new_ema)

    @property
    def sampling_params(self):
        """EMA params when enabled, else the live params."""
        return self.ema_params if self.ema_params is not None else self.params
