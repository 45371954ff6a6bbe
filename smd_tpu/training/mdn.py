"""Autoregressive Transformer-MDN training harness.

Capability parity with the reference's ``train_mdn.py`` (:195-321): the MDN
NLL objective in pure JAX (no TFP), the same fused-step / mesh / Orbax design
as the diffusion harness.
"""
from __future__ import annotations

import functools
from typing import Callable, Iterable, Optional

import jax
import jax.numpy as jnp

from smd_tpu.diffusion.losses import mdn_nll
from smd_tpu.parallel import mesh as mesh_lib
from smd_tpu.training import loop as loop_lib
from smd_tpu.training.diffusion import TrainConfig
from smd_tpu.training.optimizer import (make_optimizer,
                                        stepped_exponential_schedule)
from smd_tpu.training.state import TrainState
from smd_tpu.utils import logging as log_lib

__all__ = ["create_train_state", "make_train_step", "make_train_chunk",
           "make_eval_step", "fit"]


def create_train_state(rng, model, sample_batch, config: TrainConfig,
                       mesh=None) -> TrainState:
    params = model.init(rng, jnp.zeros(sample_batch, jnp.float32))
    tx = make_optimizer(config.learning_rate, config.grad_clip,
                        config.lr_gamma, config.lr_schedule_interval,
                        config.lr_warmup, adam_m_bf16=config.adam_m_bf16)
    # Reference MDN training has no EMA (``train_mdn.py`` checkpoints only
    # (optimizer, early_stop)).
    state = TrainState.create(params, tx, ema=False)
    if mesh is not None:
        shardings = mesh_lib.shard_params(state.params, mesh)
        state = state.replace(params=jax.device_put(state.params, shardings))
    return state


def _update(model, lr_schedule, state: TrainState, batch):
    def loss_fn(params):
        pi, mu, log_sigma = model.apply(params, batch)
        return mdn_nll(pi, mu, log_sigma, batch, "mean")

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    grad_norm = jnp.sqrt(sum(
        jnp.sum(jnp.square(g)) for g in jax.tree_util.tree_leaves(grads)))
    new_state = state.apply_gradients(grads)
    metrics = {"loss": loss, "grad": grad_norm}
    if lr_schedule is not None:
        metrics["lr"] = lr_schedule(state.step)
    return new_state, metrics


def make_train_step(model, lr_schedule=None):
    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch):
        return _update(model, lr_schedule, state, batch)

    return train_step


def make_train_chunk(model, lr_schedule=None):
    """K fused optimizer steps per dispatch — see
    ``diffusion.make_train_chunk`` for why (dispatch amortization on
    remote accelerators). ``batches`` is a (K, batch, ...) stack."""

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_chunk(state: TrainState, batches):
        def body(state, batch):
            return _update(model, lr_schedule, state, batch)

        return jax.lax.scan(body, state, batches)

    return train_chunk


def make_eval_step(model):
    @jax.jit
    def eval_step(params, batch):
        pi, mu, log_sigma = model.apply(params, batch)
        return mdn_nll(pi, mu, log_sigma, batch, "sum") / batch.shape[1]

    return eval_step


def fit(model,
        train_data: Callable[[], Iterable],
        eval_data: Callable[[], Iterable],
        input_shape,
        config: TrainConfig,
        model_dir: Optional[str] = None,
        mesh=None,
        seed: int = 0,
        snapshot_callback: Optional[Callable] = None):
    rng = jax.random.PRNGKey(seed)
    rng, model_rng = jax.random.split(rng)
    state = create_train_state(model_rng, model,
                               (config.batch_size, *input_shape), config,
                               mesh)
    log_lib.report_params(state.params)

    schedule = stepped_exponential_schedule(config.learning_rate,
                                            config.lr_schedule_interval,
                                            config.lr_gamma, config.lr_warmup)
    train_step = make_train_step(model, schedule)
    eval_step = make_eval_step(model)
    train_chunk = (make_train_chunk(model, schedule)
                   if config.scan_chunk > 1 else None)
    return loop_lib.run_loop(state, train_step, eval_step, train_data,
                             eval_data, config, model_dir=model_dir,
                             mesh=mesh, rng=rng, needs_rng=False,
                             snapshot_callback=snapshot_callback,
                             train_chunk=train_chunk)
