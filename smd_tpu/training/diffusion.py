"""Diffusion / score-network training harness.

Capability parity with the reference's ``train_ncsn.py`` training loop
(:260-496) redesigned TPU-first:

- one jitted, state-donating train step: loss + grad + clip + Adam + EMA all
  fused into a single XLA program (the reference ran EMA as a second jitted
  call per batch, paying an extra dispatch + param copy);
- the step is jitted over a ('data','model') mesh — batches arrive sharded on
  the 'data' axis and XLA inserts the gradient all-reduce over ICI;
- Orbax checkpointing of one pytree with resume-at-startup (the reference
  could not resume training at all, SURVEY.md §5);
- objective dispatch: dsm / ssm / ddpm as in ``train_ncsn.py:344-352``.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Iterable, Optional

import jax
import jax.numpy as jnp

from smd_tpu.diffusion import losses as losses_lib
from smd_tpu.parallel import mesh as mesh_lib
from smd_tpu.training.optimizer import (make_optimizer,
                                        stepped_exponential_schedule)
from smd_tpu.training import loop as loop_lib
from smd_tpu.training.state import TrainState
from smd_tpu.utils import logging as log_lib

__all__ = ["TrainConfig", "objective_by_name", "create_train_state",
           "make_train_step", "make_train_chunk", "make_eval_step",
           "evaluate", "fit"]

OBJECTIVES = {
    "dsm": losses_lib.denoising_score_matching_loss,
    "ssm": losses_lib.sliced_score_matching_loss,
    "ddpm": losses_lib.diffusion_loss,
}


def objective_by_name(name: str) -> Callable:
    if name not in OBJECTIVES:
        raise ValueError(f"Unsupported objective {name}")
    return OBJECTIVES[name]


@dataclasses.dataclass
class TrainConfig:
    loss: str = "ddpm"
    continuous_noise: bool = True
    learning_rate: float = 1e-3
    batch_size: int = 64
    epochs: int = 10
    max_steps: Optional[int] = None
    early_stopping: bool = False
    grad_clip: float = 1.0
    lr_gamma: float = 0.98
    lr_schedule_interval: int = 10000
    lr_warmup: int = 0
    # Adam first moment in bf16 (benchmarks/profile_train.py: -3% step
    # time, loss curve indistinguishable). EMA always stays fp32.
    adam_m_bf16: bool = False
    ema: bool = True
    mu: float = 0.999
    logging_freq: int = 100
    snapshot_freq: int = 5000
    checkpoints_to_keep: int = 50
    save_ckpt: bool = True
    verbose: bool = True
    resume: bool = True
    # Aux subsystems (SURVEY.md §5): profiler trace + NaN checking.
    profile_steps: int = 0      # trace this many steps (0 = off)
    profile_start_step: int = 10
    debug_nans: bool = False
    # Optimizer steps fused into one dispatch via lax.scan (1 = one dispatch
    # per step). Amortizes the per-call host round-trip on remote/tunneled
    # accelerators; snapshot/checkpoint boundaries are preserved (chunks are
    # clamped to them). See make_train_chunk.
    scan_chunk: int = 1


def create_train_state(rng, model, sample_batch, cond_shape,
                       config: TrainConfig, mesh=None) -> TrainState:
    """Init params on device (sharded under the mesh rules) and build state."""
    x = jnp.zeros(sample_batch, jnp.float32)
    cond = jnp.zeros(cond_shape, jnp.float32)
    params = model.init(rng, x, cond)
    tx = make_optimizer(config.learning_rate, config.grad_clip,
                        config.lr_gamma, config.lr_schedule_interval,
                        config.lr_warmup, adam_m_bf16=config.adam_m_bf16)
    state = TrainState.create(params, tx, ema=config.ema, ema_mu=config.mu)
    if mesh is not None:
        shardings = mesh_lib.shard_params(state.params, mesh)
        state = state.replace(
            params=jax.device_put(state.params, shardings),
            ema_params=(jax.device_put(state.ema_params, shardings)
                        if state.ema_params is not None else None))
    return state


def _update(model, objective, sigmas, continuous_noise, lr_schedule,
            state: TrainState, batch, rng):
    """One optimizer step: loss + grad + clip + Adam + EMA, trace-level."""
    def loss_fn(params):
        model_fn = lambda x, cond: model.apply(params, x, cond)
        loss = objective(batch, model_fn, sigmas, rng, continuous_noise,
                         "mean")
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    grad_norm = jnp.sqrt(sum(
        jnp.sum(jnp.square(g)) for g in jax.tree_util.tree_leaves(grads)))
    new_state = state.apply_gradients(grads)
    metrics = {"loss": loss, "grad": grad_norm}
    if lr_schedule is not None:
        metrics["lr"] = lr_schedule(state.step)
    return new_state, metrics


def make_train_step(model, objective, sigmas, continuous_noise: bool,
                    lr_schedule=None):
    """Build the fused train step. ``sigmas`` is closed over (resident)."""

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch, rng):
        return _update(model, objective, sigmas, continuous_noise,
                       lr_schedule, state, batch, rng)

    return train_step


def make_train_chunk(model, objective, sigmas, continuous_noise: bool,
                     lr_schedule=None):
    """K fused optimizer steps per dispatch (``lax.scan`` over the step).

    On a remote/tunneled accelerator every jit call pays a host round-trip
    (measured 0.1-0.5 s on the axon tunnel) that dwarfs the ~5 ms step
    compute, so a per-step Python loop is dispatch-bound, not device-bound.
    Scanning K steps inside one program amortizes the round-trip K-fold —
    the same amortization ``training/distill.py`` and
    ``scripts/train_musicvae.py --scan_chunk`` already use, available here
    for the main harness (``loop.run_loop(scan_chunk=K)``).

    ``train_chunk(state, batches, rng) -> (state, metrics)`` where
    ``batches`` is a (K, batch, ...) stack and each metric value is a (K,)
    array (row i = step i of the chunk).
    """

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_chunk(state: TrainState, batches, rng):
        keys = jax.random.split(rng, batches.shape[0])

        def body(state, xs):
            batch, key = xs
            state, metrics = _update(model, objective, sigmas,
                                     continuous_noise, lr_schedule, state,
                                     batch, key)
            return state, metrics

        return jax.lax.scan(body, state, (batches, keys))

    return train_chunk


def make_eval_step(model, objective, sigmas, continuous_noise: bool):
    @jax.jit
    def eval_step(params, batch, rng):
        model_fn = lambda x, cond: model.apply(params, x, cond)
        return objective(batch, model_fn, sigmas, rng, continuous_noise,
                         "sum")

    return eval_step


evaluate = loop_lib.evaluate


def fit(model,
        sigmas,
        train_data: Callable[[], Iterable],
        eval_data: Callable[[], Iterable],
        input_shape,
        config: TrainConfig,
        model_dir: Optional[str] = None,
        mesh=None,
        seed: int = 0,
        snapshot_callback: Optional[Callable] = None):
    """Train a score/diffusion model; see ``loop.run_loop`` for loop semantics.

    Args:
        model: Flax module with ``(x, cond)`` call signature.
        sigmas: noise schedule array (sigmas or betas).
        train_data/eval_data: zero-arg callables returning a fresh iterable of
            numpy batches per epoch (mirrors tf.data re-iteration).
        input_shape: per-example shape, e.g. (32, 512).
        snapshot_callback: fn(state, eval_metrics, sampling_step) called at
            each snapshot (the CLI hooks in-training sampling here).

    Returns:
        Final TrainState.
    """
    rng = jax.random.PRNGKey(seed)
    rng, model_rng = jax.random.split(rng)

    cond_shape = (config.batch_size, *([1] * len(input_shape)))
    state = create_train_state(model_rng,
                               model, (config.batch_size, *input_shape),
                               cond_shape, config, mesh)
    log_lib.report_params(state.params)

    objective = objective_by_name(config.loss)
    schedule = stepped_exponential_schedule(config.learning_rate,
                                            config.lr_schedule_interval,
                                            config.lr_gamma, config.lr_warmup)
    train_step = make_train_step(model, objective, sigmas,
                                 config.continuous_noise, schedule)
    eval_step = make_eval_step(model, objective, sigmas,
                               config.continuous_noise)
    train_chunk = (make_train_chunk(model, objective, sigmas,
                                    config.continuous_noise, schedule)
                   if config.scan_chunk > 1 else None)
    return loop_lib.run_loop(state, train_step, eval_step, train_data,
                             eval_data, config, model_dir=model_dir,
                             mesh=mesh, rng=rng, needs_rng=True,
                             snapshot_callback=snapshot_callback,
                             train_chunk=train_chunk)
