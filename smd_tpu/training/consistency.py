"""Consistency distillation for 1-2 step diffusion sampling.

Song, Dhariwal, Chen & Sutskever, "Consistency Models" (ICML 2023), with
the pseudo-Huber metric from "Improved Techniques for Training Consistency
Models" (Song & Dhariwal, 2023), adapted to this framework's continuous
sqrt(alpha-bar)-conditioned epsilon models (the reference trains exactly
that conditioning, ``utils/losses.py:280-300``, which makes any trained
reference-style checkpoint distillable without retraining).

Why this exists next to ``training/distill.py``: progressive distillation
measurably collapses at 1 step on the flagship (FD 891 vs DDIM-50's ~261,
docs/DESIGN.md) — each halving compounds error and the final 1-jump student
has to invert the whole ODE in one shot from a 2-step teacher. Consistency
distillation instead trains f(z_t, t) -> x0 to be *self-consistent along
the teacher's ODE trajectory* for every t at once, so the 1-step map is the
direct training target rather than the last rung of a ladder.

Design in this repo's conventions:

- The consistency function is the model's clipped-x0 prediction
  ``f(z, abar) = clip((z - sigma*eps_theta(z, alpha)) / alpha)`` — the same
  (clipped x0, raw eps) basis every sampler here uses. The boundary
  condition f(z, t->0) = z holds to O(sigma_min): the grid's clean end is
  abar = 1 - 1e-6 where x0 = z - 1e-3*eps, so no extra c_skip/c_out
  reparameterization is needed (and none would match the eps-model API).
- The teacher ODE step from segment boundary grid[i] to grid[i+1] is TWO
  chained DDIM jumps through the dense grid's midpoint — the same
  second-order-ish trajectory accuracy the CM paper gets from one Heun
  step, reusing ``distill.ddim_jump`` and the exactly-nesting grids.
- The target network theta^- is the TrainState's own EMA tree (mu is the
  ``ema_mu`` knob): ``state.ema_params`` under ``stop_gradient`` is the CM
  target, and ``state.sampling_params`` is what ships.
- Loss: per-example pseudo-Huber ``sqrt(||f_theta - f_theta^-||^2 + c^2)
  - c`` with c = 0.00054 * sqrt(D) (iCT's scaling), uniform over segments.
- Training is scan-fused like every harness here: K optimizer steps
  (teacher fwd x2 + target fwd + student fwd/bwd + Adam + EMA) per
  dispatch in ONE donated jit program.

Sampling is ``samplers.consistency_dynamics``: 1 model call for 1-step
generation; k-step refinement alternates f with forward re-noising at
lambda-spaced levels of the training grid.
"""
from __future__ import annotations

import functools
from typing import Callable, Dict, Iterator, Optional

import jax
import jax.numpy as jnp

from smd_tpu.diffusion import schedules
from smd_tpu.training.distill import _bb, ddim_jump, distill_grid, halve_grid
from smd_tpu.training.state import TrainState

__all__ = [
    "consistency_f",
    "consistency_distillation_loss",
    "consistency_training_loss",
    "make_cd_step",
    "make_cd_scan",
    "make_ct_scan",
    "consistency_distill",
    "consistency_train",
]


def consistency_f(model_fn, z, abar, clip_x0: bool = True):
    """The consistency function: the model's (clipped) x0 prediction.

    ``abar`` must broadcast to ``z``; the model is conditioned on
    sqrt(abar), matching the repo-wide continuous-noise convention.
    """
    a = jnp.sqrt(abar)
    s = jnp.sqrt(1.0 - abar)
    eps = model_fn(z, a)
    x0 = (z - s * eps) / a
    if clip_x0:
        x0 = jnp.clip(x0, -1.0, 1.0)
    return x0


def consistency_distillation_loss(batch, student_fn, target_fn, teacher_fn,
                                  grid, mids, rng,
                                  huber_c: Optional[float] = None,
                                  clip_x0: bool = True):
    """One CD step's loss: self-consistency along the teacher trajectory.

    Per example: draw a random segment i, forward-diffuse the clean
    ``batch`` to the noisier boundary grid[i], run the (stop-gradient)
    teacher one fine ODE step grid[i] -> mids[i] -> grid[i+1], and match
    the student's x0 prediction at grid[i] against the frozen target
    network's x0 prediction at grid[i+1] under the pseudo-Huber metric.

    Args:
        grid: (N+1,) student segment boundaries (ascending cleanliness).
        mids: (N,) dense-grid midpoints (``distill.halve_grid``).
        huber_c: pseudo-Huber transition constant; default
            0.00054 * sqrt(D) per iCT. ``None`` -> auto from batch shape.
    """
    num_seg = grid.shape[0] - 1
    idx_rng, eps_rng = jax.random.split(rng)
    i = jax.random.randint(idx_rng, (batch.shape[0],), 0, num_seg)
    abar_t = _bb(grid[i], batch)
    abar_m = _bb(mids[i], batch)
    abar_s = _bb(grid[i + 1], batch)

    eps = jax.random.normal(eps_rng, batch.shape)
    z_t = jnp.sqrt(abar_t) * batch + jnp.sqrt(1.0 - abar_t) * eps

    # Teacher ODE: two chained DDIM jumps (midpoint-refined trajectory).
    z_m = ddim_jump(teacher_fn, z_t, abar_t, abar_m, clip_x0=clip_x0)
    z_s = ddim_jump(teacher_fn, z_m, abar_m, abar_s, clip_x0=clip_x0)
    tgt = consistency_f(target_fn, z_s, abar_s, clip_x0=clip_x0)
    tgt = jax.lax.stop_gradient(tgt)

    pred = consistency_f(student_fn, z_t, abar_t, clip_x0=clip_x0)

    d = (pred - tgt).reshape(batch.shape[0], -1)
    dim = d.shape[-1]
    c = 0.00054 * jnp.sqrt(float(dim)) if huber_c is None else huber_c
    loss = jnp.sqrt(jnp.sum(jnp.square(d), axis=-1) + c * c) - c
    return loss.mean()


def consistency_training_loss(batch, student_fn, target_fn, grid, rng,
                              huber_c: Optional[float] = None,
                              clip_x0: bool = True,
                              p_mean: float = -1.1, p_std: float = 2.0):
    """One consistency-TRAINING step's loss (teacher-free CT).

    Song & Dhariwal, "Improved Techniques for Training Consistency Models"
    (iCT, 2023): instead of a teacher ODE step, the noisier and cleaner
    points share the SAME Gaussian draw — ``z_n = a_n x + s_n eps`` and
    ``z_{n+1} = a_{n+1} x + s_{n+1} eps`` — which is an unbiased estimate
    of the probability-flow trajectory through ``z_n`` as the segment
    width -> 0. The student's x0 prediction at the noisier level matches
    the (stop-gradient) target network's at the cleaner level.

    iCT ingredients kept: per-example pseudo-Huber, lognormal
    noise-level sampling (``p_mean``/``p_std`` in log-EDM-sigma space,
    discretized over the grid segments), and 1/(sigma_n - sigma_{n+1})
    weighting. ``grid`` is a ``distill_grid`` boundary array (ascending
    cleanliness); the segment curriculum lives in ``consistency_train``.
    """
    num_seg = grid.shape[0] - 1
    idx_rng, eps_rng = jax.random.split(rng)
    # EDM-equivalent sigma of each boundary (descending along the grid).
    sig = jnp.sqrt((1.0 - grid) / grid)
    log_sig = jnp.log(sig)
    # Discretized lognormal over segments: p(i) = CDF mass between the
    # segment's boundary log-sigmas.
    cdf = jax.scipy.special.erf((log_sig - p_mean) / (jnp.sqrt(2.0) * p_std))
    mass = jnp.maximum(cdf[:-1] - cdf[1:], 0.0) + 1e-12
    i = jax.random.categorical(idx_rng, jnp.log(mass),
                               shape=(batch.shape[0],))
    abar_n = _bb(grid[i], batch)
    abar_s = _bb(grid[i + 1], batch)

    eps = jax.random.normal(eps_rng, batch.shape)
    z_n = jnp.sqrt(abar_n) * batch + jnp.sqrt(1.0 - abar_n) * eps
    z_s = jnp.sqrt(abar_s) * batch + jnp.sqrt(1.0 - abar_s) * eps

    tgt = consistency_f(target_fn, z_s, abar_s, clip_x0=clip_x0)
    tgt = jax.lax.stop_gradient(tgt)
    pred = consistency_f(student_fn, z_n, abar_n, clip_x0=clip_x0)

    d = (pred - tgt).reshape(batch.shape[0], -1)
    dim = d.shape[-1]
    c = 0.00054 * jnp.sqrt(float(dim)) if huber_c is None else huber_c
    ph = jnp.sqrt(jnp.sum(jnp.square(d), axis=-1) + c * c) - c
    lam = 1.0 / (sig[i] - sig[i + 1])
    return (lam * ph).mean()


def _cd_update(model, teacher_params, grid, mids, huber_c, clip_x0,
               state: TrainState, batch, rng):
    teacher_fn = lambda x, cond: model.apply(teacher_params, x, cond)
    # theta^-: the state's own EMA tree is the CM target network.
    target_fn = lambda x, cond: model.apply(state.ema_params, x, cond)

    def loss_fn(params):
        student_fn = lambda x, cond: model.apply(params, x, cond)
        return consistency_distillation_loss(
            batch, student_fn, target_fn, teacher_fn, grid, mids, rng,
            huber_c=huber_c, clip_x0=clip_x0)

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    return state.apply_gradients(grads), loss


def make_cd_step(model, teacher_params, grid, mids,
                 huber_c: Optional[float] = None, clip_x0: bool = True):
    """Fused CD step (teacher fwd x2 + target fwd + student grad/Adam/EMA)
    in ONE donated jit program."""

    @functools.partial(jax.jit, donate_argnums=(0,))
    def cd_step(state: TrainState, batch, rng):
        new_state, loss = _cd_update(model, teacher_params, grid, mids,
                                     huber_c, clip_x0, state, batch, rng)
        return new_state, {"loss": loss}

    return cd_step


def make_cd_scan(model, teacher_params, grid, mids,
                 huber_c: Optional[float] = None, clip_x0: bool = True):
    """K CD steps per dispatch via ``lax.scan`` (amortizes the tunneled
    accelerator's per-call host round-trip; same rationale as
    ``distill.make_distill_scan``). ``batches`` is (K, B, ...)."""

    @functools.partial(jax.jit, donate_argnums=(0,))
    def cd_chunk(state: TrainState, batches, rng):
        keys = jax.random.split(rng, batches.shape[0])

        def body(state, xs):
            batch, key = xs
            new_state, loss = _cd_update(model, teacher_params, grid, mids,
                                         huber_c, clip_x0, state, batch, key)
            return new_state, loss

        return jax.lax.scan(body, state, (batches, keys))

    return cd_chunk


def _ct_update(model, grid, huber_c, clip_x0, p_mean, p_std,
               state: TrainState, batch, rng):
    # theta^-: the EMA tree. With ema_mu=0 (iCT's choice) this is exactly
    # the previous iterate, since apply_gradients refreshed it to the
    # post-update params at the END of the last step.
    target_fn = lambda x, cond: model.apply(state.ema_params, x, cond)

    def loss_fn(params):
        student_fn = lambda x, cond: model.apply(params, x, cond)
        return consistency_training_loss(batch, student_fn, target_fn, grid,
                                         rng, huber_c=huber_c,
                                         clip_x0=clip_x0, p_mean=p_mean,
                                         p_std=p_std)

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    return state.apply_gradients(grads), loss


def make_ct_scan(model, grid, huber_c: Optional[float] = None,
                 clip_x0: bool = True, p_mean: float = -1.1,
                 p_std: float = 2.0):
    """K consistency-training steps per dispatch (one donated jit program;
    same dispatch-amortization rationale as ``make_cd_scan``)."""

    @functools.partial(jax.jit, donate_argnums=(0,))
    def ct_chunk(state: TrainState, batches, rng):
        keys = jax.random.split(rng, batches.shape[0])

        def body(state, xs):
            batch, key = xs
            new_state, loss = _ct_update(model, grid, huber_c, clip_x0,
                                         p_mean, p_std, state, batch, key)
            return new_state, loss

        return jax.lax.scan(body, state, (batches, keys))

    return ct_chunk


def consistency_train(model,
                      params,
                      betas,
                      batches: Iterator,
                      *,
                      steps: int = 20000,
                      learning_rate: float = 1e-4,
                      warmup_steps: int = 500,
                      lam_max: Optional[float] = 2.5,
                      seg_schedule: tuple = (16, 32, 64, 128),
                      ema_mu: float = 0.0,
                      huber_c: Optional[float] = None,
                      p_mean: float = -1.1,
                      p_std: float = 2.0,
                      seed: int = 0,
                      clip_x0: bool = True,
                      scan_chunk: int = 50,
                      log_fn: Optional[Callable] = None) -> Dict:
    """Teacher-free consistency training (iCT) on top of a trained eps model.

    The student initializes from ``params`` (the trained diffusion model —
    CT from scratch needs 100k+ steps; warm-starting from the eps model the
    reference trains anyway makes the budget practical) but NO teacher is
    queried during training: the target is the student's own previous
    iterate (``ema_mu=0``, iCT's recommendation — a slow EMA target biases
    CT) under ``stop_gradient``, evaluated at the cleaner of two
    shared-noise points.

    ``seg_schedule`` is iCT's doubling discretization curriculum: training
    runs ``steps`` split evenly across the stages, each stage on a
    ``distill_grid(betas, N)``. Coarse early grids give strong learning
    signal; fine late grids shrink the discretization bias. The returned
    grid is the final (finest) stage's, which is what
    ``samplers.consistency_dynamics`` refines over.

    Returns ``{"params", "grid"}`` exactly like ``consistency_distill``, so
    the bundle serves through the same ``--sampling=consistency`` path.
    """
    import optax

    rng = jax.random.PRNGKey(seed)
    schedule = optax.warmup_cosine_decay_schedule(
        0.0, learning_rate, min(warmup_steps, max(steps // 10, 1)), steps,
        end_value=learning_rate * 0.01)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(schedule))
    state = TrainState.create(
        jax.tree_util.tree_map(jnp.copy, params), tx, ema=True,
        ema_mu=ema_mu)
    per_stage = max(1, steps // len(seg_schedule))
    done_total = 0
    grid = None
    for si, num_segments in enumerate(seg_schedule):
        grid = distill_grid(betas, num_segments, lam_max)
        chunk_fn = make_ct_scan(model, grid, huber_c=huber_c,
                                clip_x0=clip_x0, p_mean=p_mean,
                                p_std=p_std)
        stage_steps = (steps - per_stage * (len(seg_schedule) - 1)
                       if si == len(seg_schedule) - 1 else per_stage)
        done = 0
        while done < stage_steps:
            k_steps = min(scan_chunk, stage_steps - done)
            stack = jnp.stack([next(batches) for _ in range(k_steps)])
            rng, k = jax.random.split(rng)
            state, losses = chunk_fn(state, stack, k)
            done += k_steps
            done_total += k_steps
            if log_fn is not None:
                log_fn(num_segments, done_total - 1, float(losses[-1]))
    ship = state.sampling_params if ema_mu > 0 else state.params
    return {"params": ship, "grid": grid}


def consistency_distill(model,
                        params,
                        betas,
                        batches: Iterator,
                        *,
                        num_segments: int = 32,
                        steps: int = 4000,
                        learning_rate: float = 1e-4,
                        warmup_steps: int = 100,
                        lam_max: Optional[float] = 2.5,
                        ema_mu: float = 0.95,
                        huber_c: Optional[float] = None,
                        seed: int = 0,
                        clip_x0: bool = True,
                        scan_chunk: int = 50,
                        log_fn: Optional[Callable] = None) -> Dict:
    """Consistency-distill a trained eps model for 1-2 step sampling.

    One stage (no halving ladder): the student initializes from ``params``
    and its EMA (mu=``ema_mu``) is both the CM target network and the
    shipped sampling params. The teacher is ``params`` itself on a
    2*num_segments dense lambda grid; the student learns consistency
    across ``num_segments`` segments of it.

    Args:
        batches: infinite iterator of clean-data batches.
        num_segments: N in the CM discretization. Finer N = tighter
            adjacent-level consistency but weaker per-step signal.
        ema_mu: target-network EMA rate (CM paper's mu; 0.95 default —
            at a few thousand steps a 0.999 target barely moves off init).

    Returns:
        {"params": sampling params (the EMA tree), "grid": (N+1,) segment
         boundaries for ``samplers.consistency_dynamics``}.
    """
    import optax

    rng = jax.random.PRNGKey(seed)
    dense = distill_grid(betas, 2 * num_segments, lam_max)
    grid, mids = halve_grid(dense)
    schedule = optax.warmup_cosine_decay_schedule(
        0.0, learning_rate, min(warmup_steps, max(steps // 10, 1)), steps,
        end_value=learning_rate * 0.01)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(schedule))
    state = TrainState.create(
        jax.tree_util.tree_map(jnp.copy, params), tx, ema=True,
        ema_mu=ema_mu)
    if scan_chunk > 1:
        chunk_fn = make_cd_scan(model, params, grid, mids, huber_c=huber_c,
                                clip_x0=clip_x0)
        done = 0
        while done < steps:
            k_steps = min(scan_chunk, steps - done)
            stack = jnp.stack([next(batches) for _ in range(k_steps)])
            rng, k = jax.random.split(rng)
            state, losses = chunk_fn(state, stack, k)
            done += k_steps
            if log_fn is not None:
                log_fn(num_segments, done - 1, float(losses[-1]))
    else:
        step_fn = make_cd_step(model, params, grid, mids, huber_c=huber_c,
                               clip_x0=clip_x0)
        for step in range(steps):
            batch = next(batches)
            rng, k = jax.random.split(rng)
            state, metrics = step_fn(state, jnp.asarray(batch), k)
            if log_fn is not None and (step % 500 == 0 or step == steps - 1):
                log_fn(num_segments, step, float(metrics["loss"]))
    return {"params": state.sampling_params, "grid": grid}
