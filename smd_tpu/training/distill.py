"""Progressive distillation for few-step diffusion sampling.

Salimans & Ho, "Progressive Distillation for Fast Sampling of Diffusion
Models" (ICLR 2022), adapted to this framework's continuous
sqrt(alpha-bar)-conditioned epsilon models (reference
``utils/losses.py:280-300`` trains exactly that conditioning, which is what
makes any trained reference-style checkpoint distillable without retraining).

A capability the reference lacks entirely: its fastest sampler is the
1000-step ancestral chain (``utils/ebm_utils.py:274-405``). Here each
distillation stage halves the number of sampler steps — one student DDIM
step is trained to match two teacher DDIM steps — down to 2-4 steps at
DDIM-50-level quality (measured in ``benchmarks/flagship_e2e.py``).

TPU-first design notes:

- The student step is the same fused jit program shape as the normal train
  step (loss + grad + clip + Adam + EMA, state donated); the teacher's two
  DDIM jumps run inside the same XLA program under ``stop_gradient`` —
  three extra forward matmul fusions, no host round-trips.
- Grids nest EXACTLY across stages: one dense lambda-uniform grid is built
  once and every stage uses strided views of it, so each stage's teacher is
  only ever evaluated at noise levels it was itself just trained on.
- The grid follows the measured DPM-Solver++ finding (docs/DESIGN.md): the
  clean end is capped at ``lam_max`` half-log-SNR and the final boundary
  jumps to clean — beta_0=1e-6 schedules reach lambda 6.9 at t=0 and a grid
  stretched there wastes its budget where the data is already clean.
- Sampling with a distilled stage is ``samplers.distilled_ddim_dynamics``:
  one ``lax.scan``, one model call per step, like every sampler here.
"""
from __future__ import annotations

import functools
from typing import Callable, Dict, Iterator, Optional

import jax
import jax.numpy as jnp

from smd_tpu.diffusion import schedules
from smd_tpu.training.state import TrainState

__all__ = [
    "distill_grid",
    "halve_grid",
    "ddim_jump",
    "progressive_distillation_loss",
    "make_distill_step",
    "progressive_distill",
]


def distill_grid(betas, num_steps: int, lam_max: Optional[float] = 2.5,
                 constants: Optional[schedules.DDPMConstants] = None):
    """Signal-level boundaries for an ``num_steps``-step distilled sampler.

    Returns ``(num_steps + 1,)`` alpha-bar values ascending in cleanliness:
    index 0 is the init level (exactly ``alphas_prod[T-1]``, matching the
    DDIM N(0,1)-init convention), indices 1..num_steps-1 are uniform in
    half-log-SNR up to the ``lam_max`` cap, and the final boundary is clean
    (alpha-bar = 1 - 1e-6, the same clamp ``dpmpp_dynamics`` uses).
    """
    c = constants if constants is not None else schedules.ddpm_constants(betas)
    abar = c.alphas_prod
    lam = 0.5 * (jnp.log(abar) - jnp.log1p(-abar))
    lam_lo = lam[-1]                                  # noisiest (t = T-1)
    lam_hi = lam[0] if lam_max is None else jnp.minimum(
        lam[0], jnp.asarray(lam_max, lam.dtype))
    lam_grid = jnp.linspace(lam_lo, lam_hi, num_steps)
    bounds = jax.nn.sigmoid(2.0 * lam_grid)           # abar = sigmoid(2*lam)
    return jnp.concatenate(
        [bounds, jnp.asarray([1.0 - 1e-6], bounds.dtype)])


def halve_grid(grid):
    """Split a ``(2N+1,)`` boundary grid into a student grid and midpoints.

    Returns ``(student_grid (N+1,), midpoints (N,))``: the student takes
    every other boundary (keeping both ends), and ``midpoints[i]`` is the
    parent boundary the teacher passes through inside student step ``i`` —
    so stage k's teacher is only queried at stage k-1's own levels.
    """
    if (grid.shape[0] - 1) % 2:
        raise ValueError(f"Grid with {grid.shape[0] - 1} steps cannot halve")
    return grid[::2], grid[1::2]


def _bb(values, like):
    """(B,) -> (B, 1, ..., 1) matching ``like``'s rank."""
    return values.reshape(like.shape[0], *([1] * (like.ndim - 1)))


def ddim_jump(model_fn, z, abar_from, abar_to, clip_x0: bool = True):
    """One DDIM jump between arbitrary (broadcast-shaped) signal levels.

    Written in the (clipped x0, raw eps) basis — the repo-wide sampler
    convention (see ``dpmpp_dynamics``; the carry form diverges once
    clipping binds). ``abar_*`` must be broadcastable to ``z``; the model
    is conditioned on sqrt(abar_from).
    """
    a_f, s_f = jnp.sqrt(abar_from), jnp.sqrt(1.0 - abar_from)
    a_t, s_t = jnp.sqrt(abar_to), jnp.sqrt(1.0 - abar_to)
    eps = model_fn(z, a_f)
    x0 = (z - s_f * eps) / a_f
    if clip_x0:
        x0 = jnp.clip(x0, -1.0, 1.0)
    return a_t * x0 + s_t * eps


def progressive_distillation_loss(batch, student_fn, teacher_fn, grid, mids,
                                  rng, reduction: str = "mean",
                                  clip_x0: bool = True):
    """One-student-step == two-teacher-steps landing-point matching loss.

    Per example: draw a random student step i, forward-diffuse the clean
    ``batch`` to level grid[i], run the (stop-gradient) teacher two sampler
    jumps grid[i] -> mids[i] -> grid[i+1], run the student's OWN sampler
    step (the exact ``distilled_ddim_dynamics`` update, clipping included)
    once, and penalize the z-space landing gap.

    The loss is weighted max(1, SNR_t) / denom_t^2 with
    denom = alpha_s - (sigma_s/sigma_t) * alpha_t: since a single jump maps
    an implied x-prediction to z_next = denom * x + (sigma_s/sigma_t) * z_t,
    this is ALGEBRAICALLY IDENTICAL to Salimans & Ho's truncated-SNR
    x-space loss wherever clipping is inactive — but stays well-conditioned
    where it binds. (Measured on the trained flagship: a raw x-space target
    with a clipped teacher produced O(1/denom)-amplified targets at the
    noisy levels where ~86% of x0 predictions clip — initial stage loss 271
    and diverged students; and clipping cannot simply be dropped, because
    the unclipped sampler itself measures FD ~4300 vs 242-268 clipped.)
    """
    from smd_tpu.diffusion.losses import reduce_fn

    num_steps = grid.shape[0] - 1
    idx_rng, eps_rng = jax.random.split(rng)
    i = jax.random.randint(idx_rng, (batch.shape[0],), 0, num_steps)
    abar_t = _bb(grid[i], batch)
    abar_m = _bb(mids[i], batch)
    abar_s = _bb(grid[i + 1], batch)
    a_t, s_t = jnp.sqrt(abar_t), jnp.sqrt(1.0 - abar_t)
    a_s, s_s = jnp.sqrt(abar_s), jnp.sqrt(1.0 - abar_s)

    eps = jax.random.normal(eps_rng, batch.shape)
    z_t = a_t * batch + s_t * eps

    z_m = ddim_jump(teacher_fn, z_t, abar_t, abar_m, clip_x0=clip_x0)
    z_tgt = ddim_jump(teacher_fn, z_m, abar_m, abar_s, clip_x0=clip_x0)
    z_tgt = jax.lax.stop_gradient(z_tgt)

    # Student's actual sampler step (gradient flows through the raw-eps
    # term even where the x0 clip saturates).
    z_pred = ddim_jump(student_fn, z_t, abar_t, abar_s, clip_x0=clip_x0)

    denom = a_s - (s_s / s_t) * a_t
    w = jnp.maximum(1.0, abar_t / (1.0 - abar_t)) / jnp.square(denom)
    err = jnp.square(z_tgt - z_pred).reshape(batch.shape[0], -1)
    loss = (w.reshape(batch.shape[0], -1)[:, :1] * err).mean(axis=-1)
    return reduce_fn(loss, reduction)


def _distill_update(model, teacher_params, grid, mids, clip_x0,
                    state, batch, rng):
    teacher_fn = lambda x, cond: model.apply(teacher_params, x, cond)

    def loss_fn(params):
        student_fn = lambda x, cond: model.apply(params, x, cond)
        return progressive_distillation_loss(
            batch, student_fn, teacher_fn, grid, mids, rng,
            clip_x0=clip_x0)

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    return state.apply_gradients(grads), loss


def make_distill_step(model, teacher_params, grid, mids,
                      clip_x0: bool = True):
    """Fused distillation step: teacher fwd x2 + student loss/grad/Adam/EMA
    in ONE donated jit program (same shape as ``make_train_step``)."""

    @functools.partial(jax.jit, donate_argnums=(0,))
    def distill_step(state: TrainState, batch, rng):
        new_state, loss = _distill_update(model, teacher_params, grid, mids,
                                          clip_x0, state, batch, rng)
        return new_state, {"loss": loss}

    return distill_step


def make_distill_scan(model, teacher_params, grid, mids,
                      clip_x0: bool = True):
    """K distillation steps per dispatch: ``lax.scan`` over a stacked batch
    chunk inside ONE donated jit program.

    On a tunneled/remote accelerator each dispatch pays a host round-trip
    that can dwarf the ~tens-of-ms step compute; scanning K steps per call
    amortizes it K-fold (the same reason the samplers are single scan
    programs). ``batches`` is (K, B, ...); returns (state, (K,) losses).
    """

    @functools.partial(jax.jit, donate_argnums=(0,))
    def distill_chunk(state: TrainState, batches, rng):
        keys = jax.random.split(rng, batches.shape[0])

        def body(state, xs):
            batch, key = xs
            new_state, loss = _distill_update(
                model, teacher_params, grid, mids, clip_x0, state,
                batch, key)
            return new_state, loss

        return jax.lax.scan(body, state, (batches, keys))

    return distill_chunk


def progressive_distill(model,
                        params,
                        betas,
                        batches: Iterator,
                        *,
                        start_steps: int = 8,
                        end_steps: int = 2,
                        steps_per_stage: int = 3000,
                        learning_rate: float = 1e-4,
                        warmup_steps: int = 100,
                        lam_max: Optional[float] = 2.5,
                        ema: bool = False,
                        ema_mu: float = 0.999,
                        seed: int = 0,
                        clip_x0: bool = True,
                        scan_chunk: int = 50,
                        log_fn: Optional[Callable] = None
                        ) -> Dict[int, dict]:
    """Distill a trained model down to ``end_steps`` sampler steps.

    Stages halve: start_steps, start_steps/2, ..., end_steps; each stage's
    student initializes from (and is taught by) the previous stage's
    sampling params. The first teacher is ``params`` itself, evaluated at
    the dense grid's midpoints (valid because the base model is trained
    with continuous noise conditioning).

    Args:
        batches: infinite iterator of clean-data batches (shared across
            stages).
        ema: EMA over the *student* within each stage. Defaults OFF —
            measured on the toy mixture: at mu=0.999 a few-hundred-step
            stage leaves the EMA mostly at its init (0.999^400 = 67% initial
            weight), so every stage ships a half-trained student. The
            teacher is typically already an EMA snapshot of base training.
        log_fn: optional ``fn(stage_steps, step, loss)`` progress hook.

    Returns:
        {num_steps: {"params": ..., "grid": (num_steps+1,) ndarray}} for
        every stage (sampling params: EMA when enabled).
    """
    ratio = start_steps // max(end_steps, 1)
    if start_steps < end_steps or start_steps % max(end_steps, 1) \
            or ratio & (ratio - 1):
        raise ValueError(f"start_steps={start_steps} must be a power-of-2 "
                         f"multiple of end_steps={end_steps} (the halving "
                         f"loop otherwise never produces the "
                         f"{end_steps}-step stage)")
    import optax

    rng = jax.random.PRNGKey(seed)
    grid = distill_grid(betas, 2 * start_steps, lam_max)
    teacher = params
    results: Dict[int, dict] = {}
    num_steps = start_steps
    while num_steps >= end_steps:
        student_grid, mids = halve_grid(grid)
        # Per-stage warmup-cosine to ~0: each stage is a fine-tune that
        # must land, not a plateau (annealing measurably tightens the final
        # stage loss vs a constant rate).
        schedule = optax.warmup_cosine_decay_schedule(
            0.0, learning_rate, min(warmup_steps, steps_per_stage // 10),
            steps_per_stage, end_value=learning_rate * 0.01)
        tx = optax.chain(optax.clip_by_global_norm(1.0),
                         optax.adam(schedule))
        state = TrainState.create(
            jax.tree_util.tree_map(jnp.copy, teacher), tx, ema=ema,
            ema_mu=ema_mu)
        if scan_chunk > 1:
            chunk_fn = make_distill_scan(model, teacher, student_grid, mids,
                                         clip_x0=clip_x0)
            done = 0
            while done < steps_per_stage:
                k_steps = min(scan_chunk, steps_per_stage - done)
                # jnp.stack keeps device-resident batches on device (a
                # device-cached pool avoids re-shipping data through a
                # remote-accelerator tunnel every chunk).
                stack = jnp.stack([next(batches) for _ in range(k_steps)])
                rng, k = jax.random.split(rng)
                state, losses = chunk_fn(state, stack, k)
                done += k_steps
                if log_fn is not None:
                    log_fn(num_steps, done - 1, float(losses[-1]))
        else:
            step_fn = make_distill_step(model, teacher, student_grid, mids,
                                        clip_x0=clip_x0)
            for step in range(steps_per_stage):
                batch = next(batches)
                rng, k = jax.random.split(rng)
                state, metrics = step_fn(state, jnp.asarray(batch), k)
                if log_fn is not None and (step % 500 == 0 or
                                           step == steps_per_stage - 1):
                    log_fn(num_steps, step, float(metrics["loss"]))
        teacher = state.sampling_params
        results[num_steps] = {"params": teacher, "grid": student_grid}
        grid = student_grid
        num_steps //= 2
    return results
