"""Generation drivers: unconditional, infilling, interpolation.

Capability parity with the reference's ``train_ncsn.py:499-551`` (sample
dispatch + init distributions) and ``sample_ncsn.py`` (infill protocol
:405-424, stochastic encode/decode interpolation :245-310, fixed here per
SURVEY.md §7 item 7).

All drivers take a ``model_fn(x, cond)`` closure over restored params, so
they run identically under jit on one chip or a mesh-sharded batch.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from smd_tpu.diffusion import samplers, schedules

__all__ = ["sample", "make_init", "infill_edge_mask",
           "interpolation_endpoints", "interpolate"]

SAMPLERS = {
    "ald": samplers.annealed_langevin_dynamics,
    "cas": samplers.consistent_langevin_dynamics,
    "ddpm": samplers.diffusion_dynamics,
    "ddim": samplers.ddim_dynamics,
    "dpmpp": samplers.dpmpp_dynamics,
    "distilled": samplers.distilled_ddim_dynamics,
    "consistency": samplers.consistency_dynamics,
}


def make_init(rng, num_samples, sample_shape, sampling: str):
    """Initial state: N(0,1) for DDPM/DDIM, U(-sqrt(12)/2, sqrt(12)/2)
    otherwise (both mean 0, var 1 — reference ``train_ncsn.py:538-546``)."""
    if sampling in ("ddpm", "ddim", "dpmpp", "distilled", "consistency"):
        return jax.random.normal(rng, (num_samples, *sample_shape))
    rho = float(np.sqrt(12) / 2)
    return jax.random.uniform(rng, (num_samples, *sample_shape), minval=-rho,
                              maxval=rho)


def sample(model_fn,
           sigmas,
           rng,
           sample_shape,
           num_samples=2400,
           sampling="ald",
           epsilon=1e-3,
           steps=100,
           denoise=True,
           infill_samples=None,
           infill_masks=None,
           collect_steps: Optional[int] = None,
           collect_metrics: bool = True,
           ddim_steps: int = 50,
           ddim_eta: float = 0.0,
           distill_grid=None,
           ensure_snapshots: bool = False):
    """Generate samples with the chosen dynamics.

    ``ensure_snapshots=True`` declares the caller needs intermediate
    snapshots (animation / per-snapshot metrics): samplers whose default
    is collection-free (dpmpp) then opt into a DDIM-sized collection;
    samplers that already collect keep their own defaults.

    Returns (generated, collection, ld_metrics) matching the reference's
    3-tuple contract for every algorithm (CAS fixed).
    """
    if sampling not in SAMPLERS:
        raise ValueError(f"Unknown sampling algorithm: {sampling}")

    init_rng, ld_rng = jax.random.split(rng)
    init = make_init(init_rng, num_samples, sample_shape, sampling)
    if infill_masks is not None:
        infill_samples = jnp.asarray(infill_samples, jnp.float32)
        infill_masks = jnp.asarray(infill_masks, jnp.float32)

    if sampling == "ddpm":
        if collect_steps is None:
            collect_steps = 40
        out = samplers.diffusion_dynamics(ld_rng, model_fn, sigmas, init,
                                          infill_samples=infill_samples,
                                          infill_masks=infill_masks,
                                          collect_steps=collect_steps,
                                          collect_metrics=collect_metrics)
    elif sampling == "ddim":
        if collect_steps is None:
            collect_steps = 40
        out = samplers.ddim_dynamics(ld_rng, model_fn, sigmas, init,
                                     num_steps=ddim_steps, eta=ddim_eta,
                                     infill_samples=infill_samples,
                                     infill_masks=infill_masks,
                                     collect_steps=collect_steps,
                                     collect_metrics=collect_metrics)
    elif sampling == "distilled":
        # Few-step progressive-distillation sampler: ``distill_grid`` is
        # the boundary array saved with the distilled stage.
        if distill_grid is None:
            raise ValueError("sampling='distilled' needs the stage's "
                             "distill_grid (see training.distill)")
        out = samplers.distilled_ddim_dynamics(
            ld_rng, model_fn, distill_grid, init,
            infill_samples=infill_samples, infill_masks=infill_masks)
    elif sampling == "consistency":
        # 1-to-k-step consistency sampler: ``distill_grid`` is the segment
        # boundary array saved with the consistency bundle; ddim_steps
        # doubles as k (1 = single-call generation).
        if distill_grid is None:
            raise ValueError("sampling='consistency' needs the bundle's "
                             "grid (see training.consistency)")
        out = samplers.consistency_dynamics(
            ld_rng, model_fn, distill_grid, init, num_steps=ddim_steps,
            infill_samples=infill_samples, infill_masks=infill_masks)
    elif sampling == "dpmpp":
        # 2nd-order solver: ddim_steps doubles as its budget (typically
        # 10-25). Snapshots default OFF (production path) — callers opt in
        # with an explicit collect_steps or by declaring the need via
        # ensure_snapshots (the CLI does for --animate/--compute_metrics).
        if collect_steps is None:
            collect_steps = 40 if ensure_snapshots else 0
        out = samplers.dpmpp_dynamics(
            ld_rng, model_fn, sigmas, init, num_steps=ddim_steps,
            infill_samples=infill_samples, infill_masks=infill_masks,
            collect_steps=collect_steps, collect_metrics=collect_metrics)
    else:
        if collect_steps is None:
            collect_steps = 100
        fn = SAMPLERS[sampling]
        out = fn(ld_rng, model_fn, sigmas, init, epsilon, steps,
                 denoise=denoise, infill_samples=infill_samples,
                 infill_masks=infill_masks, collect_steps=collect_steps,
                 collect_metrics=collect_metrics)
    return out.state, out.collection, out.metrics


def infill_edge_mask(real, problem="vae", fixed_edge=8):
    """Build the reference's infilling inputs (``sample_ncsn.py:405-421``).

    Toy 2-D: fix dim 0, infill dim 1. Sequences: hold the first/last
    ``fixed_edge`` latents, regenerate the middle.
    """
    samples = np.copy(real)
    masks = np.zeros(samples.shape, np.float32)
    if problem == "toy" and real.shape[-1] == 2 and real.ndim == 2:
        samples[:, 1] = 0
        masks[:, 0] = 1
    else:
        seq_len = samples.shape[1]
        idx = list(range(seq_len))
        fixed_idx = idx[:fixed_edge] + idx[-fixed_edge:]
        infilled_idx = idx[fixed_edge:-fixed_edge]
        samples[:, infilled_idx] = 0
        masks[:, fixed_idx] = 1
    return samples, masks


def interpolation_endpoints(real):
    """Pair each sample with its roll-by-one neighbor
    (``sample_ncsn.py:427-428``)."""
    starts = np.asarray(real)
    goals = np.roll(starts, shift=1, axis=0)
    return starts, goals


def interpolate(model_fn, betas, rng, real, num_alphas=9,
                collect_steps=0, collect_metrics=False):
    """DDPM latent interpolation: encode q(x_T|x_0) at both endpoints,
    linearly interpolate in x_T, decode each interpolant.

    Returns (generated [A, N, ...], collections, metrics_list).
    """
    starts, goals = interpolation_endpoints(real)
    rng, enc1, enc2 = jax.random.split(rng, num=3)
    starts_z = samplers.diffusion_stochastic_encoder(
        enc1, jnp.asarray(starts), betas)
    goals_z = samplers.diffusion_stochastic_encoder(
        enc2, jnp.asarray(goals), betas)

    consts = schedules.ddpm_constants(betas)
    gen, collects, metrics_list = [], [], []
    for alpha in np.linspace(0.0, 1.0, num_alphas):
        z = (1 - alpha) * starts_z + alpha * goals_z
        rng, ld_rng = jax.random.split(rng)
        out = samplers.diffusion_dynamics(ld_rng, model_fn, betas, z,
                                          collect_steps=collect_steps,
                                          collect_metrics=collect_metrics,
                                          constants=consts)
        gen.append(np.asarray(out.state))
        collects.append(out.collection)
        metrics_list.append(out.metrics)
    return np.stack(gen), collects, metrics_list
