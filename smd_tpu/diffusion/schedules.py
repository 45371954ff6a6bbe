"""Noise schedules for score-based and diffusion models.

Capability parity with the reference's ``utils/ebm_utils.py:62-86``
(``create_noise_schedule``: geometric / linear / fibonacci) plus precomputed
DDPM constants. All schedules are returned as device arrays so samplers and
losses can keep every constant resident in HBM/VMEM; the DDPM constants are
precomputed once on host at trace time instead of being rederived inside the
sampling loop.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

__all__ = [
    "noise_schedule",
    "DDPMConstants",
    "ddpm_constants",
]


def noise_schedule(sigma_begin: float = 1.0,
                   sigma_end: float = 1e-2,
                   num: int = 10,
                   kind: str = "geometric") -> jnp.ndarray:
    """Create a 1-D noise schedule.

    Args:
        sigma_begin: first value of the schedule.
        sigma_end: last value of the schedule (unused for ``fibonacci``).
        num: number of levels (L for NCSN sigmas, T for DDPM betas).
        kind: ``geometric`` (log-space linspace), ``linear``, ``fibonacci``
            or ``cosine`` (Nichol & Dhariwal 2021 betas from the squared-
            cosine alpha-bar curve; ``sigma_begin``/``sigma_end`` are
            ignored, like ``fibonacci`` ignores ``sigma_end``).

    Returns:
        Array of shape ``(num,)`` and dtype float32.
    """
    if kind == "geometric":
        sig = np.exp(np.linspace(np.log(sigma_begin), np.log(sigma_end), num))
    elif kind == "linear":
        sig = np.linspace(sigma_begin, sigma_end, num)
    elif kind == "cosine":
        # Improved DDPM (arXiv:2102.09672 eq. 17): alpha_bar(t) =
        # cos^2((t/T + s)/(1 + s) * pi/2), beta_t = 1 - abar_t/abar_{t-1},
        # clipped at 0.999 to keep the late steps invertible.
        s = 0.008
        t = np.arange(num + 1) / num
        abar = np.cos((t + s) / (1 + s) * np.pi / 2) ** 2
        sig = np.clip(1.0 - abar[1:] / abar[:-1], 0.0, 0.999)
    elif kind == "fibonacci":
        vals = [1e-6, 2e-6]
        for _ in range(num - 2):
            vals.append(vals[-1] + vals[-2])
        sig = np.asarray(vals)
    else:
        raise ValueError(f"Unsupported schedule: {kind}")
    return jnp.asarray(sig, dtype=jnp.float32)


@dataclasses.dataclass(frozen=True)
class DDPMConstants:
    """Precomputed forward/reverse-process constants for a beta schedule.

    Mirrors the quantities derived on the fly in the reference's
    ``utils/ebm_utils.py:315-357`` (diffusion_dynamics) so the sampler body
    is pure gathers + FMAs on the VPU.
    """
    betas: jnp.ndarray                 # (T,)
    alphas: jnp.ndarray                # (T,)
    alphas_prod: jnp.ndarray           # (T,)  cumprod of alphas
    alphas_prod_prev: jnp.ndarray      # (T,)  shifted, alphas_prod_prev[0]=1
    sqrt_alphas_prod: jnp.ndarray      # (T,)
    sqrt_recip_alphas_prod: jnp.ndarray    # (T,) 1/sqrt(alpha_prod)
    sqrt_alphas_prod_m1: jnp.ndarray   # (T,) sqrt(1-a_prod)/sqrt(a_prod)
    posterior_mu1: jnp.ndarray         # (T,) beta*sqrt(a_prod_prev)/(1-a_prod)
    posterior_mu2: jnp.ndarray         # (T,) (1-a_prod_prev)*sqrt(alpha)/(1-a_prod)
    posterior_log_var: jnp.ndarray     # (T,) log of clipped posterior variance

    @property
    def num_steps(self) -> int:
        return int(self.betas.shape[0])


def ddpm_constants(betas: jnp.ndarray) -> DDPMConstants:
    """Precompute every constant the DDPM ancestral sampler needs."""
    betas = jnp.asarray(betas, dtype=jnp.float32)
    alphas = 1.0 - betas
    alphas_prod = jnp.cumprod(alphas)
    alphas_prod_prev = jnp.concatenate([jnp.ones((1,), betas.dtype),
                                        alphas_prod[:-1]])
    posterior_var = betas * (1.0 - alphas_prod_prev) / (1.0 - alphas_prod)
    posterior_var = jnp.maximum(posterior_var, 1e-20)
    return DDPMConstants(
        betas=betas,
        alphas=alphas,
        alphas_prod=alphas_prod,
        alphas_prod_prev=alphas_prod_prev,
        sqrt_alphas_prod=jnp.sqrt(alphas_prod),
        sqrt_recip_alphas_prod=jnp.sqrt(1.0 / alphas_prod),
        sqrt_alphas_prod_m1=jnp.sqrt(1.0 - alphas_prod) *
        jnp.sqrt(1.0 / alphas_prod),
        posterior_mu1=betas * jnp.sqrt(alphas_prod_prev) / (1.0 - alphas_prod),
        posterior_mu2=(1.0 - alphas_prod_prev) * jnp.sqrt(alphas) /
        (1.0 - alphas_prod),
        posterior_log_var=jnp.log(posterior_var),
    )
