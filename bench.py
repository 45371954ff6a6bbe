"""Benchmark: the BASELINE.md north star.

1000-step DDPM ancestral sampling of 1000 latent sequences (32 x 42 sliced
melody latents) with the flagship TransformerDDPM (6L/8H/2048), as one fused
jit(lax.scan) program in bfloat16, no snapshot collection (production path).

Baseline: reference target is 1000 sequences in < 60 s on a v5e-8
(BASELINE.json north_star) => 16.67 seqs/s on 8 chips = 2.083 seqs/s/chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""
from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

import os

NUM_SAMPLES = int(os.environ.get("BENCH_NUM_SAMPLES", 1000))
SEQ_LEN = 32
# 42 = the reference's sampled data shape (sample_ncsn.py samples in the
# sliced-latent space; BASELINE.md "32x512" refers to the unsliced latent,
# which the pipeline slices to 42 dims before the model ever sees it).
CHANNELS = int(os.environ.get("BENCH_CHANNELS", 42))
T = int(os.environ.get("BENCH_T", 1000))
BASELINE_SEQS_PER_SEC_PER_CHIP = (1000 / 60.0) / 8.0


def main():
    from smd_tpu.diffusion import samplers, schedules
    from smd_tpu.models import get_model
    from smd_tpu.parallel import mesh as mesh_lib

    n_chips = jax.device_count()
    mesh = mesh_lib.make_mesh() if n_chips > 1 else None

    # Serving path: standard einsum layout at dtype=bfloat16. Measured
    # fastest (docs/DESIGN.md, profiled at ~84% MXU): at bf16 XLA fuses the
    # whole step into matmul fusions, and both Pallas alternatives (fused
    # LN+attention kernel, int8 w8a8 head) as well as the fused FiLM head
    # are documented negative results at these shapes. Env toggles keep the
    # alternatives measurable: BENCH_FUSED_ATTN=1, BENCH_FUSED_HEAD=1.
    quant = os.environ.get("BENCH_QUANT_HEAD", "0") == "1"
    quant_kernel = os.environ.get("BENCH_QUANT_KERNEL", "0") == "1"
    model = get_model(
        "TransformerDDPM", num_layers=6, num_heads=8,
        num_mlp_layers=2, mlp_dims=2048,
        fused_attention=os.environ.get("BENCH_FUSED_ATTN", "0") == "1",
        fused_head=os.environ.get("BENCH_FUSED_HEAD", "0") == "1",
        quantized_head=quant or quant_kernel,
        quantized_head_kernel=quant_kernel,
        dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    x0 = jnp.ones((8, SEQ_LEN, CHANNELS), jnp.float32)
    t0 = jnp.full((8, 1, 1), 0.5, jnp.float32)
    # init builds the serving layout directly (random weights time the same
    # as calibrated ones; quality parity is flagship_e2e's job).
    params = model.init(rng, x0, t0)
    params = jax.tree_util.tree_map(
        lambda p: p if p.dtype == jnp.int8 else p.astype(jnp.bfloat16),
        params)

    betas = schedules.noise_schedule(1e-6, 0.01, T, "linear")
    consts = schedules.ddpm_constants(betas)

    def model_fn(x, cond):
        return model.apply(params, x.astype(jnp.bfloat16),
                           cond.astype(jnp.bfloat16)).astype(jnp.float32)

    def sample(key, init):
        out = samplers.diffusion_dynamics(key, model_fn, betas, init,
                                          collect_steps=0,
                                          collect_metrics=False,
                                          constants=consts)
        return out.state

    sample_jit = jax.jit(sample)
    init = jax.random.normal(jax.random.PRNGKey(1),
                             (NUM_SAMPLES, SEQ_LEN, CHANNELS), jnp.float32)
    if mesh is not None:
        # Shard the batch over the data axis; params replicate. XLA runs the
        # whole 1000-step scan SPMD with zero per-step communication.
        init = jax.device_put(init, mesh_lib.batch_sharding(mesh, init.ndim))
        params = jax.device_put(params, mesh_lib.replicated(mesh))

    # compile
    out = sample_jit(jax.random.PRNGKey(2), init)
    out.block_until_ready()

    t_start = time.time()
    out = sample_jit(jax.random.PRNGKey(3), init)
    out.block_until_ready()
    elapsed = time.time() - t_start

    seqs_per_sec_per_chip = NUM_SAMPLES / elapsed / n_chips
    print(json.dumps({
        "metric": f"ddpm_sample_{NUM_SAMPLES}x{SEQ_LEN}x{CHANNELS}_T{T}"
                  "_seqs_per_sec_per_chip",
        "value": round(seqs_per_sec_per_chip, 3),
        "unit": "seqs/s/chip",
        "vs_baseline": round(
            seqs_per_sec_per_chip / BASELINE_SEQS_PER_SEC_PER_CHIP, 3),
    }))
    print(f"# elapsed {elapsed:.2f}s on {n_chips} chip(s)", file=sys.stderr)


if __name__ == "__main__":
    main()
