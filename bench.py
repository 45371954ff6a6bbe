"""Benchmark: the BASELINE.md north star, plus every faster serving mode.

Primary row (printed LAST, the round-over-round driver metric): 1000-step
DDPM ancestral sampling of 1000 latent sequences (32 x 42 sliced melody
latents) with the flagship TransformerDDPM (6L/8H/2048), as one fused
jit(lax.scan) program in bfloat16, no snapshot collection (production path).

Additional rows (one JSON line each, VERDICT r3 item 4): the few-step
serving modes the framework ships beyond the reference's 1000-step-only
sampler (`/root/reference/utils/ebm_utils.py:274-405`) — DDIM-50,
DPM-Solver++(2M)-8, progressive-distilled 2-step, consistency 1-step.
Wall time is sampler-only (weight-independent); quality for each mode is
proven on a *trained* flagship in benchmarks/flagship_e2e.py and
docs/DESIGN.md. Few-step rows are measured as ONE jitted program chaining
R sampler repetitions via lax.scan, reduced to a scalar pulled to host —
single small dispatches report absurdly fast times on the tunneled chip
(docs/DESIGN.md "timing traps").

Baseline: reference target is 1000 sequences in < 60 s on a v5e-8
(BASELINE.json north_star) => 16.67 seqs/s on 8 chips = 2.083 seqs/s/chip.

Prints one JSON line per mode:
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
FEWSTEP_ROWS = os.environ.get("BENCH_FEWSTEP", "1") == "1"


def _emit(name, seqs_per_sec_per_chip, elapsed, n_chips, metric=None):
    print(json.dumps({
        "metric": metric or (f"{name}_{NUM_SAMPLES}x{SEQ_LEN}x{CHANNELS}"
                             "_seqs_per_sec_per_chip"),
        "value": round(seqs_per_sec_per_chip, 3),
        "unit": "seqs/s/chip",
        "vs_baseline": round(
            seqs_per_sec_per_chip / BASELINE_SEQS_PER_SEC_PER_CHIP, 3),
    }), flush=True)
    print(f"# {name}: elapsed {elapsed:.3f}s on {n_chips} chip(s)",
          file=sys.stderr)


def main():
    from smd_tpu.diffusion import samplers, schedules
    from smd_tpu.models import get_model
    from smd_tpu.parallel import mesh as mesh_lib
    from smd_tpu.training.distill import distill_grid

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

    init = jax.random.normal(jax.random.PRNGKey(1),
                             (NUM_SAMPLES, SEQ_LEN, CHANNELS), jnp.float32)
    if mesh is not None:
        # Shard the batch over the data axis; params replicate. XLA runs the
        # whole 1000-step scan SPMD with zero per-step communication.
        init = jax.device_put(init, mesh_lib.batch_sharding(mesh, init.ndim))
        params = jax.device_put(params, mesh_lib.replicated(mesh))

    if FEWSTEP_ROWS:
        # Few-step serving modes, fastest first so the north-star ancestral
        # row prints LAST (the driver's round-over-round comparison line).
        # Each is timed as one jitted lax.scan over R independent sampler
        # runs, reduced to a scalar (tunnel-proof timing).
        grid2 = distill_grid(betas, 2)       # distilled-2 boundary grid
        grid_cm = distill_grid(betas, 32)    # consistency training grid

        def fewstep(name, sample_one, reps):
            def chained(key):
                def body(acc, i):
                    out = sample_one(jax.random.fold_in(key, i))
                    return acc + jnp.mean(out), ()
                acc, _ = jax.lax.scan(body, jnp.float32(0.0),
                                      jnp.arange(reps))
                return acc
            f = jax.jit(chained)
            float(f(jax.random.PRNGKey(2)))  # compile + execute once
            t_start = time.time()
            float(f(jax.random.PRNGKey(3)))
            dt = (time.time() - t_start) / reps
            _emit(name, NUM_SAMPLES / dt / n_chips, dt, n_chips)

        fewstep("consistency1_sample",
                lambda k: samplers.consistency_dynamics(
                    k, model_fn, grid_cm, init, num_steps=1).state,
                reps=100)
        fewstep("distilled2_sample",
                lambda k: samplers.distilled_ddim_dynamics(
                    k, model_fn, grid2, init).state,
                reps=50)
        fewstep("dpmpp8_sample",
                lambda k: samplers.dpmpp_dynamics(
                    k, model_fn, betas, init, num_steps=8,
                    constants=consts).state,
                reps=20)
        fewstep("ddim50_sample",
                lambda k: samplers.ddim_dynamics(
                    k, model_fn, betas, init, num_steps=50,
                    constants=consts).state,
                reps=5)

    def sample(key, x):
        out = samplers.diffusion_dynamics(key, model_fn, betas, x,
                                          collect_steps=0,
                                          collect_metrics=False,
                                          constants=consts)
        return out.state

    sample_jit = jax.jit(sample)
    # compile
    out = sample_jit(jax.random.PRNGKey(2), init)
    out.block_until_ready()

    t_start = time.time()
    out = sample_jit(jax.random.PRNGKey(3), init)
    out.block_until_ready()
    elapsed = time.time() - t_start
    # Exact round-over-round metric name from BENCH_r01..r03.
    _emit("ancestral", NUM_SAMPLES / elapsed / n_chips, elapsed, n_chips,
          metric=f"ddpm_sample_{NUM_SAMPLES}x{SEQ_LEN}x{CHANNELS}_T{T}"
                 "_seqs_per_sec_per_chip")


if __name__ == "__main__":
    main()
