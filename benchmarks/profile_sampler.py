"""Profile the production sampler step: where does the time go?

Captures a jax profiler trace of a T-step DDPM sampling scan with the
bench.py serving configuration and prints a per-category device-time table
(via ``smd_tpu.utils.profiling``). This is the tool that produced the
measurements behind docs/DESIGN.md's serving-path decisions.

Run: python benchmarks/profile_sampler.py [--t 100] [--fused_attention]
     [--quantized_head]
"""
from __future__ import annotations

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--t", type=int, default=100)
    parser.add_argument("--num_samples", type=int, default=1000)
    parser.add_argument("--fused_attention", action="store_true")
    parser.add_argument("--fused_head", action="store_true")
    parser.add_argument("--quantized_head", action="store_true")
    parser.add_argument("--quantized_head_kernel", action="store_true",
                        help="fused Pallas w8a8 head (implies "
                             "--quantized_head)")
    args = parser.parse_args()
    if args.quantized_head_kernel:
        args.quantized_head = True

    from smd_tpu.diffusion import samplers, schedules
    from smd_tpu.models import get_model
    from smd_tpu.models.fuse import (calibrate_head_act_scales,
                                     quantize_head_params)
    from smd_tpu.utils import profiling

    std = get_model("TransformerDDPM", num_layers=6, num_heads=8,
                    num_mlp_layers=2, mlp_dims=2048)
    x0 = jnp.ones((8, 32, 42), jnp.float32)
    t0 = jnp.full((8, 1, 1), 0.5, jnp.float32)
    params = std.init(jax.random.PRNGKey(0), x0, t0)

    model = get_model("TransformerDDPM", num_layers=6, num_heads=8,
                      num_mlp_layers=2, mlp_dims=2048,
                      fused_attention=args.fused_attention,
                      fused_head=args.fused_head,
                      quantized_head=args.quantized_head,
                      quantized_head_kernel=args.quantized_head_kernel,
                      dtype=jnp.bfloat16)
    if args.quantized_head:
        params = quantize_head_params(params)
        cal = [(jax.random.normal(jax.random.PRNGKey(i), (64, 32, 42)),
                jnp.full((64, 1, 1), t))
               for i, t in enumerate((0.05, 0.5, 0.99))]
        params = calibrate_head_act_scales(model, params, cal)
    if args.fused_head:
        from smd_tpu.models.fuse import fuse_head_params
        params = fuse_head_params(params)
    if args.fused_attention:
        from smd_tpu.models.fuse import fuse_attention_params
        params = fuse_attention_params(params)
    params = jax.tree_util.tree_map(
        lambda p: p if p.dtype == jnp.int8 else jnp.asarray(p, jnp.bfloat16),
        params)

    betas = schedules.noise_schedule(1e-6, 0.01, args.t, "linear")
    consts = schedules.ddpm_constants(betas)

    def model_fn(x, cond):
        return model.apply(params, x.astype(jnp.bfloat16),
                           cond.astype(jnp.bfloat16)).astype(jnp.float32)

    def sample(key, init):
        return samplers.diffusion_dynamics(
            key, model_fn, betas, init, collect_steps=0,
            collect_metrics=False, constants=consts).state

    f = jax.jit(sample)
    init = jax.random.normal(jax.random.PRNGKey(1),
                             (args.num_samples, 32, 42), jnp.float32)
    f(jax.random.PRNGKey(2), init).block_until_ready()  # compile

    log_dir = tempfile.mkdtemp(prefix="smd_profile_")
    with profiling.trace(log_dir):
        f(jax.random.PRNGKey(3), init).block_until_ready()
    total_ms, rows = profiling.op_profile(log_dir, "jit_sample")
    print(profiling.format_op_profile(total_ms, rows, steps=args.t))


if __name__ == "__main__":
    main()
