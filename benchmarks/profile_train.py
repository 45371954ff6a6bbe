"""Training-step optimizer/EMA memory-traffic experiment (one chip).

VERDICT r4 item 9: the mixed-precision flagship train step profiles at
4.7 ms with ~0.8 ms of HBM-bound optimizer/EMA elementwise passes; at a
200k-step budget that is ~17% of the wall. This benchmark measures the two
cheap levers that cut that traffic and reports per-step device time for
each variant, plus an EMA-quality check for the numerically risky one:

- ``adam_bf16_m``: Adam's first moment stored in bfloat16
  (``optax.adam(mu_dtype=bf16)``) — halves the m-state read+write.
- ``ema_bf16``: the EMA tree stored in bfloat16. EXPECTED numerical
  failure mode, verified here: with mu=0.999 the per-step EMA increment is
  ~1e-3 of the stored value, below bf16's ~2^-8 relative resolution, so
  the EMA freezes at its init; the benchmark reports the EMA-vs-params
  relative distance after N steps next to the fp32 control so the verdict
  is measured, not assumed.
- ``no_ema`` control isolates the EMA passes' cost.

Timing protocol (CLAUDE.md): one large jitted program (lax.scan over K
optimizer steps), second call timed, output reduced via the returned state
(block_until_ready on a leaf).

Run: python benchmarks/profile_train.py [--k 200]
"""
from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--k", type=int, default=200,
                        help="Optimizer steps fused per timed program.")
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--ema_check_steps", type=int, default=400,
                        help="Steps for the EMA-numerics check.")
    args = parser.parse_args()

    from benchmarks.flagship_e2e import make_data
    from smd_tpu.diffusion import losses, schedules
    from smd_tpu.models import get_model

    model = get_model("TransformerDDPM", num_layers=6, num_heads=8,
                      num_mlp_layers=2, mlp_dims=2048, dtype=jnp.bfloat16)
    betas = schedules.noise_schedule(1e-6, 0.01, 1000, "linear")
    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((args.batch, 32, 42), jnp.float32)
    params0 = model.init(rng, x0, jnp.zeros((args.batch, 1, 1), jnp.float32))
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(params0))
    pool = jnp.asarray(np.stack(
        [make_data(args.batch, np.random.default_rng(i)) for i in range(50)]))

    def make_chunk(tx, ema_dtype):
        """K fused steps: loss+grad+clip+Adam(+EMA) per step, one program.

        ``ema_dtype``: None = no EMA; else the EMA tree's storage dtype.
        """
        def update(carry, xs):
            params, opt_state, ema = carry
            batch, key = xs

            def loss_fn(p):
                model_fn = lambda x, cond: model.apply(p, x, cond)
                return losses.diffusion_loss(batch, model_fn, betas, key,
                                             True, "mean")

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            if ema is not None:
                mu = 0.999
                ema = jax.tree_util.tree_map(
                    lambda e, p: (e.astype(jnp.float32) * mu +
                                  p * (1 - mu)).astype(e.dtype), ema, params)
            return (params, opt_state, ema), loss

        @functools.partial(jax.jit, donate_argnums=(0,))
        def chunk(carry, batches, key):
            keys = jax.random.split(key, batches.shape[0])
            return jax.lax.scan(update, carry, (batches, keys))

        def init_carry():
            params = jax.tree_util.tree_map(jnp.copy, params0)
            # jnp.array (not asarray): same-dtype asarray returns the SAME
            # buffer, and aliased params/ema leaves would be donated twice.
            ema = (None if ema_dtype is None else jax.tree_util.tree_map(
                lambda p: jnp.array(p, ema_dtype), params))
            return (params, tx.init(params), ema)

        return chunk, init_carry

    adam_fp32 = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-3))
    adam_bf16m = optax.chain(optax.clip_by_global_norm(1.0),
                             optax.adam(1e-3, mu_dtype=jnp.bfloat16))

    variants = {
        "baseline_fp32_ema": (adam_fp32, jnp.float32),
        "no_ema": (adam_fp32, None),
        "ema_bf16": (adam_fp32, jnp.bfloat16),
        "adam_bf16_m": (adam_bf16m, jnp.float32),
        "adam_bf16_m_ema_bf16": (adam_bf16m, jnp.bfloat16),
    }

    results = {"params_m": round(n_params / 1e6, 2), "batch": args.batch,
               "k": args.k}
    idx = np.arange(args.k) % 50
    for name, (tx, ema_dtype) in variants.items():
        chunk, init_carry = make_chunk(tx, ema_dtype)
        carry = init_carry()
        carry, _ = chunk(carry, pool[idx], jax.random.PRNGKey(1))
        jax.tree_util.tree_leaves(carry)[0].block_until_ready()
        t0 = time.time()
        carry, ls = chunk(carry, pool[idx], jax.random.PRNGKey(2))
        jax.tree_util.tree_leaves(carry)[0].block_until_ready()
        dt = time.time() - t0
        results[name] = {"ms_per_step": round(dt / args.k * 1e3, 3),
                         "steps_per_sec": round(args.k / dt, 1),
                         "loss_end": round(float(ls[-1]), 4)}
        print(json.dumps({name: results[name]}), file=sys.stderr, flush=True)

    # EMA-numerics check: after N steps from a shared init, how far has the
    # EMA tree moved from its init, and how close is it to the live params?
    # A frozen bf16 EMA shows ~zero movement; fp32 moves substantially.
    def ema_drift(ema_dtype):
        chunk, init_carry = make_chunk(adam_fp32, ema_dtype)
        carry = init_carry()
        ema_init = jax.tree_util.tree_map(
            lambda p: np.asarray(p, np.float32), carry[2])
        done = 0
        while done < args.ema_check_steps:
            carry, _ = chunk(carry, pool[idx], jax.random.PRNGKey(3 + done))
            done += args.k
        params, _, ema = carry
        flat = lambda t: np.concatenate([
            np.asarray(x, np.float32).ravel()
            for x in jax.tree_util.tree_leaves(t)])
        e0, e1, p1 = flat(ema_init), flat(ema), flat(params)
        denom = float(np.linalg.norm(p1 - e0))
        return {"ema_movement_frac":
                round(float(np.linalg.norm(e1 - e0)) / max(denom, 1e-9), 4),
                "ema_to_params_frac":
                round(float(np.linalg.norm(e1 - p1)) / max(denom, 1e-9), 4)}

    results["ema_numerics_fp32"] = ema_drift(jnp.float32)
    results["ema_numerics_bf16"] = ema_drift(jnp.bfloat16)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
