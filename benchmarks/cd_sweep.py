"""Consistency-distillation recipe sweep on the flagship (one chip).

Trains the flagship TransformerDDPM once (same protocol as
benchmarks/flagship_e2e.py), then consistency-distills it under several
recipes and reports 1/2/4-step FD for each — the experiment behind the
consistency rows' hyperparameters in docs/DESIGN.md. Run-once script;
results are recorded in DESIGN.md rather than re-measured per round.

Run: python benchmarks/cd_sweep.py [--steps 1500]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=1500)
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--eval_n", type=int, default=1000)
    parser.add_argument("--T", type=int, default=1000)
    parser.add_argument("--configs", type=str, default="",
                        help="Comma-separated subset of config names to run "
                        "(default: all).")
    parser.add_argument("--cd_scale", type=float, default=1.0,
                        help="Multiplier on each config's CD step count "
                        "(for CPU smoke runs).")
    parser.add_argument("--load_base", type=str, default="",
                        help="Reuse a converged base from flagship_e2e.py "
                        "--save_base instead of training --steps here "
                        "(round-5 protocol: sweep the 1-step levers on the "
                        "50k-step base, not the 1500-step smoke base).")
    args = parser.parse_args()

    from benchmarks.flagship_e2e import make_data
    from smd_tpu.diffusion import samplers, schedules
    from smd_tpu.eval import metrics
    from smd_tpu.models import get_model
    from smd_tpu.training import consistency
    from smd_tpu.training import diffusion as trainer

    rng_np = np.random.default_rng(1)
    model = get_model("TransformerDDPM", num_layers=6, num_heads=8,
                      num_mlp_layers=2, mlp_dims=2048)
    betas = schedules.noise_schedule(1e-6, 0.01, args.T, "linear")
    config = trainer.TrainConfig(loss="ddpm", learning_rate=1e-3,
                                 batch_size=args.batch, ema=True)
    rng = jax.random.PRNGKey(0)
    pool = jnp.asarray(np.stack(
        [make_data(args.batch, rng_np) for _ in range(400)]))
    if args.load_base:
        import pickle
        with open(args.load_base, "rb") as f:
            bundle = pickle.load(f)
        params = jax.tree_util.tree_map(jnp.asarray, bundle["params"])
        print(f"base loaded from {args.load_base} "
              f"({bundle.get('steps', '?')} steps)", file=sys.stderr)
    else:
        state = trainer.create_train_state(rng, model, (args.batch, 32, 42),
                                           (args.batch, 1, 1), config)
        chunk_fn = trainer.make_train_chunk(
            model, trainer.objective_by_name("ddpm"), betas, True)
        done = 0
        while done < args.steps:
            k = min(50, args.steps - done)
            idx = np.arange(done, done + k) % 400
            rng, key = jax.random.split(rng)
            state, ms = chunk_fn(state, pool[idx], key)
            done += k
        print(f"base trained: loss {float(ms['loss'][-1]):.4f}",
              file=sys.stderr)
        params = state.sampling_params

    serve_model = get_model("TransformerDDPM", num_layers=6, num_heads=8,
                            num_mlp_layers=2, mlp_dims=2048,
                            dtype=jnp.bfloat16)

    real = make_data(args.eval_n, np.random.default_rng(99))
    init = jax.random.normal(jax.random.PRNGKey(5), (args.eval_n, 32, 42))

    def batches():
        i = 0
        while True:
            yield pool[i % 400]
            i += 1

    CONFIGS = {
        # control: the round-4 run-1 recipe (1-step FD 1043 in that run)
        "base4k": dict(num_segments=32, steps=4000, ema_mu=0.95),
        # longer anneal, same everything else
        "long12k": dict(num_segments=32, steps=12000, ema_mu=0.95),
        # slower target EMA over the longer run
        "long12k_mu99": dict(num_segments=32, steps=12000, ema_mu=0.99),
        # coarser discretization: stronger per-step signal
        "seg16_4k": dict(num_segments=16, steps=4000, ema_mu=0.95),
        # finer discretization with the budget to exploit it
        "seg64_12k": dict(num_segments=64, steps=12000, ema_mu=0.95),
        # round 2: N=16 more than halved 1-step FD vs N=32 — push coarser
        "seg8_4k": dict(num_segments=8, steps=4000, ema_mu=0.95),
        "seg8_12k": dict(num_segments=8, steps=12000, ema_mu=0.95),
        "seg16_12k": dict(num_segments=16, steps=12000, ema_mu=0.95),
        "seg4_12k": dict(num_segments=4, steps=12000, ema_mu=0.95),
        # teacher-free consistency training (method='ct'): curriculum vs
        # fixed-N variants, same eval protocol
        "ct_8_16_32_12k": dict(method="ct", steps=12000,
                               seg_schedule=(8, 16, 32)),
        "ct_16_12k": dict(method="ct", steps=12000, seg_schedule=(16,)),
        "ct_8_12k": dict(method="ct", steps=12000, seg_schedule=(8,)),
        "ct_8_16_12k": dict(method="ct", steps=12000, seg_schedule=(8, 16)),
        "ct_full_curr_24k": dict(method="ct", steps=24000,
                                 seg_schedule=(16, 32, 64, 128)),
        # Round-5 1-step levers on the converged base (VERDICT r4 item 7):
        # (a) longer budget at the winning fixed grid, and a long run that
        # ends on a finer grid (iCT's "train longest at the finest N");
        "ct_16_24k": dict(method="ct", steps=24000, seg_schedule=(16,)),
        "ct_16_32_24k": dict(method="ct", steps=24000,
                             seg_schedule=(16, 32)),
        # (b) Pseudo-Huber transition-constant sweep around iCT's
        # c = 0.00054*sqrt(D) = 0.0198 at D=1344 (larger c -> more
        # L2-like, smaller -> more L1-like);
        "ct_16_12k_c4x": dict(method="ct", steps=12000, seg_schedule=(16,),
                              huber_c=0.08),
        "ct_16_12k_c16x": dict(method="ct", steps=12000, seg_schedule=(16,),
                               huber_c=0.32),
        "ct_16_12k_c025x": dict(method="ct", steps=12000, seg_schedule=(16,),
                                huber_c=0.005),
        # (c) noise-level sampling distribution: iCT default is lognormal
        # (-1.1, 2.0) in log-EDM-sigma; shift mass toward noisier levels
        # (the 1-step map's hard end) and wider.
        "ct_16_12k_pm0": dict(method="ct", steps=12000, seg_schedule=(16,),
                              p_mean=0.0, p_std=2.0),
        "ct_16_12k_wide": dict(method="ct", steps=12000, seg_schedule=(16,),
                               p_mean=-0.4, p_std=3.0),
    }
    only = [s for s in args.configs.split(",") if s]
    results = {}
    for name, kw in CONFIGS.items():
        if only and name not in only:
            continue
        kw = dict(kw, steps=max(2, int(kw["steps"] * args.cd_scale)))
        method = kw.pop("method", "cd")
        t0 = time.time()
        log_fn = lambda n, s, l: print(
            f"  {name} N={n} step {s}: loss {l:.4f}", file=sys.stderr)
        if method == "ct":
            cd = consistency.consistency_train(
                model, params, betas, batches(), learning_rate=1e-4,
                seed=4, log_fn=log_fn, **kw)
        else:
            cd = consistency.consistency_distill(
                model, params, betas, batches(), learning_rate=1e-4,
                seed=4, log_fn=log_fn, **kw)
        row = {"seconds": round(time.time() - t0, 1), "method": method,
               **{k: (list(v) if isinstance(v, tuple) else v)
                  for k, v in kw.items()}}
        cd_bf16 = jax.tree_util.tree_map(
            lambda p: jnp.asarray(p, jnp.bfloat16), cd["params"])
        cd_fn = lambda x, c: serve_model.apply(
            cd_bf16, x.astype(jnp.bfloat16),
            c.astype(jnp.bfloat16)).astype(jnp.float32)
        grid = jnp.asarray(cd["grid"])
        for n in (1, 2, 4):
            f = jax.jit(lambda k, x, s=n: samplers.consistency_dynamics(
                k, cd_fn, grid, x, num_steps=s).state)
            gen = np.asarray(f(jax.random.PRNGKey(7), init))
            row[f"fd_{n}step"] = round(
                metrics.frechet_distance(real, gen), 2)
        results[name] = row
        print(json.dumps({name: row}), file=sys.stderr, flush=True)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
