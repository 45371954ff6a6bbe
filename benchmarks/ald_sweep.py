"""ALD/CAS hyperparameter retune on a CONVERGED DSM model (one chip).

Round-5 campaign note (docs/DESIGN.md): the score-matching rows improved
far less with the converged score net (ALD 152.7, CAS 184.7 vs the DDPM
chain's 35) than the DDPM rows did, suggesting the fixed sampler
hyperparameters — tuned in round 4 on a 1500-step model — are now the
binding constraint. This script trains one converged DSM flagship (same
protocol as the campaign), then sweeps the reference samplers' knobs:

- ALD: step size epsilon (per-step SNR = sqrt(eps)/sigma_end) x steps-per-
  level T (compute scales with T).
- CAS: epsilon and the level count L (one model eval per level).

Reference dynamics being tuned: annealed Langevin
(`utils/ebm_utils.py:95-198`) and consistent annealed sampling
(`:201-271`); both sampled via this repo's single-scan implementations.

Run: python benchmarks/ald_sweep.py [--steps 50000]
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
    parser.add_argument("--steps", type=int, default=50000)
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--eval_n", type=int, default=1000)
    parser.add_argument("--pool_batches", type=int, default=1600)
    parser.add_argument("--scan_chunk", type=int, default=250)
    parser.add_argument("--dsm_sigmas", type=int, default=100)
    parser.add_argument("--sigma_begin", type=float, default=1.0)
    parser.add_argument("--save_dsm", type=str, default="",
                        help="Pickle the trained DSM sampling params here.")
    parser.add_argument("--load_dsm", type=str, default="",
                        help="Load DSM params and skip training (resume a "
                        "sweep after a transient chip fault).")
    parser.add_argument("--only", type=str, default="",
                        help="Comma-separated substrings; run only rows "
                        "whose key contains one of them.")
    args = parser.parse_args()

    from benchmarks.flagship_e2e import make_data
    from smd_tpu.diffusion import samplers, schedules
    from smd_tpu.eval import metrics
    from smd_tpu.models import get_model
    from smd_tpu.training import diffusion as trainer

    rng_np = np.random.default_rng(1)
    model = get_model("TransformerDDPM", num_layers=6, num_heads=8,
                      num_mlp_layers=2, mlp_dims=2048)
    pool = jnp.asarray(np.stack(
        [make_data(args.batch, rng_np) for _ in range(args.pool_batches)]))
    sigmas = schedules.noise_schedule(args.sigma_begin, 1e-2,
                                      args.dsm_sigmas, "geometric")
    if args.load_dsm:
        import pickle
        with open(args.load_dsm, "rb") as fh:
            params = jax.tree_util.tree_map(jnp.asarray, pickle.load(fh))
        print(f"dsm params loaded from {args.load_dsm}", file=sys.stderr)
    else:
        state = trainer.create_train_state(
            jax.random.PRNGKey(40), model, (args.batch, 32, 42),
            (args.batch, 1, 1),
            trainer.TrainConfig(loss="dsm", learning_rate=1e-3,
                                batch_size=args.batch, ema=True))
        chunk_fn = trainer.make_train_chunk(
            model, trainer.objective_by_name("dsm"), sigmas, True)
        rng = jax.random.PRNGKey(41)
        done = 0
        t0 = time.time()
        while done < args.steps:
            k = min(args.scan_chunk, args.steps - done)
            idx = np.arange(done, done + k) % args.pool_batches
            rng, key = jax.random.split(rng)
            state, ms = chunk_fn(state, pool[idx], key)
            done += k
            if done % 5000 < args.scan_chunk:
                print(f"dsm step {done}: loss {float(ms['loss'][-1]):.3f}",
                      file=sys.stderr)
        print(f"dsm trained in {time.time() - t0:.0f}s", file=sys.stderr)
        params = state.sampling_params
        if args.save_dsm:
            import pickle
            with open(args.save_dsm, "wb") as fh:
                pickle.dump(jax.device_get(params), fh)
    dsm_fn = lambda x, s: model.apply(
        params, x,
        jnp.broadcast_to(jnp.asarray(s, jnp.float32).reshape(
            *([1] * x.ndim)), (x.shape[0], *([1] * (x.ndim - 1)))))
    real = make_data(args.eval_n, np.random.default_rng(99))
    rho = float(np.sqrt(12) / 2)
    init_u = jax.random.uniform(jax.random.PRNGKey(42),
                                (args.eval_n, 32, 42), minval=-rho,
                                maxval=rho)
    results = {}

    # ALD grid: the campaign row is (eps=2e-6, T=20). Sweep eps around it
    # at T=20, then the winners at T=50/100 (reference default T=100).
    ald_grid = [(2e-6, 20), (5e-6, 20), (1e-5, 20), (2e-5, 20),
                (5e-5, 20), (1e-5, 50), (2e-5, 50), (1e-5, 100)]
    only = [s for s in args.only.split(",") if s]
    keep = lambda key: (not only) or any(s in key for s in only)
    for eps, T in ald_grid:
        if not keep(f"ald_eps{eps:g}_T{T}"):
            continue
        f = jax.jit(lambda k, x, e=eps, t=T:
                    samplers.annealed_langevin_dynamics(
                        k, dsm_fn, sigmas, x, epsilon=e, T=t, denoise=True,
                        collect_steps=0, collect_metrics=False).state)
        f(jax.random.PRNGKey(43), init_u).block_until_ready()
        t0 = time.time()
        gen = f(jax.random.PRNGKey(44), init_u)
        gen.block_until_ready()
        dt = time.time() - t0
        fd = metrics.frechet_distance(real, np.asarray(gen))
        key = f"ald_eps{eps:g}_T{T}"
        results[key] = {"seconds": round(dt, 2), "fd": round(fd, 2)}
        print(json.dumps({key: results[key]}), file=sys.stderr, flush=True)

    # CAS grid: campaign row is (eps=2e-6, L=1000).
    for eps, L in [(2e-6, 1000), (5e-6, 1000), (1e-5, 1000), (2e-5, 1000),
                   (5e-6, 2000), (1e-5, 2000)]:
        if not keep(f"cas_eps{eps:g}_L{L}"):
            continue
        cs = schedules.noise_schedule(args.sigma_begin, 1e-2, L, "geometric")
        f = jax.jit(lambda k, x, e=eps, c=cs:
                    samplers.consistent_langevin_dynamics(
                        k, dsm_fn, c, x, epsilon=e, T=1, denoise=True,
                        collect_steps=0, collect_metrics=False).state)
        f(jax.random.PRNGKey(45), init_u).block_until_ready()
        t0 = time.time()
        gen = f(jax.random.PRNGKey(46), init_u)
        gen.block_until_ready()
        dt = time.time() - t0
        fd = metrics.frechet_distance(real, np.asarray(gen))
        key = f"cas_eps{eps:g}_L{L}"
        results[key] = {"seconds": round(dt, 2), "fd": round(fd, 2)}
        print(json.dumps({key: results[key]}), file=sys.stderr, flush=True)

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
