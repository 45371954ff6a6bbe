"""Flagship end-to-end proof on real hardware.

Trains the full-size TransformerDDPM (6L/8H/2048) on a synthetic
32x42-latent-sequence distribution (the toy trajectory mixture embedded in
42 dims by a fixed random linear map), samples with both the 1000-step
ancestral sampler and 50-step DDIM, and reports Fréchet distances + wall
times. This exercises the exact production path of the north-star benchmark
with a *trained* model rather than random weights.

Optional sections (all measured on the same data/eval protocol):
- progressive distillation rows (--distill_stage_steps)
- consistency-distillation rows (--consistency_steps)
- the third model family: TransformerMDN + KV-cached decode (--mdn_steps)
- the score-matching family: DSM-trained TransformerDDPM sampled with
  annealed Langevin dynamics and consistent annealed sampling (--dsm_steps)
  — the reference's first-class NCSN path
  (/root/reference/configs/ncsn-mel-1seq-512.cfg, utils/ebm_utils.py:95-271)
  quality-proven at flagship scale.
- conditional generation rows (--conditional_rows): infilling (fix first/
  last 8 latents, regenerate middle 16 — the reference protocol at
  sample_ncsn.py:405-424) and interpolation (stochastic encode + x_T
  midpoint + decode — sample_ncsn.py:426-435), each against the spherical-
  interpolation baseline the reference's audio script builds
  (scripts/sample_audio.py:171-180).

--seed offsets every training/sampling RNG stream (the data distribution
and the real eval set stay fixed so FDs are comparable across seeds);
multi-seed reruns give the error bars for the few-step claims.

Run: python benchmarks/flagship_e2e.py [--steps 1500]
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


def make_data(n, rng):
    """Trajectory mixture lifted to 42 dims with a fixed orthogonal-ish map."""
    from smd_tpu.data.synthetic import toy_sequence_distribution
    base = toy_sequence_distribution(32, n, rng)          # (n, 32, 2)
    lift = np.random.default_rng(0).normal(size=(2, 42)) / np.sqrt(2)
    x = base @ lift                                        # (n, 32, 42)
    return (x / 12.0).astype(np.float32)                   # roughly [-1, 1]


def slerp_batch(a, b, t):
    """Spherical interpolation between latent batches a, b at scalar t
    (the reference's baseline construction, sample_audio.py:171-180 /
    song_utils.py:27-38), vectorized over the batch."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    na = np.linalg.norm(a, axis=-1, keepdims=True)
    nb = np.linalg.norm(b, axis=-1, keepdims=True)
    dot = np.sum(a * b, axis=-1, keepdims=True) / np.maximum(na * nb, 1e-12)
    omega = np.arccos(np.clip(dot, -1.0, 1.0))
    so = np.sin(omega)
    lin = (1 - t) * a + t * b                       # fallback for omega ~ 0
    sph = (np.sin((1 - t) * omega) / so) * a + (np.sin(t * omega) / so) * b
    return np.where(so < 1e-6, lin, sph).astype(np.float32)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=1500)
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--eval_n", type=int, default=1000)
    parser.add_argument("--T", type=int, default=1000,
                        help="DDPM schedule length (reduce for CPU smoke "
                        "runs; row names keep the T1000 label only at "
                        "T=1000).")
    parser.add_argument("--seed", type=int, default=0,
                        help="Offsets every training/sampling RNG stream "
                        "(data + real eval set stay fixed). Use 0/1/2... "
                        "for multi-seed error bars.")
    parser.add_argument("--scan_chunk", type=int, default=50,
                        help="Optimizer steps fused per dispatch for the "
                        "base and MDN training loops (the tunneled chip "
                        "pays ~0.1-0.5 s per dispatch).")
    parser.add_argument("--pool_batches", type=int, default=400,
                        help="Device-resident batch-pool size. 400 (25.6k "
                        "examples) is plenty for the 1500-step smoke "
                        "budget; converged-base runs (>=50k steps) should "
                        "raise it so the pool is not recycled hundreds of "
                        "times (1600 = 102k examples = ~550 MB HBM).")
    parser.add_argument("--mdn_gate_margin", type=float, default=8.0,
                        help="MDN serve-time convergence gate, NLL leg: "
                        "held-out teacher-forced per-position NLL must "
                        "beat the per-position diagonal-Gaussian baseline "
                        "(fit on the training pool, closed form) by this "
                        "many nats. Catches gross non-learning only — "
                        "measured: a 3k-step MDN at NLL -75 (vs Gaussian "
                        "-4.4) still detonated in free-running decode (FD "
                        "3803), which is what the probe leg is for.")
    parser.add_argument("--mdn_gate_dev_max", type=float, default=1.0,
                        help="MDN gate, probe leg: free-running decode is "
                        "probed and its per-(position,channel) marginal "
                        "mean/std must stay within this relative deviation "
                        "of the real data's. Teacher-forced NLL cannot see "
                        "compounding autoregressive drift (measured: NLL "
                        "-75 -> decode FD 3803), so the gate checks the "
                        "serving behavior itself. Calibration, all "
                        "measured on the flagship at N=1000: real-vs-real "
                        "sampling floor 0.026; a healthy converged MDN "
                        "(decode FD 59) 0.59; a 2x marginal-std blowup "
                        "1.62; detonation ~19.")
    parser.add_argument("--mdn_max_extensions", type=int, default=2,
                        help="How many remedial rounds (extension or "
                        "re-init, see --mdn_gate_reinit_dev) the gate may "
                        "take before giving up (the row is then reported "
                        "with gate_passed=false).")
    parser.add_argument("--mdn_gate_reinit_dev", type=float, default=4.0,
                        help="Gate remedy selector: probe deviation above "
                        "this means the INIT is bad and training is "
                        "restarted from a fresh seed instead of extended. "
                        "Measured (4 inits, same 15k budget/data): one "
                        "init detonates at dev 5.3/FD 1105 and stays "
                        "broken through 45k steps of extension, while "
                        "neighboring inits land at 0.8-1.0/FD 70-185; a "
                        "mid-range failure (dev 2.3) was fixed by one "
                        "extension. So: dev > 4 -> re-init; else extend.")
    parser.add_argument("--quant_rows", type=int, default=1,
                        help="1 = include the int8 w8a8 head/kernel rows.")
    parser.add_argument("--distill_stage_steps", type=int, default=3000,
                        help="Optimizer steps per progressive-distillation "
                        "stage (0 disables the distilled rows).")
    parser.add_argument("--distill_end", type=int, default=2,
                        help="Last distilled step count (1 adds the "
                        "single-jump student row).")
    parser.add_argument("--distill_start", type=int, default=8,
                        help="First distilled step count. Measured: 8 "
                        "(teacher = the 16-level lambda grid, the best "
                        "base-model grid at FD 242) beats 16 or 64 — "
                        "finer-h stages are harder to fit and errors "
                        "compound over more halvings.")
    parser.add_argument("--consistency_steps", type=int, default=12000,
                        help="Consistency-distillation optimizer steps "
                        "(0 disables the consistency_1/2/4 rows). This is "
                        "the 1-step path: progressive distillation "
                        "measurably collapses at 1 step (FD 891). 12000: "
                        "cd_sweep measured 4k->12k worth 40-90 FD at "
                        "every step count.")
    parser.add_argument("--consistency_segments", type=int, default=16,
                        help="CM discretization N (training-grid segments). "
                        "Default 16: the benchmarks/cd_sweep.py winner for "
                        "2/4-step quality (N=32 was the round-4-run-1 "
                        "recipe; coarser N measured strictly better).")
    parser.add_argument("--consistency_segments_alt", type=int, default=0,
                        help="If >0, train a SECOND consistency bundle at "
                        "this N and add consistency_alt_1/2/4 rows (e.g. 8 "
                        "= the cd_sweep 1-step-FD winner).")
    parser.add_argument("--ct_steps", type=int, default=0,
                        help="Teacher-free consistency-TRAINING (iCT) "
                        "optimizer steps (0 disables the ct_1/2/4 rows); "
                        "warm-started from the trained eps model.")
    parser.add_argument("--ct_seg_schedule", type=str, default="16",
                        help="Comma-separated CT discretization curriculum. "
                        "Default '16': cd_sweep measured the single-stage "
                        "N=16 run beating both the iCT doubling curricula "
                        "and every CD recipe at 1/2/4 steps.")
    parser.add_argument("--mdn_steps", type=int, default=3000,
                        help="TransformerMDN training steps for the MDN "
                        "quality row (0 disables it).")
    parser.add_argument("--dsm_steps", type=int, default=0,
                        help="DSM (score-matching) training steps for the "
                        "NCSN-family rows (0 disables them).")
    parser.add_argument("--dsm_sigmas", type=int, default=100,
                        help="Geometric noise-level count L for DSM "
                        "training (reference ncsn configs use 500 at "
                        "data_shape=512; continuous-noise conditioning "
                        "interpolates between levels either way).")
    parser.add_argument("--dsm_sigma_begin", type=float, default=1.0,
                        help="Largest sigma (data here is ~[-1,1]; the "
                        "reference's 15 was for unnormalized latents).")
    parser.add_argument("--ald_T", type=int, default=20,
                        help="Langevin steps per sigma level (reference "
                        "default 100; L*T model evals total).")
    parser.add_argument("--ald_eps", type=float, default=2e-5,
                        help="ALD step size (per-step SNR is "
                        "sqrt(eps)/sigma_end, level-independent). Round-5 "
                        "retune on a converged 50k DSM net (ald_sweep.py): "
                        "2e-5 measures FD 12.9 vs 152.6 at the old 2e-6 "
                        "default, which had been tuned on a 1500-step "
                        "model.")
    parser.add_argument("--cas_sigmas", type=int, default=1000,
                        help="Sigma-level count for the CAS row (one model "
                        "eval per level).")
    parser.add_argument("--cas_eps", type=float, default=2e-5,
                        help="CAS step size; round-5 retune measured FD "
                        "34.0 at 2e-5 vs 184.6 at the old 2e-6 default "
                        "(converged DSM net, ald_sweep.py).")
    parser.add_argument("--conditional_rows", type=int, default=0,
                        help="1 = add infilling + interpolation quality "
                        "rows (FD vs real, vs the slerp baseline).")
    parser.add_argument("--save_base", type=str, default="",
                        help="Pickle the trained base model's sampling "
                        "params here (lets cd_sweep / follow-up runs "
                        "reuse a converged base instead of retraining "
                        "50k+ steps).")
    parser.add_argument("--load_base", type=str, default="",
                        help="Load base sampling params from this pickle "
                        "and skip base training (all downstream rows run "
                        "against the loaded base).")
    args = parser.parse_args()

    from smd_tpu.diffusion import losses, samplers, schedules
    from smd_tpu.eval import metrics
    from smd_tpu.models import get_model
    from smd_tpu.training import diffusion as trainer
    from smd_tpu.training import consistency, distill

    rng_np = np.random.default_rng(1)
    seed_off = args.seed * 1000
    model = get_model("TransformerDDPM", num_layers=6, num_heads=8,
                      num_mlp_layers=2, mlp_dims=2048)
    betas = schedules.noise_schedule(1e-6, 0.01, args.T, "linear")
    consts = schedules.ddpm_constants(betas)
    config = trainer.TrainConfig(loss="ddpm", learning_rate=1e-3,
                                 batch_size=args.batch, ema=True)

    rng = jax.random.PRNGKey(seed_off)
    state = trainer.create_train_state(rng, model,
                                       (args.batch, 32, 42),
                                       (args.batch, 1, 1), config)

    # Device-resident batch pool: host-side data generation plus a
    # host->device transfer per step dominates wall time on a tunneled
    # accelerator; pre-staged batches cycle on device instead.
    n_pool = args.pool_batches
    pool = jnp.asarray(np.stack(
        [make_data(args.batch, rng_np) for _ in range(n_pool)]))

    def train_model(state, objective_name, sched, steps, rng, tag):
        """Scan-chunked training off the device-resident pool."""
        chunk_fn = trainer.make_train_chunk(
            model, trainer.objective_by_name(objective_name), sched, True)
        done = 0
        loss0 = lossN = None
        while done < steps:
            k = min(args.scan_chunk, steps - done)
            idx = np.arange(done, done + k) % n_pool
            rng, key = jax.random.split(rng)
            state, ms = chunk_fn(state, pool[idx], key)
            done += k
            if loss0 is None:
                loss0 = float(ms["loss"][min(20, k - 1)])
            lossN = float(ms["loss"][-1])
            if done % 500 < args.scan_chunk:
                print(f"{tag} step {done}: loss {lossN:.4f}",
                      file=sys.stderr)
        return state, rng, loss0, lossN

    if args.load_base:
        import pickle
        with open(args.load_base, "rb") as f:
            base_bundle = pickle.load(f)
        params = jax.tree_util.tree_map(jnp.asarray, base_bundle["params"])
        loss0, lossN = base_bundle.get("loss0", -1.0), base_bundle.get(
            "lossN", -1.0)
        train_time = base_bundle.get("train_seconds", float("nan"))
        base_steps = base_bundle.get("steps", -1)
        print(f"Loaded base params from {args.load_base} "
              f"({base_steps} steps)", file=sys.stderr)
    else:
        t0 = time.time()
        state, rng, loss0, lossN = train_model(state, "ddpm", betas,
                                               args.steps, rng, "ddpm")
        train_time = time.time() - t0
        base_steps = args.steps
        params = state.sampling_params
        if args.save_base:
            import pickle
            with open(args.save_base, "wb") as f:
                pickle.dump({"params": jax.device_get(params),
                             "steps": args.steps, "seed": args.seed,
                             "loss0": loss0, "lossN": lossN,
                             "train_seconds": train_time}, f)
            print(f"Saved base params to {args.save_base}", file=sys.stderr)
    model_fn = lambda x, c: model.apply(
        jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16), params),
        x.astype(jnp.bfloat16), c.astype(jnp.bfloat16)).astype(jnp.float32)

    # The exact production serving path bench.py runs: the standard einsum
    # layout at dtype=bfloat16 (measured fastest; see docs/DESIGN.md).
    # Validates that serving-path FD matches the training-layout model.
    serve_model = get_model("TransformerDDPM", num_layers=6, num_heads=8,
                            num_mlp_layers=2, mlp_dims=2048,
                            dtype=jnp.bfloat16)
    serve_params = jax.tree_util.tree_map(
        lambda p: jnp.asarray(p, jnp.bfloat16), params)
    serve_fn = lambda x, c: serve_model.apply(
        serve_params, x.astype(jnp.bfloat16),
        c.astype(jnp.bfloat16)).astype(jnp.float32)

    real = make_data(args.eval_n, np.random.default_rng(99))
    init = jax.random.normal(jax.random.PRNGKey(seed_off + 5),
                             (args.eval_n, 32, 42))
    fd_noise = metrics.frechet_distance(
        real, np.random.default_rng(3).normal(size=real.shape))
    # FD noise floor: two fully-real disjoint draws of the same size. Any
    # sampler row within a few×10 of this is statistically at the data
    # distribution for this metric/sample-count.
    cond_real = make_data(args.eval_n, np.random.default_rng(123))
    fd_floor = metrics.frechet_distance(real, cond_real)

    results = {"seed": args.seed,
               "train_steps": base_steps,
               "train_steps_per_sec": round(base_steps / train_time, 2),
               "loss_start": round(loss0, 4), "loss_end": round(lossN, 4),
               "fd_random_baseline": round(fd_noise, 4),
               "real_vs_real_fd": round(fd_floor, 4)}

    quant_rows = []
    if args.quant_rows:
        # int8 w8a8 quantized head (opt-in serving mode): calibrate static
        # activation scales on states spanning the noise schedule, then
        # report its FD so quantization quality is validated end-to-end.
        from smd_tpu.models.fuse import (calibrate_head_act_scales,
                                         quantize_head_params)
        quant_model = get_model("TransformerDDPM", num_layers=6, num_heads=8,
                                num_mlp_layers=2, mlp_dims=2048,
                                quantized_head=True, dtype=jnp.bfloat16)
        q_params = quantize_head_params(params)
        n_cal = min(64, args.eval_n)
        cal_x = jax.random.normal(jax.random.PRNGKey(11), (n_cal, 32, 42))
        cal = [(cal_x * (1.0 - a) + jnp.asarray(real[:n_cal]) * a,
                jnp.full((n_cal, 1, 1), t))
               for a, t in ((0.0, 0.99), (0.5, 0.5), (0.9, 0.1), (1.0, 0.02))]
        q_params = calibrate_head_act_scales(quant_model, q_params, cal)
        q_params = jax.tree_util.tree_map(
            lambda p: p if p.dtype == jnp.int8 else jnp.asarray(
                p, jnp.bfloat16),
            q_params)
        quant_fn = lambda x, c: quant_model.apply(
            q_params, x.astype(jnp.bfloat16),
            c.astype(jnp.bfloat16)).astype(jnp.float32)
        quant_kernel_model = get_model("TransformerDDPM", num_layers=6,
                                       num_heads=8, num_mlp_layers=2,
                                       mlp_dims=2048, quantized_head=True,
                                       quantized_head_kernel=True,
                                       dtype=jnp.bfloat16)
        quant_kernel_fn = lambda x, c: quant_kernel_model.apply(
            q_params, x.astype(jnp.bfloat16),
            c.astype(jnp.bfloat16)).astype(jnp.float32)
        quant_rows = [
            ("ancestral_T1000_int8head",
             lambda k, x: samplers.diffusion_dynamics(
                 k, quant_fn, betas, x, collect_steps=0,
                 collect_metrics=False, constants=consts).state),
            # Same int8 params through the fused Pallas w8a8 kernel
            # (ops/quant_matmul.py): validates the kernel's numerics survive
            # Mosaic compilation on the real chip, not just interpret mode.
            ("ancestral_T1000_int8kernel",
             lambda k, x: samplers.diffusion_dynamics(
                 k, quant_kernel_fn, betas, x, collect_steps=0,
                 collect_metrics=False, constants=consts).state),
        ]

    # Progressive distillation: halve 64 -> 2 sampler steps, then report
    # 4- and 2-step rows through the bf16 serving path (the VERDICT r2
    # target: FD <= DDIM-50 at 2-4 steps).
    distilled_rows = []
    if args.distill_stage_steps > 0:
        t0 = time.time()

        def batches():
            i = 0
            while True:
                yield pool[i % n_pool]
                i += 1

        stages = distill.progressive_distill(
            model, params, betas, batches(),
            start_steps=args.distill_start, end_steps=args.distill_end,
            steps_per_stage=args.distill_stage_steps, learning_rate=1e-4,
            seed=seed_off + 2)
        results["distill_seconds"] = round(time.time() - t0, 1)
        row_steps = [n for n in (4, 2, 1) if n in stages]
        for n in row_steps:
            st = stages[n]
            st_bf16 = jax.tree_util.tree_map(
                lambda p: jnp.asarray(p, jnp.bfloat16), st["params"])
            st_fn = (lambda x, c, sp=st_bf16: serve_model.apply(
                sp, x.astype(jnp.bfloat16),
                c.astype(jnp.bfloat16)).astype(jnp.float32))
            grid = jnp.asarray(st["grid"])
            distilled_rows.append(
                (f"distilled_{n}",
                 lambda k, x, fn=st_fn, g=grid:
                 samplers.distilled_ddim_dynamics(k, fn, g, x).state))
            # Zero-training control: the UNdistilled base model driven over
            # the same lambda-capped grid — isolates how much of the
            # few-step win is the grid vs. the distillation itself.
            distilled_rows.append(
                (f"base_on_grid_{n}",
                 lambda k, x, g=grid: samplers.distilled_ddim_dynamics(
                     k, serve_fn, g, x, clip_x0=True).state))

    # Consistency distillation: the 1-step path (trains f(z_t, t) -> x0 to
    # be self-consistent along the teacher ODE; see training/consistency.py).
    if args.consistency_steps > 0:
        def cd_batches():
            i = 0
            while True:
                yield pool[i % n_pool]
                i += 1

        cd_configs = [("consistency", args.consistency_segments)]
        if args.consistency_segments_alt > 0:
            cd_configs.append(("consistency_alt",
                               args.consistency_segments_alt))
        for tag, num_segments in cd_configs:
            t0 = time.time()
            cd = consistency.consistency_distill(
                model, params, betas, cd_batches(),
                num_segments=num_segments,
                steps=args.consistency_steps, learning_rate=1e-4,
                seed=seed_off + 4,
                log_fn=lambda n, s, l: print(
                    f"cd N={n} step {s}: loss {l:.4f}", file=sys.stderr))
            results[f"{tag}_seconds"] = round(time.time() - t0, 1)
            results[f"{tag}_segments"] = num_segments
            cd_bf16 = jax.tree_util.tree_map(
                lambda p: jnp.asarray(p, jnp.bfloat16), cd["params"])
            cd_fn = (lambda x, c, cp=cd_bf16: serve_model.apply(
                cp, x.astype(jnp.bfloat16),
                c.astype(jnp.bfloat16)).astype(jnp.float32))
            cd_grid = jnp.asarray(cd["grid"])
            for n in (1, 2, 4):
                if n > num_segments:
                    continue
                distilled_rows.append(
                    (f"{tag}_{n}",
                     lambda k, x, s=n, fn=cd_fn, g=cd_grid:
                     samplers.consistency_dynamics(
                         k, fn, g, x, num_steps=s).state))

    # Teacher-free consistency TRAINING (iCT): no teacher queries; the
    # target is the student's own previous iterate at a shared-noise
    # cleaner level (see training/consistency.py::consistency_train).
    if args.ct_steps > 0:
        t0 = time.time()

        def ct_batches():
            i = 0
            while True:
                yield pool[i % n_pool]
                i += 1

        ct = consistency.consistency_train(
            model, params, betas, ct_batches(),
            steps=args.ct_steps, learning_rate=1e-4,
            seg_schedule=tuple(int(s) for s in
                               args.ct_seg_schedule.split(",")),
            seed=seed_off + 8,
            log_fn=lambda n, s, l: print(
                f"ct N={n} step {s}: loss {l:.4f}", file=sys.stderr))
        results["ct_seg_schedule"] = args.ct_seg_schedule
        results["ct_seconds"] = round(time.time() - t0, 1)
        ct_bf16 = jax.tree_util.tree_map(
            lambda p: jnp.asarray(p, jnp.bfloat16), ct["params"])
        ct_fn = lambda x, c: serve_model.apply(
            ct_bf16, x.astype(jnp.bfloat16),
            c.astype(jnp.bfloat16)).astype(jnp.float32)
        ct_grid = jnp.asarray(ct["grid"])
        for n in (1, 2, 4):
            if n > ct_grid.shape[0] - 1:
                continue
            distilled_rows.append(
                (f"ct_{n}",
                 lambda k, x, s=n: samplers.consistency_dynamics(
                     k, ct_fn, ct_grid, x, num_steps=s).state))

    for name, fn in [
        ("ancestral_T1000", lambda k, x: samplers.diffusion_dynamics(
            k, model_fn, betas, x, collect_steps=0, collect_metrics=False,
            constants=consts).state),
        ("ddim_50", lambda k, x: samplers.ddim_dynamics(
            k, model_fn, betas, x, num_steps=50, constants=consts).state),
        ("dpmpp_20", lambda k, x: samplers.dpmpp_dynamics(
            k, model_fn, betas, x, num_steps=20, constants=consts).state),
        ("dpmpp_8", lambda k, x: samplers.dpmpp_dynamics(
            k, model_fn, betas, x, num_steps=8, constants=consts).state),
        ("ancestral_T1000_serving", lambda k, x: samplers.diffusion_dynamics(
            k, serve_fn, betas, x, collect_steps=0, collect_metrics=False,
            constants=consts).state),
    ] + quant_rows + distilled_rows:
        f = jax.jit(fn)
        f(jax.random.PRNGKey(seed_off + 6), init).block_until_ready()
        t0 = time.time()
        gen = f(jax.random.PRNGKey(seed_off + 7), init)
        gen.block_until_ready()
        dt = time.time() - t0
        fd = metrics.frechet_distance(real, np.asarray(gen))
        results[name] = {"seconds": round(dt, 4), "fd": round(fd, 4)}

    # Score-matching family (NCSN path): DSM-train a second flagship-size
    # TransformerDDPM on the same distribution, sample with ALD and CAS.
    if args.dsm_steps > 0:
        sigmas = schedules.noise_schedule(args.dsm_sigma_begin, 1e-2,
                                          args.dsm_sigmas, "geometric")
        dsm_state = trainer.create_train_state(
            jax.random.PRNGKey(seed_off + 40), model, (args.batch, 32, 42),
            (args.batch, 1, 1),
            trainer.TrainConfig(loss="dsm", learning_rate=1e-3,
                                batch_size=args.batch, ema=True))
        t0 = time.time()
        dsm_state, rng, dsm_l0, dsm_lN = train_model(
            dsm_state, "dsm", sigmas, args.dsm_steps,
            jax.random.PRNGKey(seed_off + 41), "dsm")
        results["dsm_train"] = {
            "steps": args.dsm_steps, "sigmas": args.dsm_sigmas,
            "sigma_begin": args.dsm_sigma_begin,
            "loss_start": round(dsm_l0, 4), "loss_end": round(dsm_lN, 4),
            "seconds": round(time.time() - t0, 1)}
        dsm_params = dsm_state.sampling_params
        dsm_fn = lambda x, s: model.apply(
            dsm_params, x,
            jnp.broadcast_to(jnp.asarray(s, jnp.float32).reshape(
                *([1] * x.ndim)), (x.shape[0], *([1] * (x.ndim - 1)))))
        # NCSN init convention: U(-sqrt(12)/2, sqrt(12)/2) (reference
        # train_ncsn.py:544-547).
        rho = float(np.sqrt(12) / 2)
        init_u = jax.random.uniform(jax.random.PRNGKey(seed_off + 42),
                                    (args.eval_n, 32, 42),
                                    minval=-rho, maxval=rho)
        cas_sigmas = schedules.noise_schedule(args.dsm_sigma_begin, 1e-2,
                                              args.cas_sigmas, "geometric")
        for name, fn in [
            (f"ald_L{args.dsm_sigmas}_T{args.ald_T}",
             lambda k, x: samplers.annealed_langevin_dynamics(
                 k, dsm_fn, sigmas, x, epsilon=args.ald_eps, T=args.ald_T,
                 denoise=True, collect_steps=0,
                 collect_metrics=False).state),
            (f"cas_L{args.cas_sigmas}",
             lambda k, x: samplers.consistent_langevin_dynamics(
                 k, dsm_fn, cas_sigmas, x, epsilon=args.cas_eps, T=1,
                 denoise=True, collect_steps=0,
                 collect_metrics=False).state),
        ]:
            f = jax.jit(fn)
            f(jax.random.PRNGKey(seed_off + 43), init_u).block_until_ready()
            t0 = time.time()
            gen = f(jax.random.PRNGKey(seed_off + 44), init_u)
            gen.block_until_ready()
            dt = time.time() - t0
            fd = metrics.frechet_distance(real, np.asarray(gen))
            results[name] = {"seconds": round(dt, 4), "fd": round(fd, 4)}

    # Conditional generation quality: infilling + interpolation, scored
    # (VERDICT r3 item 5 — previously only mask-correctness-tested).
    if args.conditional_rows:
        # Infill: fix first/last 8 of 32 latents, regenerate the middle 16
        # (reference protocol, sample_ncsn.py:405-424).
        masks = np.zeros((args.eval_n, 32, 42), np.float32)
        masks[:, :8] = 1.0
        masks[:, 24:] = 1.0
        fixed = jnp.asarray(cond_real * masks)
        masks_j = jnp.asarray(masks)
        # Conditional-quality scoring is on the REGENERATED content only
        # (middle 16 vs real middles): full-sequence FD is dominated by the
        # 16 copied real latents — the trivial slerp-fill baseline "wins"
        # it at FD ~0.14 (VERDICT r4 weak #3). The full-sequence FD is kept
        # as fd_full for boundary-coherence context. cond_mse is the
        # per-sequence error against the TRUE held-out middles — meaningful
        # on this data because the trajectory mixture is smooth, so the
        # real conditional p(middle | edges) is nearly deterministic (which
        # is also why slerp-fill remains a strong baseline even on the
        # middle-16 basis: interpolating inside a smooth trajectory nearly
        # reconstructs it — a property of the data, not a metric artifact).
        real_mid = real[:, 8:24]
        true_mid = cond_real[:, 8:24]
        results["infill_middle16_floor_real_vs_real"] = round(
            metrics.frechet_distance(real_mid, true_mid), 4)

        def cond_mse(gen_mid):
            return float(np.mean((np.asarray(gen_mid) - true_mid) ** 2))
        for name, fn in [
            ("infill_ancestral_T1000", lambda k, x: samplers.diffusion_dynamics(
                k, serve_fn, betas, x, infill_samples=fixed,
                infill_masks=masks_j, collect_steps=0,
                collect_metrics=False, constants=consts).state),
            ("infill_ddim_50", lambda k, x: samplers.ddim_dynamics(
                k, serve_fn, betas, x, num_steps=50, infill_samples=fixed,
                infill_masks=masks_j, constants=consts).state),
        ]:
            f = jax.jit(fn)
            f(jax.random.PRNGKey(seed_off + 50), init).block_until_ready()
            t0 = time.time()
            gen = f(jax.random.PRNGKey(seed_off + 51), init)
            gen.block_until_ready()
            dt = time.time() - t0
            gen_np = np.asarray(gen)
            results[name] = {
                "seconds": round(dt, 4),
                "fd": round(metrics.frechet_distance(
                    real_mid, gen_np[:, 8:24]), 4),
                "fd_full": round(metrics.frechet_distance(real, gen_np), 4),
                "cond_mse": round(cond_mse(gen_np[:, 8:24]), 6)}
        # Baseline the reference's audio script would build: slerp the
        # middle 16 latents from the edge latents (7 -> 24) — scored on the
        # same middle-16 basis, where copying the fixed bars buys nothing.
        slerp_fill = cond_real.copy()
        for j, pos in enumerate(range(8, 24)):
            tt = (j + 1) / 17.0
            slerp_fill[:, pos] = slerp_batch(cond_real[:, 7],
                                             cond_real[:, 24], tt)
        results["infill_slerp_baseline"] = {
            "fd": round(metrics.frechet_distance(
                real_mid, slerp_fill[:, 8:24]), 4),
            "fd_full": round(metrics.frechet_distance(real, slerp_fill), 4),
            "cond_mse": round(cond_mse(slerp_fill[:, 8:24]), 6)}

        # Interpolation: stochastic-encode two real endpoint batches to
        # x_T, take the midpoint, decode (reference sample_ncsn.py:426-435
        # uses linear interpolation in x_T; off-by-one encoder bug fixed).
        ends = make_data(2 * args.eval_n, np.random.default_rng(124))
        xa, xb = ends[:args.eval_n], ends[args.eval_n:]
        za = samplers.diffusion_stochastic_encoder(
            jax.random.PRNGKey(seed_off + 52), jnp.asarray(xa), betas)
        zb = samplers.diffusion_stochastic_encoder(
            jax.random.PRNGKey(seed_off + 53), jnp.asarray(xb), betas)
        zmid = (za + zb) / 2.0
        for name, fn in [
            ("interp_ancestral_T1000",
             lambda k, x: samplers.diffusion_dynamics(
                 k, serve_fn, betas, x, collect_steps=0,
                 collect_metrics=False, constants=consts).state),
            ("interp_ddim_50", lambda k, x: samplers.ddim_dynamics(
                k, serve_fn, betas, x, num_steps=50,
                constants=consts).state),
        ]:
            f = jax.jit(fn)
            f(jax.random.PRNGKey(seed_off + 54), zmid).block_until_ready()
            t0 = time.time()
            gen = f(jax.random.PRNGKey(seed_off + 55), zmid)
            gen.block_until_ready()
            dt = time.time() - t0
            fd = metrics.frechet_distance(real, np.asarray(gen))
            results[name] = {"seconds": round(dt, 4), "fd": round(fd, 4)}
        # Latent-space slerp midpoint of the same endpoint pairs. On
        # independent trajectory pairs ~42% of positions are near-antipodal
        # (sin(omega) < 0.1), where slerp's 1/sin(omega) explodes (|x| up to
        # ~7e3) — a real failure mode of the reference's baseline on
        # unrelated endpoints, reported as measured. The lerp midpoint is
        # the numerically stable comparison; note it is a *shrinkage* (cov
        # of (a+b)/2 is half the data cov), not a sample, so its low FD
        # reflects conservatism, not generation quality.
        results["interp_slerp_baseline"] = {
            "fd": round(metrics.frechet_distance(
                real, slerp_batch(xa, xb, 0.5)), 4)}
        results["interp_lerp_baseline"] = {
            "fd": round(metrics.frechet_distance(
                real, (xa + xb) / 2.0), 4)}

    # Third model family, evaluated for QUALITY (VERDICT r2 item 6: the MDN
    # path previously had only throughput proof): train the TransformerMDN
    # on the same latent distribution and report decode FD next to the
    # diffusion rows. Reference contract: sample_mdn.py:54-121 decodes and
    # sample_ncsn.py:142-170 evaluates generated latents model-agnostically.
    if args.mdn_steps > 0:
        from smd_tpu.sampling.mdn_decode import ar_decode_cached
        from smd_tpu.training import mdn as mdn_trainer
        mdn_model = get_model("TransformerMDN", num_layers=6, num_heads=8,
                              num_mlp_layers=2, mlp_dims=2048,
                              mdn_mixtures=100)
        mdn_config = trainer.TrainConfig(learning_rate=3e-4,
                                         batch_size=args.batch, ema=False,
                                         lr_warmup=500)
        mdn_state = mdn_trainer.create_train_state(
            jax.random.PRNGKey(seed_off + 21), mdn_model,
            (args.batch, 32, 42), mdn_config)
        mdn_chunk = mdn_trainer.make_train_chunk(mdn_model)

        def mdn_train_rounds(mdn_state, steps, start):
            done = 0
            while done < steps:
                k = min(args.scan_chunk, steps - done)
                idx = np.arange(start + done, start + done + k) % n_pool
                mdn_state, ms = mdn_chunk(mdn_state, pool[idx])
                done += k
                if done % 500 < args.scan_chunk:
                    print(f"mdn step {start + done}: "
                          f"nll {float(ms['loss'][-1]):.4f}",
                          file=sys.stderr)
            return mdn_state, float(ms["loss"][-1])

        # Serve-time convergence gate (VERDICT r4 item 3), two legs:
        # 1. NLL leg: held-out teacher-forced per-position NLL must beat
        #    the closed-form per-position diagonal-Gaussian baseline by
        #    --mdn_gate_margin nats (catches gross non-learning).
        # 2. Probe leg: free-running decode is probed and its marginal
        #    per-(position,channel) mean/std must match the real data's
        #    within --mdn_gate_dev_max relative deviation. This is the leg
        #    that actually catches the measured failure mode: teacher-
        #    forced NLL is blind to compounding autoregressive drift (a
        #    3k-step pilot passed the NLL leg at -75 yet decoded at FD
        #    3803; the round-4 seed-2 MDN shipped a 3609-FD decode
        #    silently past the sigma-cap guard).
        # On failure the gate auto-extends training up to
        # --mdn_max_extensions rounds of --mdn_steps.
        from smd_tpu.sampling import gates
        pool_np = np.asarray(pool).reshape(-1, 32, 42)
        gauss_nll = gates.gaussian_baseline_nll(real, fit_on=pool_np)
        gate = gauss_nll - args.mdn_gate_margin

        heldout_nll_fn = jax.jit(lambda params, batch: losses.mdn_nll(
            *mdn_model.apply(params, batch), batch, "mean"))

        def heldout_nll(params):
            chunks = [float(heldout_nll_fn(params, jnp.asarray(c)))
                      for c in np.array_split(real, 4)]
            return float(np.mean(chunks))

        probe_deviation = lambda gen: gates.marginal_deviation(real, gen)

        decode = jax.jit(lambda k, params: ar_decode_cached(
            k, mdn_model, params, args.eval_n, steps=32,
            channels=42, log_sigma_cap=0.0))

        t0 = time.time()
        mdn_state, nll_train = mdn_train_rounds(mdn_state, args.mdn_steps, 0)
        extensions = 0
        reinits = 0
        trained_steps = args.mdn_steps
        while True:
            nll_eval = heldout_nll(mdn_state.params)
            probe = decode(jax.random.PRNGKey(seed_off + 31),
                           mdn_state.params)
            dev = probe_deviation(probe)
            gate_passed = (nll_eval <= gate) and (dev <= args.mdn_gate_dev_max)
            rounds = extensions + reinits
            if gate_passed or rounds >= args.mdn_max_extensions:
                break
            if dev > args.mdn_gate_reinit_dev:
                # Bad init, not a budget problem: extension measurably
                # cannot fix it (a detonating init stayed at dev 2.5-5.3
                # through 45k steps while fresh inits pass at 15k).
                reinits += 1
                print(f"MDN GATE: probe deviation {dev:.3f} > reinit "
                      f"threshold {args.mdn_gate_reinit_dev} — bad init; "
                      f"RESTARTING from a fresh seed (remedy "
                      f"{rounds + 1}/{args.mdn_max_extensions})",
                      file=sys.stderr)
                mdn_state = mdn_trainer.create_train_state(
                    jax.random.PRNGKey(seed_off + 21 + 5000 * reinits),
                    mdn_model, (args.batch, 32, 42), mdn_config)
                mdn_state, nll_train = mdn_train_rounds(
                    mdn_state, args.mdn_steps, 0)
                trained_steps = args.mdn_steps
            else:
                extensions += 1
                print(f"MDN GATE: held-out NLL {nll_eval:.2f} (gate "
                      f"{gate:.2f}), probe marginal deviation {dev:.3f} "
                      f"(max {args.mdn_gate_dev_max}); auto-extending "
                      f"training (remedy {rounds + 1}/"
                      f"{args.mdn_max_extensions})", file=sys.stderr)
                mdn_state, nll_train = mdn_train_rounds(
                    mdn_state, args.mdn_steps, trained_steps)
                trained_steps += args.mdn_steps
        if not gate_passed:
            print(f"MDN GATE FAILED after {extensions} extensions + "
                  f"{reinits} re-inits: held-out NLL {nll_eval:.2f} (gate "
                  f"{gate:.2f}), probe deviation {dev:.3f} (max "
                  f"{args.mdn_gate_dev_max}); the decode row below is from "
                  f"an underconverged model", file=sys.stderr)
        results["mdn_train"] = {
            "steps": trained_steps,
            "nll_end": round(nll_train, 4),
            "seconds": round(time.time() - t0, 1)}
        results["mdn_gate"] = {
            "heldout_nll": round(nll_eval, 4),
            "gauss_baseline_nll": round(gauss_nll, 4),
            "margin": args.mdn_gate_margin,
            "probe_marginal_deviation": round(dev, 4),
            "dev_max": args.mdn_gate_dev_max,
            "extensions": extensions,
            "reinits": reinits,
            "passed": bool(gate_passed)}
        # log_sigma_cap=0.0: serving-side guard against the NLL's unbounded
        # variance components (sigma up to ~e^6 on this flagship) that
        # detonate free-running decode — see mdn_decode.sample_mixture.
        # (decode jit built above for the gate's probe leg.)
        decode(jax.random.PRNGKey(seed_off + 30),
               mdn_state.params).block_until_ready()
        t0 = time.time()
        mdn_gen = decode(jax.random.PRNGKey(seed_off + 31), mdn_state.params)
        mdn_gen.block_until_ready()
        dt = time.time() - t0
        results["mdn_cached_decode"] = {
            "seconds": round(dt, 4),
            "fd": round(metrics.frechet_distance(
                real, np.asarray(mdn_gen)), 4)}
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
