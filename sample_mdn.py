"""Sample from a trained autoregressive MDN — CLI.

Flag-compatible with the reference's ``sample_mdn.py`` (its broken
``train_transformer`` import fixed; SURVEY.md §7 item 3). Decoding runs as a
single on-device ``lax.scan`` (``smd_tpu.sampling.mdn_decode``) instead of the
reference's 32 host-driven full forward passes.
"""
from __future__ import annotations

import os
import time

import numpy as np
from absl import app, flags, logging

from smd_tpu import cli

FLAGS = flags.FLAGS
cli.define_common_flags()
cli.define_sampling_flags()
flags.DEFINE_boolean(
    "cached_decode", True,
    "KV-cached incremental decoding (11x faster, clean ancestral sampling)."
    " Disable for the reference's exact decode semantics incl. its"
    " final-step full resample.")
flags.DEFINE_float(
    "mdn_sigma_cap", 0.0,
    "Serving-side upper bound on per-component log stddev during mixture "
    "sampling. The MDN NLL never bounds sigma, so trained mixtures carry "
    "near-unused huge-variance components that destabilize free-running "
    "decode (measured: FD 3e9 -> 309 on the flagship with cap 0.0, i.e. "
    "sigma <= 1 on unit-scale standardized latents). Set to inf for the "
    "reference's exact unguarded sampling.")
flags.DEFINE_enum(
    "nll_gate", "warn", ["off", "warn", "fail"],
    "Serve-time convergence gate, two legs. NLL leg (pre-decode): the "
    "checkpoint's teacher-forced per-position NLL on the eval examples "
    "must beat the per-position diagonal-Gaussian baseline (closed form, "
    "fit on the same examples) by --nll_gate_margin nats — catches gross "
    "non-learning. Probe leg (post-decode): the decoded samples' marginal "
    "per-(position,channel) mean/std must match the eval examples' within "
    "--gate_dev_max relative deviation — catches compounding "
    "autoregressive drift, which teacher-forced NLL is blind to "
    "(measured: a checkpoint passing the NLL leg at -75 still decoded at "
    "FD 3803 even under --mdn_sigma_cap). 'fail' refuses to decode/flush; "
    "'warn' proceeds loudly.")
flags.DEFINE_float(
    "nll_gate_margin", 8.0,
    "Nats-per-position margin the MDN must beat the Gaussian baseline by "
    "(see --nll_gate).")
flags.DEFINE_float(
    "gate_dev_max", 1.0,
    "Maximum relative marginal mean+std deviation of decoded samples vs "
    "the eval examples (see --nll_gate probe leg). Measured calibration "
    "on the flagship at N=1000: real-vs-real sampling floor 0.026, a "
    "healthy converged MDN 0.59, a 2x marginal-std blowup 1.62, "
    "detonation ~19.")


def main(argv):
    del argv
    logging.info(FLAGS.flags_into_string())

    import jax
    import tensorflow as tf
    tf.config.experimental.set_visible_devices([], "GPU")

    from smd_tpu.data import transforms
    from smd_tpu.sampling import mdn_decode
    from smd_tpu.utils import io as io_lib

    log_dir = FLAGS.sampling_dir
    pca, slice_idx, dim_weights = cli.load_transforms_from_flags()

    train_ds, eval_ds = cli.dataset_from_flags(include_cardinality=False,
                                               problem="vae")
    real = eval_ds.take_examples(FLAGS.sample_size)
    steps, channels = real[0].shape

    model, state = cli.restore_state_for_sampling((steps, channels), mdn=True)

    if FLAGS.nll_gate != "off":
        from smd_tpu.diffusion import losses as losses_lib
        from smd_tpu.sampling import gates
        real_np = np.asarray(real, np.float32)
        gauss_nll = gates.gaussian_baseline_nll(real_np)
        nll_fn = jax.jit(lambda batch: losses_lib.mdn_nll(
            *model.apply(state.params, batch), batch, "mean"))
        heldout = float(np.mean([
            float(nll_fn(np.asarray(c)))
            for c in np.array_split(real_np, max(1, len(real_np) // 256))]))
        gate = gauss_nll - FLAGS.nll_gate_margin
        if heldout > gate:
            msg = (f"MDN convergence gate: held-out NLL {heldout:.2f} is "
                   f"above the gate {gate:.2f} (diagonal-Gaussian baseline "
                   f"{gauss_nll:.2f} - margin {FLAGS.nll_gate_margin}); "
                   "this checkpoint is underconverged and free-running "
                   "decode is unreliable — train longer (see train_mdn.py "
                   "--max_steps) or lower --nll_gate_margin deliberately.")
            if FLAGS.nll_gate == "fail":
                raise SystemExit(f"REFUSING TO DECODE. {msg}")
            logging.error("%s (decoding anyway: --nll_gate=warn)", msg)
        else:
            logging.info(
                "MDN convergence gate passed: held-out NLL %.2f <= gate "
                "%.2f (Gaussian baseline %.2f)", heldout, gate, gauss_nll)

    cap = None if np.isinf(FLAGS.mdn_sigma_cap) else FLAGS.mdn_sigma_cap
    t0 = time.time()
    if FLAGS.cached_decode:
        generated = mdn_decode.ar_decode_cached(
            jax.random.PRNGKey(FLAGS.sample_seed), model, state.params,
            len(real), steps=steps, channels=channels, log_sigma_cap=cap)
    else:
        model_fn = lambda tokens: model.apply(state.params, tokens,
                                              shift=False)
        generated = mdn_decode.ar_decode(
            jax.random.PRNGKey(FLAGS.sample_seed), model_fn, len(real),
            steps=steps, channels=channels, log_sigma_cap=cap)
    generated = np.asarray(generated)
    logging.info("Generated samples in %f seconds", time.time() - t0)

    if FLAGS.nll_gate != "off":
        from smd_tpu.sampling import gates
        dev = gates.marginal_deviation(real, generated)
        if dev > FLAGS.gate_dev_max:
            msg = (f"MDN probe gate: decoded samples' marginal deviation "
                   f"{dev:.3f} exceeds --gate_dev_max="
                   f"{FLAGS.gate_dev_max} — free-running decode has "
                   "drifted off-distribution (underconverged checkpoint); "
                   "train longer before serving.")
            if FLAGS.nll_gate == "fail":
                raise SystemExit(f"REFUSING TO FLUSH SAMPLES. {msg}")
            logging.error("%s (flushing anyway: --nll_gate=warn)", msg)
        else:
            logging.info("MDN probe gate passed: marginal deviation %.3f "
                         "<= %.2f", dev, FLAGS.gate_dev_max)

    if FLAGS.flush:
        generated_t = transforms.inverse_data_transform(
            generated, FLAGS.normalize, pca, train_ds.min, train_ds.max,
            slice_idx, dim_weights)
        real_t = transforms.inverse_data_transform(
            real, FLAGS.normalize, pca, eval_ds.min, eval_ds.max, slice_idx,
            dim_weights)
        io_lib.save(real_t, os.path.join(log_dir, "mdn/real.pkl"))
        io_lib.save(generated_t, os.path.join(log_dir, "mdn/generated.pkl"))


if __name__ == "__main__":
    app.run(main)
