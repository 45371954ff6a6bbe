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
