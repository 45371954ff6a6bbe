"""Train the Flax MusicVAE codec on a MIDI corpus.

The reference depends on Google's pretrained MusicVAE checkpoints
(``README``/``config.py``), which cannot be fetched here; this script makes
the codec self-sufficient: it tokenizes MIDI with the melody converter and
trains the Flax MusicVAE (``smd_tpu.codec.musicvae``) with the ELBO on TPU.
Saved params plug into every pipeline entry that takes ``--vae_params``.
"""
from __future__ import annotations

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from absl import app, flags, logging

FLAGS = flags.FLAGS
flags.DEFINE_string("input", None, "Glob of input MIDI files.")
flags.DEFINE_string("output", "./checkpoints/musicvae.pkl",
                    "Output params pickle.")
flags.DEFINE_integer("batch_size", 64, "Batch size.")
flags.DEFINE_integer("steps", 2000, "Training steps.")
flags.DEFINE_float("learning_rate", 1e-3, "Learning rate.")
flags.DEFINE_float("beta", 0.2, "KL weight.")
flags.DEFINE_float("free_bits", 48.0, "Free bits for the KL term.")
flags.DEFINE_integer("latent_dims", 512, "Latent dims.")
flags.DEFINE_integer("enc_units", 512, "Encoder LSTM units.")
flags.DEFINE_integer("dec_units", 512, "Decoder LSTM units per layer.")
flags.DEFINE_integer("dec_layers", 2, "Decoder LSTM layers.")
flags.DEFINE_integer("log_every", 100, "Logging frequency.")
flags.DEFINE_integer("seed", 0, "PRNG seed.")


def load_tensors(files):
    from smd_tpu.codec import midi_io
    from smd_tpu.codec.melody import extract_melodies, melody_2bar_converter
    tensors = []
    for path in files:
        try:
            ns = midi_io.read_midi_file(path)
        except Exception:
            continue
        for melody in extract_melodies(ns):
            tensors.extend(
                melody_2bar_converter.to_tensors(melody).inputs[::2])
    return np.stack(tensors) if tensors else None


def main(argv):
    del argv
    import jax
    import jax.numpy as jnp
    import optax
    from smd_tpu.codec.musicvae import MusicVAE, MusicVAEConfig, elbo_loss
    from smd_tpu.utils import io as io_lib

    files = sorted(glob.glob(os.path.expanduser(FLAGS.input), recursive=True))
    data = load_tensors(files)
    if data is None:
        raise ValueError("No melody chunks extracted from input")
    logging.info("Training on %d melody chunks", len(data))

    cfg = MusicVAEConfig(latent_dims=FLAGS.latent_dims,
                         enc_units=FLAGS.enc_units,
                         dec_units=(FLAGS.dec_units,) * FLAGS.dec_layers,
                         depth=data.shape[-1], max_seq_len=data.shape[1],
                         free_bits=FLAGS.free_bits, beta=FLAGS.beta)
    model = MusicVAE(cfg)
    rng = jax.random.PRNGKey(FLAGS.seed)
    rng, init_rng = jax.random.split(rng)
    x0 = jnp.zeros((2, cfg.max_seq_len, cfg.depth))
    params = model.init({"params": init_rng}, x0, init_rng)

    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adam(FLAGS.learning_rate))
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, batch, rng):
        def loss_fn(p):
            logits, mu, sigma = model.apply(p, batch, rng)
            return elbo_loss(logits, batch, mu, sigma,
                             free_bits=cfg.free_bits, beta=cfg.beta)

        (loss, aux), grads = jax.value_and_grad(loss_fn,
                                                has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, aux

    n = len(data)
    rng_np = np.random.default_rng(FLAGS.seed)
    for step in range(FLAGS.steps):
        idx = rng_np.integers(0, n, FLAGS.batch_size)
        batch = jnp.asarray(data[idx])
        rng, step_rng = jax.random.split(rng)
        params, opt_state, loss, aux = train_step(params, opt_state, batch,
                                                  step_rng)
        if step % FLAGS.log_every == 0:
            logging.info("step %d | elbo %.3f | rec %.3f | kl %.3f", step,
                         float(loss), float(aux["rec"]), float(aux["kl"]))

    os.makedirs(os.path.dirname(os.path.abspath(FLAGS.output)), exist_ok=True)
    io_lib.save({"params": params, "config": cfg}, FLAGS.output)
    logging.info("Saved MusicVAE params to %s", FLAGS.output)


if __name__ == "__main__":
    flags.mark_flag_as_required("input")
    app.run(main)
