"""Generate melodies out of the box: shipped bundle -> noise -> MIDI files.

One command where the reference needs three wired-together downloads plus two
CLIs (``/root/reference/sample_ncsn.py`` to sample latents, then
``/root/reference/scripts/sample_audio.py`` to decode them through a TF1
MusicVAE): load `checkpoints/melody-diffusion.pkl` (model + schedule + slice
transform + normalization, packed by ``scripts/package_generation_bundle.py``)
and the shipped MusicVAE codec, sample latent sequences, invert the data
transform, decode to NoteSequences, and write `.mid` files.

  python scripts/generate_melodies.py --n=8 --output_dir=./melodies
  python scripts/generate_melodies.py --sampler=consistency --steps=2   # 1-2 model calls/seq
  python scripts/generate_melodies.py --sampler=dpmpp --steps=8

Samplers: `consistency` (needs the bundle's consistency pack; fastest),
`dpmpp` / `ddim` / `ancestral` drive the base model.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from absl import app, flags, logging

FLAGS = flags.FLAGS
flags.DEFINE_string("bundle", "./checkpoints/melody-diffusion.pkl",
                    "Generation bundle (scripts/package_generation_bundle.py).")
flags.DEFINE_string("output_dir", "./melodies", "Directory for .mid files.")
flags.DEFINE_integer("n", 8, "Number of melodies to generate.")
flags.DEFINE_enum("sampler", "consistency",
                  ["consistency", "dpmpp", "ddim", "ancestral"],
                  "Sampling algorithm.")
flags.DEFINE_integer("steps", 0,
                     "Sampler steps (0 = per-sampler default: consistency 2, "
                     "dpmpp 8, ddim 50, ancestral = full schedule).")
flags.DEFINE_integer("seed", 0, "Sampling seed.")
flags.DEFINE_string("vae_params", "",
                    "Optional pickled MusicVAE params (default: the shipped "
                    "melody codec).")
flags.DEFINE_integer("checkpoint_seed", 0,
                     "Seed for VAE weights when no shipped codec exists.")
flags.DEFINE_float("temperature", 1e-3, "Decode temperature.")


def load_model_fn(bundle, which="params"):
    """Build a serving closure from bundle params (bf16 on accelerators)."""
    import jax
    import jax.numpy as jnp
    from smd_tpu.models import get_model

    dtype = jnp.float32 if jax.default_backend() == "cpu" else jnp.bfloat16
    arch = dict(bundle["arch"])
    model = get_model(arch.pop("architecture"), dtype=dtype, **arch)
    params = jax.tree_util.tree_map(
        lambda p: jnp.asarray(p, dtype), bundle[which] if which == "params"
        else bundle["consistency"]["params"])
    return lambda x, cond: model.apply(
        params, x.astype(dtype), cond.astype(dtype)).astype(jnp.float32)


def main(argv):
    del argv
    import jax
    from smd_tpu.codec import midi_io, song as song_lib
    from smd_tpu.codec.musicvae import TrainedMusicVAE
    from smd_tpu.data import transforms
    from smd_tpu.diffusion import samplers, schedules
    from smd_tpu.utils import io as io_lib

    if not os.path.exists(FLAGS.bundle):
        raise SystemExit(
            f"No generation bundle at {FLAGS.bundle}. Train one with the "
            "offline pipeline (generate_song_data -> "
            "generate_compressed_transform -> transform_encoded_data -> "
            "train_ncsn [--distill --distill_mode=ct]) and pack it with "
            "scripts/package_generation_bundle.py.")
    bundle = io_lib.load(FLAGS.bundle)
    shape = tuple(bundle["sample_shape"])
    sched = bundle["schedule"]
    betas = schedules.noise_schedule(sched["sigma_begin"], sched["sigma_end"],
                                     sched["num_sigmas"], kind=sched["kind"])

    rng = jax.random.PRNGKey(FLAGS.seed)
    init_rng, ld_rng = jax.random.split(rng)
    init = jax.random.normal(init_rng, (FLAGS.n, *shape))

    t0 = time.time()
    if FLAGS.sampler == "consistency":
        if not bundle.get("consistency"):
            raise SystemExit(
                f"{FLAGS.bundle} carries no consistency pack; re-train with "
                "train_ncsn.py --distill --distill_mode=ct or use "
                "--sampler=dpmpp/ddim/ancestral.")
        model_fn = load_model_fn(bundle, which="consistency")
        grid = np.asarray(bundle["consistency"]["grid"])
        out = samplers.consistency_dynamics(
            ld_rng, model_fn, grid, init, num_steps=FLAGS.steps or 2)
    else:
        model_fn = load_model_fn(bundle)
        if FLAGS.sampler == "dpmpp":
            out = samplers.dpmpp_dynamics(ld_rng, model_fn, betas, init,
                                          num_steps=FLAGS.steps or 8)
        elif FLAGS.sampler == "ddim":
            out = samplers.ddim_dynamics(ld_rng, model_fn, betas, init,
                                         num_steps=FLAGS.steps or 50,
                                         collect_steps=0)
        else:
            out = samplers.diffusion_dynamics(ld_rng, model_fn, betas, init,
                                              collect_steps=0,
                                              collect_metrics=False)
    generated = np.asarray(out.state)
    logging.info("Sampled %d sequences (%s) in %.2fs", FLAGS.n, FLAGS.sampler,
                 time.time() - t0)

    latents = transforms.inverse_data_transform(
        generated, bundle["normalize"], None, bundle["data_min"],
        bundle["data_max"], bundle["slice_idx"],
        out_channels=bundle["out_channels"],
        rng=np.random.default_rng(FLAGS.seed))

    vae_params = io_lib.load(FLAGS.vae_params) if FLAGS.vae_params else None
    codec = TrainedMusicVAE(params=vae_params, seed=FLAGS.checkpoint_seed)
    if codec.random_weights:
        logging.warning("No shipped MusicVAE artifact found: decoding with "
                        "RANDOM codec weights (shape-valid MIDI, not music).")

    os.makedirs(FLAGS.output_dir, exist_ok=True)
    for i in range(FLAGS.n):
        song = song_lib.embeddings_to_song(
            latents[i].astype(np.float64), codec, codec.converter,
            temperature=FLAGS.temperature)
        path = os.path.join(FLAGS.output_dir, f"melody_{i:03d}.mid")
        midi_io.write_midi_file(song.note_sequence, path)
        logging.info("Wrote %s (%d notes)", path,
                     len(song.note_sequence.notes))
    logging.info("Done: %d melodies in %s (total %.2fs)", FLAGS.n,
                 FLAGS.output_dir, time.time() - t0)


if __name__ == "__main__":
    app.run(main)
