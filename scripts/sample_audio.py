"""Render sampled latents to MIDI / WAV / piano-roll plots.

Capability parity with the reference's ``scripts/sample_audio.py`` (its
broken ``train_lm`` import fixed; SURVEY.md §7 item 3): loads
``{real,generated,collection}.pkl`` latent pickles, rebuilds baselines
(prior = randn, spherical interpolation between bars, infill re-insertion of
fixed bars), decodes to NoteSequences through the MusicVAE codec, then
renders WAV (44.1 kHz int16 via the native C++ synthesizer — the FluidSynth
analogue) and MIDI in a process pool (the Ray analogue; synthesis is
CPU-bound DSP).
"""
from __future__ import annotations

import concurrent.futures
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from absl import app, flags, logging

FLAGS = flags.FLAGS
flags.DEFINE_string("input", None, "Directory with {real,generated}.pkl.")
flags.DEFINE_string("output", "./audio", "Output directory.")
flags.DEFINE_integer("n_synth", 10, "Number of samples to render.")
flags.DEFINE_boolean("include_wav", True, "Render WAV audio.")
flags.DEFINE_boolean("include_plots", True, "Render piano-roll plots.")
flags.DEFINE_boolean("gen_interpolations", False,
                     "Build spherical-interpolation baseline.")
flags.DEFINE_boolean("include_collection", False,
                     "Also render intermediate sampling steps "
                     "(collection.pkl).")
flags.DEFINE_boolean("infill", False, "Re-insert real fixed bars (infill).")
flags.DEFINE_integer("sample_rate", 44100, "WAV sample rate.")
flags.DEFINE_string("vae_params", "", "Optional pickled MusicVAE params.")
flags.DEFINE_integer("checkpoint_seed", 0, "Seed for VAE weights.")
flags.DEFINE_float("melody_temperature", 1e-3, "Decode temperature.")


def _render_one(args):
    """Process-pool worker: NoteSequence pickle -> WAV + plot."""
    ns_path, out_base, sample_rate, include_wav, include_plots = args
    from smd_tpu.codec import synth
    from smd_tpu.utils import io as io_lib

    ns = io_lib.load(ns_path)
    if include_wav:
        synth.note_sequence_to_wav(ns, out_base + ".wav", sample_rate)
    if include_plots:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig = plt.figure(figsize=(8, 3), dpi=120)
        for n in ns.notes:
            plt.plot([n.start_time, n.end_time], [n.pitch, n.pitch],
                     lw=3, solid_capstyle="butt")
        plt.xlabel("seconds")
        plt.ylabel("pitch")
        plt.tight_layout()
        fig.savefig(out_base + ".png")
        plt.close(fig)
    return out_base


def main(argv):
    del argv
    from smd_tpu.codec import midi_io, song as song_lib
    from smd_tpu.codec.musicvae import TrainedMusicVAE
    from smd_tpu.utils import io as io_lib

    params = io_lib.load(FLAGS.vae_params) if FLAGS.vae_params else None
    model = TrainedMusicVAE(params=params, seed=FLAGS.checkpoint_seed)

    base = FLAGS.input
    groups = {}
    for name in ("real", "generated"):
        path = os.path.join(base, f"{name}.pkl")
        if os.path.exists(path):
            latents = np.asarray(io_lib.load(path))
            if latents.ndim == 2:   # 1seq problems: one latent per sample
                latents = latents[:, None, :]
            groups[name] = latents[:FLAGS.n_synth]
    if "real" not in groups and "generated" not in groups:
        raise FileNotFoundError(f"No real.pkl/generated.pkl under {base}")

    # Intermediate sampling steps (collection.pkl), a few evenly spaced.
    coll_path = os.path.join(base, "collection.pkl")
    if FLAGS.include_collection and os.path.exists(coll_path):
        coll = np.asarray(io_lib.load(coll_path))
        for step_idx in np.linspace(0, len(coll) - 1, 4).astype(int):
            latents = coll[step_idx]
            if latents.ndim == 2:
                latents = latents[:, None, :]
            groups[f"collection_{step_idx:03d}"] = latents[:FLAGS.n_synth]

    # Baselines (reference sample_audio.py:158-180).
    ref = groups.get("generated", groups.get("real"))
    groups["prior"] = np.random.randn(*ref.shape)
    if FLAGS.gen_interpolations and "real" in groups:
        interp = []
        for seq in groups["real"]:
            interp.append(
                np.stack([
                    song_lib.spherical_interpolation(
                        seq[7:8], seq[24:25], a).squeeze(0)
                    for a in np.linspace(0, 1, len(seq))
                ]))
        groups["interpolation"] = np.stack(interp)
    if FLAGS.infill and "real" in groups and "generated" in groups:
        fixed = groups["generated"].copy()
        fixed[:, :8] = groups["real"][:, :8]
        fixed[:, -8:] = groups["real"][:, -8:]
        groups["infill"] = fixed

    os.makedirs(FLAGS.output, exist_ok=True)
    jobs = []
    for name, latents in groups.items():
        out_dir = os.path.join(FLAGS.output, name)
        os.makedirs(out_dir, exist_ok=True)
        for i, seq in enumerate(latents):
            song = song_lib.embeddings_to_song(
                np.asarray(seq, np.float64), model, model.converter,
                temperature=FLAGS.melody_temperature)
            out_base = os.path.join(out_dir, f"{i:03d}")
            midi_io.write_midi_file(song.note_sequence, out_base + ".mid")
            io_lib.save(song.note_sequence, out_base + ".ns.pkl")
            jobs.append((out_base + ".ns.pkl", out_base, FLAGS.sample_rate,
                         FLAGS.include_wav, FLAGS.include_plots))
        logging.info("Decoded %d sequences for %s", len(latents), name)

    with concurrent.futures.ProcessPoolExecutor() as pool:
        for out_base in pool.map(_render_one, jobs):
            logging.info("Rendered %s", out_base)


if __name__ == "__main__":
    flags.mark_flag_as_required("input")
    app.run(main)
