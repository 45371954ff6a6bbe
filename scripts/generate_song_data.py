"""Encode MIDI files into MusicVAE latent TFRecords.

Replaces the reference's Apache-Beam pipeline
(``scripts/generate_song_data_beam.py``, whose imports were broken —
SURVEY.md §7 item 4) with the TPU-native split: a multiprocessing pool parses
and tokenizes MIDI on host CPUs while the MusicVAE encoder runs *batched on
the accelerator* in the driver process — the reference instead loaded one TF1
session per Beam worker and encoded on CPU.

Output matches the reference exactly: TFRecords of pickled [3, n_chunks, 512]
(z, mu, sigma) matrices per song (``generate_song_data_beam.py:90-96``).

Usage:
  python scripts/generate_song_data.py --input='data/lmd/**/*.mid' \
      --output=./output/encoded --mode=melody
"""
from __future__ import annotations

import concurrent.futures
import glob
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from absl import app, flags, logging

FLAGS = flags.FLAGS
flags.DEFINE_string("input", None, "Glob of input MIDI files.")
flags.DEFINE_string("output", "./output/encoded", "Output directory.")
flags.DEFINE_enum("mode", "melody", ["melody", "melody16", "multi"],
                  "Encoding mode (melody16: non-overlapping 16-bar chunks "
                  "through the hierdec codec, reference config.py:41-48).")
flags.DEFINE_integer("checkpoint_seed", 0,
                     "Seed for VAE weights when no checkpoint is given.")
flags.DEFINE_string("vae_params", "",
                    "Optional pickled MusicVAE params to load.")
flags.DEFINE_integer("max_songs", None, "Maximum number of songs.")
flags.DEFINE_integer("encode_batch", 1024,
                     "Chunks per accelerator encode batch. Larger batches "
                     "amortize LSTM weight loads: measured 60k chunks/s at "
                     "1024 vs 38k at 256 (docs/DESIGN.md).")
flags.DEFINE_enum("codec_dtype", "bfloat16", ["float32", "bfloat16"],
                  "MusicVAE compute dtype on accelerators (+5-13% encode "
                  "throughput, round-trip accuracy unchanged).")
flags.DEFINE_integer("workers", None, "MIDI parser processes.")
flags.DEFINE_float("max_song_seconds", 3600.0,
                   "Skip songs longer than this (ref :61).")
flags.DEFINE_float("eval_fraction", 0.1, "Fraction of songs for eval split.")


def _parse_one(path):
    """Host-side: MIDI -> list of chunk tensors per track group.

    melody mode: monophonic melodies -> non-overlapping 2-bar chunks
    (2-bar converter, stride 2 over 1-bar-hop segments).
    multi mode: the whole multitrack sequence -> 1-bar per-instrument
    performance-event streams (``codec.performance``), one group per song.
    """
    from smd_tpu.codec import midi_io
    from smd_tpu.codec.melody import extract_melodies, melody_2bar_converter
    from smd_tpu.codec.performance import multiperf_default_1bar_converter
    try:
        ns = midi_io.read_midi_file(path)
    except Exception as e:  # malformed files are common in Lakh
        return path, [], f"parse error: {e}"
    if ns.total_time > FLAGS.max_song_seconds:
        return path, [], "too long"

    songs_chunks = []
    if FLAGS.mode in ("melody", "melody16"):
        if FLAGS.mode == "melody":
            converter, stride = melody_2bar_converter, 2
        else:
            from smd_tpu.config import melody_16bar_converter
            converter, stride = melody_16bar_converter, 16
        for melody in extract_melodies(ns):
            out = converter.to_tensors(melody)
            chunk_tensors = out.inputs[::stride]
            if chunk_tensors:
                songs_chunks.append(chunk_tensors)
    else:
        out = multiperf_default_1bar_converter.to_tensors(ns)
        if out.inputs:
            songs_chunks.append(out.inputs)
    return path, songs_chunks, None


def main(argv):
    del argv
    from smd_tpu.codec.musicvae import TrainedMusicVAE
    from smd_tpu.utils import io as io_lib

    try:
        import tensorflow as tf
        writer_cls = tf.io.TFRecordWriter
    except ImportError:
        raise RuntimeError("TensorFlow required for TFRecord output")

    files = sorted(glob.glob(os.path.expanduser(FLAGS.input), recursive=True))
    if FLAGS.max_songs:
        files = files[:FLAGS.max_songs]
    logging.info("Encoding %d MIDI files", len(files))

    import jax
    import jax.numpy as jnp
    codec_dtype = jnp.bfloat16 if (FLAGS.codec_dtype == "bfloat16" and
                                   jax.default_backend() != "cpu") \
        else jnp.float32
    params = io_lib.load(FLAGS.vae_params) if FLAGS.vae_params else None
    if FLAGS.mode in ("multi", "melody16"):
        from smd_tpu.config import MUSIC_VAE_CONFIG
        entry = MUSIC_VAE_CONFIG[
            "multi-1-big" if FLAGS.mode == "multi" else "melody-16-big"]
        model = TrainedMusicVAE(params=params, config=entry.model,
                                converter=entry.data_converter,
                                seed=FLAGS.checkpoint_seed,
                                compute_dtype=codec_dtype)
    else:
        model = TrainedMusicVAE(params=params, seed=FLAGS.checkpoint_seed,
                                compute_dtype=codec_dtype)

    os.makedirs(FLAGS.output, exist_ok=True)
    n_eval = max(1, int(len(files) * FLAGS.eval_fraction)) \
        if len(files) > 1 else 0
    writers = {
        "train": writer_cls(os.path.join(FLAGS.output,
                                         "training_seqs.tfrecord-00000")),
        "eval": writer_cls(os.path.join(FLAGS.output,
                                        "eval_seqs.tfrecord-00000")),
    }

    count = skipped = 0
    with concurrent.futures.ProcessPoolExecutor(FLAGS.workers) as pool:
        for path, songs_chunks, err in pool.map(_parse_one, files,
                                                chunksize=4):
            if err or not songs_chunks:
                skipped += 1
                continue
            split = "eval" if count < n_eval else "train"
            for chunk_tensors in songs_chunks:
                # Batched accelerator encode of all chunks of this melody.
                zs, mus, sigmas = [], [], []
                for i in range(0, len(chunk_tensors), FLAGS.encode_batch):
                    z, mu, sigma = model.encode_tensors(
                        chunk_tensors[i:i + FLAGS.encode_batch])
                    zs.append(z)
                    mus.append(mu)
                    sigmas.append(sigma)
                encoding = np.stack([np.concatenate(zs),
                                     np.concatenate(mus),
                                     np.concatenate(sigmas)])
                writers[split].write(pickle.dumps(encoding))
            count += 1
            if count % 100 == 0:
                logging.info("Encoded %d songs (%d skipped)", count, skipped)

    for w in writers.values():
        w.close()
    logging.info("Done: %d songs encoded, %d skipped", count, skipped)


if __name__ == "__main__":
    flags.mark_flag_as_required("input")
    app.run(main)
