"""Transform encoded-song TFRecords into training datasets.

Capability parity with the reference's ``scripts/transform_encoded_data.py``:
modes ``flatten`` (individual latents, zero vectors dropped), ``sequences``
(sliding context windows + next-latent targets), ``decoded`` (one-hot token
grids padded to 1024), toy-data substitution, 2^17-example shards, tfrecord
or pkl output with the exact example schema (``:71-92``).
"""
from __future__ import annotations

import glob
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from absl import app, flags, logging

FLAGS = flags.FLAGS
flags.DEFINE_boolean("toy_data", False, "Create a toy dataset.")
flags.DEFINE_string("encoded_data", "~/data/encoded_lmd",
                    "Path to encoded data TFRecord directory.")
flags.DEFINE_string("output_path", "./output/transform/", "Output directory.")
flags.DEFINE_integer("shard_size", 2**17, "Number of vectors per shard.")
flags.DEFINE_enum("output_format", "tfrecord", ["tfrecord", "pkl"],
                  "Shard file type.")
flags.DEFINE_enum("mode", "flatten", ["flatten", "sequences", "decoded"],
                  "Transformation mode.")
flags.DEFINE_boolean("remove_zeros", True, "Remove zero vectors.")
flags.DEFINE_integer("context_length", 4,
                     "The length of the context window in a sequence.")
flags.DEFINE_integer("stride", 1, "The stride used for generating sequences.")
flags.DEFINE_integer("max_songs", None, "Maximum number of songs to process.")
flags.DEFINE_integer("max_examples", None,
                     "Maximum number of examples to process.")


def _iter_encoded_records(files):
    import tensorflow as tf
    for rec in tf.data.TFRecordDataset(files).as_numpy_iterator():
        yield pickle.loads(rec)


def _save_shard(contexts, targets, output_path):
    from smd_tpu.data import records
    from smd_tpu.utils import io as io_lib

    if FLAGS.mode in ("flatten", "decoded"):
        shard = targets[:FLAGS.shard_size]
        dtype = bool if FLAGS.mode == "decoded" else np.float32
        shard = np.stack(shard).astype(dtype)
        targets = targets[FLAGS.shard_size:]
        shard_examples, shard_targets = shard, None
    else:  # sequences
        shard_examples = np.stack(
            contexts[:FLAGS.shard_size]).astype(np.float32)
        shard_targets = np.stack(
            targets[:FLAGS.shard_size]).astype(np.float32)
        contexts = contexts[FLAGS.shard_size:]
        targets = targets[FLAGS.shard_size:]

    output_path += "." + FLAGS.output_format
    if FLAGS.output_format == "pkl":
        if shard_targets is None:
            io_lib.save(shard_examples, output_path)
        else:
            io_lib.save((shard_examples, shard_targets), output_path)
    else:
        records.write_tfrecord(output_path, shard_examples,
                               targets=shard_targets,
                               tokens=FLAGS.mode == "decoded")
    logging.info("Saved to %s", output_path)
    return contexts, targets


def main(argv):
    del argv
    from smd_tpu.data.synthetic import toy_distribution

    if FLAGS.mode == "decoded":
        globs = ("decoded-train.tfrecord-*", "decoded-eval.tfrecord-*")
    else:
        globs = ("training_seqs.tfrecord-*", "eval_seqs.tfrecord-*")

    base = os.path.expanduser(FLAGS.encoded_data)
    rng = np.random.default_rng(0)
    for pattern, split in zip(globs, ("train", "eval")):
        files = sorted(glob.glob(os.path.join(base, pattern)))
        if not files:
            logging.warning("No files for split %s (%s)", split, pattern)
            continue

        contexts, targets = [], []
        count = discard = example_count = 0
        should_terminate = False
        songs = 0
        for song_data in _iter_encoded_records(files):
            song_embeddings = np.asarray(song_data)
            songs += 1
            if FLAGS.max_songs is not None and songs > FLAGS.max_songs:
                break

            if FLAGS.mode != "decoded":
                assert song_embeddings.ndim == 3 and \
                    song_embeddings.shape[0] == 3
                song = song_embeddings[0]  # z component
            else:
                song = song_embeddings
                if song.shape[0] < 896:
                    discard += 1
                    continue
                pad_len = 1024 - song.shape[0]
                padding = np.zeros((pad_len, song.shape[-1]))
                padding[:, 0] = 1.0
                song = np.concatenate((song, padding))
                example_count += 1
                targets.append(song)

            if FLAGS.toy_data:
                song = toy_distribution(batch_size=len(song), rng=rng)

            if FLAGS.mode == "flatten":
                for vec in song:
                    if FLAGS.remove_zeros and np.linalg.norm(vec) < 1e-6:
                        continue
                    if FLAGS.max_examples is not None and \
                            example_count >= FLAGS.max_examples:
                        should_terminate = True
                        break
                    example_count += 1
                    targets.append(vec)
            elif FLAGS.mode == "sequences":
                ctx = FLAGS.context_length
                for i in range(0, len(song) - ctx, FLAGS.stride):
                    context = song[i:i + ctx]
                    if FLAGS.remove_zeros and \
                            (np.linalg.norm(context, axis=1) < 1e-6).any():
                        continue
                    if FLAGS.max_examples is not None and \
                            example_count >= FLAGS.max_examples:
                        should_terminate = True
                        break
                    example_count += 1
                    contexts.append(context)
                    targets.append(song[i + ctx])

            if len(targets) >= FLAGS.shard_size:
                contexts, targets = _save_shard(
                    contexts, targets,
                    f"{FLAGS.output_path}/{split}-{count:04d}")
                count += 1
            if should_terminate:
                break

        logging.info("Discarded %d invalid sequences.", discard)
        if targets:
            _save_shard(contexts, targets,
                        f"{FLAGS.output_path}/{split}-{count:04d}")


if __name__ == "__main__":
    app.run(main)
