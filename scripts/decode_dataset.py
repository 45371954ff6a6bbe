"""Decode latent TFRecords back into one-hot token grids.

Capability parity with the reference's ``scripts/decode_dataset_beam.py``
(broken imports fixed — SURVEY.md §7 item 4): reads encoded-song TFRecords of
pickled [3, n, 512] matrices, decodes z through the MusicVAE decoder, and
writes boolean one-hot event tensors for token-level baselines.
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
flags.DEFINE_string("encoded_data", None, "Encoded TFRecord directory.")
flags.DEFINE_string("output", "./output/decoded", "Output directory.")
flags.DEFINE_integer("max_songs", None, "Max songs to decode.")
flags.DEFINE_integer("decode_batch", 128, "Latents per decode batch.")
flags.DEFINE_string("vae_params", "", "Optional pickled MusicVAE params.")


def main(argv):
    del argv
    import tensorflow as tf
    from smd_tpu.codec.melody import VOCAB_SIZE
    from smd_tpu.codec.musicvae import TrainedMusicVAE
    from smd_tpu.utils import io as io_lib

    params = io_lib.load(FLAGS.vae_params) if FLAGS.vae_params else None
    model = TrainedMusicVAE(params=params)

    os.makedirs(FLAGS.output, exist_ok=True)
    base = os.path.expanduser(FLAGS.encoded_data)
    for pattern, split in (("training_seqs.tfrecord-*", "train"),
                           ("eval_seqs.tfrecord-*", "eval")):
        files = sorted(glob.glob(os.path.join(base, pattern)))
        if not files:
            continue
        out_path = os.path.join(FLAGS.output,
                                f"decoded-{split}.tfrecord-00000")
        count = 0
        with tf.io.TFRecordWriter(out_path) as writer:
            for rec in tf.data.TFRecordDataset(files).as_numpy_iterator():
                if FLAGS.max_songs is not None and count >= FLAGS.max_songs:
                    break
                m = np.asarray(pickle.loads(rec))
                z = m[0]
                tokens = []
                for i in range(0, len(z), FLAGS.decode_batch):
                    samples = model.decode_to_tensors(z[i:i +
                                                        FLAGS.decode_batch])
                    onehot = np.eye(VOCAB_SIZE,
                                    dtype=bool)[samples]  # (B, T, 90)
                    tokens.append(onehot.reshape(-1, VOCAB_SIZE))
                song_tokens = np.concatenate(tokens)
                writer.write(pickle.dumps(song_tokens))
                count += 1
        logging.info("Decoded %d songs to %s", count, out_path)


if __name__ == "__main__":
    flags.mark_flag_as_required("encoded_data")
    app.run(main)
