"""Fit latent-compression transforms (slice / PCA / dim-weights).

Capability parity with the reference's
``scripts/generate_compressed_transform.py``: top-variance SliceTransform
(:59-82), sigma-based dimension weights for [3, n, 512] encodings (:99-109),
StandardScaler+PCA pipeline (:129-143), and SVD explained-variance analysis
(:111-126). Artifacts are pickles loadable by the training CLIs'
``--slice_ckpt`` / ``--pca_ckpt`` / ``--dim_weights_ckpt`` flags.
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
flags.DEFINE_string("encoded_data", None,
                    "Directory of encoded-song TFRecords ([3,n,512]).")
flags.DEFINE_string("output_path", "./checkpoints", "Output directory.")
flags.DEFINE_enum("transform", "slice", ["slice", "pca", "dim_weights"],
                  "Transform to fit.")
flags.DEFINE_integer("keep_dims", 42, "Dimensions to keep.")
flags.DEFINE_integer("max_vectors", 200000, "Latent vectors to fit on.")
flags.DEFINE_string("name", "slice-mel-512", "Artifact base name.")


def _collect(files, max_vectors):
    import tensorflow as tf
    zs, sigmas = [], []
    total = 0
    for rec in tf.data.TFRecordDataset(files).as_numpy_iterator():
        m = np.asarray(pickle.loads(rec))
        z, sigma = m[0], m[2]
        keep = np.linalg.norm(z, axis=1) > 1e-6
        zs.append(z[keep])
        sigmas.append(sigma[keep])
        total += keep.sum()
        if total >= max_vectors:
            break
    return (np.concatenate(zs)[:max_vectors],
            np.concatenate(sigmas)[:max_vectors])


def main(argv):
    del argv
    from smd_tpu.data import transforms
    from smd_tpu.utils import io as io_lib

    files = sorted(
        glob.glob(os.path.join(os.path.expanduser(FLAGS.encoded_data),
                               "training_seqs.tfrecord-*")))
    z, sigma = _collect(files, FLAGS.max_vectors)
    logging.info("Fitting on %d latent vectors", len(z))

    # Explained-variance analysis (reference :111-126).
    var = np.var(z, axis=0)
    order = np.argsort(var)[::-1]
    explained = np.cumsum(var[order]) / var.sum()
    logging.info("Top-%d dims explain %.1f%% of variance", FLAGS.keep_dims,
                 100 * explained[FLAGS.keep_dims - 1])

    os.makedirs(FLAGS.output_path, exist_ok=True)
    out = os.path.join(FLAGS.output_path, FLAGS.name + ".pkl")
    if FLAGS.transform == "slice":
        st = transforms.SliceTransform.fit(z, keep=FLAGS.keep_dims)
        io_lib.save(st.indices.astype(np.int64), out)
    elif FLAGS.transform == "pca":
        pt = transforms.fit_pca(z, n_components=FLAGS.keep_dims)
        io_lib.save(pt, out)
    else:
        io_lib.save(transforms.sigma_dim_weights(sigma), out)
    logging.info("Saved %s transform to %s", FLAGS.transform, out)


if __name__ == "__main__":
    flags.mark_flag_as_required("encoded_data")
    app.run(main)
