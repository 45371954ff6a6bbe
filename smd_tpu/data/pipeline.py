"""Input pipeline: TFRecord latents -> transformed, normalized device batches.

Parity with the reference's ``input_pipeline.py`` (``get_dataset`` :113,
``inverse_data_transform`` :78) and ``utils/data_utils.py`` min/max +
cardinality caching (:63-156). Differences by design:

- transforms (slice / dim-weights / PCA / normalize) run inside the tf.data
  graph as vectorized TF ops — no ``tf.py_function`` bottleneck for PCA
  (the reference funneled every batch through Python, ``input_pipeline.py:161``);
- the returned ``Dataset`` owns its min/max/cardinality instead of gluing
  attributes onto a tf.data object;
- iteration yields numpy arrays ready for ``jax.device_put`` with a sharded
  layout (per-host sharding hook: ``shard_index/shard_count``).
"""
from __future__ import annotations

import dataclasses
import os
from typing import Iterator, Optional

import numpy as np

try:
    import tensorflow as tf
    _HAS_TF = True
except ImportError:  # pragma: no cover
    tf = None
    _HAS_TF = False

from absl import logging

from smd_tpu.data import records, transforms
from smd_tpu.utils import io as io_lib

__all__ = ["Dataset", "get_dataset", "inverse_data_transform"]

# Re-export for CLI parity with input_pipeline.inverse_data_transform.
inverse_data_transform = transforms.inverse_data_transform


@dataclasses.dataclass
class Dataset:
    """A batched dataset plus its normalization statistics."""
    ds: "tf.data.Dataset"
    min: float = 0.0
    max: float = 1.0
    examples: int = -1   # number of batches per epoch (reference semantics)

    def __iter__(self) -> Iterator[np.ndarray]:
        for batch in self.ds.as_numpy_iterator():
            yield batch

    def take_examples(self, n: Optional[int]) -> np.ndarray:
        """Unbatch and materialize up to n examples as one array."""
        out, count = [], 0
        for batch in self:
            out.append(batch)
            count += batch.shape[0]
            if n is not None and count >= n:
                break
        arr = np.concatenate(out, axis=0)
        return arr[:n] if n is not None else arr


def _cache_path(cache_dir, split, config, stat):
    return os.path.join(cache_dir, f"cache/{split}_{config}_{stat}.pkl")


def _compute_min_max(ds, split, cache_dir, config):
    min_p = _cache_path(cache_dir, split, config, "min")
    max_p = _cache_path(cache_dir, split, config, "max")
    if os.path.exists(min_p) and os.path.exists(max_p):
        logging.info("Using cached dataset min/max at %s", cache_dir)
        return io_lib.load(min_p), io_lib.load(max_p)
    ds_min = ds.map(tf.reduce_min).reduce(tf.float32.max, tf.math.minimum)
    ds_max = ds.map(tf.reduce_max).reduce(tf.float32.min, tf.math.maximum)
    ds_min, ds_max = float(ds_min.numpy()), float(ds_max.numpy())
    if cache_dir:
        io_lib.save(ds_min, min_p)
        io_lib.save(ds_max, max_p)
    return ds_min, ds_max


def compute_dataset_statistics(ds, split="train", cache_dir="", config=""):
    """Mean/std over a batched dataset, pickle-cached
    (reference ``utils/data_utils.py:93-125``)."""
    mean_p = _cache_path(cache_dir, split, config, "mean")
    std_p = _cache_path(cache_dir, split, config, "stddev")
    if os.path.exists(mean_p) and os.path.exists(std_p):
        return io_lib.load(mean_p), io_lib.load(std_p)
    count, total, total_sq = 0, 0.0, 0.0
    for batch in ds.as_numpy_iterator():
        count += 1
        total += batch.astype(np.float64)
        total_sq += batch.astype(np.float64)**2
    mean = total / max(count, 1)
    std = np.sqrt(total_sq / max(count, 1) - mean**2)
    if cache_dir:
        io_lib.save(mean, mean_p)
        io_lib.save(std, std_p)
    return mean, std


def _compute_cardinality(ds, split, cache_dir, config):
    path = _cache_path(cache_dir, split, config, "cardinality")
    if os.path.exists(path):
        return io_lib.load(path)
    n = int(ds.cardinality().numpy())
    if n < 0:
        n = sum(1 for _ in ds.as_numpy_iterator())
    if cache_dir:
        io_lib.save(n, path)
    return n


def _sklearn_digits_as_mnist():
    """sklearn's bundled 1797 8x8 digits upscaled to MNIST's 28x28 uint8.

    The offline stand-in for tfds MNIST (reference input_pipeline.py:122-124)
    when no $MNIST_NPZ file is provided: real handwritten-digit images with
    the same tensor contract (N, 28, 28) uint8 0..255.
    """
    try:
        from sklearn.datasets import load_digits
    except ImportError as e:   # pragma: no cover
        raise RuntimeError(
            "MNIST problem needs $MNIST_NPZ (x_train/x_test arrays) or "
            "scikit-learn's bundled digits") from e
    images = load_digits().images.astype(np.float32)   # (1797, 8, 8), 0..16
    images = np.kron(images, np.ones((1, 3, 3), np.float32))   # -> 24x24
    images = np.pad(images, ((0, 0), (2, 2), (2, 2)))
    images = np.clip(images * (255.0 / 16.0), 0, 255).astype(np.uint8)
    n_eval = len(images) // 10
    return images[n_eval:], images[:n_eval]


def get_dataset(dataset="",
                data_shape=(2,),
                problem="vae",
                batch_size=128,
                normalize=True,
                pca_ckpt="",
                slice_ckpt="",
                dim_weights_ckpt="",
                include_cardinality=True,
                shuffle=True,
                shard_index=0,
                shard_count=1):
    """Build (train, eval) Dataset pairs for a problem.

    problems: 'vae' | 'toy' | 'tokens' read ``{dataset}/{split}-*.tfrecord``;
    'mnist' loads tensorflow_datasets MNIST when available.
    """
    if not _HAS_TF:
        raise RuntimeError("TensorFlow is required for the TFRecord pipeline")

    shape = tuple(int(s) for s in data_shape)
    if problem == "mnist":
        # tensorflow_datasets is not in this image; accept a local npz with
        # x_train/x_test arrays (the keras mnist.npz layout) via $MNIST_NPZ,
        # matching the reference's tfds.load('mnist') capability offline.
        # Fallback: sklearn's bundled 8x8 digits, nearest-upscaled to 28x28,
        # so --problem=mnist runs on real digit images out of the box.
        npz_path = os.environ.get("MNIST_NPZ", "")
        if npz_path and os.path.exists(npz_path):
            with np.load(npz_path) as d:
                x_train, x_test = d["x_train"], d["x_test"]
        else:
            x_train, x_test = _sklearn_digits_as_mnist()
        train_ds = tf.data.Dataset.from_tensor_slices(
            {"image": x_train}).shuffle(10000)
        eval_ds = tf.data.Dataset.from_tensor_slices({"image": x_test})
        key = "image"
    elif problem in ("vae", "toy", "tokens"):
        tokens = problem == "tokens"
        train_ds = records.get_tf_record_dataset(
            f"{dataset}/train-*.tfrecord", shape=shape, batch_size=batch_size,
            shuffle=shuffle, tokens=tokens)
        eval_ds = records.get_tf_record_dataset(
            f"{dataset}/eval-*.tfrecord", shape=shape, batch_size=batch_size,
            shuffle=shuffle, tokens=tokens)
        key = "inputs"
    else:
        raise ValueError(f"Unknown problem type: {problem}")

    if shard_count > 1:
        train_ds = train_ds.shard(shard_count, shard_index)
        eval_ds = eval_ds.shard(shard_count, shard_index)

    pca = io_lib.load(os.path.expanduser(pca_ckpt)) if pca_ckpt else None
    slice_idx = io_lib.load(
        os.path.expanduser(slice_ckpt)) if slice_ckpt else None
    dim_weights = io_lib.load(
        os.path.expanduser(dim_weights_ckpt)) if dim_weights_ckpt else None

    def build(ds):
        ds = ds.batch(batch_size, drop_remainder=True)
        ds = ds.map(lambda d: d[key], num_parallel_calls=records.AUTOTUNE)
        if problem == "mnist":
            ds = ds.map(
                lambda b: 2.0 * (tf.cast(
                    tf.reshape(b, (batch_size, -1)), tf.float32) / 255.) - 1.,
                num_parallel_calls=records.AUTOTUNE)
        elif problem != "tokens":
            if pca is not None:
                comps = tf.constant(pca.pca.components_, tf.float32)
                mean = tf.constant(pca.scaler.mean_, tf.float32)
                scale = tf.constant(pca.scaler.scale_, tf.float32)
                pmean = tf.constant(pca.pca.mean_, tf.float32)

                def tf_pca(b):
                    flat = tf.reshape(b, (tf.shape(b)[0], -1))
                    z = (flat - mean) / scale
                    return tf.matmul(z - pmean, comps, transpose_b=True)

                ds = ds.map(tf_pca, num_parallel_calls=records.AUTOTUNE)
            if dim_weights is not None:
                w = tf.constant(np.asarray(dim_weights), tf.float32)
                ds = ds.map(lambda b: b * w,
                            num_parallel_calls=records.AUTOTUNE)
            if slice_idx is not None:
                idx = tf.constant(np.asarray(slice_idx), tf.int64)
                ds = ds.map(lambda b: tf.gather(b, idx, axis=-1),
                            num_parallel_calls=records.AUTOTUNE)
        return ds

    train_tf, eval_tf = build(train_ds), build(eval_ds)

    config_name = "".join(
        p.split("/")[-1].split(".")[0]
        for p in (pca_ckpt, slice_ckpt, dim_weights_ckpt))
    cache_dir = os.path.expanduser(dataset) if dataset else ""

    train_min = eval_min = 0.0
    train_max = eval_max = 1.0
    if normalize and problem != "mnist":
        logging.info("Normalizing dataset to have range [-1, 1].")
        train_min, train_max = _compute_min_max(train_tf, "train", cache_dir,
                                                config_name)
        eval_min, eval_max = _compute_min_max(eval_tf, "eval", cache_dir,
                                              config_name)
        train_tf = train_tf.map(
            lambda b: transforms.normalize(b, train_min, train_max),
            num_parallel_calls=records.AUTOTUNE)
        eval_tf = eval_tf.map(
            lambda b: transforms.normalize(b, eval_min, eval_max),
            num_parallel_calls=records.AUTOTUNE)

    train_tf = train_tf.prefetch(records.AUTOTUNE)
    eval_tf = eval_tf.prefetch(records.AUTOTUNE).cache()

    train = Dataset(train_tf, train_min, train_max)
    evald = Dataset(eval_tf, eval_min, eval_max)

    if include_cardinality:
        train.examples = _compute_cardinality(train_tf, "train", cache_dir,
                                              str(batch_size))
        evald.examples = _compute_cardinality(eval_tf, "eval", cache_dir,
                                              str(batch_size))
    return train, evald
