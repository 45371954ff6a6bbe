"""TFRecord I/O with the reference's exact example schema.

Schema (``scripts/transform_encoded_data.py:71-92``):
    {'inputs': float_list | serialized bool tensor,
     'input_shape': int64_list}
optionally with 'targets'/'target_shape' in sequences mode.

Reading mirrors ``utils/data_utils.py:159-191``: file-pattern list ->
interleave(cycle=40, nondeterministic) -> shuffle(8*batch) -> parse.
TF stays host-side only (the reference forced TF off GPU at
``train_ncsn.py:561``; here TF never sees a device at all).
"""
from __future__ import annotations

import os
from functools import reduce

import numpy as np

try:
    import tensorflow as tf
    _HAS_TF = True
except ImportError:  # pragma: no cover
    tf = None
    _HAS_TF = False

__all__ = ["write_tfrecord", "get_tf_record_dataset", "serialize_example"]

AUTOTUNE = None if not _HAS_TF else tf.data.AUTOTUNE


def _float_feature(values):
    return tf.train.Feature(float_list=tf.train.FloatList(value=values))


def _int_feature(values):
    return tf.train.Feature(int64_list=tf.train.Int64List(value=values))


def _bytes_feature(value):
    return tf.train.Feature(bytes_list=tf.train.BytesList(value=[value]))


def serialize_example(input_tensor, target_tensor=None, tokens=False):
    """One tf.train.Example in the reference's schema."""
    input_tensor = np.asarray(input_tensor)
    if tokens:
        feat = _bytes_feature(
            tf.io.serialize_tensor(input_tensor.astype(bool)).numpy())
    else:
        feat = _float_feature(input_tensor.reshape(-1).astype(np.float32))
    features = {"inputs": feat, "input_shape": _int_feature(input_tensor.shape)}
    if target_tensor is not None:
        target_tensor = np.asarray(target_tensor)
        features["targets"] = _float_feature(
            target_tensor.reshape(-1).astype(np.float32))
        features["target_shape"] = _int_feature(target_tensor.shape)
    ex = tf.train.Example(features=tf.train.Features(feature=features))
    return ex.SerializeToString()


def write_tfrecord(path, examples, targets=None, tokens=False):
    """Write a shard of examples (optionally with targets) to ``path``."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with tf.io.TFRecordWriter(path) as writer:
        for i, ex in enumerate(examples):
            tgt = targets[i] if targets is not None else None
            writer.write(serialize_example(ex, tgt, tokens))


def _decode_record(record, flattened_shape, shape_len, tokens=False):
    if not tokens:
        input_parser = tf.io.FixedLenFeature([flattened_shape], tf.float32)
    else:
        input_parser = tf.io.FixedLenFeature((), tf.string)
    parsed = tf.io.parse_example(
        record, {
            "inputs": input_parser,
            "input_shape": tf.io.FixedLenFeature([shape_len], tf.int64),
        })
    if tokens:
        parsed["inputs"] = tf.io.parse_tensor(parsed["inputs"],
                                              out_type=tf.bool)
    parsed["inputs"] = tf.reshape(parsed["inputs"], parsed["input_shape"])
    return parsed


def get_tf_record_dataset(file_pattern, shape=(512,), batch_size=512,
                          shuffle=True, tokens=False):
    """File pattern -> parsed tf.data.Dataset of {'inputs': ...} dicts."""
    filenames = tf.data.Dataset.list_files(os.path.expanduser(file_pattern),
                                           shuffle=shuffle)
    dataset = filenames.interleave(map_func=tf.data.TFRecordDataset,
                                   cycle_length=40,
                                   num_parallel_calls=AUTOTUNE,
                                   deterministic=False)
    if shuffle:
        dataset = dataset.shuffle(8 * batch_size)
    flattened = reduce(lambda x, y: x * y, shape)
    decode = lambda x: _decode_record(x, flattened, len(shape), tokens)
    return dataset.map(decode, num_parallel_calls=AUTOTUNE)
