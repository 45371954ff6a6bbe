"""Native (TF-free) TFRecord reader vs. TF-written ground truth."""
import numpy as np
import pytest

from smd_tpu.data import records, tfrecord_native as tn


@pytest.fixture
def shard(tmp_path, np_rng):
    data = np_rng.normal(size=(12, 4, 6)).astype(np.float32)
    path = str(tmp_path / "x.tfrecord")
    records.write_tfrecord(path, data)
    return path, data


def test_scan_matches_tf(shard):
    path, data = shard
    extents = tn.scan_records(path, verify_crc=True)
    assert len(extents) == 12

    import tensorflow as tf
    tf_records = list(tf.data.TFRecordDataset(path).as_numpy_iterator())
    ours = tn.read_records(path)
    assert len(tf_records) == len(ours)
    for a, b in zip(tf_records, ours):
        assert a == b


def test_crc_detects_corruption(shard, tmp_path):
    path, _ = shard
    raw = bytearray(open(path, "rb").read())
    raw[40] ^= 0xFF  # flip a payload byte
    bad = str(tmp_path / "bad.tfrecord")
    open(bad, "wb").write(bytes(raw))
    if tn._load_native() is None:
        pytest.skip("native lib unavailable")
    with pytest.raises(ValueError):
        tn.scan_records(bad, verify_crc=True)


def test_parse_example_matches_written_data(shard):
    path, data = shard
    recs = tn.read_records(path)
    ex = tn.parse_example(recs[0])
    assert set(ex) == {"inputs", "input_shape"}
    np.testing.assert_array_equal(ex["input_shape"], [4, 6])
    np.testing.assert_allclose(ex["inputs"].reshape(4, 6), data[0],
                               rtol=1e-6)


def test_native_source_random_access(shard):
    path, data = shard
    src = tn.NativeTFRecordSource(path)
    assert len(src) == 12
    np.testing.assert_allclose(src[3]["inputs"], data[3], rtol=1e-6)
    np.testing.assert_allclose(src[11]["inputs"], data[11], rtol=1e-6)


def test_native_source_multi_shard(tmp_path, np_rng):
    a = np_rng.normal(size=(3, 2)).astype(np.float32)
    b = np_rng.normal(size=(5, 2)).astype(np.float32)
    records.write_tfrecord(str(tmp_path / "a.tfrecord"), a)
    records.write_tfrecord(str(tmp_path / "b.tfrecord"), b)
    src = tn.NativeTFRecordSource([str(tmp_path / "a.tfrecord"),
                                   str(tmp_path / "b.tfrecord")])
    assert len(src) == 8
    np.testing.assert_allclose(src[5]["inputs"], b[2], rtol=1e-6)


def test_python_fallback_scan(shard, monkeypatch):
    path, _ = shard
    extents_native = tn.scan_records(path)
    extents_py = tn._scan_python(path)
    assert extents_native == extents_py


def test_grain_integration(shard):
    """The source satisfies grain's random-access protocol."""
    grain = pytest.importorskip("grain")
    path, data = shard
    src = tn.NativeTFRecordSource(path)
    ds = grain.MapDataset.source(src).shuffle(seed=0).batch(4)
    batch = ds[0]
    assert batch["inputs"].shape == (4, 4, 6)
