import numpy as np
import pytest

from smd_tpu.data import pipeline, records, synthetic, transforms


def test_toy_distribution_statistics(np_rng):
    x = synthetic.toy_distribution(20000, np_rng)
    assert x.shape == (20000, 2)
    # 0.8*5 + 0.2*(-5) = 3
    np.testing.assert_allclose(x.mean(axis=0), 3.0, atol=0.15)
    frac_pos = (x[:, 0] > 0).mean()
    assert abs(frac_pos - 0.8) < 0.02


def test_toy_sequence_distribution_shape(np_rng):
    x = synthetic.toy_sequence_distribution(10, 64, np_rng)
    assert x.shape == (64, 10, 2)


def test_tfrecord_roundtrip(tmp_path, np_rng):
    data = np_rng.normal(size=(32, 4, 8)).astype(np.float32)
    path = str(tmp_path / "train-0000.tfrecord")
    records.write_tfrecord(path, data)
    ds = records.get_tf_record_dataset(str(tmp_path / "train-*.tfrecord"),
                                       shape=(4, 8), batch_size=8,
                                       shuffle=False)
    got = np.stack([ex["inputs"] for ex in ds.as_numpy_iterator()])
    np.testing.assert_allclose(np.sort(got.reshape(-1)),
                               np.sort(data.reshape(-1)), rtol=1e-6)


def test_normalize_inverse_roundtrip(np_rng):
    x = np_rng.normal(size=(16, 10)).astype(np.float32) * 3
    lo, hi = x.min(), x.max()
    n = transforms.normalize(x, lo, hi)
    assert n.min() >= -1 - 1e-6 and n.max() <= 1 + 1e-6
    back = transforms.inverse_data_transform(n, True, None, lo, hi)
    np.testing.assert_allclose(back, x, rtol=1e-4, atol=1e-5)


def test_slice_transform_roundtrip(np_rng):
    x = np_rng.normal(size=(64, 512)).astype(np.float32)
    # make dims 0..41 high variance
    x[:, :42] *= 10
    st = transforms.SliceTransform.fit(x, keep=42)
    np.testing.assert_array_equal(st.indices, np.arange(42))
    y = st.transform(x)
    assert y.shape == (64, 42)
    back = st.inverse_transform(y, out_channels=512,
                                rng=np.random.default_rng(0))
    # kept dims restored exactly; dropped dims filled with noise
    np.testing.assert_allclose(back[:, :42], x[:, :42], rtol=1e-6)
    assert back.shape == (64, 512)


def test_pca_transform_roundtrip(np_rng):
    x = np_rng.normal(size=(256, 16)).astype(np.float32)
    pt = transforms.fit_pca(x, n_components=16)
    y = pt.transform(x)
    back = pt.inverse_transform(y)
    np.testing.assert_allclose(back, x, atol=1e-4)


def test_dim_weights(np_rng):
    sigma = np.abs(np_rng.normal(size=(100, 8))) + 0.5
    w = transforms.sigma_dim_weights(sigma)
    assert w.shape == (8,)
    np.testing.assert_allclose(w, 1 / sigma.mean(axis=0), rtol=1e-6)


@pytest.fixture
def toy_dataset_dir(tmp_path, np_rng):
    for split in ("train", "eval"):
        data = synthetic.toy_distribution(256, np_rng)
        records.write_tfrecord(str(tmp_path / f"{split}-0000.tfrecord"), data)
    return str(tmp_path)


def test_get_dataset_toy(toy_dataset_dir):
    train, evald = pipeline.get_dataset(dataset=toy_dataset_dir,
                                        data_shape=(2,), problem="toy",
                                        batch_size=32, normalize=True)
    batch = next(iter(train))
    assert batch.shape == (32, 2)
    assert batch.min() >= -1 - 1e-6 and batch.max() <= 1 + 1e-6
    assert train.examples == 8  # 256 / 32 batches
    # min/max caching works: second call reads the cache
    train2, _ = pipeline.get_dataset(dataset=toy_dataset_dir, data_shape=(2,),
                                     problem="toy", batch_size=32,
                                     normalize=True)
    assert train2.min == train.min and train2.max == train.max


def test_get_dataset_slice(toy_dataset_dir, tmp_path, np_rng):
    from smd_tpu.utils import io as io_lib
    slice_path = str(tmp_path / "slice.pkl")
    io_lib.save(np.array([0], dtype=np.int64), slice_path)
    train, _ = pipeline.get_dataset(dataset=toy_dataset_dir, data_shape=(2,),
                                    problem="toy", batch_size=16,
                                    normalize=False, slice_ckpt=slice_path,
                                    include_cardinality=False)
    batch = next(iter(train))
    assert batch.shape == (16, 1)


def test_take_examples(toy_dataset_dir):
    train, _ = pipeline.get_dataset(dataset=toy_dataset_dir, data_shape=(2,),
                                    problem="toy", batch_size=32,
                                    normalize=False,
                                    include_cardinality=False)
    arr = train.take_examples(50)
    assert arr.shape == (50, 2)


def test_tokens_problem(tmp_path, np_rng):
    """'tokens' problem: boolean one-hot grids parse via serialized tensors."""
    data = np.zeros((16, 8, 5), dtype=bool)
    idx = np_rng.integers(0, 5, size=(16, 8))
    for i in range(16):
        data[i, np.arange(8), idx[i]] = True
    for split in ("train", "eval"):
        records.write_tfrecord(str(tmp_path / f"{split}-0000.tfrecord"), data,
                               tokens=True)
    train, _ = pipeline.get_dataset(dataset=str(tmp_path), data_shape=(8, 5),
                                    problem="tokens", batch_size=4,
                                    normalize=False,
                                    include_cardinality=False)
    batch = next(iter(train))
    assert batch.shape == (4, 8, 5)
    assert batch.dtype == bool
    assert (batch.sum(-1) == 1).all()


def test_compute_dataset_statistics(tmp_path, np_rng):
    import tensorflow as tf
    data = np_rng.normal(loc=3.0, size=(64, 4)).astype(np.float32)
    ds = tf.data.Dataset.from_tensor_slices(data).batch(8)
    mean, std = pipeline.compute_dataset_statistics(ds, cache_dir=str(tmp_path))
    np.testing.assert_allclose(mean.mean(), 3.0, atol=0.5)
    # cached second call
    mean2, _ = pipeline.compute_dataset_statistics(ds,
                                                   cache_dir=str(tmp_path))
    np.testing.assert_allclose(mean, mean2)


def test_mnist_problem_offline_fallback(monkeypatch):
    """--problem=mnist runs on sklearn's bundled digits when no $MNIST_NPZ."""
    import numpy as np
    from smd_tpu.data import pipeline
    monkeypatch.delenv("MNIST_NPZ", raising=False)
    train, _ = pipeline.get_dataset(problem="mnist", data_shape=(28, 28, 1),
                                    batch_size=16,
                                    include_cardinality=False)
    batch = next(iter(train))
    batch = np.asarray(batch)
    assert batch.shape == (16, 28 * 28)
    assert batch.min() >= -1.0 and batch.max() <= 1.0
    assert batch.max() > 0.5   # actual bright digit pixels
