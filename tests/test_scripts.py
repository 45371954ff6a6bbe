"""End-to-end dataset-generation pipeline tests (MIDI -> latents -> dataset).

Runs the scripts as subprocesses (absl flags are process-global).
"""
import glob
import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, timeout=420):
    env = dict(os.environ)
    env["SMD_TPU_PLATFORM"] = "cpu"
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_cache"
    env["TF_CPP_MIN_LOG_LEVEL"] = "3"
    proc = subprocess.run([sys.executable] + args, cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=timeout)
    if proc.returncode != 0:
        raise AssertionError(f"script failed ({args}):\n{proc.stdout[-1500:]}"
                             f"\n{proc.stderr[-4000:]}")
    return proc


@pytest.fixture(scope="module")
def midi_dir(tmp_path_factory):
    """Write a handful of synthetic melodic MIDI files."""
    from smd_tpu.codec import midi_io
    from smd_tpu.codec.note_sequence import NoteSequence, Tempo, TimeSignature
    d = tmp_path_factory.mktemp("midi")
    rng = np.random.default_rng(0)
    for i in range(4):
        ns = NoteSequence(tempos=[Tempo(qpm=120)],
                         time_signatures=[TimeSignature()])
        t = 0.0
        for _ in range(48):  # 12s = 6 bars
            pitch = int(rng.integers(55, 80))
            ns.add_note(pitch, 80, t, t + 0.2)
            t += 0.25
        midi_io.write_midi_file(ns, str(d / f"song_{i}.mid"))
    return str(d)


@pytest.mark.slow
def test_generate_transform_fit_pipeline(midi_dir, tmp_path):
    encoded = str(tmp_path / "encoded")
    # Tiny VAE via default seed — capability test, not quality.
    _run(["scripts/generate_song_data.py", f"--input={midi_dir}/*.mid",
          f"--output={encoded}", "--mode=melody", "--eval_fraction=0.25",
          "--workers=2"])
    files = glob.glob(f"{encoded}/training_seqs.tfrecord-*")
    assert files

    import tensorflow as tf
    recs = list(tf.data.TFRecordDataset(files).as_numpy_iterator())
    assert recs
    m = pickle.loads(recs[0])
    assert m.ndim == 3 and m.shape[0] == 3 and m.shape[2] == 512

    # transform: flatten
    flat = str(tmp_path / "flat")
    os.makedirs(flat, exist_ok=True)
    _run(["scripts/transform_encoded_data.py", f"--encoded_data={encoded}",
          f"--output_path={flat}", "--mode=flatten"])
    assert glob.glob(f"{flat}/train-*.tfrecord")

    # transform: sequences with short context
    seqs = str(tmp_path / "seqs")
    os.makedirs(seqs, exist_ok=True)
    _run(["scripts/transform_encoded_data.py", f"--encoded_data={encoded}",
          f"--output_path={seqs}", "--mode=sequences", "--context_length=2",
          "--noremove_zeros"])
    assert glob.glob(f"{seqs}/train-*.tfrecord")

    # fit a slice transform from the encoded data
    ckpt = str(tmp_path / "ckpt")
    _run(["scripts/generate_compressed_transform.py",
          f"--encoded_data={encoded}", f"--output_path={ckpt}",
          "--transform=slice", "--keep_dims=8", "--name=slice-test"])
    idx = pickle.load(open(f"{ckpt}/slice-test.pkl", "rb"))
    assert idx.shape == (8,) and idx.dtype == np.int64

    # the training pipeline can read the flattened data with the slice
    from smd_tpu.data import pipeline
    train, _ = pipeline.get_dataset(dataset=flat, data_shape=(512,),
                                    problem="vae", batch_size=4,
                                    normalize=True,
                                    slice_ckpt=f"{ckpt}/slice-test.pkl",
                                    include_cardinality=False)
    batch = next(iter(train))
    assert batch.shape == (4, 8)
    assert np.isfinite(batch).all()


@pytest.mark.slow
def test_sample_audio_script(tmp_path):
    """Latent pickles -> MIDI + WAV + plots through the native synth."""
    from smd_tpu.utils import io as io_lib
    rng = np.random.default_rng(0)
    sample_dir = str(tmp_path / "samples")
    io_lib.save(rng.normal(size=(2, 4, 512)), f"{sample_dir}/generated.pkl")
    io_lib.save(rng.normal(size=(2, 4, 512)), f"{sample_dir}/real.pkl")

    out = str(tmp_path / "audio")
    _run(["scripts/sample_audio.py", f"--input={sample_dir}",
          f"--output={out}", "--n_synth=1", "--sample_rate=8000"])
    for group in ("generated", "real", "prior"):
        assert os.path.exists(f"{out}/{group}/000.mid")
        assert os.path.exists(f"{out}/{group}/000.wav")
        assert os.path.exists(f"{out}/{group}/000.png")


@pytest.mark.slow
def test_generate_song_data_multi_mode(tmp_path, tmp_path_factory):
    """multi mode encodes 1-bar multitrack grids via the trio-style converter."""
    from smd_tpu.codec import midi_io
    from smd_tpu.codec.note_sequence import NoteSequence, Tempo, TimeSignature
    d = tmp_path_factory.mktemp("multimidi")
    rng = np.random.default_rng(0)
    for i in range(2):
        ns = NoteSequence(tempos=[Tempo(qpm=120)],
                         time_signatures=[TimeSignature()])
        t = 0.0
        for _ in range(24):
            ns.add_note(int(rng.integers(60, 72)), 80, t, t + 0.2,
                        instrument=0, program=0)
            ns.add_note(int(rng.integers(36, 48)), 80, t, t + 0.4,
                        instrument=1, program=33)
            t += 0.25
        midi_io.write_midi_file(ns, str(d / f"m{i}.mid"))

    encoded = str(tmp_path / "enc_multi")
    _run(["scripts/generate_song_data.py", f"--input={d}/*.mid",
          f"--output={encoded}", "--mode=multi", "--eval_fraction=0.5",
          "--workers=1", "--encode_batch=8"], timeout=500)
    files = glob.glob(f"{encoded}/training_seqs.tfrecord-*")
    assert files
    import tensorflow as tf
    recs = list(tf.data.TFRecordDataset(files).as_numpy_iterator())
    m = pickle.loads(recs[0])
    assert m.ndim == 3 and m.shape[0] == 3 and m.shape[2] == 512


@pytest.mark.slow
def test_generate_song_data_melody16_mode(tmp_path, tmp_path_factory):
    """melody16 mode encodes non-overlapping 16-bar chunks through the
    hierdec codec (shipped artifact or seeded random weights)."""
    from scripts.make_melody_corpus import make_song
    from smd_tpu.codec import midi_io
    d = tmp_path_factory.mktemp("mel16midi")
    rng = np.random.default_rng(3)
    for i in range(2):
        midi_io.write_midi_file(make_song(rng, min_bars=20, max_bars=36),
                                str(d / f"m{i}.mid"))

    encoded = str(tmp_path / "enc_mel16")
    _run(["scripts/generate_song_data.py", f"--input={d}/*.mid",
          f"--output={encoded}", "--mode=melody16", "--eval_fraction=0.5",
          "--workers=1", "--encode_batch=8"], timeout=500)
    files = glob.glob(f"{encoded}/training_seqs.tfrecord-*")
    assert files
    import tensorflow as tf
    recs = list(tf.data.TFRecordDataset(files).as_numpy_iterator())
    m = pickle.loads(recs[0])
    assert m.ndim == 3 and m.shape[0] == 3 and m.shape[2] == 512


@pytest.mark.slow
def test_full_workflow_benchmark_inline(tmp_path):
    """The headline workflow benchmark runs end to end (tiny step budget):
    corpus -> codec -> encode -> diffusion -> DDIM -> decode -> OA."""
    import json

    proc = _run(["benchmarks/full_workflow.py", "--codec=inline",
                 "--vae_steps=40", "--steps=40"], timeout=540)
    out = json.loads(proc.stdout)
    assert out["vae"]["steps"] == 40
    assert out["diffusion"]["steps"] == 40
    assert np.isfinite(out["latent_fd"]["generated"])
    # Even a 40-step model must beat unstructured noise on latent FD.
    assert out["latent_fd"]["generated"] < out["latent_fd"]["random_baseline"]
    assert out["perceptual_oa_vs_real"] is not None


@pytest.mark.slow
def test_full_workflow_16bar_bundle_path(tmp_path, monkeypatch):
    """The 16-bar hierdec workflow's shipped-bundle path runs end to end
    (tiny codec bundle injected; exercises bundle load, hierdec encode,
    SliceTransform recipe, chunked diffusion loop, decode and OA)."""
    import json

    import jax
    import jax.numpy as jnp

    import benchmarks.full_workflow_16bar as wf
    from smd_tpu.codec.musicvae import MusicVAE, MusicVAEConfig
    from smd_tpu.utils import io as io_lib

    cfg = MusicVAEConfig(latent_dims=32, enc_units=32, dec_units=(32, 32),
                         depth=90, max_seq_len=256, hier_segments=16,
                         conductor_units=32, conductor_layers=2)
    model = MusicVAE(cfg)
    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng}, jnp.zeros((1, 256, 90)), rng)
    ck = str(tmp_path / "m16.pkl")
    io_lib.save({"params": params, "config": cfg,
                 "metrics": {"eval_roundtrip_acc": 0.0}}, ck)
    monkeypatch.setattr(wf, "CKPT", ck)
    monkeypatch.setattr(
        sys, "argv", ["wf16", "--songs", "6", "--steps", "30",
                      "--eval_n", "8"])
    import contextlib
    import io as _io
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        wf.main()
    out = json.loads(buf.getvalue())
    assert out["codec"]["source"] == "shipped artifact"
    assert out["diffusion_train"]["steps"] == 30
    assert np.isfinite(out["latent_fd"]["generated"])


def test_aggregate_seeds_table(tmp_path):
    """Multi-seed aggregator: parses trailing JSON, groups FD rows, flags
    duplicate seeds (VERDICT r3 item 2 tooling)."""
    import json
    import subprocess
    import sys

    for seed, fd in ((0, 100.0), (1, 120.0)):
        (tmp_path / f"s{seed}.json").write_text(
            "training noise line\n" + json.dumps({
                "seed": seed, "train_steps": 10,
                "row_a": {"seconds": 1.0, "fd": fd},
                "only_in_one": ({"fd": 5.0} if seed == 0 else None) or
                               {"fd": 5.0},
            }))
    proc = subprocess.run(
        [sys.executable, "benchmarks/aggregate_seeds.py",
         str(tmp_path / "s0.json"), str(tmp_path / "s1.json")],
        cwd=REPO, capture_output=True, text=True, timeout=120)
    assert proc.returncode == 0, proc.stderr
    assert "| row_a | 110.0 | 100.0..120.0 | 20.0 | 1.00 |" in proc.stdout
    assert "Seeds: [0, 1]" in proc.stdout
