"""Tests for the smaller parity surfaces: replay buffer, data utils,
series loss, multitrack converter, MUSIC_VAE_CONFIG registry."""
import jax
import jax.numpy as jnp
import numpy as np

from smd_tpu.codec.multitrack import multitrack_default_1bar_converter
from smd_tpu.codec.note_sequence import NoteSequence, Tempo
from smd_tpu.config import MUSIC_VAE_CONFIG
from smd_tpu.data import utils as du
from smd_tpu.diffusion.losses import series_loss
from smd_tpu.diffusion.replay import ReplayBuffer


def test_replay_buffer(rng):
    buf = ReplayBuffer.create(64, 4, rng)
    samples = jnp.ones((8, 4)) * 7.0
    buf = buf.add(samples)
    np.testing.assert_allclose(np.asarray(buf.data[:8]), 7.0)
    out = buf.sample(jax.random.PRNGKey(1), 16, p=1.0)
    assert out.shape == (16, 4)


def test_self_similarity():
    emb = np.eye(4, dtype=np.float32)
    ss = du.self_similarity(emb, normalized=True, max_len=4)
    np.testing.assert_allclose(ss, np.eye(4), atol=1e-6)
    # zero rows do not produce NaN
    emb2 = np.zeros((4, 4), np.float32)
    assert not np.isnan(du.self_similarity(emb2, max_len=4)).any()


def test_triangular_roundtrip():
    m = np.arange(16, dtype=float).reshape(4, 4)
    m = (m + m.T) / 2
    vec = du.unroll_upper_triangular(m)
    assert len(vec) == 6
    back = du.roll_upper_triangular(vec, 4)
    np.testing.assert_allclose(np.triu(back, 1), np.triu(m, 1))


def test_erase_and_infill_bars():
    emb = np.ones((6, 3))
    erased = du.erase_bars(emb, [1, 3])
    np.testing.assert_allclose(erased[[1, 3]], 0.0)
    refilled = du.infill_bars(erased, np.full((2, 3), 5.0), [1, 3])
    np.testing.assert_allclose(refilled[[1, 3]], 5.0)
    np.testing.assert_allclose(refilled[[0, 2, 4, 5]], 1.0)


def test_batches_and_shuffle():
    data = np.arange(10)[:, None]
    batches = list(du.batches(data, batch_size=3))
    assert len(batches) == 3
    shuffled = du.shuffle(data, rng=np.random.default_rng(0))
    assert sorted(shuffled.ravel().tolist()) == list(range(10))


def test_series_loss():
    ctx = jnp.ones((4, 3))
    target = jnp.ones((1, 3))
    assert float(series_loss(ctx, target, target)) == 0.0
    assert float(series_loss(ctx, target, target * 2)) > 0.0


def test_music_vae_config_registry():
    assert set(MUSIC_VAE_CONFIG) == {
        "melody-2-big", "melody-16-big", "multi-1-big", "multi-0min-1-big",
        "melody-2-big-nopoly"}
    entry = MUSIC_VAE_CONFIG["melody-2-big"]
    assert entry.model.latent_dims == 512
    assert entry.model.max_seq_len == 32
    assert entry.data_converter.seq_len == 32
    assert MUSIC_VAE_CONFIG["melody-16-big"].data_converter.seq_len == 256


def test_multitrack_converter_roundtrip():
    ns = NoteSequence(tempos=[Tempo(qpm=120)])
    # two instruments, one bar (2s at 120qpm)
    for i in range(4):
        ns.add_note(60 + i, 80, i * 0.5, i * 0.5 + 0.4, instrument=0,
                    program=0)
        ns.add_note(40 + i, 80, i * 0.5, i * 0.5 + 0.4, instrument=1,
                    program=33)
    conv = multitrack_default_1bar_converter
    out = conv.to_tensors(ns)
    assert len(out.inputs) >= 1
    grid = out.inputs[0]
    assert grid.shape == (16, conv.depth)

    back = conv.from_tensors([grid])[0]
    insts = back.instruments()
    assert len(insts) == 2
    pitches0 = sorted(n.pitch for n in back.notes if n.instrument == 0)
    assert pitches0 == [60, 61, 62, 63]
    programs = {n.program for n in back.notes if n.instrument == 1}
    assert programs == {33}


def test_multitrack_min_instruments():
    ns = NoteSequence(tempos=[Tempo(qpm=120)])
    ns.add_note(60, 80, 0, 1, instrument=0)
    # only 1 instrument < min 2 -> no tensors
    assert multitrack_default_1bar_converter.to_tensors(ns).inputs == []
