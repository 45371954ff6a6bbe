"""The shipped melody codec artifact must load and actually reconstruct."""
import numpy as np
import pytest

from smd_tpu.codec import musicvae as mv


@pytest.fixture(scope="module")
def shipped():
    params = mv.load_default_melody_params()
    if params is None:
        pytest.skip("no shipped codec artifact")
    return params


def test_auto_loads_for_melody_shape(shipped):
    vae = mv.TrainedMusicVAE()
    assert not vae.random_weights
    assert vae.config.depth == 90 and vae.config.max_seq_len == 32


def test_shipped_codec_roundtrips_a_melody(shipped):
    """encode -> mu -> decode reproduces a held-out-style melody's tokens."""
    from smd_tpu.codec.note_sequence import (NoteSequence, Tempo,
                                             TimeSignature)
    vae = mv.TrainedMusicVAE()
    ns = NoteSequence(tempos=[Tempo(qpm=120)],
                      time_signatures=[TimeSignature()])
    # Two bars: a simple diatonic line with rests, the corpus's bread and
    # butter.
    pitches = [60, 62, 64, 65, 67, 69, 67, 65, 64, 62, 60, 64]
    for i, p in enumerate(pitches):
        ns.add_note(p, 90, i * 0.25, i * 0.25 + 0.22)
    x = vae.converter.to_tensors(ns).inputs[0]
    z, mu, sigma = vae.encode_tensors([x])
    tokens = vae.decode_to_tensors(mu)[0]
    labels = np.asarray(x).argmax(-1)
    acc = float((tokens == labels).mean())
    assert acc > 0.8, f"round-trip token accuracy {acc:.3f}"


def test_bundle_records_eval_metrics(shipped):
    assert shipped["metrics"]["eval_roundtrip_acc"] > 0.9


@pytest.fixture(scope="module")
def shipped_multi():
    params = mv.load_default_multi_params()
    if params is None:
        pytest.skip("no shipped multitrack codec artifact")
    return params


def test_auto_loads_for_multi_shape(shipped_multi):
    from smd_tpu.config import MUSIC_VAE_CONFIG
    entry = MUSIC_VAE_CONFIG["multi-1-big"]
    vae = mv.TrainedMusicVAE(config=entry.model,
                             converter=entry.data_converter)
    assert not vae.random_weights
    assert vae.config.hier_segments == 8
    assert shipped_multi["metrics"]["eval_roundtrip_acc_nonpad"] > 0.5


def test_shipped_multi_codec_roundtrips(shipped_multi):
    """encode -> mu -> decode keeps most non-PAD events of a simple
    two-instrument bar."""
    import numpy as np
    from smd_tpu.config import MUSIC_VAE_CONFIG
    from smd_tpu.codec.note_sequence import (NoteSequence, Tempo,
                                             TimeSignature)
    entry = MUSIC_VAE_CONFIG["multi-1-big"]
    vae = mv.TrainedMusicVAE(config=entry.model,
                             converter=entry.data_converter)
    ns = NoteSequence(tempos=[Tempo(qpm=120)],
                      time_signatures=[TimeSignature()])
    for i, p in enumerate([60, 64, 67, 64]):          # lead
        ns.add_note(p, 90, i * 0.5, i * 0.5 + 0.45, program=0, instrument=0)
    ns.add_note(36, 100, 0.0, 1.9, program=33, instrument=1)  # bass
    x = vae.converter.to_tensors(ns).inputs[0]
    z, mu, sigma = vae.encode_tensors([x])
    tokens = vae.decode_to_tensors(mu)[0]
    labels = np.asarray(x).argmax(-1)
    mask = labels != 0
    acc = float(((tokens == labels) & mask).sum() / mask.sum())
    assert acc > 0.5, f"non-PAD round-trip accuracy {acc:.3f}"
