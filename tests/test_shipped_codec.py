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
