import numpy as np

from smd_tpu.codec.note_sequence import NoteSequence, Tempo
from smd_tpu.eval import midi_metrics as mm


def _ns(pitches, dur=0.5, gap=0.0):
    ns = NoteSequence(tempos=[Tempo(qpm=120)])
    t = 0.0
    for p in pitches:
        ns.add_note(p, 80, t, t + dur)
        t += dur + gap
    return ns


def test_note_density():
    ns = _ns([60] * 8, dur=0.5)  # 2 notes per second for 4s
    nd = mm.note_density(ns)
    assert len(nd) == 4
    np.testing.assert_allclose(nd, 2.0)


def test_pitch_range_and_mean():
    ns = _ns([60, 72], dur=0.5)
    pr = mm.pitch_range(ns)
    mp = mm.mean_pitch(ns)
    assert pr[0] == 12
    assert mp[0] == 66.0


def test_durations():
    ns = _ns([60, 62], dur=0.25, gap=0.25)
    md = mm.mean_note_duration(ns)
    np.testing.assert_allclose(md[0], 0.25, atol=1e-6)
    vd = mm.var_note_duration(ns)
    np.testing.assert_allclose(vd[0], 0.0, atol=1e-6)


def test_histograms_and_statistics():
    ns = _ns([60, 64, 67, 72] * 4, dur=0.5)
    hist = mm.perceptual_midi_histograms(ns, interval=1)
    assert set(hist) == {"nd", "pr", "mp", "vp", "md", "vd"}
    stats = mm.perceptual_midi_statistics(ns, interval=1)
    assert all(len(v) == 2 for v in stats.values())
    vec = mm.perceptual_midi_statistics(ns, interval=1, vector=True)
    assert vec.shape == (12,)


def test_overlapping_area_bounds():
    # identical Gaussians -> OA = 1; far apart -> OA ~ 0
    assert abs(mm.overlapping_area(0.0, 0.0, 1.0, 1.0) - 1.0) < 1e-6
    assert mm.overlapping_area(0.0, 100.0, 1.0, 1.0) < 1e-6
    mid = mm.overlapping_area(0.0, 2.0, 1.0, 1.0)
    assert 0.1 < mid < 0.9


def test_perceptual_similarity_self_is_one():
    ns = _ns([60, 64, 67, 72] * 4, dur=0.5)
    sim = mm.perceptual_similarity(ns, ns)
    for key, oa in sim.items():
        assert abs(oa - 1.0) < 1e-5, key


def test_oa_consistency_variance():
    seqs = [_ns([60 + i, 64, 67] * 4, dur=0.5) for i in range(4)]
    out = mm.oa_consistency_variance(seqs)
    for key, (cons, var) in out.items():
        assert 0 <= cons <= 1.0 + 1e-9
        assert 0 <= var <= 1.0 + 1e-9


def test_synth_native_and_wav(tmp_path):
    from smd_tpu.codec import synth
    ns = _ns([60, 64, 67], dur=0.25)
    pcm = synth.synthesize(ns, sample_rate=8000)
    assert pcm.dtype == np.float32
    assert np.abs(pcm).max() <= 1.0
    assert np.abs(pcm).max() > 0.01  # actually rendered something

    path = str(tmp_path / "x.wav")
    synth.note_sequence_to_wav(ns, path, sample_rate=8000)
    from scipy.io import wavfile
    sr, data = wavfile.read(path)
    assert sr == 8000 and data.dtype == np.int16 and len(data) > 8000


def test_synth_spectral_content():
    """The native synth renders energy at the note's fundamental frequency."""
    from smd_tpu.codec import synth
    ns = _ns([69], dur=1.0)  # A4 = 440 Hz
    sr = 8000
    pcm = synth.synthesize(ns, sample_rate=sr)[: sr]
    spectrum = np.abs(np.fft.rfft(pcm * np.hanning(len(pcm))))
    freqs = np.fft.rfftfreq(len(pcm), 1 / sr)
    peak_freq = freqs[np.argmax(spectrum)]
    assert abs(peak_freq - 440.0) < 10.0, peak_freq
