"""Performance-event multitrack converter + nopoly melody converter tests.

Semantics under test mirror the reference's converters (``config.py:32-64``):
velocity-binned performance-event streams per instrument, 1-bar hops, and a
nopoly melody converter that SKIPS polyphonic segments.
"""
import numpy as np

from smd_tpu.codec.melody import MelodyConverter
from smd_tpu.codec.note_sequence import NoteSequence, Tempo, TimeSignature
from smd_tpu.codec.performance import (MultiInstrumentPerformanceConverter,
                                       multiperf_default_1bar_converter,
                                       multiperf_zero_1bar_converter)


def _ns():
    return NoteSequence(tempos=[Tempo(qpm=120)],
                        time_signatures=[TimeSignature()])


def test_multiperf_roundtrip_pitch_time_velocity():
    ns = _ns()
    # Two instruments, one bar at 120 qpm (2 s), varied velocities.
    ns.add_note(60, 100, 0.0, 0.5, instrument=0, program=0)
    ns.add_note(64, 40, 0.5, 1.0, instrument=0, program=0)
    ns.add_note(67, 100, 1.0, 2.0, instrument=0, program=0)
    ns.add_note(36, 80, 0.0, 1.0, instrument=1, program=32)
    ns.add_note(43, 80, 1.0, 2.0, instrument=1, program=32)

    conv = multiperf_default_1bar_converter
    out = conv.to_tensors(ns)
    assert len(out.inputs) == 1
    t = out.inputs[0]
    assert t.shape == (conv.seq_len, conv.depth) == (512, 490)
    assert np.all(t.sum(-1) == 1.0)   # strict one-hot incl. PAD

    rec = conv.from_tensors([t])[0]
    by_inst = {}
    for n in rec.notes:
        by_inst.setdefault(n.instrument, []).append(n)
    assert len(by_inst) == 2
    mel = sorted(by_inst[0], key=lambda n: n.start_time)
    assert [n.pitch for n in mel] == [60, 64, 67]
    np.testing.assert_allclose([n.start_time for n in mel], [0.0, 0.5, 1.0],
                               atol=1e-6)
    np.testing.assert_allclose([n.end_time for n in mel], [0.5, 1.0, 2.0],
                               atol=1e-6)
    # Velocity survives up to bin resolution (8 bins over 127).
    for n, orig in zip(mel, [100, 40, 100]):
        assert abs(n.velocity - orig) <= 128 / 8
    # Program round-trips exactly.
    bass = by_inst[1]
    assert all(n.program == 32 for n in bass)
    assert all(n.program == 0 for n in mel)


def test_multiperf_min_instruments_skips_sparse_bars():
    ns = _ns()
    ns.add_note(60, 80, 0.0, 1.0, instrument=0)   # bar 0: one instrument
    ns.add_note(60, 80, 2.0, 3.0, instrument=0)   # bar 1: two instruments
    ns.add_note(40, 80, 2.0, 3.0, instrument=1)
    out = multiperf_default_1bar_converter.to_tensors(ns)
    assert len(out.inputs) == 1   # min_num_instruments=2 skips bar 0
    out0 = multiperf_zero_1bar_converter.to_tensors(ns)
    assert len(out0.inputs) == 2


def test_multiperf_overflow_truncation_vs_drop():
    ns = _ns()
    # 40 very short notes in one bar -> >64 events for instrument 0.
    for i in range(40):
        t0 = i * 0.05
        ns.add_note(60 + (i % 12), 80, t0, t0 + 0.04, instrument=0)
    ns.add_note(36, 80, 0.0, 2.0, instrument=1)
    # default: the overflowing chunk is dropped entirely
    assert multiperf_default_1bar_converter.to_tensors(ns).inputs == []
    # zero converter truncates instead
    out = multiperf_zero_1bar_converter.to_tensors(ns)
    assert len(out.inputs) == 1
    rec = multiperf_zero_1bar_converter.from_tensors(out.inputs)[0]
    assert len(rec.notes) > 0


def test_multiperf_eight_instrument_cap():
    ns = _ns()
    for i in range(10):
        ns.add_note(50 + i, 80, 0.0, 2.0, instrument=i)
    out = multiperf_zero_1bar_converter.to_tensors(ns)
    assert len(out.inputs) == 1
    rec = multiperf_zero_1bar_converter.from_tensors(out.inputs)[0]
    assert len({n.instrument for n in rec.notes}) == 8


def test_multiperf_time_shift_precision():
    """24 steps/quarter resolves offbeat timings a 4-step grid cannot."""
    ns = _ns()
    ns.add_note(60, 80, 0.0, 1.0 / 6, instrument=0)        # sixteenth triplet
    ns.add_note(62, 80, 1.0 / 6, 2.0 / 6, instrument=0)
    ns.add_note(64, 80, 2.0 / 6, 3.0 / 6, instrument=0)
    ns.add_note(36, 80, 0.0, 2.0, instrument=1)
    conv = multiperf_default_1bar_converter
    rec = conv.from_tensors(conv.to_tensors(ns).inputs)[0]
    # Canonical segment ordering may reassign instrument slots; pick the
    # melody stream by content.
    mel = sorted([n for n in rec.notes if n.pitch >= 60],
                 key=lambda n: n.start_time)
    np.testing.assert_allclose([n.start_time for n in mel],
                               [0.0, 1.0 / 6, 2.0 / 6], atol=1e-6)


def test_multiperf_drum_track_token():
    ns = _ns()
    ns.add_note(36, 80, 0.0, 0.5, instrument=0, is_drum=True)
    ns.add_note(60, 80, 0.0, 2.0, instrument=1)
    conv = multiperf_zero_1bar_converter
    rec = conv.from_tensors(conv.to_tensors(ns).inputs)[0]
    drums = [n for n in rec.notes if n.is_drum]
    assert len(drums) == 1 and drums[0].pitch == 36


def test_nopoly_converter_skips_polyphonic_segments():
    poly = MelodyConverter(skip_polyphony=True)
    std = MelodyConverter()

    # Monophonic sequence: both converters emit it.
    mono = _ns()
    for i in range(8):
        mono.add_note(60 + i, 80, i * 0.5, (i + 1) * 0.5)
    assert len(poly.to_tensors(mono).inputs) > 0

    # A chord in bar 0 -> nopoly skips segments covering it, standard keeps.
    chord = _ns()
    chord.add_note(60, 80, 0.0, 1.0)
    chord.add_note(64, 80, 0.0, 1.0)
    for i in range(12):
        chord.add_note(60 + i % 6, 80, 2.0 + i * 0.5, 2.5 + i * 0.5)
    std_out = std.to_tensors(chord).inputs
    poly_out = poly.to_tensors(chord).inputs
    assert len(std_out) > len(poly_out)
    # Exactly the 2-bar window covering the chord's bar is skipped.
    assert len(poly_out) == len(std_out) - 1


def test_multiperf_velocity_bins_cover_range():
    conv = MultiInstrumentPerformanceConverter()
    bins = [conv._velocity_bin(v) for v in range(1, 128)]
    assert min(bins) == 1 and max(bins) == 8
    assert sorted(set(bins)) == list(range(1, 9))
    for b in range(1, 9):
        assert conv._velocity_bin(conv._bin_velocity(b)) == b


def test_multiperf_registry_wiring():
    from smd_tpu.config import MUSIC_VAE_CONFIG
    entry = MUSIC_VAE_CONFIG["multi-1-big"]
    assert entry.data_converter is multiperf_default_1bar_converter
    assert entry.model.hier_segments == 8
    assert entry.model.max_seq_len == 512
    assert entry.model.depth == multiperf_default_1bar_converter.depth
    nopoly = MUSIC_VAE_CONFIG["melody-2-big-nopoly"]
    std = MUSIC_VAE_CONFIG["melody-2-big"]
    assert nopoly.data_converter is not std.data_converter
    assert nopoly.data_converter.skip_polyphony


def test_multiperf_canonical_order_note_order_invariant():
    """Chunks must not depend on the input's note/instrument ordering:
    in-memory (instrument-major) and MIDI-read (time-interleaved) listings
    of the same music must produce IDENTICAL tensors (the round-2 shipped
    multi codec's 0.16-vs-0.84 F1 cliff was exactly this ordering skew)."""
    conv = multiperf_default_1bar_converter

    def build(order):
        ns = _ns()
        notes = [
            (72, 90, 0.0, 0.4, 2, 73),    # lead (program 73)
            (74, 90, 0.5, 0.9, 2, 73),
            (36, 80, 0.0, 1.9, 0, 33),    # bass (program 33)
            (60, 70, 0.0, 1.0, 1, 0),     # chords (program 0)
            (64, 70, 1.0, 2.0, 1, 0),
        ]
        for i in order:
            p, v, s, e, inst, prog = notes[i]
            ns.add_note(p, v, s, e, instrument=inst, program=prog)
        return conv.to_tensors(ns).inputs

    a = build([0, 1, 2, 3, 4])            # lead first (in-memory style)
    b = build([2, 3, 0, 4, 1])            # bass first (file-read style)
    assert len(a) == len(b) == 1
    np.testing.assert_array_equal(a[0], b[0])
    # Canonical order is program-major: bass(33) < chords(0)? No — sorted
    # by the leading PROGRAM token id, so program 0 < 33 < 73.
    first_tokens = a[0].argmax(-1).reshape(8, 64)[:, 0]
    progs = [t - conv._vocab.program0 for t in first_tokens[:3]]
    assert progs == sorted(progs)


def test_multiperf_memory_vs_midi_file_chunks_match():
    """End to end: a synthetic multitrack song converted in memory and via a
    MIDI write/read must yield (near-)identical chunk tensors."""
    import tempfile

    from scripts.make_multitrack_corpus import make_song
    from smd_tpu.codec import midi_io

    rng = np.random.default_rng(77)
    ns = make_song(rng)
    tmp = tempfile.mkdtemp()
    midi_io.write_midi_file(ns, tmp + "/s.mid")
    ns2 = midi_io.read_midi_file(tmp + "/s.mid")
    conv = multiperf_default_1bar_converter
    a = conv.to_tensors(ns).inputs
    b = conv.to_tensors(ns2).inputs
    assert len(a) == len(b) and len(a) > 0
    match = np.mean([(x.argmax(-1) == y.argmax(-1)).mean()
                     for x, y in zip(a, b)])
    # Tiny residue allowed: MIDI tick rounding can nudge one event.
    assert match > 0.97, f"memory-vs-file chunk token match {match:.3f}"


def test_multiperf_truncation_is_note_order_invariant():
    """With >max_num_instruments streams, WHICH instruments survive
    truncation must not depend on input note order: canonical sort runs
    before the truncation cut (an instrument-major listing and a
    time-interleaved listing of the same music must keep the same 8)."""
    conv = multiperf_zero_1bar_converter   # drop_tracks_and_truncate=True
    n_inst = conv.max_num_instruments + 2

    def build(reverse):
        ns = _ns()
        insts = list(range(n_inst))
        if reverse:
            insts = insts[::-1]
        for inst in insts:
            prog = 8 * inst   # distinct programs -> deterministic sort
            ns.add_note(48 + inst, 90, 0.125 * inst, 0.125 * inst + 0.25,
                        instrument=inst, program=prog)
        out = conv.to_tensors(ns).inputs
        assert len(out) == 1
        return out[0]

    a, b = build(False), build(True)
    np.testing.assert_array_equal(a, b)
    # The kept subset is the 8 lowest program tokens, not first-seen.
    first_tokens = a.argmax(-1).reshape(conv.max_num_instruments, -1)[:, 0]
    progs = [int(t) - conv._vocab.program0 for t in first_tokens]
    assert progs == [8 * i for i in range(conv.max_num_instruments)]
