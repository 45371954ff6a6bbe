"""Audio synthesis: NoteSequence -> PCM via the native C++ renderer.

The compute path is ``native/smd_synth.cpp`` (additive synthesis, C ABI via
ctypes), built on demand with the in-image toolchain; a numpy fallback keeps
the API available when no compiler is present. Replaces the reference's
FluidSynth binding (``scripts/sample_audio.py:46``).
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

__all__ = ["synthesize", "note_sequence_to_wav"]

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB = None
_LIB_TRIED = False


def _load_native():
    global _LIB, _LIB_TRIED
    if _LIB is not None or _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    so_path = os.path.join(_NATIVE_DIR, "libsmd_synth.so")
    src = os.path.join(_NATIVE_DIR, "smd_synth.cpp")
    try:
        if not os.path.exists(so_path) or \
                os.path.getmtime(so_path) < os.path.getmtime(src):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o",
                 so_path], check=True, capture_output=True)
        lib = ctypes.CDLL(so_path)
        lib.synth_render.restype = ctypes.c_int
        lib.synth_render.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int32, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.c_int32,
        ]
        _LIB = lib
    except Exception:  # pragma: no cover - toolchain missing
        _LIB = None
    return _LIB


def _numpy_render(pitches, velocities, starts, ends, programs, is_drum,
                  n_samples, sample_rate):
    out = np.zeros(n_samples, np.float32)
    t_axis = np.arange(n_samples) / sample_rate
    for p, v, s, e, prog, drum in zip(pitches, velocities, starts, ends,
                                      programs, is_drum):
        if e <= s:
            continue
        mask = (t_axis >= s) & (t_axis < e + 0.1)
        t = t_axis[mask] - s
        if drum:
            rng = np.random.default_rng(int(p))
            sig = rng.uniform(-1, 1, mask.sum()) * np.exp(-t / 0.08)
        else:
            freq = 440.0 * 2 ** ((p - 69) / 12.0)
            env = np.minimum(t / 0.01, 1.0) * np.exp(-np.maximum(
                t - (e - s), 0) / 0.1)
            sig = np.sin(2 * np.pi * freq * t) * env
        out[mask] += (v / 127.0) * sig * 0.12
    return np.tanh(out)


def synthesize(ns, sample_rate: int = 44100, tail: float = 0.5) -> np.ndarray:
    """Render a NoteSequence to mono float32 PCM in [-1, 1]."""
    notes = ns.notes
    n_samples = int((ns.total_time + tail) * sample_rate) + 1
    if not notes:
        return np.zeros(n_samples, np.float32)

    pitches = np.array([n.pitch for n in notes], np.int32)
    velocities = np.array([n.velocity for n in notes], np.float32)
    starts = np.array([n.start_time for n in notes], np.float32)
    ends = np.array([n.end_time for n in notes], np.float32)
    programs = np.array([n.program for n in notes], np.int32)
    is_drum = np.array([n.is_drum for n in notes], np.uint8)

    lib = _load_native()
    if lib is None:
        return _numpy_render(pitches, velocities, starts, ends, programs,
                             is_drum, n_samples, sample_rate)

    out = np.zeros(n_samples, np.float32)
    lib.synth_render(
        pitches.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        velocities.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        starts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ends.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        programs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        is_drum.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        np.int32(len(notes)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        np.int64(n_samples), np.int32(sample_rate))
    return out


def note_sequence_to_wav(ns, path: str, sample_rate: int = 44100):
    """Render and write a 16-bit PCM WAV (reference used 44.1kHz int16)."""
    from scipy.io import wavfile
    pcm = synthesize(ns, sample_rate)
    wavfile.write(path, sample_rate, (pcm * 32767).astype(np.int16))
