"""TF-free TFRecord reading: native C++ scanner + pure-Python example parser.

The training read path normally uses tf.data (``data/records.py``); this
module is the dependency-free alternative: ``native/tfrecord_reader.cpp``
mmaps shards and returns payload extents (with CRC32C verification), and a
minimal proto-wire parser decodes the reference's ``tf.train.Example``
schema (floats feature 'inputs' + int64 feature 'input_shape') without
TensorFlow. A pure-Python framing fallback covers missing toolchains.

Also exposes ``NativeTFRecordSource`` compatible with grain's random-access
data-source protocol (``__len__`` + ``__getitem__``).
"""
from __future__ import annotations

import ctypes
import os
import struct
import subprocess
from typing import List, Optional, Tuple

import numpy as np

__all__ = ["scan_records", "read_records", "parse_example",
           "NativeTFRecordSource"]

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB = None
_LIB_TRIED = False


def _load_native():
    global _LIB, _LIB_TRIED
    if _LIB is not None or _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    so_path = os.path.join(_NATIVE_DIR, "libsmd_tfrecord.so")
    src = os.path.join(_NATIVE_DIR, "tfrecord_reader.cpp")
    try:
        if not os.path.exists(so_path) or \
                os.path.getmtime(so_path) < os.path.getmtime(src):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o",
                 so_path], check=True, capture_output=True)
        lib = ctypes.CDLL(so_path)
        lib.tfrecord_scan.restype = ctypes.c_int64
        lib.tfrecord_scan.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int32,
        ]
        _LIB = lib
    except Exception:  # pragma: no cover - toolchain missing
        _LIB = None
    return _LIB


def _scan_python(path: str) -> List[Tuple[int, int]]:
    """Pure-Python framing scan (no CRC verification)."""
    extents = []
    size = os.path.getsize(path)
    with open(path, "rb") as f:
        pos = 0
        while pos + 12 <= size:
            header = f.read(12)
            if len(header) < 12:
                break
            (length,) = struct.unpack("<Q", header[:8])
            payload = pos + 12
            if payload + length + 4 > size:
                break
            extents.append((payload, length))
            pos = payload + length + 4
            f.seek(pos)
    return extents


def scan_records(path: str, verify_crc: bool = True) -> List[Tuple[int, int]]:
    """(offset, length) extents of every record payload in the file."""
    lib = _load_native()
    if lib is None:
        return _scan_python(path)
    cap = max(16, os.path.getsize(path) // 16)
    offsets = np.zeros(cap, np.int64)
    lengths = np.zeros(cap, np.int64)
    n = lib.tfrecord_scan(
        path.encode(), offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        np.int64(cap), np.int32(verify_crc))
    if n == -2:
        raise ValueError(f"Corrupt TFRecord framing/CRC in {path}")
    if n < 0:
        raise IOError(f"Cannot read {path}")
    return list(zip(offsets[:n].tolist(), lengths[:n].tolist()))


def read_records(path: str, verify_crc: bool = True) -> List[bytes]:
    extents = scan_records(path, verify_crc)
    out = []
    with open(path, "rb") as f:
        for offset, length in extents:
            f.seek(offset)
            out.append(f.read(length))
    return out


# ---------------------------------------------------------------------------
# Minimal proto-wire parsing of tf.train.Example (schema from
# transform_encoded_data: features 'inputs' float_list / bytes_list and
# 'input_shape' int64_list; optional 'targets'/'target_shape').
# ---------------------------------------------------------------------------

def _read_varint(buf, pos):
    value = shift = 0
    while True:
        b = buf[pos]
        pos += 1
        value |= (b & 0x7F) << shift
        if not b & 0x80:
            return value, pos
        shift += 7


def _iter_fields(buf, start, end):
    pos = start
    while pos < end:
        key, pos = _read_varint(buf, pos)
        field, wire = key >> 3, key & 7
        if wire == 2:  # length-delimited
            length, pos = _read_varint(buf, pos)
            yield field, buf[pos:pos + length]
            pos += length
        elif wire == 0:
            value, pos = _read_varint(buf, pos)
            yield field, value
        elif wire == 5:
            yield field, buf[pos:pos + 4]
            pos += 4
        elif wire == 1:
            yield field, buf[pos:pos + 8]
            pos += 8
        else:
            raise ValueError(f"Unsupported wire type {wire}")


def _parse_feature(buf):
    """tf.train.Feature: field 1 bytes_list, 2 float_list, 3 int64_list."""
    for field, payload in _iter_fields(buf, 0, len(buf)):
        if field == 2:  # FloatList{ repeated float value = 1 (packed) }
            for f2, packed in _iter_fields(payload, 0, len(payload)):
                if f2 == 1:
                    return np.frombuffer(packed, "<f4").copy()
            return np.zeros(0, np.float32)
        if field == 3:  # Int64List
            for f3, packed in _iter_fields(payload, 0, len(payload)):
                if f3 == 1:
                    vals, pos = [], 0
                    while pos < len(packed):
                        v, pos = _read_varint(packed, pos)
                        vals.append(v)
                    return np.asarray(vals, np.int64)
            return np.zeros(0, np.int64)
        if field == 1:  # BytesList
            for f1, raw in _iter_fields(payload, 0, len(payload)):
                if f1 == 1:
                    return bytes(raw)
    return None


def parse_example(record: bytes) -> dict:
    """Decode a serialized tf.train.Example into {name: np.ndarray|bytes}."""
    out = {}
    # Example{ Features features = 1 } ; Features{ map<string, Feature> = 1 }
    for field, features_buf in _iter_fields(record, 0, len(record)):
        if field != 1:
            continue
        for f, entry in _iter_fields(features_buf, 0, len(features_buf)):
            if f != 1:
                continue
            name = value = None
            for mf, mv in _iter_fields(entry, 0, len(entry)):
                if mf == 1:
                    name = mv.decode()
                elif mf == 2:
                    value = _parse_feature(mv)
            if name is not None:
                out[name] = value
    return out


class NativeTFRecordSource:
    """Random-access record source over one or more shards (grain protocol).

    ``__getitem__`` returns the parsed example dict with 'inputs' reshaped by
    'input_shape' (matching ``records._decode_record``).
    """

    def __init__(self, paths, verify_crc: bool = True, parse: bool = True):
        if isinstance(paths, (str, os.PathLike)):
            paths = [paths]
        self._paths = [str(p) for p in paths]
        self._parse = parse
        self._index = []  # (path_idx, offset, length)
        for pi, path in enumerate(self._paths):
            for offset, length in scan_records(path, verify_crc):
                self._index.append((pi, offset, length))
        self._files = {}

    def __len__(self):
        return len(self._index)

    def _file(self, pi):
        if pi not in self._files:
            self._files[pi] = open(self._paths[pi], "rb")
        return self._files[pi]

    def __getitem__(self, i):
        pi, offset, length = self._index[i]
        f = self._file(pi)
        f.seek(offset)
        record = f.read(length)
        if not self._parse:
            return record
        ex = parse_example(record)
        if "inputs" in ex and "input_shape" in ex and \
                isinstance(ex["inputs"], np.ndarray):
            ex["inputs"] = ex["inputs"].reshape(ex["input_shape"])
        return ex
