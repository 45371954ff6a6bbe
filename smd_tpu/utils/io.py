"""Pickle save/load helpers (reference ``utils/data_utils.py:30-41``)."""
from __future__ import annotations

import os
import pickle

from absl import logging

__all__ = ["save", "load"]


def save(obj, path):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(obj, f, protocol=4)
    logging.info("Saved to %s", path)


def load(path):
    with open(path, "rb") as f:
        return pickle.load(f)
