"""Architecture registry.

Replaces the reference's reflection lookup ``getattr(ncsn, FLAGS.architecture)``
(``train_ncsn.py:194``) with an explicit registry covering every architecture
the reference's configs name — including the three that were missing from the
reference (SURVEY.md §7 item 8).
"""
from __future__ import annotations

from smd_tpu.models import autoregressive, ddpm

MODEL_REGISTRY = {
    "TransformerDDPM": ddpm.TransformerDDPM,
    "TransformerDDPM4": ddpm.TransformerDDPM4,
    "DenseDDPM": ddpm.DenseDDPM,
    "DenseNCSN": ddpm.DenseNCSN,
    "ConvNCSN": ddpm.ConvNCSN,
    "ToyDDPM": ddpm.ToyDDPM,
    "ToyNCSN": ddpm.ToyNCSN,
    "TransformerMDN": autoregressive.TransformerMDN,
}


def get_model(name: str, **kwargs):
    """Instantiate a registered architecture, dropping kwargs it rejects."""
    if name not in MODEL_REGISTRY:
        raise ValueError(
            f"Unknown architecture {name!r}; known: {sorted(MODEL_REGISTRY)}")
    cls = MODEL_REGISTRY[name]
    fields = {f for f in cls.__dataclass_fields__}
    return cls(**{k: v for k, v in kwargs.items() if k in fields})
