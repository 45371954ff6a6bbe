"""Autoregressive Transformer-MDN baseline (Flax Linen).

Capability parity with the reference's ``models/autoregressive.py``
(``shift_right`` :26, ``TransformerMDN`` :37): the same pre-LN trunk as
TransformerDDPM but with causal attention and a mixture-density head, no
noise conditioning.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from smd_tpu.models.blocks import DenseResBlock, MDN
from smd_tpu.models.ddpm import TransformerEncoder

__all__ = ["shift_right", "TransformerMDN"]


def shift_right(x):
    """Shift along axis 1 by left-padding one zero step (teacher forcing)."""
    pad_widths = [(0, 0)] * x.ndim
    pad_widths[1] = (1, 0)
    return jnp.pad(x, pad_widths)[:, :-1]


class TransformerMDN(nn.Module):
    """Causal transformer over latent sequences with an MDN output head."""
    num_layers: int = 6
    num_heads: int = 8
    num_mlp_layers: int = 2
    mlp_dims: int = 2048
    mdn_mixtures: int = 100
    embed_channels: int = 128
    dtype: jnp.dtype = jnp.float32
    remat: bool = False
    max_decode_length: int = 128

    @nn.compact
    def __call__(self, inputs, shift: bool = True, decode: bool = False,
                 decode_position=None):
        data_channels = inputs.shape[-1]
        x = shift_right(inputs) if (shift and not decode) else inputs

        x = TransformerEncoder(num_layers=self.num_layers,
                               num_heads=self.num_heads,
                               mlp_dims=self.mlp_dims,
                               embed_channels=self.embed_channels,
                               causal=True, dtype=self.dtype,
                               remat=self.remat,
                               max_decode_length=self.max_decode_length)(
                                   x, decode=decode,
                                   decode_position=decode_position)

        x = nn.LayerNorm(dtype=self.dtype)(x)
        x = nn.Dense(self.mlp_dims, dtype=self.dtype)(x)
        for _ in range(self.num_mlp_layers):
            x = DenseResBlock(self.mlp_dims, dtype=self.dtype)(x)
        x = nn.LayerNorm(dtype=self.dtype)(x)
        # fp32 head: mixture NLL is numerically fragile in bf16
        return MDN(out_channels=data_channels,
                   num_components=self.mdn_mixtures, name="mdn")(x.astype(
                       jnp.float32))
