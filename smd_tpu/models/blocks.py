"""Shared neural-net building blocks (Flax Linen).

Capability parity with the reference's ``models/shared.py`` (MDN head :21,
sinusoidal positional encoding :33, FeaturewiseAffine :51, DenseResBlock :58)
and ``models/ncsn.py:25-80`` (NoiseEncoding, DenseFiLM) — re-expressed as
Linen modules. Topology is preserved exactly (LN → affine → swish → Dense ×2
with projected shortcut; noise embedding scaled ×5000) so training dynamics
match; parameter layout is modern Linen, not flax.nn.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

__all__ = [
    "sinusoidal_embedding",
    "positional_encoding",
    "noise_encoding",
    "DenseFiLM",
    "DenseResBlock",
    "MDN",
]


def sinusoidal_embedding(positions: jnp.ndarray, channels: int) -> jnp.ndarray:
    """Sin/cos embedding of a 1-D position/noise vector -> (len, channels)."""
    assert positions.ndim == 1
    half_dim = channels // 2
    emb = jnp.log(10000.0) / float(half_dim - 1)
    emb = jnp.exp(jnp.arange(half_dim) * -emb)
    emb = positions.astype(jnp.float32)[:, None] * emb[None, :]
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=1)
    if channels % 2 == 1:
        emb = jnp.pad(emb, [[0, 0], [0, 1]])
    return emb


def positional_encoding(seq_len: int, channels: int) -> jnp.ndarray:
    """Transformer positional encoding table, shape (seq_len, channels)."""
    return sinusoidal_embedding(jnp.arange(seq_len), channels)


def noise_encoding(noise: jnp.ndarray, channels: int) -> jnp.ndarray:
    """Sinusoidal embedding of a continuous noise level, scaled x5000.

    The x5000 scale spreads the [0, 1] continuous noise range across the
    sinusoid frequencies (reference ``models/ncsn.py:36``).
    """
    if noise.ndim == 2:
        noise = noise.squeeze(-1)
    assert noise.ndim == 1
    return sinusoidal_embedding(5000.0 * noise, channels)


class DenseFiLM(nn.Module):
    """Feature-wise linear modulation generator from a noise level.

    noise (B,) or (B,1) -> (scale, shift) each (B, out_channels), or
    (B, 1, out_channels) when ``sequence=True`` for broadcast over a seq axis.
    """
    embedding_channels: int
    out_channels: int
    sequence: bool = False
    dtype: "jnp.dtype" = jnp.float32

    @nn.compact
    def __call__(self, position):
        pos = noise_encoding(position, self.embedding_channels)
        pos = pos.astype(self.dtype)
        pos = nn.Dense(self.embedding_channels * 4, dtype=self.dtype)(pos)
        pos = nn.swish(pos)
        pos = nn.Dense(self.embedding_channels * 4, dtype=self.dtype)(pos)
        if self.sequence:
            pos = pos[:, None, :]
        scale = nn.Dense(self.out_channels, dtype=self.dtype)(pos)
        shift = nn.Dense(self.out_channels, dtype=self.dtype)(pos)
        return scale, shift


def featurewise_affine(x, scale, shift):
    return scale * x + shift


class DenseResBlock(nn.Module):
    """Fully-connected residual block with optional FiLM conditioning.

    LN -> affine -> swish -> Dense -> LN -> affine -> swish -> Dense, plus a
    projected shortcut when the width changes. The same (scale, shift) pair
    conditions both affines, matching reference ``models/shared.py:58-75``.
    """
    output_size: int
    dtype: "jnp.dtype" = jnp.float32

    @nn.compact
    def __call__(self, inputs, scale=1.0, shift=0.0):
        x = nn.LayerNorm(dtype=self.dtype)(inputs)
        x = featurewise_affine(x, scale, shift)
        x = nn.swish(x)
        x = nn.Dense(self.output_size, dtype=self.dtype)(x)
        x = nn.LayerNorm(dtype=self.dtype)(x)
        x = featurewise_affine(x, scale, shift)
        x = nn.swish(x)
        x = nn.Dense(self.output_size, dtype=self.dtype)(x)

        shortcut = inputs
        if inputs.shape[-1] != self.output_size:
            shortcut = nn.Dense(self.output_size, dtype=self.dtype)(inputs)
        return x + shortcut


class FusedDenseResBlock(nn.Module):
    """DenseResBlock with each half fused into one Pallas VMEM program.

    Serving layout: flat params (ln1_scale/ln1_bias/w1/b1, ln2_*/w2/b2) so
    the LN + FiLM affine fold into a single per-item (scale, shift) pair and
    the whole LN->affine->swish->matmul half never touches HBM between ops
    (``ops/fused_film_resblock.py``). Convert trained DenseResBlock params
    with ``models.fuse.fuse_head_params``. Mathematically identical to
    ``DenseResBlock``; requires input width == output_size (the head case).
    """
    output_size: int
    dtype: "jnp.dtype" = jnp.float32

    @nn.compact
    def __call__(self, inputs, scale, shift):
        import jax

        from smd_tpu.ops import fused_film_resblock as ffr

        K = inputs.shape[-1]
        N = self.output_size
        assert K == N, "fused resblock requires matching widths (no shortcut)"
        init_k = nn.initializers.lecun_normal()
        w1 = self.param("w1", init_k, (K, N))
        b1 = self.param("b1", nn.initializers.zeros, (N,))
        ln1_s = self.param("ln1_scale", nn.initializers.ones, (K,))
        ln1_b = self.param("ln1_bias", nn.initializers.zeros, (K,))
        w2 = self.param("w2", init_k, (N, N))
        b2 = self.param("b2", nn.initializers.zeros, (N,))
        ln2_s = self.param("ln2_scale", nn.initializers.ones, (N,))
        ln2_b = self.param("ln2_bias", nn.initializers.zeros, (N,))

        scale = jnp.asarray(scale, jnp.float32)
        shift = jnp.asarray(shift, jnp.float32)
        # Fold LN's learned affine into the FiLM affine:
        # (z*ls + lb)*s + sh == z*(ls*s) + (lb*s + sh).
        s1 = ln1_s.astype(jnp.float32) * scale
        h1 = ln1_b.astype(jnp.float32) * scale + shift
        s2 = ln2_s.astype(jnp.float32) * scale
        h2 = ln2_b.astype(jnp.float32) * scale + shift

        B, S, _ = inputs.shape
        w1c, w2c = w1.astype(self.dtype), w2.astype(self.dtype)
        if jax.default_backend() != "cpu" and \
                ffr.supported(B, S, K, jnp.dtype(self.dtype).itemsize):
            u = ffr.fused_ln_film_swish_dense(inputs, s1, h1, w1c, b1)
            return ffr.fused_ln_film_swish_dense(u, s2, h2, w2c, b2,
                                                 residual=inputs)
        u = ffr._reference(inputs, s1, h1, w1c, b1)
        return ffr._reference(u, s2, h2, w2c, b2, residual=inputs)


class QuantDenseResBlock(nn.Module):
    """DenseResBlock with both matmuls on the int8 MXU path (serving only).

    Same math as ``DenseResBlock`` with weights in symmetric per-channel
    int8 (``ops/quant.py``). Activation quantization is static-scale by
    default (``static_act=True``): a per-matmul scalar scale calibrated with
    ``models.fuse.calibrate_head_act_scales`` — dynamic per-row scales
    measured *slower* than bf16 in the full model (the row amax breaks
    XLA's fusion of quantization into the matmul operand load; see
    ``ops/quant.py``). Convert trained params with
    ``models.fuse.quantize_head_params``. Requires input width ==
    output_size (the head case, no shortcut proj).
    """
    output_size: int
    dtype: "jnp.dtype" = jnp.float32
    static_act: bool = True
    use_kernel: bool = False   # fused Pallas w8a8 (ops/quant_matmul.py)

    @nn.compact
    def __call__(self, inputs, scale=1.0, shift=0.0):
        import jax as _jax

        from smd_tpu.ops.quant import int8_dense as _xla_int8

        if self.use_kernel:
            assert self.static_act, \
                "the fused w8a8 kernel requires static activation scales"
            from smd_tpu.ops.quant_matmul import w8a8_dense
            # axon (the tunneled TPU) must compile, not interpret — match
            # the flash-attention routing (!= "cpu", attention.py:88).
            interp = _jax.default_backend() == "cpu"
            int8_dense = lambda x, wq, ws, b, s: w8a8_dense(
                x, wq, ws, b, s, interpret=interp)
        else:
            int8_dense = _xla_int8

        K = inputs.shape[-1]
        N = self.output_size
        assert K == N, "quantized resblock requires matching widths"
        int8_init = lambda key, shape: jnp.zeros(shape, jnp.int8)
        w1_q = self.param("w1_q", int8_init, (K, N))
        w1_s = self.param("w1_scale", nn.initializers.ones, (N,))
        b1 = self.param("b1", nn.initializers.zeros, (N,))
        a1_s = self.param("a1_scale", nn.initializers.ones, ())
        w2_q = self.param("w2_q", int8_init, (N, N))
        w2_s = self.param("w2_scale", nn.initializers.ones, (N,))
        b2 = self.param("b2", nn.initializers.zeros, (N,))
        a2_s = self.param("a2_scale", nn.initializers.ones, ())
        observe = self.is_mutable_collection("intermediates")

        x = nn.LayerNorm(dtype=self.dtype)(inputs)
        x = featurewise_affine(x, scale, shift)
        x = nn.swish(x)
        if observe:
            self.sow("intermediates", "a1_amax", jnp.max(jnp.abs(
                x.astype(jnp.float32))))
        x = int8_dense(x, w1_q, w1_s, b1,
                       a1_s if self.static_act else None).astype(self.dtype)
        x = nn.LayerNorm(dtype=self.dtype)(x)
        x = featurewise_affine(x, scale, shift)
        x = nn.swish(x)
        if observe:
            self.sow("intermediates", "a2_amax", jnp.max(jnp.abs(
                x.astype(jnp.float32))))
        x = int8_dense(x, w2_q, w2_s, b2,
                       a2_s if self.static_act else None).astype(self.dtype)
        return x + inputs


class MDN(nn.Module):
    """Mixture-density output head: unnormalized (pi, mu, log_sigma)."""
    out_channels: int = 512
    num_components: int = 10

    @nn.compact
    def __call__(self, inputs):
        mu = nn.Dense(self.out_channels * self.num_components)(inputs)
        log_sigma = nn.Dense(self.out_channels * self.num_components)(inputs)
        pi = nn.Dense(self.num_components)(inputs)
        return pi, mu, log_sigma
