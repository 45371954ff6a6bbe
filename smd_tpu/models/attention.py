"""Multi-head self-attention with a Pallas flash-attention fast path.

The reference uses old-flax ``nn.SelfAttention`` (``models/ncsn.py:161``,
``models/autoregressive.py:62``) with qkv/out width equal to the input width.
Here attention is computed blockwise: for sequences long enough to tile the
MXU/VPU lanes the Pallas kernel in ``smd_tpu.ops.flash_attention`` is used
(O(S) memory, no S x S materialization, and the seam for a future
context-parallel mesh axis); for the reference's tiny 32-token sequences the
einsum path is used, which XLA fuses into adjacent matmuls — at S=32 a custom
kernel cannot beat that because a single (8,128) VPU tile already covers the
whole score matrix.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from smd_tpu.ops import flash_attention as fa

__all__ = ["MultiHeadSelfAttention"]


class MultiHeadSelfAttention(nn.Module):
    """Self-attention matching the reference layer's shape contract.

    features: model width (qkv width == out width == features).
    causal: apply a causal mask (TransformerMDN) or none (TransformerDDPM).
    use_flash_min_len: sequences at least this long route to the Pallas
        kernel. Measured crossover on v5e (chained-scan, bf16 + fp32):
        XLA's fused einsum is ~2x faster at S=128, ties at S=256, and the
        flash kernel wins 1.6-3x from S=1024 (docs/DESIGN.md) — so the
        default routes S < 512 to einsum.
    """
    features: int
    num_heads: int
    causal: bool = False
    use_flash_min_len: int = 512
    # Packed short-seq kernel: measured slower than the fused einsum path at
    # S=32/Dh=16 on v5e (21.8 vs 15.0 ms/step in the DDPM sampler — the
    # fold transposes and small-K MXU work outweigh the tiling win), so the
    # einsum path stays the default for short sequences.
    use_packed: bool = False

    max_decode_length: int = 128

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True,
                 decode: bool = False):
        B, S, _ = x.shape
        H = self.num_heads
        Dh = self.features // H
        assert self.features % H == 0, "features must divide num_heads"

        qkv = nn.DenseGeneral(features=(3, H, Dh), axis=-1, name="qkv")(x)
        q, k, v = jnp.moveaxis(qkv, -3, 0)  # each (B, S, H, Dh)

        if decode:
            # Incremental decoding: S == 1; attend over the KV cache.
            assert S == 1, "decode mode consumes one position at a time"
            L = self.max_decode_length
            cached_k = self.variable("cache", "cached_key", jnp.zeros,
                                     (B, L, H, Dh), k.dtype)
            cached_v = self.variable("cache", "cached_value", jnp.zeros,
                                     (B, L, H, Dh), v.dtype)
            idx_var = self.variable("cache", "cache_index",
                                    lambda: jnp.zeros((), jnp.int32))
            idx = idx_var.value
            cached_k.value = jax.lax.dynamic_update_slice(
                cached_k.value, k, (0, idx, 0, 0))
            cached_v.value = jax.lax.dynamic_update_slice(
                cached_v.value, v, (0, idx, 0, 0))
            idx_var.value = idx + 1

            q = q / jnp.sqrt(Dh).astype(q.dtype)
            scores = jnp.einsum("bqhd,bkhd->bhqk", q, cached_k.value)
            mask = jnp.arange(L) <= idx  # causal: positions written so far
            scores = jnp.where(mask[None, None, None], scores,
                               jnp.finfo(scores.dtype).min)
            weights = jax.nn.softmax(scores, axis=-1)
            out = jnp.einsum("bhqk,bkhd->bqhd", weights, cached_v.value)
            return nn.DenseGeneral(features=self.features, axis=(-2, -1),
                                   name="out")(out)

        q = q / jnp.sqrt(Dh).astype(q.dtype)
        # Pallas kernels only lower on accelerator backends; the CPU test
        # mesh (and any CPU run) takes the einsum path XLA fuses anyway.
        on_accelerator = jax.default_backend() != "cpu"
        use_flash = (S >= self.use_flash_min_len and on_accelerator and
                     fa.supported(S, Dh, q.dtype))
        out = None
        if use_flash:
            out = fa.flash_attention(q, k, v, causal=self.causal)
        elif self.use_packed and on_accelerator and \
                q.dtype in (jnp.float32, jnp.bfloat16):
            # Short sequences: pack batch items into MXU-sized sequences
            # with a block-diagonal mask (see ops/flash_attention.py).
            out = fa.packed_short_seq_attention(q, k, v, causal=self.causal)
        if out is None:
            scores = jnp.einsum("bqhd,bkhd->bhqk", q, k)
            if self.causal:
                mask = jnp.tril(jnp.ones((S, S), bool))
                scores = jnp.where(mask[None, None], scores,
                                   jnp.finfo(scores.dtype).min)
            weights = jax.nn.softmax(scores, axis=-1)
            out = jnp.einsum("bhqk,bkhd->bqhd", weights, v)

        return nn.DenseGeneral(features=self.features, axis=(-2, -1),
                               name="out")(out)
