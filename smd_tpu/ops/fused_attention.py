"""Fully fused short-sequence attention: LN + QKV + softmax(QK^T)V + out.

Motivation (docs/DESIGN.md): at the reference's S=32, Dh=16 shapes, XLA
spends ~5 ms/step of the DDPM sampler in attention — tiny batched matmuls
that can't tile the MXU, plus HBM round-trips between the qkv projection,
score, and output ops. This kernel performs the *entire* attention block for
a tile of NB batch items in VMEM:

1. row LayerNorm over the embed dim,
2. one full-tile (NB*S, E) x (E, 3E) qkv matmul,
3. per head: a block-diagonal (NB*S, NB*S) score matmul — full 512-wide MXU
   tiles where only the S x S diagonal blocks are semantically live (the
   ~(NB-1)/NB wasted FLOPs are trivially cheap next to the tiling win),
   masked softmax, and the P @ V matmul,
4. one (NB*S, E) x (E, E) output projection.

Nothing but x and the output touch HBM. The backward pass recomputes via the
einsum formulation (standard flash strategy).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu  # noqa: F401
    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    _HAS_PLTPU = False

__all__ = ["fused_ln_attention", "supported"]

_NEG_INF = -1e30


def supported(batch: int, seq_len: int, embed: int, num_heads: int) -> bool:
    if not _HAS_PLTPU:
        return False
    if embed % num_heads:
        return False
    nb = _pick_nb(batch, seq_len)
    return nb > 1 and embed % 128 == 0


def _pick_nb(batch: int, seq_len: int) -> int:
    """Batch items per tile: largest divisor with NB*S in [128, 512]."""
    best = 1
    for nb in range(2, 512 // seq_len + 1):
        if batch % nb == 0 and nb * seq_len >= 128:
            best = nb
    return best


def _kernel(x_ref, wqkv_ref, bqkv_ref, wout_ref, bout_ref, ln_scale_ref,
            ln_bias_ref, o_ref, *, seq_len: int, num_heads: int,
            causal: bool):
    NB, S, E = x_ref.shape
    R = NB * S
    Dh = E // num_heads

    x = x_ref[...].astype(jnp.float32).reshape(R, E)

    # LayerNorm rows.
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    ln = (x - mean) * jax.lax.rsqrt(var + 1e-6)
    ln = ln * ln_scale_ref[...].astype(jnp.float32) + \
        ln_bias_ref[...].astype(jnp.float32)

    # QKV projection: (R, E) @ (E, 3E).
    qkv = jax.lax.dot_general(ln, wqkv_ref[...].astype(jnp.float32),
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    qkv = qkv + bqkv_ref[...].astype(jnp.float32)

    scale = 1.0 / (Dh ** 0.5)
    rows = jax.lax.broadcasted_iota(jnp.int32, (R, R), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (R, R), 1)
    keep = (rows // seq_len) == (cols // seq_len)
    if causal:
        keep = jnp.logical_and(keep, cols <= rows)

    head_outs = []
    for h in range(num_heads):
        q = qkv[:, h * Dh:(h + 1) * Dh] * scale
        k = qkv[:, E + h * Dh:E + (h + 1) * Dh]
        v = qkv[:, 2 * E + h * Dh:2 * E + (h + 1) * Dh]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = jnp.where(keep, s, _NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        head_outs.append(
            jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32))
    attn_out = jnp.concatenate(head_outs, axis=-1)

    out = jax.lax.dot_general(attn_out, wout_ref[...].astype(jnp.float32),
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    out = out + bout_ref[...].astype(jnp.float32)
    o_ref[...] = out.reshape(NB, S, E).astype(o_ref.dtype)


def _reference(x, wqkv, bqkv, wout, bout, ln_scale, ln_bias, num_heads,
               causal):
    B, S, E = x.shape
    Dh = E // num_heads
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, -1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), -1, keepdims=True)
    ln = (xf - mean) * jax.lax.rsqrt(var + 1e-6) * ln_scale + ln_bias
    qkv = ln @ wqkv.astype(jnp.float32) + bqkv
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(t):
        return t.reshape(B, S, num_heads, Dh)

    q = heads(q) / (Dh ** 0.5)
    k, v = heads(k), heads(v)
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k)
    if causal:
        mask = jnp.tril(jnp.ones((S, S), bool))
        s = jnp.where(mask[None, None], s, _NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(B, S, E)
    return (o @ wout.astype(jnp.float32) + bout).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def fused_ln_attention(x, wqkv, bqkv, wout, bout, ln_scale, ln_bias,
                       num_heads: int, causal: bool = False,
                       interpret: bool = False):
    """LN + attention block for (B, S, E) with flat (E, 3E)/(E, E) weights."""
    B, S, E = x.shape
    nb = _pick_nb(B, S)
    kernel = functools.partial(_kernel, seq_len=S, num_heads=num_heads,
                               causal=causal)
    return pl.pallas_call(
        kernel,
        grid=(B // nb,),
        in_specs=[
            pl.BlockSpec((nb, S, E), lambda i: (i, 0, 0)),
            pl.BlockSpec((E, 3 * E), lambda i: (0, 0)),
            pl.BlockSpec((3 * E,), lambda i: (0,)),
            pl.BlockSpec((E, E), lambda i: (0, 0)),
            pl.BlockSpec((E,), lambda i: (0,)),
            pl.BlockSpec((E,), lambda i: (0,)),
            pl.BlockSpec((E,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((nb, S, E), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, S, E), x.dtype),
        interpret=interpret,
    )(x, wqkv, bqkv, wout, bout, ln_scale, ln_bias)


def _fwd(x, wqkv, bqkv, wout, bout, ln_scale, ln_bias, num_heads, causal,
         interpret):
    out = fused_ln_attention(x, wqkv, bqkv, wout, bout, ln_scale, ln_bias,
                             num_heads, causal, interpret)
    return out, (x, wqkv, bqkv, wout, bout, ln_scale, ln_bias)


def _bwd(num_heads, causal, interpret, res, g):
    x, wqkv, bqkv, wout, bout, ln_scale, ln_bias = res
    _, vjp = jax.vjp(
        lambda *a: _reference(*a, num_heads=num_heads, causal=causal),
        x, wqkv, bqkv, wout, bout, ln_scale, ln_bias)
    return vjp(g)


fused_ln_attention.defvjp(_fwd, _bwd)
