"""Blockwise (flash) self-attention as a Pallas TPU kernel.

The reference computes dense S x S attention via old-flax ``nn.SelfAttention``
(``models/ncsn.py:161``). This kernel computes the same softmax attention
blockwise with an online softmax: O(S) memory, fp32 accumulation on the MXU,
no S x S materialization in HBM. Because it is already blockwise over the
sequence axis, adding a context-parallel mesh axis later is a BlockSpec /
shard_map change rather than a rewrite (SURVEY.md §2 parallelism table).

Layout: q, k, v are (B, S, H, Dh); internally heads fold into the batch grid
axis. Queries are scaled by the caller (matching flax semantics where the
1/sqrt(Dh) scale is applied to q before the kernel).

The backward pass recomputes attention from the saved inputs (standard flash
recompute strategy) using an einsum formulation that XLA fuses well; the
training-time sequence length here is small, so the forward kernel is the
inference/sampling fast path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu is importable on CPU too; interpret mode backs the tests.
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

__all__ = ["flash_attention", "supported"]

_NEG_INF = -1e30


def supported(seq_len: int, head_dim: int, dtype) -> bool:
    """Whether the kernel handles this shape without padding."""
    if not _HAS_PLTPU:
        return False
    if dtype not in (jnp.float32, jnp.bfloat16):
        return False
    # Sequences shorter than one (128-lane) tile can't fill the kernel's
    # blocks; XLA's fused einsum path is faster there anyway.
    return seq_len >= 128 and seq_len % _pick_block(seq_len) == 0


def _pick_block(seq_len: int) -> int:
    for cand in (512, 256, 128):
        if seq_len % cand == 0:
            return cand
    return seq_len


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, block_k: int, causal: bool,
                 seq_len: int, block_diag: int = 0):
    """One (batch*head, q-block) program: online-softmax over k blocks.

    ``block_diag > 0`` restricts attention to block-diagonal groups of that
    size — the packed-short-sequence mode where several independent batch
    items share one MXU-sized sequence.
    """
    qi = pl.program_id(1)
    block_q = q_ref.shape[0]
    head_dim = q_ref.shape[1]

    q = q_ref[...].astype(jnp.float32)

    m0 = jnp.full((block_q, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc0 = jnp.zeros((block_q, head_dim), jnp.float32)

    if causal:
        # Only k blocks at or left of the diagonal contribute.
        num_kb = (qi * block_q) // block_k + 1
    else:
        num_kb = seq_len // block_k

    def body(j, carry):
        m, l, acc = carry
        k = k_ref[pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if causal or block_diag:
            rows = qi * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            cols = j * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1)
            keep = None
            if causal:
                keep = cols <= rows
            if block_diag:
                same = (cols // block_diag) == (rows // block_diag)
                keep = same if keep is None else jnp.logical_and(keep, same)
            s = jnp.where(keep, s, _NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return m_new, l, acc

    m, l, acc = jax.lax.fori_loop(0, num_kb, body, (m0, l0, acc0))
    o_ref[...] = (acc / l).astype(o_ref.dtype)


def _flash_fwd(q, k, v, causal: bool, interpret: bool, block_diag: int = 0):
    B, S, H, Dh = q.shape
    block_q = _pick_block(S)
    block_k = block_q

    def fold(x):  # (B, S, H, D) -> (B*H, S, D)
        return x.transpose(0, 2, 1, 3).reshape(B * H, S, Dh)

    qf, kf, vf = fold(q), fold(k), fold(v)

    kernel = functools.partial(_attn_kernel, block_k=block_k, causal=causal,
                               seq_len=S, block_diag=block_diag)
    grid = (B * H, S // block_q)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, block_q, Dh), lambda b, i: (b, i, 0)),
            pl.BlockSpec((None, S, Dh), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((None, S, Dh), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, block_q, Dh), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B * H, S, Dh), q.dtype),
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(B, H, S, Dh).transpose(0, 2, 1, 3)


def _reference_attention(q, k, v, causal: bool, block_diag: int = 0):
    S = q.shape[1]
    scores = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                        k.astype(jnp.float32))
    keep = None
    if causal:
        keep = jnp.tril(jnp.ones((S, S), bool))
    if block_diag:
        idx = jnp.arange(S) // block_diag
        same = idx[:, None] == idx[None, :]
        keep = same if keep is None else keep & same
    if keep is not None:
        scores = jnp.where(keep[None, None], scores, _NEG_INF)
    weights = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", weights, v.astype(jnp.float32))
    return out.astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flash_attention(q, k, v, causal: bool = False, interpret: bool = False,
                    block_diag: int = 0):
    """Softmax attention over (B, S, H, Dh) tensors; q pre-scaled by caller."""
    return _flash_fwd(q, k, v, causal, interpret, block_diag)


def _fwd(q, k, v, causal, interpret, block_diag):
    return _flash_fwd(q, k, v, causal, interpret, block_diag), (q, k, v)


def _bwd(causal, interpret, block_diag, residuals, g):
    q, k, v = residuals
    _, vjp = jax.vjp(
        lambda q, k, v: _reference_attention(q, k, v, causal, block_diag),
        q, k, v)
    return vjp(g)


flash_attention.defvjp(_fwd, _bwd)


def pack_group(batch: int, seq_len: int, max_packed: int = 256) -> int:
    """Largest G dividing ``batch`` with G*seq_len a supported packed length."""
    best = 1
    for g in range(2, max_packed // seq_len + 1):
        packed = g * seq_len
        if batch % g == 0 and packed % 128 == 0:
            best = g
    return best


def packed_short_seq_attention(q, k, v, causal: bool = False,
                               interpret: bool = False):
    """Attention for short sequences via batch packing.

    At S=32, Dh=16 the per-(batch, head) matmuls are (32,16)x(16,32) — a few
    percent of an MXU tile, and XLA spends ~40% of the reference sampler's
    step time there. Packing G batch items into one G*S sequence with a
    block-diagonal mask turns them into full-width (G*S, Dh)x(Dh, G*S) tiles
    inside the flash kernel with no HBM score materialization. Exact same
    math: softmax over a block-diagonal row never mixes groups, and causal
    masking composes (global order == local order within a block).
    """
    B, S, H, Dh = q.shape
    g = pack_group(B, S)
    if g == 1:
        return None  # caller falls back
    qp = q.reshape(B // g, g * S, H, Dh)
    kp = k.reshape(B // g, g * S, H, Dh)
    vp = v.reshape(B // g, g * S, H, Dh)
    out = flash_attention(qp, kp, vp, causal, interpret, S)
    return out.reshape(B, S, H, Dh)
