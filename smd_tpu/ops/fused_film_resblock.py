"""Fused FiLM-resblock halves: LN + affine + swish + Dense (+ residual).

Motivation (docs/DESIGN.md): the FiLM-conditioned resblock head is the
largest slice of the DDPM sampler step (~7 ms of 12.9 ms at the north-star
shapes). Its two 2048x2048 matmuls already run near MXU peak under XLA, but
the LayerNorm -> FiLM affine -> swish chain between them materializes
(B*S, 2048) intermediates to HBM — ~1 GB of avoidable traffic per sampler
step. This kernel computes one resblock *half* entirely in VMEM for a tile
of NB batch items:

    y = swish(LN(x) * scale + shift) @ W + b  [+ residual]

LN/affine/swish run in fp32 on the VPU; the matmul feeds the MXU in bf16
with fp32 accumulation (casting W to fp32 would halve MXU throughput). The
weight matrix (8.4 MB bf16 at 2048x2048) stays resident in VMEM across the
row grid. A full resblock is two calls: the second adds the block input as
``residual``.

Serving-path only — the backward pass recomputes via the reference
formulation (same strategy as ``fused_attention.py``).

Reference topology: ``models/shared.py:58-75`` (DenseResBlock) conditioned
by ``models/ncsn.py:44-61`` (DenseFiLM) — the math here is identical, only
the schedule differs.
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

__all__ = ["fused_ln_film_swish_dense", "supported"]


_VMEM_BUDGET = 14 * 1024 * 1024


def _row_bytes(width: int, w_itemsize: int) -> int:
    # fp32 intermediates (x, h, accum) + double-buffered in/out tiles.
    return width * (3 * 4 + 2 * w_itemsize + 2 * w_itemsize)


def supported(batch: int, seq_len: int, width: int,
              w_itemsize: int = 2) -> bool:
    if not _HAS_PLTPU:
        return False
    if width % 128 or width * width * w_itemsize > 9 * 1024 * 1024:
        return False
    nb = _pick_nb(batch, seq_len, width, w_itemsize)
    return nb >= 1 and (nb * seq_len) % 8 == 0


def _pick_nb(batch: int, seq_len: int, width: int, w_itemsize: int) -> int:
    """Batch items per tile: largest divisor fitting the VMEM budget.

    Budget = weight matrix (resident) + per-row fp32 intermediates +
    double-buffered in/out tiles; rows per tile capped at 512.
    """
    budget = _VMEM_BUDGET - width * width * w_itemsize
    max_rows = max(budget // _row_bytes(width, w_itemsize), 8)
    best = 0
    for nb in range(1, max(512 // seq_len, 1) + 1):
        if batch % nb == 0 and nb * seq_len <= min(512, max_rows):
            best = nb
    return best


def _kernel(x_ref, scale_ref, shift_ref, w_ref, b_ref, o_ref):
    _ln_film_swish_dense_body(x_ref, scale_ref, shift_ref, w_ref, b_ref,
                              None, o_ref)


def _kernel_res(x_ref, scale_ref, shift_ref, w_ref, b_ref, res_ref, o_ref):
    _ln_film_swish_dense_body(x_ref, scale_ref, shift_ref, w_ref, b_ref,
                              res_ref, o_ref)


def _ln_film_swish_dense_body(x_ref, scale_ref, shift_ref, w_ref, b_ref,
                              res_ref, o_ref):
    NB, S, K = x_ref.shape
    x = x_ref[...].astype(jnp.float32)

    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    h = (x - mean) * jax.lax.rsqrt(var + 1e-6)
    # FiLM affine: scale/shift are per batch item, broadcast over S.
    h = h * scale_ref[...].astype(jnp.float32) + \
        shift_ref[...].astype(jnp.float32)
    h = h * jax.nn.sigmoid(h)   # swish, fp32 on the VPU

    # MXU: bf16 operands, fp32 accumulation.
    out = jax.lax.dot_general(
        h.reshape(NB * S, K).astype(w_ref.dtype), w_ref[...],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    out = out + b_ref[...].astype(jnp.float32)
    if res_ref is not None:
        out = out + res_ref[...].astype(jnp.float32).reshape(NB * S, -1)
    o_ref[...] = out.reshape(NB, S, -1).astype(o_ref.dtype)


def _call(x, scale, shift, w, b, residual, interpret):
    B, S, K = x.shape
    N = w.shape[1]
    nb = _pick_nb(B, S, K, w.dtype.itemsize)
    specs = [
        pl.BlockSpec((nb, S, K), lambda i: (i, 0, 0)),
        pl.BlockSpec((nb, 1, K), lambda i: (i, 0, 0)),
        pl.BlockSpec((nb, 1, K), lambda i: (i, 0, 0)),
        pl.BlockSpec((K, N), lambda i: (0, 0)),
        pl.BlockSpec((N,), lambda i: (0,)),
    ]
    args = [x, scale, shift, w, b]
    kernel = _kernel
    if residual is not None:
        specs.append(pl.BlockSpec((nb, S, N), lambda i: (i, 0, 0)))
        args.append(residual)
        kernel = _kernel_res
    return pl.pallas_call(
        kernel,
        grid=(B // nb,),
        in_specs=specs,
        out_specs=pl.BlockSpec((nb, S, N), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, S, N), x.dtype),
        interpret=interpret,
    )(*args)


def _reference(x, scale, shift, w, b, residual=None):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, -1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), -1, keepdims=True)
    h = (xf - mean) * jax.lax.rsqrt(var + 1e-6)
    h = h * scale.astype(jnp.float32) + shift.astype(jnp.float32)
    h = h * jax.nn.sigmoid(h)
    out = jnp.einsum("bsk,kn->bsn", h.astype(w.dtype), w,
                     preferred_element_type=jnp.float32)
    out = out + b.astype(jnp.float32)
    if residual is not None:
        out = out + residual.astype(jnp.float32)
    return out.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def fused_ln_film_swish_dense(x, scale, shift, w, b, residual=None,
                              interpret: bool = False):
    """y = swish(LN(x) * scale + shift) @ w + b [+ residual].

    Shapes: x (B, S, K); scale/shift (B, 1, K); w (K, N); b (N,);
    residual (B, S, N) or None. Returns (B, S, N) in x.dtype.
    """
    return _call(x, scale, shift, w, b, residual, interpret)


def _fwd(x, scale, shift, w, b, residual, interpret):
    out = _call(x, scale, shift, w, b, residual, interpret)
    return out, (x, scale, shift, w, b, residual)


def _bwd(interpret, res, g):
    x, scale, shift, w, b, residual = res
    if residual is None:
        _, vjp = jax.vjp(lambda *a: _reference(*a), x, scale, shift, w, b)
        return (*vjp(g), None)
    _, vjp = jax.vjp(lambda *a: _reference(*a), x, scale, shift, w, b,
                     residual)
    return vjp(g)


fused_ln_film_swish_dense.defvjp(_fwd, _bwd)
