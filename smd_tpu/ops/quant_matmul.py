"""Fused w8a8 matmul as a Pallas TPU kernel: quantize + int8 MXU + dequant.

Why this exists (docs/DESIGN.md, round-2 measured negative): the XLA int8
head (``ops/quant.py``) realizes the 2x int8 MXU rate — matmul fusions drop
9.54 -> 6.43 ms/step on the flagship sampler — but XLA cannot fuse a
dtype-changing quantization into a convolution operand, so the activation
quantize (1.46 ms), the dequant reductions (0.93 ms) and the bias broadcast
(0.82 ms) each make an extra HBM round-trip that eats the entire MXU win
(net zero: 9.89 s vs 9.77 s north star).

This kernel removes exactly those HBM passes by doing all three stages in
VMEM within one program:

- the activation tile is quantized ONCE per M-stripe into an int8 VMEM
  scratch (``@pl.when(j == 0)``) and reused across all N-tiles — the
  round-2 fused-FiLM lesson was that a per-tile VPU prologue serializes
  against each MXU call; amortizing it 1/(N/bn) ways keeps the MXU busy;
- the matmul runs int8 x int8 -> int32 on the MXU
  (``preferred_element_type``), 2x the bf16 rate on v5e;
- dequantization (a_scale * w_scale[j]) and the bias add are the epilogue
  on the int32 accumulator tile, written back once as bf16.

Quantization semantics match ``ops/quant.py`` exactly (symmetric int8,
static activation scale, per-output-channel weight scales), so
``models.fuse.quantize_head_params`` + ``calibrate_head_act_scales``
artifacts serve both paths and the interpret-mode test asserts bit-equal
accumulators. The reference has no serving path at all; this is part of
the TPU-native serving story (reference samples through its training
graph, ``sample_ncsn.py:175-188``).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # importable on CPU; interpret mode backs the tests
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

__all__ = ["w8a8_dense", "supported"]

# int8 min tile is (32, 128); bf16 is (16, 128). Block candidates keep the
# M-stripe + weight stripe + scratch well under the ~16 MB VMEM budget at
# K = 2048 (x bf16 2*bm*K + xq int8 bm*K + w int8 K*bn + acc 4*bm*bn).
_BM_CANDIDATES = (512, 448, 384, 320, 256, 160, 128, 96, 64, 32)
_BN_CANDIDATES = (512, 256, 128)


def _pick(total, candidates):
    for c in candidates:
        if total % c == 0:
            return c
    return None


def supported(M: int, K: int, N: int) -> bool:
    """Shapes the kernel handles without padding (lane dim multiples of
    128, M divisible by an int8-legal stripe)."""
    if not _HAS_PLTPU:
        return False
    if K % 128 or N % 128:
        return False
    if _pick(M, _BM_CANDIDATES) is None or _pick(N, _BN_CANDIDATES) is None:
        return False
    # Whole-K stripes must fit VMEM comfortably.
    bm, bn = _pick(M, _BM_CANDIDATES), _pick(N, _BN_CANDIDATES)
    vmem = 2 * bm * K + bm * K + K * bn + 4 * bm * bn
    return vmem < 12 * 1024 * 1024


def _kernel(a_scale_ref, x_ref, w_ref, ws_ref, b_ref, o_ref, xq_ref):
    """One (i, j) program: j==0 quantizes the M-stripe, every j runs one
    int8 MXU tile + dequant/bias epilogue."""

    @pl.when(pl.program_id(1) == 0)
    def _quantize_stripe():
        # Plain division, not multiply-by-reciprocal: keeps the quantized
        # values bit-identical to ops.quant.int8_dense (tested), and the
        # divide runs once per M-stripe, amortized over the N tiles.
        xf = x_ref[...].astype(jnp.float32) / a_scale_ref[0]
        xq_ref[...] = jnp.clip(jnp.round(xf), -127.0, 127.0).astype(jnp.int8)

    acc = jax.lax.dot_general(
        xq_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    scale = a_scale_ref[0] * ws_ref[...]          # (1, bn)
    out = acc.astype(jnp.float32) * scale + b_ref[...]
    o_ref[...] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def _w8a8_2d(x, w_q, w_scale, a_scale, b, out_dtype, interpret):
    M, K = x.shape
    N = w_q.shape[1]
    bm = _pick(M, _BM_CANDIDATES)
    bn = _pick(N, _BN_CANDIDATES)
    grid = (M // bm, N // bn)
    a_scale = jnp.asarray(a_scale, jnp.float32).reshape(1)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((bm, K), lambda i, j: (i, 0)),
            pl.BlockSpec((K, bn), lambda i, j: (0, j)),
            # row vectors as (1, bn) 2-D blocks: 1-D VMEM layouts are
            # fragile in Mosaic; 2-D broadcasts cleanly against the tile.
            pl.BlockSpec((1, bn), lambda i, j: (0, j)),
            pl.BlockSpec((1, bn), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, K), jnp.int8)],
        interpret=interpret,
    )(a_scale, x, w_q,
      jnp.asarray(w_scale, jnp.float32).reshape(1, N),
      jnp.asarray(b, jnp.float32).reshape(1, N))
    return out


def w8a8_dense(x, w_q, w_scale, b=None, a_scale=None, *,
               interpret: bool = False):
    """Fused-quantized ``x @ dequant(w_q) + b`` (drop-in for
    ``ops.quant.int8_dense`` with a static activation scale).

    x: (..., K) float; w_q: (K, N) int8; w_scale: (N,) fp32; b: (N,) or
    None; a_scale: scalar static activation scale (required — the dynamic
    per-row mode measured slower than bf16 even before kernel fusion).
    Returns (..., N) in x.dtype.
    """
    if a_scale is None:
        raise ValueError("w8a8_dense requires a static activation scale "
                         "(calibrate with models.fuse."
                         "calibrate_head_act_scales)")
    lead = x.shape[:-1]
    K = x.shape[-1]
    N = w_q.shape[1]
    xf = x.reshape(-1, K)
    if not supported(xf.shape[0], K, N):
        # Shapes the kernel can't tile cleanly route to the XLA int8 path
        # (same math, separate quant/dequant passes).
        from smd_tpu.ops.quant import int8_dense
        return int8_dense(x, w_q, w_scale, b, a_scale).astype(x.dtype)
    if b is None:
        b = jnp.zeros((N,), jnp.float32)
    out = _w8a8_2d(xf, w_q, w_scale, a_scale, b,
                   out_dtype=x.dtype, interpret=interpret)
    return out.reshape(*lead, N)
