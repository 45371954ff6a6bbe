"""int8 w8a8 quantized serving head: numerics + model parity."""
import jax
import jax.numpy as jnp
import numpy as np

from smd_tpu.models import get_model
from smd_tpu.models.fuse import calibrate_head_act_scales, quantize_head_params
from smd_tpu.ops import quant


def test_quantize_weight_roundtrip(rng):
    w = jax.random.normal(rng, (64, 96)) * 0.05
    w_q, s = quant.quantize_weight(w)
    assert w_q.dtype == jnp.int8 and s.shape == (96,)
    deq = np.asarray(w_q, np.float32) * np.asarray(s)[None, :]
    err = np.abs(deq - np.asarray(w)).max()
    # per-channel symmetric: error bounded by half a quantization step
    assert err <= np.asarray(s).max() * 0.5 + 1e-8


def test_int8_dense_close_to_float(rng):
    k1, k2, k3 = jax.random.split(rng, 3)
    x = jax.random.normal(k1, (32, 16, 128))
    w = jax.random.normal(k2, (128, 256)) * 0.05
    b = jax.random.normal(k3, (256,)) * 0.1
    w_q, s = quant.quantize_weight(w)
    ref = np.asarray(x @ w + b)
    for a_scale in (None, float(jnp.max(jnp.abs(x))) / 127.0):
        out = np.asarray(quant.int8_dense(x, w_q, s, b, a_scale))
        rel = np.abs(out - ref).mean() / (np.abs(ref).mean() + 1e-9)
        assert rel < 0.02, (a_scale, rel)


def test_int8_dense_zero_row_safe():
    x = jnp.zeros((4, 128))
    w_q, s = quant.quantize_weight(jnp.ones((128, 64)) * 0.01)
    out = np.asarray(quant.int8_dense(x, w_q, s))
    assert np.isfinite(out).all() and np.abs(out).max() == 0.0


def test_quantized_head_model_matches_standard(rng):
    """quantize + calibrate static act scales ~ standard model output."""
    kwargs = dict(num_layers=1, num_heads=2, num_mlp_layers=2, mlp_dims=128)
    std = get_model("TransformerDDPM", **kwargs)
    quantized = get_model("TransformerDDPM", quantized_head=True, **kwargs)
    x = jax.random.normal(rng, (4, 8, 6))
    t = jnp.full((4, 1, 1), 0.3)
    params = std.init(jax.random.PRNGKey(0), x, t)
    q_params = quantize_head_params(params)
    # int8 leaves survive the conversion
    leaves = jax.tree_util.tree_leaves(q_params)
    assert any(getattr(l, "dtype", None) == jnp.int8 for l in leaves)

    # calibrate on inputs spanning the eval noise levels
    cal = [(jax.random.normal(jax.random.PRNGKey(i), (4, 8, 6)),
            jnp.full((4, 1, 1), tt))
           for i, tt in enumerate((0.1, 0.3, 0.9))]
    q_cal = calibrate_head_act_scales(quantized, q_params, cal)
    scales = [float(v) for k, v in jax.tree_util.tree_leaves_with_path(q_cal)
              if "a1_scale" in str(k) or "a2_scale" in str(k)]
    assert len(scales) == 4 and all(s != 1.0 for s in scales)

    out_std = np.asarray(std.apply(params, x, t))
    out_q = np.asarray(quantized.apply(q_cal, x, t))
    rel = np.abs(out_q - out_std).mean() / (np.abs(out_std).mean() + 1e-9)
    assert rel < 0.05, rel


def test_w8a8_kernel_matches_xla_int8_dense(rng):
    """The fused Pallas kernel (interpret mode) reproduces int8_dense:
    identical quantization semantics, int32 accumulation, dequant + bias."""
    from smd_tpu.ops import quant_matmul

    np_rng = np.random.default_rng(3)
    M, K, N = 320, 256, 384
    x = jnp.asarray(np_rng.normal(size=(M, K)) * 0.5, jnp.float32)
    w = jnp.asarray(np_rng.normal(size=(K, N)) * 0.05, jnp.float32)
    b = jnp.asarray(np_rng.normal(size=(N,)), jnp.float32)
    w_q, w_s = quant.quantize_weight(w)
    a_s = float(jnp.max(jnp.abs(x))) / 127.0

    assert quant_matmul.supported(M, K, N)
    ref = np.asarray(quant.int8_dense(x, w_q, w_s, b, a_s))
    out = np.asarray(quant_matmul.w8a8_dense(x, w_q, w_s, b, a_s,
                                             interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-4)

    # Lead-dim reshape path and the unsupported-shape fallback.
    out3 = np.asarray(quant_matmul.w8a8_dense(
        x.reshape(4, 80, K), w_q, w_s, b, a_s, interpret=True))
    np.testing.assert_allclose(out3.reshape(M, N), out, rtol=1e-6)
    assert not quant_matmul.supported(7, K, N)
    fb = np.asarray(quant_matmul.w8a8_dense(x[:7], w_q, w_s, b, a_s,
                                            interpret=True))
    np.testing.assert_allclose(fb, ref[:7], rtol=1e-5, atol=1e-4)


def test_quantized_head_kernel_model_matches_xla_path(rng):
    """quantized_head_kernel=True (Pallas, interpret on CPU) is numerically
    the XLA int8 path at model level: same params, same outputs."""
    kwargs = dict(num_layers=1, num_heads=2, num_mlp_layers=2, mlp_dims=128)
    std = get_model("TransformerDDPM", **kwargs)
    q_xla = get_model("TransformerDDPM", quantized_head=True, **kwargs)
    q_ker = get_model("TransformerDDPM", quantized_head=True,
                      quantized_head_kernel=True, **kwargs)
    x = jax.random.normal(rng, (4, 32, 6))   # M = 128: kernel-supported
    t = jnp.full((4, 1, 1), 0.3)
    params = quantize_head_params(std.init(jax.random.PRNGKey(0), x, t))
    out_xla = np.asarray(q_xla.apply(params, x, t))
    out_ker = np.asarray(q_ker.apply(params, x, t))
    np.testing.assert_allclose(out_ker, out_xla, rtol=1e-4, atol=1e-4)
