"""Convert standard-layout transformer params to the fused serving layout.

Standard layout (training): ``TransformerLayer_k/{LayerNorm_0,
MultiHeadSelfAttention_0/{qkv,out}, LayerNorm_1, Dense_0, Dense_1}`` with
qkv kernel (E, 3, H, Dh) and out kernel (H, Dh, E).

Fused layout (serving, ``fused_attention=True``): ``FusedTransformerLayer_k/
{wqkv (E,3E), bqkv, wout (E,E), bout, ln_scale, ln_bias, LayerNorm_0,
Dense_0, Dense_1}``.

Mathematically identical: this is a pure reshape/rename. Train in the
standard layout (converter-compatible with reference checkpoints), fuse for
the production sampling path.
"""
from __future__ import annotations

import numpy as np

__all__ = ["fuse_attention_params", "fuse_head_params",
           "quantize_head_params", "calibrate_head_act_scales"]


def _fuse_layer(layer):
    out = {}
    attn = layer["MultiHeadSelfAttention_0"]
    qkv_kernel = np.asarray(attn["qkv"]["kernel"])     # (E, 3, H, Dh)
    E = qkv_kernel.shape[0]
    out["wqkv"] = qkv_kernel.reshape(E, -1)
    out["bqkv"] = np.asarray(attn["qkv"]["bias"]).reshape(-1)
    out_kernel = np.asarray(attn["out"]["kernel"])     # (H, Dh, E)
    out["wout"] = out_kernel.reshape(-1, E)
    out["bout"] = np.asarray(attn["out"]["bias"]).reshape(-1)
    out["ln_scale"] = np.asarray(layer["LayerNorm_0"]["scale"])
    out["ln_bias"] = np.asarray(layer["LayerNorm_0"]["bias"])
    # The MLP half keeps its names, but the fused layer has only one
    # LayerNorm module, so LayerNorm_1 -> LayerNorm_0.
    out["LayerNorm_0"] = dict(layer["LayerNorm_1"])
    out["Dense_0"] = dict(layer["Dense_0"])
    out["Dense_1"] = dict(layer["Dense_1"])
    return out


def fuse_attention_params(params):
    """Rewrite every TransformerLayer_k subtree into FusedTransformerLayer_k.

    Works on the pytree from ``model.init`` / a restored checkpoint; returns
    a tree loadable by the same architecture with ``fused_attention=True``.
    """
    def rec(node):
        out = {}
        for k, v in node.items():
            if k.startswith("TransformerLayer_"):
                idx = k.split("_")[-1]
                out[f"FusedTransformerLayer_{idx}"] = _fuse_layer(v)
            elif isinstance(v, dict):
                out[k] = rec(v)
            else:
                out[k] = v
        return out

    if "params" in params:
        return {"params": rec(params["params"])}
    return rec(params)


def _fuse_resblock(block):
    """DenseResBlock params -> FusedDenseResBlock flat layout (pure rename)."""
    return {
        "ln1_scale": np.asarray(block["LayerNorm_0"]["scale"]),
        "ln1_bias": np.asarray(block["LayerNorm_0"]["bias"]),
        "w1": np.asarray(block["Dense_0"]["kernel"]),
        "b1": np.asarray(block["Dense_0"]["bias"]),
        "ln2_scale": np.asarray(block["LayerNorm_1"]["scale"]),
        "ln2_bias": np.asarray(block["LayerNorm_1"]["bias"]),
        "w2": np.asarray(block["Dense_1"]["kernel"]),
        "b2": np.asarray(block["Dense_1"]["bias"]),
    }


def fuse_head_params(params):
    """Rewrite DenseResBlock_k subtrees into FusedDenseResBlock_k.

    Loadable by the same architecture with ``fused_head=True``. Shortcut
    projections (Dense_2) never occur in the head (width is constant).
    """
    def rec(node):
        out = {}
        for k, v in node.items():
            if k.startswith("DenseResBlock_"):
                assert "Dense_2" not in v, "fused head has no shortcut proj"
                idx = k.split("_")[-1]
                out[f"FusedDenseResBlock_{idx}"] = _fuse_resblock(v)
            elif isinstance(v, dict):
                out[k] = rec(v)
            else:
                out[k] = v
        return out

    if "params" in params:
        return {"params": rec(params["params"]),
                **{k: v for k, v in params.items() if k != "params"}}
    return rec(params)


def _quantize_resblock(block):
    """DenseResBlock params -> QuantDenseResBlock int8 layout."""
    from smd_tpu.ops.quant import quantize_weight

    w1_q, w1_s = quantize_weight(np.asarray(block["Dense_0"]["kernel"]))
    w2_q, w2_s = quantize_weight(np.asarray(block["Dense_1"]["kernel"]))
    return {
        "LayerNorm_0": dict(block["LayerNorm_0"]),
        "LayerNorm_1": dict(block["LayerNorm_1"]),
        "w1_q": np.asarray(w1_q), "w1_scale": np.asarray(w1_s),
        "b1": np.asarray(block["Dense_0"]["bias"]),
        "a1_scale": np.asarray(1.0, np.float32),
        "w2_q": np.asarray(w2_q), "w2_scale": np.asarray(w2_s),
        "b2": np.asarray(block["Dense_1"]["bias"]),
        "a2_scale": np.asarray(1.0, np.float32),
    }


def quantize_head_params(params):
    """Rewrite DenseResBlock_k subtrees into int8 QuantDenseResBlock_k.

    Loadable by the same architecture with ``quantized_head=True``. The int8
    leaves must NOT be cast afterwards (keep the tree's dtypes as returned).
    Activation scales default to 1.0 — calibrate them on representative
    inputs with ``calibrate_head_act_scales`` before static-scale serving.
    """
    def rec(node):
        out = {}
        for k, v in node.items():
            if k.startswith("DenseResBlock_"):
                assert "Dense_2" not in v, "quantized head has no shortcut"
                idx = k.split("_")[-1]
                out[f"QuantDenseResBlock_{idx}"] = _quantize_resblock(v)
            elif isinstance(v, dict):
                out[k] = rec(v)
            else:
                out[k] = v
        return out

    if "params" in params:
        return {"params": rec(params["params"]),
                **{k: v for k, v in params.items() if k != "params"}}
    return rec(params)


def calibrate_head_act_scales(model, params, batches, margin=1.0,
                              rounds=2):
    """Calibrate static int8 activation scales for the quantized head.

    model: the architecture with ``quantized_head=True``; params: the tree
    from ``quantize_head_params``; batches: iterable of (x, t) calibration
    inputs — for a diffusion sampler, states + noise levels spanning the
    sampling trajectory (see ``benchmarks/flagship_e2e.py``). Runs the model
    with the ``intermediates`` collection mutable so each QuantDenseResBlock
    sows the amax of its pre-matmul activations, maxes the observations over
    batches, and returns a params tree with ``a{1,2}_scale = margin * amax
    / 127`` baked in.

    ``rounds``: calibration iterations. Observations downstream of a
    still-uncalibrated matmul (e.g. a2 during the first pass, when the
    first matmul quantizes with scale 1.0) are distorted; a second pass
    re-observes under the first pass's scales. Two rounds converge.
    """
    for _ in range(max(rounds, 1)):
        params = _calibrate_once(model, params, batches, margin)
    return params


def _calibrate_once(model, params, batches, margin):
    import jax

    amax = {}
    for x, t in batches:
        _, mut = model.apply(params, x, t, mutable=["intermediates"])

        def walk(node, path):
            for k, v in node.items():
                if isinstance(v, dict):
                    walk(v, path + (k,))
                else:  # sow stores a tuple of observations per call site
                    cur = max(float(o) for o in v)
                    key = path + (k,)
                    amax[key] = max(amax.get(key, 0.0), cur)
        walk(mut["intermediates"], ())

    out = jax.tree_util.tree_map(lambda p: p, params)  # shallow-safe copy

    def set_path(tree, path, value):
        node = tree
        for k in path[:-1]:
            node[k] = dict(node[k])
            node = node[k]
        node[path[-1]] = np.asarray(value, np.float32)

    out = {k: (dict(v) if isinstance(v, dict) else v) for k, v in out.items()}
    # sow paths are relative to the module root; params trees carry the
    # top-level "params" collection key.
    base = ("params",) if "params" in out else ()
    for key, m in amax.items():
        scale_name = {"a1_amax": "a1_scale", "a2_amax": "a2_scale"}[key[-1]]
        set_path(out, base + key[:-1] + (scale_name,),
                 max(margin * m / 127.0, 1e-12))
    return out
