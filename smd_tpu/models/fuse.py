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

__all__ = ["fuse_attention_params", "fuse_head_params"]


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
