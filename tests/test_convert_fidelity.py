"""Checkpoint-converter fidelity against a faithfully reconstructed old tree.

Round-1 validated ``utils/convert.py`` only on synthetic trees with unique
shapes; positional pairing could silently mis-pair same-shape leaves (VERDICT
r1 weak #3). This test reconstructs the EXACT param-tree layout flax 0.3's
``flax.nn`` produced for the reference ``TransformerDDPM``
(``/root/reference/models/ncsn.py:138-179``): auto-names ``<Class>_<k>`` with
one call-order cursor shared across classes (param-less module calls like
``TransformerPositionalEncoding``/``NoiseEncoding``/``FeaturewiseAffine``
also consume a slot), attention children named query/key/value/out. It then
computes the reference forward pass independently (numpy-style, reading the
old tree BY NAME) and asserts the converted Linen model reproduces it —
which fails on ANY mis-pairing of the many same-shape leaves
(two identical transformer layers, two identical FiLM/resblock pairs).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smd_tpu.models import get_model
from smd_tpu.models.blocks import noise_encoding, positional_encoding
from smd_tpu.utils import convert

# Small but pairing-hazardous config: 2 identical layers, 2 identical
# FiLM+resblock head stages, embed fixed at 128 like the reference.
L, H, M, MLP, E, CH, S, B = 2, 2, 2, 16, 128, 6, 4, 3
DH = E // H


def _old_tree(rng):
    def dense(i, o):
        return {"kernel": rng.normal(size=(i, o)).astype(np.float32) * 0.2,
                "bias": rng.normal(size=(o,)).astype(np.float32) * 0.1}

    def ln(d):
        return {"scale": rng.normal(size=(d,)).astype(np.float32) * 0.1 + 1,
                "bias": rng.normal(size=(d,)).astype(np.float32) * 0.1}

    def attn():
        def dg(shape):
            return rng.normal(size=shape).astype(np.float32) * 0.2
        return {
            "query": {"kernel": dg((E, H, DH)), "bias": dg((H, DH))},
            "key": {"kernel": dg((E, H, DH)), "bias": dg((H, DH))},
            "value": {"kernel": dg((E, H, DH)), "bias": dg((H, DH))},
            "out": {"kernel": dg((H, DH, E)), "bias": dg((E,))},
        }

    tree = {}
    cur = 0   # shared auto-name cursor

    def name(cls):
        nonlocal cur
        n = f"{cls}_{cur}"
        cur += 1
        return n

    name("TransformerPositionalEncoding")        # param-less, consumes slot
    tree[name("Dense")] = dense(CH, E)
    for _ in range(L):
        tree[name("LayerNorm")] = ln(E)
        tree[name("SelfAttention")] = attn()
        tree[name("LayerNorm")] = ln(E)
        tree[name("Dense")] = dense(E, MLP)
        tree[name("Dense")] = dense(MLP, E)
    tree[name("LayerNorm")] = ln(E)
    tree[name("Dense")] = dense(E, MLP)
    for _ in range(M):
        film = {}
        fcur = 0
        fcur += 1   # NoiseEncoding_0, param-less
        film[f"Dense_{fcur}"] = dense(E, E * 4); fcur += 1
        film[f"Dense_{fcur}"] = dense(E * 4, E * 4); fcur += 1
        film[f"Dense_{fcur}"] = dense(E * 4, MLP); fcur += 1   # scale
        film[f"Dense_{fcur}"] = dense(E * 4, MLP); fcur += 1   # shift
        tree[name("DenseFiLM")] = film
        res = {"LayerNorm_0": ln(MLP),
               # FeaturewiseAffine_1: param-less
               "Dense_2": dense(MLP, MLP),
               "LayerNorm_3": ln(MLP),
               # FeaturewiseAffine_4: param-less
               "Dense_5": dense(MLP, MLP)}
        tree[name("DenseResBlock")] = res
    tree[name("LayerNorm")] = ln(MLP)
    tree[name("Dense")] = dense(MLP, CH)
    return tree


# -- independent oracle: the reference's math, reading old params BY NAME --

def _dense(p, x):
    return x @ p["kernel"] + p["bias"]


def _ln(p, x, eps=1e-6):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * p["scale"] + p["bias"]


def _attn(p, x):
    q = np.einsum("bse,ehd->bshd", x, p["query"]["kernel"]) \
        + p["query"]["bias"]
    k = np.einsum("bse,ehd->bshd", x, p["key"]["kernel"]) + p["key"]["bias"]
    v = np.einsum("bse,ehd->bshd", x, p["value"]["kernel"]) \
        + p["value"]["bias"]
    scores = np.einsum("bqhd,bkhd->bhqk", q / np.sqrt(DH), k)
    w = np.asarray(jax.nn.softmax(jnp.asarray(scores), axis=-1))
    o = np.einsum("bhqk,bkhd->bqhd", w, v)
    return np.einsum("bqhd,hde->bqe", o, p["out"]["kernel"]) \
        + p["out"]["bias"]


def _gelu(x):
    return np.asarray(jax.nn.gelu(jnp.asarray(x)))


def _swish(x):
    return x / (1.0 + np.exp(-x))


def _reference_forward(tree, x, t):
    """reference/models/ncsn.py:138-179 (TransformerDDPM.apply)."""
    cur = 1   # slot 0 = TransformerPositionalEncoding
    def nxt(cls):
        nonlocal cur
        n = f"{cls}_{cur}"
        cur += 1
        return tree.get(n), n

    temb = np.asarray(positional_encoding(S, E))[None]
    p, _ = nxt("Dense")
    h = _dense(p, x) + temb
    for _ in range(L):
        shortcut = h
        h = _ln(nxt("LayerNorm")[0], h)
        h = _attn(nxt("SelfAttention")[0], h)
        h = h + shortcut
        shortcut2 = h
        h = _ln(nxt("LayerNorm")[0], h)
        h = _dense(nxt("Dense")[0], h)
        h = _gelu(h)
        h = _dense(nxt("Dense")[0], h)
        h = h + shortcut2
    h = _ln(nxt("LayerNorm")[0], h)
    h = _dense(nxt("Dense")[0], h)
    for _ in range(M):
        film, _ = nxt("DenseFiLM")
        pos = np.asarray(noise_encoding(jnp.asarray(t).reshape(-1), E))
        pos = _swish(_dense(film["Dense_1"], pos))
        pos = _dense(film["Dense_2"], pos)
        pos = pos[:, None, :]   # sequence=True
        scale = _dense(film["Dense_3"], pos)
        shift = _dense(film["Dense_4"], pos)
        res, _ = nxt("DenseResBlock")
        o = _ln(res["LayerNorm_0"], h)
        o = _swish(scale * o + shift)
        o = _dense(res["Dense_2"], o)
        o = _ln(res["LayerNorm_3"], o)
        o = _swish(scale * o + shift)
        o = _dense(res["Dense_5"], o)
        h = o + h   # no shortcut projection: widths match
    h = _ln(nxt("LayerNorm")[0], h)
    return _dense(nxt("Dense")[0], h)


@pytest.fixture(scope="module")
def case():
    rng = np.random.default_rng(42)
    tree = _old_tree(rng)
    x = rng.normal(size=(B, S, CH)).astype(np.float32) * 0.5
    t = np.full((B, 1, 1), 0.37, np.float32)
    return tree, x, t


def test_converted_params_reproduce_reference_forward(case):
    tree, x, t = case
    oracle = _reference_forward(tree, x, t)

    model = get_model("TransformerDDPM", num_layers=L, num_heads=H,
                      num_mlp_layers=M, mlp_dims=MLP)
    template, order = convert.linen_call_order(
        model, jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(t))
    params = convert.convert_params(tree, template, order)
    out = np.asarray(model.apply(params, jnp.asarray(x), jnp.asarray(t)))
    np.testing.assert_allclose(out, oracle, rtol=2e-4, atol=2e-4)


def test_convert_insensitive_to_paramless_slot_convention(case):
    """If flax 0.3 did NOT give param-less calls a name slot, only the
    numeric suffixes shift — relative order is identical, so conversion
    must produce the same pairing."""
    tree, x, t = case

    def shift_names(node):
        if not isinstance(node, dict) or "kernel" in node or \
                "scale" in node or set(node) <= {"query", "key", "value",
                                                 "out"}:
            return node
        items = sorted(node.items(), key=lambda kv: convert._order_key(
            kv[0]))
        out = {}
        for i, (k, v) in enumerate(items):
            base = k.rsplit("_", 1)[0]
            out[f"{base}_{i}"] = shift_names(v)
        return out

    dense_tree = shift_names(tree)
    model = get_model("TransformerDDPM", num_layers=L, num_heads=H,
                      num_mlp_layers=M, mlp_dims=MLP)
    template, order = convert.linen_call_order(
        model, jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(t))
    p1 = convert.convert_params(tree, template, order)
    p2 = convert.convert_params(dense_tree, template, order)
    jax.tree_util.tree_map(np.testing.assert_array_equal, p1, p2)
