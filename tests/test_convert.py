"""Checkpoint converter tests: old flax.nn layout -> Linen template.

Builds a synthetic old-format tree by walking the Linen model's true call
order (captured by interceptor) and renaming with the old shared-cursor
convention, then converts back and checks exact value placement.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smd_tpu.models import get_model
from smd_tpu.utils import convert


def _template_and_order(model, shape, cond=True):
    x = jnp.zeros((1, *shape))
    if cond:
        c = jnp.zeros((1, *([1] * len(shape))))
        return convert.linen_call_order(model, jax.random.PRNGKey(0), x, c)
    return convert.linen_call_order(model, jax.random.PRNGKey(0), x)


def _fill_unique(template):
    counter = [0]

    def fill(leaf):
        counter[0] += 1
        return np.full(np.asarray(leaf).shape, float(counter[0]), np.float32)

    return jax.tree_util.tree_map(fill, template)


def _to_old_format(params, order):
    """Rebuild our Linen tree as an old-flax tree with shared-cursor names."""
    tpl = params["params"]
    old = {}
    cursors = {(): 0}
    name_map = {(): ()}

    def old_path_for(path):
        if path in name_map:
            return name_map[path]
        parent_old = old_path_for(path[:-1])
        cls = path[-1].split("_")[0]
        if cls == "MultiHeadSelfAttention":
            cls = "SelfAttention"
        if path[-1] in ("qkv", "out"):
            # handled by caller (attention children keep fixed names)
            raise AssertionError
        idx = cursors.setdefault(parent_old, 0)
        cursors[parent_old] = idx + 1
        name_map[path] = parent_old + (f"{cls}_{idx}",)
        cursors.setdefault(name_map[path], 0)
        return name_map[path]

    def node_at(tree, path):
        for p in path:
            tree = tree[p]
        return tree

    def insert(dst, path, leafs):
        for p in path:
            dst = dst.setdefault(p, {})
        dst.update(leafs)

    for path in order:
        node = tpl
        ok = True
        for p in path:
            if p not in node:
                ok = False
                break
            node = node[p]
        if not ok:
            continue
        leaves = {k: np.asarray(v) for k, v in node.items()
                  if not isinstance(v, dict)}
        if not leaves:
            continue
        if path[-1] == "qkv":
            attn_old = old_path_for(path[:-1])
            kern, bias = leaves["kernel"], leaves["bias"]
            for i, nm in enumerate(("query", "key", "value")):
                insert(old, attn_old + (nm,), {"kernel": kern[:, i],
                                               "bias": bias[i]})
        elif path[-1] == "out" and path[:-1] in name_map and \
                name_map[path[:-1]][-1].startswith("SelfAttention"):
            insert(old, old_path_for(path[:-1])[:0] +
                   name_map[path[:-1]] + ("out",), leaves)
        else:
            insert(old, old_path_for(path), leaves)
    return old


@pytest.mark.parametrize("name,kwargs,shape,cond", [
    ("DenseDDPM", dict(num_layers=2, mlp_dims=32), (10,), True),
    ("TransformerDDPM", dict(num_layers=2, num_heads=4, num_mlp_layers=2,
                             mlp_dims=64), (8, 6), True),
    ("TransformerMDN", dict(num_layers=1, num_heads=2, num_mlp_layers=1,
                            mlp_dims=32, mdn_mixtures=3), (8, 6), False),
])
def test_convert_roundtrip(name, kwargs, shape, cond):
    model = get_model(name, **kwargs)
    template, order = _template_and_order(model, shape, cond)
    unique = _fill_unique(template)
    old = _to_old_format(unique, order)

    converted = convert.convert_params(old, template, order)

    flat_a = jax.tree_util.tree_leaves_with_path(unique)
    flat_b = jax.tree_util.tree_leaves_with_path(converted)
    assert len(flat_a) == len(flat_b)
    for (pa, a), (pb, b) in zip(flat_a, flat_b):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_convert_shape_mismatch_raises():
    model = get_model("DenseDDPM", num_layers=1, mlp_dims=16)
    template, order = _template_and_order(model, (4,), True)
    old = _to_old_format(_fill_unique(template), order)

    def corrupt(node):
        for k, v in node.items():
            if isinstance(v, dict):
                if corrupt(v):
                    return True
            elif k == "kernel":
                node[k] = v[:, :-1]
                return True
        return False

    corrupt(old)
    with pytest.raises(ValueError):
        convert.convert_params(old, template, order)


def test_converted_params_run():
    model = get_model("TransformerDDPM", num_layers=1, num_heads=2,
                      num_mlp_layers=1, mlp_dims=32)
    template, order = _template_and_order(model, (4, 6), True)
    old = _to_old_format(template, order)
    converted = convert.convert_params(old, template, order)
    x = jnp.ones((2, 4, 6))
    t = jnp.full((2, 1, 1), 0.5)
    out_a = model.apply(template, x, t)
    out_b = model.apply(converted, x, t)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b),
                               atol=1e-6)


def test_find_param_tree_prefers_ema():
    """The converter CLI locates the EMA params inside the restored tuple."""
    import importlib.util, os, sys
    spec = importlib.util.spec_from_file_location(
        "convert_cli", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "scripts",
            "convert_reference_checkpoint.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules["convert_cli"] = spec.loader.load_module("convert_cli")
    mod = sys.modules["convert_cli"]

    restored = {
        "0": {"target": {"params": {"Dense_0": {"kernel": np.ones((2, 2))}}},
              "state": {}},
        "1": {"mu": 0.999,
              "params": {"Dense_0": {"kernel": np.full((2, 2), 7.0)}}},
        "2": {"best_metric": 1.0},
    }
    from absl import flags
    flags.FLAGS.mark_as_parsed()
    tree = mod._find_param_tree(restored)
    np.testing.assert_allclose(tree["Dense_0"]["kernel"], 7.0)
