"""Convert a reference flax-0.3 checkpoint into an smd_tpu params pickle.

Reads the msgpack written by the reference's
``flax.training.checkpoints.save_checkpoint`` on the ``(optimizer, ema,
early_stop)`` tuple, extracts the (EMA or live) param tree, and maps it onto
the matching smd_tpu Linen architecture (see ``smd_tpu/utils/convert.py``).

Usage:
  python scripts/convert_reference_checkpoint.py \
      --checkpoint=save/mel512-ddpm-32seq/checkpoint_12 \
      --architecture=TransformerDDPM --num_layers=6 --num_heads=8 \
      --num_mlp_layers=2 --mlp_dims=2048 --data_shape=32,42 \
      --output=converted_params.pkl
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from absl import app, flags, logging

FLAGS = flags.FLAGS
flags.DEFINE_string("checkpoint", None, "Reference checkpoint file.")
flags.DEFINE_string("output", "converted_params.pkl", "Output pickle.")
flags.DEFINE_string("architecture", "TransformerDDPM", "Architecture name.")
flags.DEFINE_integer("num_layers", 6, "Encoder layers.")
flags.DEFINE_integer("num_heads", 8, "Attention heads.")
flags.DEFINE_integer("num_mlp_layers", 2, "MLP layers.")
flags.DEFINE_integer("mlp_dims", 2048, "MLP width.")
flags.DEFINE_integer("mdn_components", 100, "MDN mixtures.")
flags.DEFINE_list("data_shape", ["32", "42"], "Per-example data shape.")
flags.DEFINE_boolean("use_ema", True, "Prefer EMA params when present.")


def _find_param_tree(obj):
    """Locate the old ``nn.Model`` params dict inside the restored tuple."""
    # save_checkpoint((optimizer, ema, early_stop)) restores as a dict
    # {'0': optimizer_state, '1': ema_state, '2': early_stop}.
    candidates = []

    def rec(node, path):
        if isinstance(node, dict):
            if "params" in node and isinstance(node["params"], dict):
                candidates.append((path, node["params"]))
            for k, v in node.items():
                rec(v, path + (k,))

    rec(obj, ())
    if not candidates:
        raise ValueError("No params tree found in checkpoint")
    if FLAGS.use_ema:
        for path, tree in candidates:
            if any("1" == p or "ema" in str(p).lower() for p in path):
                return tree
    # optimizer.target.params is usually the first candidate
    return candidates[0][1]


def main(argv):
    del argv
    import jax
    import jax.numpy as jnp
    from smd_tpu.models import get_model
    from smd_tpu.utils import convert, io as io_lib

    restored = convert.load_reference_checkpoint(FLAGS.checkpoint)
    old_params = _find_param_tree(restored)

    model = get_model(FLAGS.architecture, num_layers=FLAGS.num_layers,
                      num_heads=FLAGS.num_heads,
                      num_mlp_layers=FLAGS.num_mlp_layers,
                      mlp_dims=FLAGS.mlp_dims,
                      mdn_mixtures=FLAGS.mdn_components)
    shape = tuple(int(s) for s in FLAGS.data_shape)
    x = jnp.zeros((1, *shape))
    if FLAGS.architecture == "TransformerMDN":
        template, order = convert.linen_call_order(
            model, jax.random.PRNGKey(0), x)
    else:
        cond = jnp.zeros((1, *([1] * len(shape))))
        template, order = convert.linen_call_order(
            model, jax.random.PRNGKey(0), x, cond)

    new_params = convert.convert_params(old_params, template, order)
    io_lib.save(new_params, FLAGS.output)
    logging.info("Wrote converted params to %s", FLAGS.output)


if __name__ == "__main__":
    flags.mark_flag_as_required("checkpoint")
    app.run(main)
