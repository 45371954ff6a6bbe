"""Package a trained diffusion model_dir into one shippable generation bundle.

The reference's out-of-the-box story requires three separately downloaded
artifacts wired together by flags: a TF1 MusicVAE checkpoint, a trained
diffusion checkpoint, and the latent slice transform
(``/root/reference/README.md`` pipeline; restore contract
``/root/reference/sample_ncsn.py:193-211``). This packer collapses the
diffusion side into ONE pickle that `scripts/generate_melodies.py` can serve
with zero flags: model architecture + EMA/sampling params, the noise
schedule, the slice transform, the dataset normalization range, and (when
present) the consistency bundle for 1-2 step sampling.

Run with the SAME flagfile the model was trained with:

  python scripts/package_generation_bundle.py \
      --flagfile=configs/ddpm-mel-32seq-512.cfg \
      --dataset=/tmp/gen_seq --slice_ckpt=/tmp/slice-gen-512.pkl \
      --model_dir=/tmp/gen_model \
      --output=checkpoints/melody-diffusion.pkl
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from absl import app, flags, logging

from smd_tpu import cli

FLAGS = flags.FLAGS
cli.define_common_flags()
cli.define_diffusion_flags()
flags.DEFINE_string("output", "./checkpoints/melody-diffusion.pkl",
                    "Bundle output path.")
flags.DEFINE_string("provenance", "",
                    "Free-form training provenance recorded in the bundle.")


def _fp16_tree(tree):
    import jax
    import jax.numpy as jnp

    def cast(p):
        p = np.asarray(p)
        return p.astype(np.float16) if p.dtype == np.float32 else p

    return jax.tree_util.tree_map(cast, tree)


def main(argv):
    del argv
    from smd_tpu.utils import io as io_lib

    # Dataset stats: the same pipeline the trainer used — min/max come from
    # the dataset dir's stats cache (computed at train time), so this is
    # cheap and exactly reproduces the trainer's normalization.
    train_ds, _ = cli.dataset_from_flags(include_cardinality=False)
    sample = next(iter(train_ds))
    shape = tuple(sample.shape[1:])

    model, state = cli.restore_state_for_sampling(shape)
    del model
    params = state.sampling_params if FLAGS.ema else state.params

    _, slice_idx, _ = cli.load_transforms_from_flags()
    out_channels = int(FLAGS.data_shape[-1])

    bundle = {
        "kind": "smd-tpu-generation-bundle",
        "arch": {
            "architecture": FLAGS.architecture,
            "num_layers": FLAGS.num_layers,
            "num_heads": FLAGS.num_heads,
            "num_mlp_layers": FLAGS.num_mlp_layers,
            "mlp_dims": FLAGS.mlp_dims,
        },
        "params": _fp16_tree(params),
        "schedule": {
            "sigma_begin": FLAGS.sigma_begin,
            "sigma_end": FLAGS.sigma_end,
            "num_sigmas": FLAGS.num_sigmas,
            "kind": FLAGS.schedule_type,
        },
        "sample_shape": list(shape),
        "out_channels": out_channels,
        "slice_idx": np.asarray(slice_idx) if slice_idx is not None else None,
        "normalize": FLAGS.normalize,
        "data_min": float(train_ds.min),
        "data_max": float(train_ds.max),
        "provenance": FLAGS.provenance,
    }

    cm_path = os.path.join(FLAGS.model_dir, "distilled", "consistency.pkl")
    if os.path.exists(cm_path):
        cm = io_lib.load(cm_path)
        bundle["consistency"] = {"params": _fp16_tree(cm["params"]),
                                 "grid": np.asarray(cm["grid"])}
        logging.info("Included consistency bundle (%d segments)",
                     len(cm["grid"]) - 1)
    else:
        bundle["consistency"] = None

    io_lib.save(bundle, FLAGS.output)
    logging.info("Wrote %s (%.1f MB); sample shape %s, slice %s -> %d dims",
                 FLAGS.output, os.path.getsize(FLAGS.output) / 1e6, shape,
                 out_channels, shape[-1])


if __name__ == "__main__":
    app.run(main)
