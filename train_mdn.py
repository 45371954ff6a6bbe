"""Train the autoregressive Transformer-MDN baseline — CLI.

Flag-compatible with the reference's ``train_mdn.py``; backed by the
``smd_tpu.training.mdn`` harness (pure-JAX mixture NLL, mesh-jitted fused
step, Orbax resume).
"""
from __future__ import annotations

from absl import app, flags, logging

from smd_tpu import cli

FLAGS = flags.FLAGS
cli.define_common_flags()


def main(argv):
    del argv
    logging.info(FLAGS.flags_into_string())

    import tensorflow as tf
    tf.config.experimental.set_visible_devices([], "GPU")

    from smd_tpu.training import mdn as trainer

    cli.initialize_from_flags()
    # The reference's MDN entry point always trains on the 'vae' problem
    # (``train_mdn.py:333-341``).
    train_ds, eval_ds = cli.dataset_from_flags(problem="vae")
    model = cli.model_from_flags(mdn=True)
    config = cli.train_config_from_flags(mdn=True)
    mesh = cli.mesh_from_flags()

    sample_batch = next(iter(eval_ds))
    input_shape = sample_batch.shape[1:]

    trainer.fit(model,
                train_data=lambda: iter(train_ds),
                eval_data=lambda: iter(eval_ds),
                input_shape=input_shape,
                config=config,
                model_dir=FLAGS.model_dir,
                mesh=mesh,
                seed=FLAGS.seed)


if __name__ == "__main__":
    app.run(main)
