"""Train iterative refinement networks (NCSN and DDPM) — CLI.

Flag-compatible with the reference's ``train_ncsn.py`` (same flags, same
layered ``--flagfile`` configs); the implementation is the TPU-native
``smd_tpu`` stack: mesh-jitted fused train step, Orbax resume, fused scan
samplers for snapshot sampling.
"""
from __future__ import annotations

import functools

from absl import app, flags, logging

from smd_tpu import cli

FLAGS = flags.FLAGS
cli.define_common_flags()
cli.define_diffusion_flags()


def snapshot_sampling_callback(model, sigmas, train_ds, eval_ds, writer,
                               output_dir):
    """In-training sampling + logging (reference ``train_ncsn.py:405-486``)."""
    import numpy as np
    import jax

    from smd_tpu.data import transforms
    from smd_tpu.eval import plots
    from smd_tpu.sampling import generate
    from smd_tpu.utils import io as io_lib

    pca, slice_idx, dim_weights = cli.load_transforms_from_flags()

    def callback(state, eval_metrics, sampling_step):
        params = state.sampling_params
        model_fn = lambda x, cond: model.apply(params, x, cond)
        rng = jax.random.PRNGKey(FLAGS.seed + sampling_step + 1)
        input_shape = tuple(int(s) for s in FLAGS.data_shape)
        if FLAGS.slice_ckpt:
            input_shape = (*input_shape[:-1], len(slice_idx))
        generated, collection, ld_metrics = generate.sample(
            model_fn, sigmas, rng, input_shape,
            num_samples=FLAGS.eval_samples, sampling=FLAGS.sampling,
            epsilon=FLAGS.ld_epsilon, steps=FLAGS.ld_steps,
            denoise=FLAGS.denoise, ddim_steps=FLAGS.ddim_steps,
            ddim_eta=FLAGS.ddim_eta)
        if ld_metrics is not None:
            from smd_tpu.utils.logging import log_sampling_metrics
            log_sampling_metrics(ld_metrics, sampling_step, output_dir)

        init = np.asarray(collection[0])
        generated = np.asarray(generated)
        real = eval_ds.take_examples(FLAGS.eval_samples)

        inv = functools.partial(transforms.inverse_data_transform,
                                normalize_flag=FLAGS.normalize, pca=pca,
                                data_min=train_ds.min, data_max=train_ds.max,
                                slice_idx=slice_idx, dim_weights=dim_weights)
        real_t = transforms.inverse_data_transform(
            real, FLAGS.normalize, pca, eval_ds.min, eval_ds.max, slice_idx,
            dim_weights)
        init_t, generated_t = inv(init), inv(generated)

        step = int(state.step)
        if FLAGS.problem == "toy":
            writer.image("init", plots.scatter_2d(init_t, scale=8).getvalue(),
                         step)
            writer.image("real", plots.scatter_2d(real_t, scale=8).getvalue(),
                         step)
            writer.image("fake",
                         plots.scatter_2d(generated_t, scale=8).getvalue(),
                         step)
            if len(input_shape) == 1 and FLAGS.sampling != "ddpm":
                for sigma in np.asarray(sigmas)[:: max(1,
                                                       len(sigmas) // 8)]:
                    buf = plots.score_field_2d(model_fn, sigma, scale=8)
                    writer.image(f"score_sigma={sigma:.4f}", buf.getvalue(),
                                 step)
        elif FLAGS.problem == "mnist":
            writer.image("fake",
                         plots.image_tiles(generated_t[:10]).getvalue(), step)
        elif FLAGS.problem == "vae":
            shape = (input_shape[0], 32) if len(input_shape) > 1 else (16, 32)
            writer.image(
                "fake",
                plots.image_tiles(
                    generated_t[:10].reshape(10, -1)[:, :shape[0] * shape[1]],
                    shape=shape).getvalue(), step)
            for category, samples in (("init", init_t), ("real", real_t),
                                      ("fake", generated_t)):
                io_lib.save(
                    samples,
                    f"{output_dir}/samples/{category}/{step}.pkl")
        writer.flush()

    return callback


def run_distillation(train_ds, eval_ds):
    """``--distill``: progressively distill the latest checkpoint down to
    few-step sampling (``smd_tpu.training.distill``); each stage's params +
    grid land in ``<model_dir>/distilled/<steps>.pkl`` for
    ``sample_ncsn.py --sampling=distilled``."""
    import os

    import numpy as np

    from smd_tpu.training import consistency, distill
    from smd_tpu.utils import io as io_lib

    sample_batch = next(iter(eval_ds))
    input_shape = sample_batch.shape[1:]
    model, state = cli.restore_state_for_sampling(input_shape)
    params = state.sampling_params if FLAGS.ema else state.params
    betas = cli.schedule_from_flags()
    # Distillation teaches the DDIM update on a DDPM beta schedule; an NCSN
    # score-matching checkpoint (geometric sigma schedule, sigmas near 1)
    # makes cumprod(1-beta) hit <=0 and the lambda grid NaN — stages would
    # save "successfully" and detonate at sampling time.
    if FLAGS.loss != "ddpm" or float(np.max(np.asarray(betas))) >= 1.0:
        raise ValueError(
            "--distill requires a DDPM checkpoint (--loss=ddpm with a beta "
            f"schedule < 1); got --loss={FLAGS.loss}, max schedule value "
            f"{float(np.max(np.asarray(betas))):.4f}. Progressive "
            "distillation of score-matching (ALD) samplers is not "
            "supported.")

    def batches():
        while True:
            for batch in train_ds:
                if batch.shape[0] == FLAGS.batch_size:
                    yield np.asarray(batch)

    def log_fn(stage_steps, step, loss):
        logging.info("distill stage %d-step | step %d | loss %.5f",
                     stage_steps, step, loss)

    out_dir = os.path.join(FLAGS.model_dir, "distilled")
    if FLAGS.distill_mode in ("consistency", "ct"):
        # Consistency distillation ('consistency') or teacher-free
        # consistency training ('ct', iCT): one stage, one bundle, sampled
        # with --sampling=consistency --consistency_sampling_steps=k for
        # ANY k in [1, N].
        if FLAGS.distill_mode == "ct":
            seg_schedule = tuple(
                int(s) for s in FLAGS.ct_seg_schedule.split(","))
            cd = consistency.consistency_train(
                model, params, betas, batches(),
                steps=FLAGS.distill_stage_steps,
                seg_schedule=seg_schedule,
                learning_rate=FLAGS.distill_lr,
                lam_max=FLAGS.distill_lam_max,
                p_mean=FLAGS.ct_p_mean,
                p_std=FLAGS.ct_p_std,
                seed=FLAGS.seed,
                log_fn=log_fn if FLAGS.verbose else None)
            num_segments = seg_schedule[-1]
        else:
            cd = consistency.consistency_distill(
                model, params, betas, batches(),
                num_segments=FLAGS.consistency_segments,
                steps=FLAGS.distill_stage_steps,
                learning_rate=FLAGS.distill_lr,
                lam_max=FLAGS.distill_lam_max,
                seed=FLAGS.seed,
                log_fn=log_fn if FLAGS.verbose else None)
            num_segments = FLAGS.consistency_segments
        bundle = {"params": cd["params"],
                  "grid": np.asarray(cd["grid"]),
                  "num_segments": num_segments,
                  "objective": FLAGS.distill_mode}
        io_lib.save(bundle, os.path.join(out_dir, "consistency.pkl"))
        logging.info("Saved %s bundle to %s/consistency.pkl",
                     FLAGS.distill_mode, out_dir)
        return

    stages = distill.progressive_distill(
        model, params, betas, batches(),
        start_steps=FLAGS.distill_start_steps,
        end_steps=FLAGS.distill_end_steps,
        steps_per_stage=FLAGS.distill_stage_steps,
        learning_rate=FLAGS.distill_lr,
        lam_max=FLAGS.distill_lam_max,
        seed=FLAGS.seed,
        log_fn=log_fn if FLAGS.verbose else None)

    for num_steps, stage in stages.items():
        bundle = {"params": stage["params"],
                  "grid": np.asarray(stage["grid"]),
                  "num_steps": num_steps}
        io_lib.save(bundle, os.path.join(out_dir, f"{num_steps}.pkl"))
        logging.info("Saved %d-step distilled stage to %s/%d.pkl",
                     num_steps, out_dir, num_steps)


def main(argv):
    del argv
    logging.info(FLAGS.flags_into_string())

    import tensorflow as tf
    tf.config.experimental.set_visible_devices([], "GPU")

    from smd_tpu.training import diffusion as trainer
    from smd_tpu.utils.logging import SummaryWriter

    process_index, _ = cli.initialize_from_flags()
    train_ds, eval_ds = cli.dataset_from_flags()
    if FLAGS.distill:
        run_distillation(train_ds, eval_ds)
        return
    sigmas = cli.schedule_from_flags()
    model = cli.model_from_flags()
    config = cli.train_config_from_flags()
    mesh = cli.mesh_from_flags()

    sample_batch = next(iter(eval_ds))
    input_shape = sample_batch.shape[1:]

    callback = None
    if FLAGS.snapshot_sampling and process_index == 0:
        writer = SummaryWriter(f"{FLAGS.model_dir}/eval")
        callback = snapshot_sampling_callback(model, sigmas, train_ds,
                                              eval_ds, writer,
                                              FLAGS.model_dir)

    trainer.fit(model, sigmas,
                train_data=lambda: iter(train_ds),
                eval_data=lambda: iter(eval_ds),
                input_shape=input_shape,
                config=config,
                model_dir=FLAGS.model_dir,
                mesh=mesh,
                seed=FLAGS.seed,
                snapshot_callback=callback)


if __name__ == "__main__":
    app.run(main)
