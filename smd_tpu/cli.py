"""Shared CLI flag definitions and helpers.

Preserves the reference's flag surface (``train_ncsn.py:48-128``,
``train_mdn.py:49-97``, ``sample_ncsn.py:51-66``) so the layered
``configs/*.cfg`` flagfiles work unchanged, while backing the flags with the
typed ``TrainConfig`` dataclass.
"""
from __future__ import annotations

from absl import flags

from smd_tpu.diffusion import schedules
from smd_tpu.models import get_model
from smd_tpu.training.diffusion import TrainConfig

FLAGS = flags.FLAGS


def define_common_flags():
    flags.DEFINE_integer("seed", 0, "Random seed for network initialization.")
    # Training
    flags.DEFINE_float("learning_rate", 3e-4, "Learning rate for optimizer.")
    flags.DEFINE_integer("batch_size", 128, "Batch size for training.")
    flags.DEFINE_integer("epochs", 10, "Number of training epochs.")
    flags.DEFINE_integer("max_steps", None, "Maximum number of training steps.")
    # Training stability
    flags.DEFINE_boolean("early_stopping", False,
                         "Use early stopping to prevent overfitting.")
    flags.DEFINE_float("grad_clip", 1.0, "Max gradient norm for training.")
    flags.DEFINE_float("lr_gamma", 0.98, "Gamma for learning rate scheduler.")
    flags.DEFINE_integer("lr_schedule_interval", 10000,
                         "Number of steps between LR changes.")
    flags.DEFINE_float("lr_warmup", 0, "Learning rate warmup (steps).")
    # Model
    flags.DEFINE_string("architecture", "TransformerDDPM",
                        "Class name of model architecture.")
    flags.DEFINE_integer("num_layers", 6, "Number of encoder layers.")
    flags.DEFINE_integer("num_heads", 8, "Number of attention heads.")
    flags.DEFINE_integer("num_mlp_layers", 2, "Number of MLP layers.")
    flags.DEFINE_integer("mlp_dims", 2048, "Number of channels per MLP layer.")
    flags.DEFINE_integer("mdn_components", 100, "Number of mixtures.")
    # Data
    flags.DEFINE_list("data_shape", [2], "Shape of data.")
    flags.DEFINE_enum("problem", "toy", ["toy", "mnist", "vae", "tokens"],
                      "Problem to solve.")
    flags.DEFINE_string(
        "dataset", "./output/mix2d",
        "Path to directory containing data as train/eval tfrecord files.")
    flags.DEFINE_string("pca_ckpt", "", "PCA transform.")
    flags.DEFINE_string("slice_ckpt", "", "Slice transform.")
    flags.DEFINE_string("dim_weights_ckpt", "", "Dimension scale transform.")
    flags.DEFINE_boolean("normalize", True, "Normalize dataset to [-1, 1].")
    # Logging, checkpointing, and evaluation
    flags.DEFINE_integer("logging_freq", 100, "Logging frequency.")
    flags.DEFINE_integer("snapshot_freq", 5000,
                         "Evaluation and checkpoint frequency.")
    flags.DEFINE_boolean("snapshot_sampling", True,
                         "Sample from score network during evaluation.")
    flags.DEFINE_integer("eval_samples", 3000,
                         "Number of samples to generate.")
    flags.DEFINE_integer("checkpoints_to_keep", 50,
                         "Number of checkpoints to keep.")
    flags.DEFINE_boolean("save_ckpt", True,
                         "Save model checkpoints at each evaluation step.")
    flags.DEFINE_string("model_dir", "./save/ncsn",
                        "Directory to store model data.")
    flags.DEFINE_boolean("verbose", True, "Toggle logging to stdout.")
    # Parallelism / scale (new: the reference was single-device)
    flags.DEFINE_integer("model_parallelism", 1,
                         "Size of the tensor-parallel mesh axis.")
    flags.DEFINE_integer("scan_chunk", 1,
                         "Optimizer steps fused into one dispatch via "
                         "lax.scan (1 = one dispatch per step). On a "
                         "remote/tunneled accelerator the per-call host "
                         "round-trip dwarfs the step compute; fusing K "
                         "steps amortizes it K-fold. Snapshot/checkpoint "
                         "boundaries are preserved; logging coarsens to "
                         "chunk granularity.")
    flags.DEFINE_boolean("mixed_precision", False,
                         "bfloat16 compute with fp32 params.")
    flags.DEFINE_boolean("adam_m_bf16", False,
                         "Store Adam's first moment in bfloat16 (measured "
                         "-3%% step time, indistinguishable loss curve — "
                         "benchmarks/profile_train.py). The EMA stays "
                         "fp32: bf16 EMA measurably stalls (its mu=0.999 "
                         "increments underflow bf16).")
    flags.DEFINE_boolean("remat", False,
                         "Rematerialize transformer layers in the backward "
                         "pass (activation checkpointing).")


def define_diffusion_flags():
    flags.DEFINE_enum("loss", "dsm", ["dsm", "ssm", "ddpm"], "Loss function.")
    flags.DEFINE_boolean("continuous_noise", True,
                         "Continuous noise conditioning.")
    # Noise schedule
    flags.DEFINE_float("sigma_begin", 1.0,
                       "Starting variance for noise schedule.")
    flags.DEFINE_float("sigma_end", 1e-2,
                       "Ending variance for noise schedule.")
    flags.DEFINE_enum("schedule_type", "geometric",
                      ["geometric", "linear", "fibonacci", "cosine"],
                      "Noise schedule configuration (cosine: improved-DDPM "
                      "betas; sigma_begin/sigma_end ignored).")
    flags.DEFINE_integer("num_sigmas", 15,
                         "Number of sigma values (L) in noise schedule.")
    # Langevin dynamics (NCSN only)
    flags.DEFINE_integer("ld_steps", 100,
                         "Number of steps for annealed Langevin dynamics.")
    flags.DEFINE_float("ld_epsilon", 2e-6,
                       "Step size for annealed Langevin dynamics.")
    # Sampling
    flags.DEFINE_enum("sampling", "ald",
                      ["ald", "cas", "ddpm", "ddim", "dpmpp", "distilled",
                       "consistency"],
                      "Sampling algorithm to use. 'distilled' samples a "
                      "progressively distilled stage (train one with "
                      "--distill); --ddim_steps selects the stage. "
                      "'consistency' samples a consistency-distilled model "
                      "(--distill --distill_mode=consistency); "
                      "--consistency_sampling_steps is the refinement step "
                      "count (1 = single call).")
    # Progressive distillation (train_ncsn.py --distill; a capability the
    # reference lacks — its fastest sampler is the 1000-step chain).
    flags.DEFINE_boolean(
        "distill", False,
        "Progressively distill the latest checkpoint for few-step sampling "
        "instead of training: stages halve from --distill_start_steps down "
        "to --distill_end_steps, each saved to "
        "<model_dir>/distilled/<steps>.pkl.")
    flags.DEFINE_enum("distill_mode", "progressive",
                      ["progressive", "consistency", "ct"],
                      "Distillation objective: 'progressive' (Salimans & "
                      "Ho halving ladder, bottoms out at 2 steps), "
                      "'consistency' (consistency distillation; the 1-step "
                      "path — progressive 1-step students collapse, "
                      "docs/DESIGN.md), or 'ct' (teacher-free consistency "
                      "training, iCT — no teacher queries; segment "
                      "curriculum via --ct_seg_schedule). 'consistency' and "
                      "'ct' save ONE bundle to "
                      "<model_dir>/distilled/consistency.pkl and train "
                      "for --distill_stage_steps total steps.")
    flags.DEFINE_integer("consistency_segments", 32,
                         "Consistency-distillation discretization N "
                         "(training-grid segments).")
    flags.DEFINE_string("ct_seg_schedule", "16,32,64,128",
                        "Comma-separated discretization curriculum for "
                        "--distill_mode=ct (iCT's doubling N schedule; "
                        "--distill_stage_steps splits evenly across "
                        "stages).")
    flags.DEFINE_float("ct_p_mean", -1.1,
                       "Mean of iCT's lognormal noise-level sampling "
                       "distribution (log-EDM-sigma space) for "
                       "--distill_mode=ct. The round-5 sweep on a "
                       "converged flagship base measured 0.0 (more mass "
                       "at the noisy end) beating the iCT default -1.1 "
                       "at every step count: 1-step FD 106.9 -> 93.7 "
                       "(see DESIGN.md).")
    flags.DEFINE_float("ct_p_std", 2.0,
                       "Std of iCT's lognormal noise-level sampling "
                       "(see --ct_p_mean).")
    flags.DEFINE_integer("distill_start_steps", 8,
                         "First (largest) distilled sampler step count. "
                         "Measured on the flagship: 8 (whose teacher is the "
                         "32-level dense grid) beats 16 or 64 — finer-h "
                         "stages are harder to fit and their errors "
                         "compound over more halvings (docs/DESIGN.md).")
    flags.DEFINE_integer("distill_end_steps", 2,
                         "Final (smallest) distilled sampler step count.")
    flags.DEFINE_integer("distill_stage_steps", 3000,
                         "Optimizer steps per distillation stage.")
    flags.DEFINE_float("distill_lr", 1e-4,
                       "Learning rate for distillation stages.")
    flags.DEFINE_float("distill_lam_max", 2.5,
                       "Half-log-SNR cap for the distillation grid's clean "
                       "end (see docs/DESIGN.md on DPM-Solver++ grids).")
    flags.DEFINE_integer("ddim_steps", 50,
                         "Number of strided steps for DDIM sampling.")
    flags.DEFINE_integer("consistency_sampling_steps", 0,
                         "Refinement step count for --sampling=consistency "
                         "(1 = single-call generation). 0 falls back to "
                         "--ddim_steps for backward compatibility.")
    flags.DEFINE_float("ddim_eta", 0.0,
                       "DDIM stochasticity (0 = deterministic ODE).")
    flags.DEFINE_boolean("ema", True, "Exponential moving average smoothing.")
    flags.DEFINE_float("mu", 0.999, "Momentum parameter for EMA.")
    flags.DEFINE_boolean(
        "denoise", True,
        "Add additional denoising step during sampling (Song et al., 2020).")


def define_sampling_flags():
    flags.DEFINE_integer("sample_seed", 1,
                         "Random number generator seed for sampling.")
    flags.DEFINE_enum("sampling_dtype", "bfloat16", ["float32", "bfloat16"],
                      "Compute dtype for the sampling forward pass. bfloat16 "
                      "is the measured-fastest serving path (~84% MXU) and "
                      "is FD-indistinguishable from float32 on a trained "
                      "flagship (docs/DESIGN.md).")
    flags.DEFINE_string("sampling_dir", "samples", "Sampling directory.")
    flags.DEFINE_integer("sample_size", 1000, "Number of samples.")
    flags.DEFINE_boolean("compute_metrics", False,
                         "Compute evaluation metrics for generated samples.")
    flags.DEFINE_boolean("compute_final_only", False,
                         "Do not include metrics for intermediate samples.")
    flags.DEFINE_boolean("flush", True, "Flush generated samples to disk.")
    flags.DEFINE_boolean("animate", False, "Generate animation of samples.")
    flags.DEFINE_boolean("infill", False, "Infill.")
    flags.DEFINE_boolean("interpolate", False, "Interpolate.")


def train_config_from_flags(mdn: bool = False) -> TrainConfig:
    cfg = TrainConfig(
        learning_rate=FLAGS.learning_rate,
        batch_size=FLAGS.batch_size,
        epochs=FLAGS.epochs,
        max_steps=FLAGS.max_steps,
        early_stopping=FLAGS.early_stopping,
        grad_clip=FLAGS.grad_clip,
        lr_gamma=FLAGS.lr_gamma,
        lr_schedule_interval=FLAGS.lr_schedule_interval,
        lr_warmup=int(FLAGS.lr_warmup),
        logging_freq=FLAGS.logging_freq,
        snapshot_freq=FLAGS.snapshot_freq,
        checkpoints_to_keep=FLAGS.checkpoints_to_keep,
        save_ckpt=FLAGS.save_ckpt,
        verbose=FLAGS.verbose,
        scan_chunk=FLAGS.scan_chunk,
        adam_m_bf16=FLAGS.adam_m_bf16,
    )
    if not mdn:
        cfg.loss = FLAGS.loss
        cfg.continuous_noise = FLAGS.continuous_noise
        cfg.ema = FLAGS.ema
        cfg.mu = FLAGS.mu
    else:
        cfg.ema = False
    return cfg


def model_from_flags(mdn: bool = False, dtype=None):
    import jax.numpy as jnp
    kwargs = dict(num_layers=FLAGS.num_layers, num_heads=FLAGS.num_heads,
                  num_mlp_layers=FLAGS.num_mlp_layers,
                  mlp_dims=FLAGS.mlp_dims, remat=FLAGS.remat)
    if FLAGS.mixed_precision:
        kwargs["dtype"] = jnp.bfloat16
    if dtype is not None:
        kwargs["dtype"] = dtype
    if mdn:
        kwargs["mdn_mixtures"] = FLAGS.mdn_components
    return get_model(FLAGS.architecture, **kwargs)


def serving_model_fn(params, mdn: bool = False):
    """(x, cond) -> fp32 output closure honoring ``--sampling_dtype``.

    At bfloat16 (the default) this is the measured-fastest serving path
    (docs/DESIGN.md): the flag-built architecture at compute dtype bf16 with
    params cast to bf16, fp32 in/out at the boundary.
    """
    import jax
    import jax.numpy as jnp

    # bf16 is the fast path on accelerators only — the CPU backend emulates
    # it far slower than fp32, so flag-driven CPU runs keep fp32.
    if getattr(FLAGS, "sampling_dtype", "float32") == "bfloat16" \
            and jax.default_backend() != "cpu":
        model = model_from_flags(mdn=mdn, dtype=jnp.bfloat16)
        bf_params = jax.tree_util.tree_map(
            lambda p: jnp.asarray(p, jnp.bfloat16), params)
        return lambda x, cond: model.apply(
            bf_params, x.astype(jnp.bfloat16),
            cond.astype(jnp.bfloat16)).astype(jnp.float32)
    # Explicit fp32: --sampling_dtype=float32 must override a
    # --mixed_precision flag inherited from a shared train flagfile
    # (model_from_flags would otherwise build a bf16-compute model).
    model = model_from_flags(mdn=mdn, dtype=jnp.float32)
    return lambda x, cond: model.apply(params, x, cond)


def schedule_from_flags():
    return schedules.noise_schedule(FLAGS.sigma_begin, FLAGS.sigma_end,
                                    FLAGS.num_sigmas,
                                    kind=FLAGS.schedule_type)


def mesh_from_flags():
    import jax
    from smd_tpu.parallel import mesh as mesh_lib
    n = jax.device_count()
    model_axis = max(1, FLAGS.model_parallelism)
    if n == 1 and model_axis == 1:
        return None
    return mesh_lib.make_mesh(
        mesh_lib.MeshConfig(data=n // model_axis, model=model_axis))


def initialize_from_flags():
    """Multi-host bring-up for the train/sample CLIs.

    Starts the distributed runtime when the environment declares one (TPU
    slice metadata or explicit JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES),
    then returns (process_index, process_count). Idempotent on single host.
    """
    import jax
    from absl import logging as absl_logging
    from smd_tpu.parallel import mesh as mesh_lib
    idx, count = mesh_lib.initialize_distributed()
    if count > 1:
        absl_logging.info("distributed: process %d/%d, %d local / %d global "
                          "devices", idx, count, jax.local_device_count(),
                          jax.device_count())
    return idx, count


def dataset_from_flags(include_cardinality=True, problem=None):
    import jax
    from smd_tpu.data import pipeline
    # --batch_size is the GLOBAL batch; each host loads a disjoint dataset
    # shard and batches its slice of it (shard_batch assembles the global
    # array from per-process data).
    count = jax.process_count()
    if FLAGS.batch_size % max(count, 1):
        raise ValueError(f"batch_size {FLAGS.batch_size} must divide by "
                         f"process_count {count}")
    return pipeline.get_dataset(
        dataset=FLAGS.dataset,
        data_shape=FLAGS.data_shape,
        problem=problem if problem is not None else FLAGS.problem,
        batch_size=FLAGS.batch_size // max(count, 1),
        normalize=FLAGS.normalize,
        pca_ckpt=FLAGS.pca_ckpt,
        slice_ckpt=FLAGS.slice_ckpt,
        dim_weights_ckpt=FLAGS.dim_weights_ckpt,
        include_cardinality=include_cardinality,
        shard_index=jax.process_index(),
        shard_count=count)


def load_transforms_from_flags():
    import os
    from smd_tpu.utils import io as io_lib
    pca = io_lib.load(os.path.expanduser(
        FLAGS.pca_ckpt)) if FLAGS.pca_ckpt else None
    slice_idx = io_lib.load(os.path.expanduser(
        FLAGS.slice_ckpt)) if FLAGS.slice_ckpt else None
    dim_weights = io_lib.load(os.path.expanduser(
        FLAGS.dim_weights_ckpt)) if FLAGS.dim_weights_ckpt else None
    return pca, slice_idx, dim_weights


def restore_state_for_sampling(input_shape, mdn: bool = False):
    """Rebuild the model from flags and restore the latest checkpoint."""
    import jax
    from smd_tpu.training import diffusion as dtrainer
    from smd_tpu.training import mdn as mtrainer
    from smd_tpu.utils.checkpoints import CheckpointManager

    model = model_from_flags(mdn=mdn)
    config = train_config_from_flags(mdn=mdn)
    rng = jax.random.PRNGKey(FLAGS.seed)
    if mdn:
        state = mtrainer.create_train_state(rng, model,
                                            (1, *input_shape), config)
    else:
        cond_shape = (1, *([1] * len(input_shape)))
        state = dtrainer.create_train_state(rng, model, (1, *input_shape),
                                            cond_shape, config)
    manager = CheckpointManager(f"{FLAGS.model_dir}/ckpt",
                                keep=config.checkpoints_to_keep)
    if manager.latest_step is None:
        raise FileNotFoundError(
            f"No checkpoint found under {FLAGS.model_dir}/ckpt")
    state = manager.restore_latest(state)
    manager.close()
    return model, state
