"""Train the Flax MusicVAE codec on a MIDI corpus.

The reference depends on Google's pretrained MusicVAE checkpoints
(``README``/``config.py``), which cannot be fetched here; this script makes
the codec self-sufficient: it tokenizes MIDI with the melody converter and
trains the Flax MusicVAE (``smd_tpu.codec.musicvae``) with the ELBO on TPU.
Saved params plug into every pipeline entry that takes ``--vae_params``.

Evaluation on a held-out split reports:
- teacher-forced token accuracy (next-token prediction given ground truth);
- free-running reconstruction accuracy: encode -> mu -> sample the decoder at
  low temperature -> fraction of the 32 grid steps whose token matches the
  input. This is the number recorded in docs/DESIGN.md for the shipped codec.
"""
from __future__ import annotations

import concurrent.futures
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from absl import app, flags, logging

FLAGS = flags.FLAGS
flags.DEFINE_string("input", None, "Glob of input MIDI files.")
flags.DEFINE_enum("mode", "melody", ["melody", "melody16", "multi"],
                  "melody: 2-bar monophonic chunks (cat-mel_2bar family). "
                  "melody16: 16-bar chunks with a 16-segment hierdec "
                  "conductor (hierdec-mel_16bar family). "
                  "multi: 1-bar multi-instrument performance-event chunks "
                  "(hier-multiperf family, 8-segment conductor).")
flags.DEFINE_string("output", "./checkpoints/musicvae.pkl",
                    "Output params pickle.")
flags.DEFINE_integer("batch_size", 64, "Batch size.")
flags.DEFINE_integer("steps", 2000, "Training steps.")
flags.DEFINE_float("learning_rate", 1e-3, "Peak learning rate.")
flags.DEFINE_integer("warmup_steps", 200, "LR warmup steps.")
flags.DEFINE_float("beta", 0.2, "KL weight.")
flags.DEFINE_float("free_bits", 48.0, "Free bits for the KL term.")
flags.DEFINE_integer("latent_dims", 512, "Latent dims.")
flags.DEFINE_integer("enc_units", 512, "Encoder LSTM units.")
flags.DEFINE_integer("dec_units", 512, "Decoder LSTM units per layer.")
flags.DEFINE_integer("dec_layers", 2, "Decoder LSTM layers.")
flags.DEFINE_integer("conductor_units", 512,
                     "Conductor LSTM units (multi mode).")
flags.DEFINE_integer("conductor_layers", 2,
                     "Conductor LSTM layers (multi mode).")
flags.DEFINE_integer("log_every", 100, "Logging frequency.")
flags.DEFINE_integer("scan_chunk", 25,
                     "Optimizer steps fused into one dispatch via lax.scan "
                     "(amortizes remote-accelerator round-trips; 1 = one "
                     "dispatch per step).")
flags.DEFINE_integer("seed", 0, "PRNG seed.")
flags.DEFINE_float("eval_frac", 0.05, "Held-out fraction for evaluation.")
flags.DEFINE_integer("eval_batches", 8, "Eval batches per evaluation.")
flags.DEFINE_bool("half_precision_artifact", True,
                  "Save params as float16 (halves the artifact size; "
                  "restored to float32 at load).")
flags.DEFINE_integer("parse_workers", 8, "Processes for MIDI parsing.")
flags.DEFINE_string("chunk_cache", "",
                    "Optional .npy path: load parsed chunks from it when it "
                    "exists, otherwise parse --input and save there first "
                    "(amortizes the MIDI parse across runs and lets it run "
                    "on CPU while the accelerator is busy).")
flags.DEFINE_bool("parse_only", False,
                  "Exit right after writing --chunk_cache (no training).")
flags.DEFINE_float("scheduled_sampling", 0.0,
                   "Final scheduled-sampling probability (ramped linearly "
                   "over the first half of training). Feeds the decoder its "
                   "own samples during teacher forcing so free-running "
                   "decode does not drift.")
flags.DEFINE_bool("keep_best", True,
                  "Ship the params with the best held-out round-trip "
                  "accuracy seen at any eval, not the final step's. Large "
                  "decoders overfit the corpus late in training (measured: "
                  "the 134M cat-mel_2bar_big peaked at step 6k and declined "
                  "for the remaining 24k steps); the best-eval snapshot is "
                  "the artifact users actually want.")
flags.DEFINE_string("init_from", "",
                    "Optional codec pickle to initialize params from "
                    "(fine-tune a shipped artifact on fresh data). The "
                    "architecture flags must match the pickled config; "
                    "fp16 artifacts are restored to fp32.")
flags.DEFINE_bool("scheduled_sampling_ramp", True,
                  "Ramp scheduled sampling linearly over the first half of "
                  "training (the from-scratch recipe). Set false when "
                  "fine-tuning with --init_from a model already trained "
                  "with scheduled sampling: re-ramping from 0 would spend "
                  "half the run re-learning the teacher-forced regime.")


def _parse_one(path):
    """Worker: MIDI file -> list of (32,) uint8 2-bar melody token rows.

    ids rather than one-hot (like the other modes): the corpus stays ~360x
    smaller in RAM and per-chunk transfers to a tunneled accelerator ship
    kilobytes instead of megabytes; one-hot happens on device per batch.
    """
    from smd_tpu.codec import midi_io
    from smd_tpu.codec.melody import extract_melodies, melody_2bar_converter
    try:
        ns = midi_io.read_midi_file(path)
    except Exception:
        return []
    out = []
    for melody in extract_melodies(ns):
        out.extend(t.argmax(-1).astype(np.uint8) for t in
                   melody_2bar_converter.to_tensors(melody).inputs[::2])
    return out


def _parse_one_16(path):
    """Worker: MIDI file -> list of (256,) uint8 16-bar melody token rows.

    ids rather than one-hot (90-deep rows stay tiny in RAM; one-hot happens
    on device per batch like multi mode).
    """
    from smd_tpu.codec import midi_io
    from smd_tpu.codec.melody import extract_melodies
    from smd_tpu.config import melody_16bar_converter
    try:
        ns = midi_io.read_midi_file(path)
    except Exception:
        return []
    out = []
    for melody in extract_melodies(ns):
        out.extend(t.argmax(-1).astype(np.uint8) for t in
                   melody_16bar_converter.to_tensors(melody).inputs[::16])
    return out


def _parse_one_multi(path):
    """Worker: MIDI file -> list of (512,) uint16 performance-event id rows.

    ids rather than one-hot: a (512, 490) fp32 chunk is 1 MB, the id row is
    1 KB — the corpus stays in RAM and one-hot happens on device per batch.
    """
    from smd_tpu.codec import midi_io
    from smd_tpu.codec.performance import multiperf_default_1bar_converter
    try:
        ns = midi_io.read_midi_file(path)
    except Exception:
        return []
    return [t.argmax(-1).astype(np.uint16)
            for t in multiperf_default_1bar_converter.to_tensors(ns).inputs]


def load_tensors(files, workers=8, mode="melody"):
    parse = {"melody": _parse_one, "melody16": _parse_one_16,
             "multi": _parse_one_multi}[mode]
    tensors = []
    if workers <= 1 or len(files) < 16:
        for path in files:
            tensors.extend(parse(path))
    else:
        with concurrent.futures.ProcessPoolExecutor(workers) as pool:
            for chunk in pool.map(parse, files, chunksize=16):
                tensors.extend(chunk)
    return np.stack(tensors) if tensors else None


def main(argv):
    del argv
    import jax
    import jax.numpy as jnp
    import optax
    from smd_tpu.codec.musicvae import MusicVAE, MusicVAEConfig, elbo_loss
    from smd_tpu.utils import io as io_lib

    t0 = time.time()
    if FLAGS.chunk_cache and os.path.exists(FLAGS.chunk_cache):
        data = np.load(FLAGS.chunk_cache)
        logging.info("Loaded %d %s chunks from %s in %.1fs", len(data),
                     FLAGS.mode, FLAGS.chunk_cache, time.time() - t0)
    else:
        files = sorted(glob.glob(os.path.expanduser(FLAGS.input),
                                 recursive=True))
        data = load_tensors(files, FLAGS.parse_workers, FLAGS.mode)
        if data is None:
            raise ValueError("No chunks extracted from input")
        logging.info("Parsed %d files -> %d %s chunks in %.1fs", len(files),
                     len(data), FLAGS.mode, time.time() - t0)
        if FLAGS.chunk_cache:
            np.save(FLAGS.chunk_cache, data)
            logging.info("Chunk cache written to %s", FLAGS.chunk_cache)
    if FLAGS.parse_only:
        return
    ids_input = data.ndim == 2   # multi mode stores event ids

    # Held-out split for honest reconstruction numbers.
    rng_np = np.random.default_rng(FLAGS.seed)
    perm = rng_np.permutation(len(data))
    n_eval = max(FLAGS.batch_size,
                 int(len(data) * FLAGS.eval_frac)) if FLAGS.eval_frac else 0
    # Never let the eval split consume the training data (tiny corpora).
    n_eval = min(n_eval, max(len(data) - FLAGS.batch_size, 0))
    eval_data = data[perm[:n_eval]]
    train_data = data[perm[n_eval:]]
    logging.info("train %d / eval %d chunks", len(train_data), len(eval_data))

    if FLAGS.mode == "multi":
        from smd_tpu.codec.performance import multiperf_default_1bar_converter
        depth = multiperf_default_1bar_converter.depth
        cfg = MusicVAEConfig(
            latent_dims=FLAGS.latent_dims, enc_units=FLAGS.enc_units,
            dec_units=(FLAGS.dec_units,) * FLAGS.dec_layers,
            depth=depth, max_seq_len=data.shape[1],
            free_bits=FLAGS.free_bits, beta=FLAGS.beta,
            hier_segments=multiperf_default_1bar_converter
            .max_num_instruments,
            conductor_units=FLAGS.conductor_units,
            conductor_layers=FLAGS.conductor_layers)
    elif FLAGS.mode == "melody16":
        from smd_tpu.codec.melody import VOCAB_SIZE
        cfg = MusicVAEConfig(
            latent_dims=FLAGS.latent_dims, enc_units=FLAGS.enc_units,
            dec_units=(FLAGS.dec_units,) * FLAGS.dec_layers,
            depth=VOCAB_SIZE, max_seq_len=data.shape[1],
            free_bits=FLAGS.free_bits, beta=FLAGS.beta,
            hier_segments=16, conductor_units=FLAGS.conductor_units,
            conductor_layers=FLAGS.conductor_layers)
    else:
        from smd_tpu.codec.melody import VOCAB_SIZE
        depth = VOCAB_SIZE if ids_input else data.shape[-1]
        cfg = MusicVAEConfig(latent_dims=FLAGS.latent_dims,
                             enc_units=FLAGS.enc_units,
                             dec_units=(FLAGS.dec_units,) * FLAGS.dec_layers,
                             depth=depth, max_seq_len=data.shape[1],
                             free_bits=FLAGS.free_bits, beta=FLAGS.beta)
    model = MusicVAE(cfg)
    rng = jax.random.PRNGKey(FLAGS.seed)
    rng, init_rng = jax.random.split(rng)
    x0 = jnp.zeros((2, cfg.max_seq_len, cfg.depth))
    params = model.init({"params": init_rng}, x0, init_rng)
    if FLAGS.init_from:
        from smd_tpu.codec.musicvae import normalize_params
        bundle = io_lib.load(FLAGS.init_from)
        loaded = jax.tree_util.tree_map(
            lambda p: jnp.asarray(p, jnp.float32)
            if np.asarray(p).dtype == np.float16 else jnp.asarray(p),
            normalize_params(bundle["params"]))
        want = jax.tree_util.tree_map(lambda p: p.shape, params)
        got = jax.tree_util.tree_map(lambda p: p.shape, loaded)
        if want != got:
            raise ValueError(
                f"--init_from={FLAGS.init_from} does not match the "
                "architecture flags (param tree shapes differ)")
        # Shapes alone cannot catch everything: LSTM/conductor params are
        # invariant to max_seq_len and hier_segments, so a mismatched chunk
        # length or segment count would pass silently and fine-tune the
        # model on a different problem. Compare the pickled config's
        # architecture fields too.
        old_cfg = bundle.get("config")
        if old_cfg is not None:
            arch_fields = ("latent_dims", "enc_units", "dec_units", "depth",
                           "max_seq_len", "hier_segments", "conductor_units",
                           "conductor_layers")
            diffs = [
                f"{f}: checkpoint={getattr(old_cfg, f)!r} flags={getattr(cfg, f)!r}"
                for f in arch_fields
                if hasattr(old_cfg, f)
                and getattr(old_cfg, f) != getattr(cfg, f)]
            if diffs:
                raise ValueError(
                    f"--init_from={FLAGS.init_from} was trained with a "
                    "different architecture/problem than the current flags "
                    "and corpus: " + "; ".join(diffs))
        params = loaded
        logging.info("Initialized params from %s (fine-tune)",
                     FLAGS.init_from)
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(params))
    logging.info("MusicVAE %s: %.1fM params", cfg, n_params / 1e6)

    warmup = min(FLAGS.warmup_steps, max(FLAGS.steps // 10, 1))
    schedule = optax.warmup_cosine_decay_schedule(
        0.0, FLAGS.learning_rate, warmup, FLAGS.steps,
        end_value=FLAGS.learning_rate * 0.02)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(schedule))
    opt_state = tx.init(params)

    def prep(batch):
        return jax.nn.one_hot(batch, cfg.depth) if ids_input \
            else batch

    def _update(params, opt_state, batch, rng, ss_prob):
        x = prep(batch)

        def loss_fn(p):
            logits, mu, sigma = model.apply(p, x, rng, ss_prob=ss_prob)
            return elbo_loss(logits, x, mu, sigma,
                             free_bits=cfg.free_bits, beta=cfg.beta)

        (loss, aux), grads = jax.value_and_grad(loss_fn,
                                                has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, aux

    from functools import partial

    @partial(jax.jit, donate_argnums=(0, 1))
    def train_chunk(params, opt_state, batches, rng, ss_probs):
        """K optimizer steps per dispatch (lax.scan): on a tunneled
        accelerator the per-call host round-trip dwarfs the step compute,
        so scanning K steps per call amortizes it K-fold."""
        keys = jax.random.split(rng, batches.shape[0])

        def body(carry, xs):
            params, opt_state = carry
            batch, key, ss = xs
            params, opt_state, loss, aux = _update(params, opt_state, batch,
                                                   key, ss)
            return (params, opt_state), (loss, aux)

        (params, opt_state), (losses, auxes) = jax.lax.scan(
            body, (params, opt_state), (batches, keys, ss_probs))
        return params, opt_state, losses, auxes

    @jax.jit
    def eval_step(params, batch, rng):
        """Teacher-forced accuracy + free-running round-trip accuracy.

        In multi mode both are also reported over non-PAD rows only — the
        overall number is inflated by the padded tails of the 8 x 64 event
        grid."""
        x = prep(batch)
        logits, mu, sigma = model.apply(params, x, rng)
        labels = x.argmax(-1)
        mask = (labels != 0) if ids_input else jnp.ones_like(labels,
                                                             jnp.bool_)
        tf_hit = logits.argmax(-1) == labels
        tf_acc = tf_hit.mean()
        tf_acc_np = (tf_hit * mask).sum() / jnp.maximum(mask.sum(), 1)
        # Free-running: decode from mu at near-greedy temperature.
        _, samples = model.apply(params, mu, rng, temperature=1e-3,
                                 method=MusicVAE.decode)
        fr_hit = samples == labels
        fr_acc = fr_hit.mean()
        fr_acc_np = (fr_hit * mask).sum() / jnp.maximum(mask.sum(), 1)
        return tf_acc, fr_acc, tf_acc_np, fr_acc_np

    def evaluate(params, rng):
        accs = []
        for b in range(min(FLAGS.eval_batches,
                           len(eval_data) // FLAGS.batch_size)):
            batch = jnp.asarray(
                eval_data[b * FLAGS.batch_size:(b + 1) * FLAGS.batch_size])
            rng, k = jax.random.split(rng)
            accs.append([float(a) for a in eval_step(params, batch, k)])
        return [float(np.mean(col)) for col in zip(*accs)]

    n = len(train_data)
    t0 = time.time()
    chunk = max(1, min(FLAGS.scan_chunk, FLAGS.log_every))
    step = 0
    # (best_metric, step, host params) — see --keep_best.
    best = (-1.0, 0, None)
    if (FLAGS.init_from and FLAGS.keep_best
            and len(eval_data) >= FLAGS.batch_size):
        # Seed keep_best with the starting checkpoint's own score so a
        # regressive fine-tune can never ship an artifact worse than its
        # input (without this, best only ever saw in-training evals).
        rng, ek = jax.random.split(rng)
        tf0, fr0, tf0_np, fr0_np = evaluate(params, ek)
        sel0 = fr0_np if ids_input else fr0
        best = (sel0, 0, jax.device_get(params))
        logging.info("init_from baseline: round-trip %.4f seeded as the "
                     "keep_best candidate", sel0)
    while step < FLAGS.steps:
        k_steps = min(chunk, FLAGS.steps - step)
        idx = rng_np.integers(0, n, (k_steps, FLAGS.batch_size))
        batches = jnp.asarray(train_data[idx.reshape(-1)].reshape(
            k_steps, FLAGS.batch_size, *train_data.shape[1:]))
        rng, step_rng = jax.random.split(rng)
        ss = jnp.asarray([
            FLAGS.scheduled_sampling * (min(
                1.0, (step + j) / max(FLAGS.steps // 2, 1))
                if FLAGS.scheduled_sampling_ramp else 1.0)
            for j in range(k_steps)], jnp.float32)
        params, opt_state, losses, auxes = train_chunk(
            params, opt_state, batches, step_rng, ss)
        step += k_steps
        if (step - k_steps) % FLAGS.log_every < k_steps:
            loss, aux = losses[-1], {k: v[-1] for k, v in auxes.items()}
            msg = (f"step {step} | elbo {float(loss):.3f} | "
                   f"rec {float(aux['rec']):.3f} | kl {float(aux['kl']):.3f}"
                   f" | {step / max(time.time() - t0, 1e-9):.1f} steps/s")
            if len(eval_data) >= FLAGS.batch_size:
                rng, ek = jax.random.split(rng)
                tf_acc, fr_acc, tf_np, fr_np = evaluate(params, ek)
                msg += (f" | eval tf_acc {tf_acc:.4f} | "
                        f"eval roundtrip_acc {fr_acc:.4f}")
                if ids_input:
                    msg += (f" | nonpad tf {tf_np:.4f} | "
                            f"nonpad roundtrip {fr_np:.4f}")
                sel = fr_np if ids_input else fr_acc
                if FLAGS.keep_best and sel > best[0]:
                    best = (sel, step, jax.device_get(params))
            logging.info("%s", msg)

    metrics = {}
    if len(eval_data) >= FLAGS.batch_size:
        rng, ek = jax.random.split(rng)
        tf_acc, fr_acc, tf_np, fr_np = evaluate(params, ek)
        final_sel = fr_np if ids_input else fr_acc
        if FLAGS.keep_best and best[2] is not None and best[0] > final_sel:
            logging.info(
                "keep_best: shipping step-%d params (round-trip %.4f) over "
                "final step-%d (%.4f)", best[1], best[0], step, final_sel)
            params = jax.tree_util.tree_map(jnp.asarray, best[2])
            rng, ek = jax.random.split(rng)
            tf_acc, fr_acc, tf_np, fr_np = evaluate(params, ek)
            metrics["best_step"] = int(best[1])
        metrics.update({"eval_teacher_forced_acc": tf_acc,
                        "eval_roundtrip_acc": fr_acc,
                        "eval_chunks": int(len(eval_data)),
                        "train_chunks": int(len(train_data))})
        if ids_input:
            metrics["eval_teacher_forced_acc_nonpad"] = tf_np
            metrics["eval_roundtrip_acc_nonpad"] = fr_np
        logging.info("FINAL eval: teacher-forced acc %.4f | "
                     "round-trip acc %.4f", tf_acc, fr_acc)
        if ids_input:
            logging.info("FINAL eval (non-PAD rows): teacher-forced %.4f | "
                         "round-trip %.4f", tf_np, fr_np)

    if FLAGS.half_precision_artifact:
        params = jax.tree_util.tree_map(
            lambda p: np.asarray(p, np.float16)
            if np.asarray(p).dtype == np.float32 else np.asarray(p), params)
    os.makedirs(os.path.dirname(os.path.abspath(FLAGS.output)), exist_ok=True)
    io_lib.save({"params": params, "config": cfg, "metrics": metrics},
                FLAGS.output)
    logging.info("Saved MusicVAE params to %s", FLAGS.output)


if __name__ == "__main__":
    flags.mark_flag_as_required("input")
    app.run(main)
