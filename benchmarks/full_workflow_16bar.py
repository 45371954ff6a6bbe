"""16-bar hierdec workflow proof: long-form melody pipeline end to end.

The reference's `melody-16-big` capability (16-bar chunks through magenta's
pretrained hierdec-mel_16bar, reference ``config.py:41-48``) driven entirely
in-framework: melodic corpus -> 16-bar chunks (256-step token sequences) ->
hierdec MusicVAE encode (16-segment conductor) -> latent windows ->
TransformerDDPM -> DDIM-sample -> hierdec decode back to 16-bar MIDI ->
latent FD + framewise OA.

Uses the shipped `checkpoints/musicvae-melody16.pkl` artifact when present
(train one with ``scripts/train_musicvae.py --mode=melody16``); otherwise
trains a miniature hierdec codec inline so the proof stays self-contained.

Run: python benchmarks/full_workflow_16bar.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

CKPT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "checkpoints", "musicvae-melody16.pkl")


def make_corpus(n_songs, rng, min_bars=68):
    """Long melodic songs (>= min_bars) so each yields several 16-bar
    chunks; same motif/scale style as scripts/make_melody_corpus."""
    from scripts.make_melody_corpus import make_song
    songs = []
    while len(songs) < n_songs:
        ns = make_song(rng)
        if not ns.notes:
            continue
        # Concatenate a song with itself (shifted) until long enough —
        # keeps melodic structure while reaching chunking length.
        total = max(n.end_time for n in ns.notes)
        bars = total / 2.0  # 2 s/bar at 120 qpm
        reps = int(np.ceil(min_bars / max(bars, 1)))
        base_notes = list(ns.notes)   # snapshot before appending
        period = np.ceil(total / 2.0) * 2.0
        for r in range(1, reps):
            for n in base_notes:
                ns.add_note(n.pitch, n.velocity, n.start_time + r * period,
                            n.end_time + r * period)
        songs.append(ns)
    return songs


def main():
    import argparse
    parser = argparse.ArgumentParser()
    parser.add_argument("--songs", type=int, default=300)
    parser.add_argument("--window", type=int, default=2)
    parser.add_argument("--steps", type=int, default=3000)
    parser.add_argument("--eval_n", type=int, default=128)
    args = parser.parse_args()
    args.steps = max(args.steps, 1)   # the loop must run once

    import optax
    from smd_tpu.codec.musicvae import (MusicVAE, MusicVAEConfig, elbo_loss,
                                        TrainedMusicVAE, normalize_config,
                                        normalize_params)
    from smd_tpu.config import melody_16bar_converter
    from smd_tpu.diffusion import samplers, schedules
    from smd_tpu.eval import metrics, midi_metrics
    from smd_tpu.models import get_model
    from smd_tpu.training import diffusion as trainer
    from smd_tpu.utils import io as io_lib

    t_all = time.time()
    results = {}
    rng_np = np.random.default_rng(0)

    # ---- 1. corpus -> 16-bar chunks -------------------------------------
    songs = make_corpus(args.songs, rng_np)
    conv = melody_16bar_converter
    per_song_chunks = []
    for ns in songs:
        per_song_chunks.append(
            [t.argmax(-1).astype(np.uint8)
             for t in conv.to_tensors(ns).inputs[::16]])
    flat = [c for chunks in per_song_chunks for c in chunks]
    results["corpus"] = {"songs": len(songs), "chunks_16bar": len(flat)}

    # ---- 2. codec: shipped artifact or miniature inline train -----------
    rng = jax.random.PRNGKey(0)
    bundle = io_lib.load(CKPT) if os.path.exists(CKPT) else None
    if bundle is not None:
        cfg = normalize_config(bundle["config"])
        params = normalize_params(bundle["params"])
        params = jax.tree_util.tree_map(
            lambda p: jnp.asarray(p, jnp.float32)
            if jnp.asarray(p).dtype == jnp.float16 else jnp.asarray(p),
            params)
        results["codec"] = {"source": "shipped artifact",
                            "metrics": bundle.get("metrics", {})}
    else:
        cfg = MusicVAEConfig(latent_dims=128, enc_units=256,
                             dec_units=(256, 256), depth=90, max_seq_len=256,
                             free_bits=32.0, beta=0.2, hier_segments=16,
                             conductor_units=256, conductor_layers=2)
        vae = MusicVAE(cfg)
        x0 = jax.nn.one_hot(jnp.asarray(np.stack(flat[:2])), 90)
        params = vae.init({"params": rng}, x0, rng)
        tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-3))
        opt_state = tx.init(params)

        @jax.jit
        def vae_chunk(params, opt_state, batches, k):
            keys = jax.random.split(k, batches.shape[0])

            def body(carry, xs):
                params, opt_state = carry
                batch, key = xs
                x = jax.nn.one_hot(batch, 90)

                def loss_fn(p):
                    logits, mu, sigma = vae.apply(p, x, key)
                    loss, aux = elbo_loss(logits, x, mu, sigma,
                                          cfg.free_bits, cfg.beta)
                    acc = jnp.mean(logits.argmax(-1) == batch)
                    return loss, acc

                (loss, acc), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params)
                updates, opt_state2 = tx.update(grads, opt_state, params)
                return (optax.apply_updates(params, updates), opt_state2), \
                    (loss, acc)

            (params, opt_state), (losses, accs) = jax.lax.scan(
                body, (params, opt_state), (batches, keys))
            return params, opt_state, losses[-1], accs[-1]

        data16 = np.stack(flat)
        t0 = time.time()
        CH = 25
        for step in range(0, 2500, CH):
            idx = rng_np.integers(0, len(data16), (CH, 32))
            rng, k = jax.random.split(rng)
            params, opt_state, loss, acc = vae_chunk(
                params, opt_state, jnp.asarray(data16[idx]), k)
        results["codec"] = {"source": "inline miniature",
                            "steps": 2500,
                            "teacher_forced_acc": round(float(acc), 4),
                            "seconds": round(time.time() - t0, 1)}
    codec = TrainedMusicVAE(params=params, config=cfg, converter=conv)

    # ---- 3. encode to latent windows ------------------------------------
    t0 = time.time()
    onehots = [jax.nn.one_hot(jnp.asarray(np.stack(chunks)), 90)
               for chunks in per_song_chunks if len(chunks) >= args.window]
    windows = []
    for x in onehots:
        _, mu, _ = codec.encode_tensors(list(np.asarray(x)))
        for i in range(0, len(mu) - args.window + 1):
            windows.append(mu[i:i + args.window])
    data = np.stack(windows).astype(np.float32)
    # The reference's slice-transform recipe (data/transforms.py, shared
    # with full_workflow.py's shipped branch): keep top-variance dims,
    # normalize to [-1, 1].
    from smd_tpu.data.transforms import SliceTransform
    n_keep = min(128, data.shape[-1])
    st = SliceTransform.fit(data.reshape(-1, data.shape[-1]), keep=n_keep)
    sliced = st.transform(data)
    d_mean = sliced.reshape(-1, n_keep).mean(axis=0)
    d_std = sliced.reshape(-1, n_keep).std(axis=0) + 1e-6
    data_n = np.clip((sliced - d_mean) / (3.0 * d_std), -1.0, 1.0)
    results["encode"] = {"windows": int(len(data_n)),
                         "seconds": round(time.time() - t0, 1)}
    args.eval_n = min(args.eval_n, len(data_n))

    # ---- 4. diffusion over 16-bar-latent windows ------------------------
    t0 = time.time()
    latent = data_n.shape[-1]
    model = get_model("TransformerDDPM", num_layers=6, num_heads=8,
                      num_mlp_layers=2, mlp_dims=2048, dtype=jnp.bfloat16)
    betas = schedules.noise_schedule(1e-6, 0.01, 1000, "linear")
    consts = schedules.ddpm_constants(betas)
    config = trainer.TrainConfig(loss="ddpm", learning_rate=1e-3,
                                 batch_size=64, ema=True)
    state = trainer.create_train_state(jax.random.PRNGKey(1), model,
                                       (64, args.window, latent),
                                       (64, 1, 1), config)
    # K fused steps per dispatch over a device-resident batch pool: on the
    # tunneled chip a per-step Python loop is dispatch-bound (0.1-0.5
    # s/call), not device-bound.
    step_fn = trainer.make_train_chunk(
        model, trainer.objective_by_name("ddpm"), betas, True)
    rng = jax.random.PRNGKey(2)
    K = 50
    pool = jnp.asarray(data_n[rng_np.integers(0, len(data_n),
                                              (400, 64))])
    for i in range(0, args.steps, K):
        k_i = min(K, args.steps - i)   # exact count; remainder recompiles
        rng, k = jax.random.split(rng)
        # Device-side gather from the resident pool (arbitrary k_i).
        sel = jnp.asarray(rng_np.integers(0, pool.shape[0], k_i))
        state, m = step_fn(state, pool[sel], k)
    results["diffusion_train"] = {
        "steps": args.steps, "loss": round(float(m["loss"][-1]), 4),
        "seconds": round(time.time() - t0, 1)}

    # ---- 5. sample + decode back to 16-bar MIDI -------------------------
    t0 = time.time()
    params_d = state.sampling_params
    model_fn = lambda x, c: model.apply(
        jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16), params_d),
        x.astype(jnp.bfloat16), c.astype(jnp.bfloat16)).astype(jnp.float32)
    init = jax.random.normal(jax.random.PRNGKey(5),
                             (args.eval_n, args.window, latent))
    gen_n = np.asarray(jax.jit(
        lambda k, x: samplers.ddim_dynamics(
            k, model_fn, betas, x, num_steps=50,
            constants=consts).state)(jax.random.PRNGKey(6), init))
    real_idx = rng_np.choice(len(data_n), args.eval_n, replace=False)
    fd = metrics.frechet_distance(
        data_n[real_idx].reshape(args.eval_n, -1),
        gen_n.reshape(args.eval_n, -1))
    fd_noise = metrics.frechet_distance(
        data_n[real_idx].reshape(args.eval_n, -1),
        np.random.default_rng(3).normal(
            size=(args.eval_n, args.window * latent)))
    results["latent_fd"] = {"generated": round(fd, 2),
                            "random_baseline": round(fd_noise, 2)}

    gen_k = (gen_n * (3.0 * d_std) + d_mean).reshape(-1, n_keep)
    # randn prior fill for the dropped (dead-posterior) dims — the
    # reference's inverse recipe (input_pipeline.py:103-105).
    gen = st.inverse_transform(gen_k, out_channels=data.shape[-1],
                               rng=np.random.default_rng(5)).astype(
                                   np.float32)
    decoded_ns = []
    for i in range(0, min(len(gen), 64), 32):
        decoded_ns.extend(codec.decode(gen[i:i + 32]))
    results["decode_seconds"] = round(time.time() - t0, 1)
    results["generated_notes_per_16bars"] = round(float(np.mean(
        [len(ns.notes) for ns in decoded_ns])), 1)

    # ---- 6. perceptual OA -----------------------------------------------
    real_ns = [conv.from_tensors([chunks[0]])[0]
               for chunks in per_song_chunks[:16] if chunks]
    # Metric ceiling: disjoint real chunks against the same reference set
    # (OA between different real sequences is bounded below 1; the
    # generated row reads against this, not against 1.0).
    held_ns = [conv.from_tensors([chunks[0]])[0]
               for chunks in per_song_chunks[16:32] if chunks]

    def mean_oa(gen_list, ref_list):
        oas = []
        for g in gen_list:
            if not g.notes:
                continue
            sims = []
            for r in ref_list:
                try:
                    s = midi_metrics.perceptual_similarity(g, r)
                    sims.append(float(np.mean(list(s.values()))))
                except Exception:
                    continue
            if sims:
                oas.append(float(np.mean(sims)))
        return round(float(np.mean(oas)), 4) if oas else None

    results["framewise_oa_vs_real"] = mean_oa(decoded_ns[:16], real_ns)
    results["framewise_oa_ceiling_real_vs_real"] = mean_oa(held_ns,
                                                           real_ns)
    results["total_seconds"] = round(time.time() - t_all, 1)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
