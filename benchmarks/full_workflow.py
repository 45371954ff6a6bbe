"""Complete-workflow proof: the reference's entire pipeline, end to end.

MIDI corpus -> train MusicVAE codec -> encode corpus to latents -> window
into sequences -> train TransformerDDPM on latent sequences -> DDIM-sample ->
decode latents back to MIDI through the VAE -> score with latent Fréchet
distance and the paper's framewise Overlapping-Area perceptual metrics.

Everything the reference needed Beam + TF1 MusicVAE + Ray + missing metric
code for, in one script on one TPU chip. Moderate scale (small codec, short
training) so it finishes in minutes; every stage is the production code path.

Run: python benchmarks/full_workflow.py [--codec=inline|shipped]

``--codec=shipped`` replaces the inline miniature codec train with the
shipped melody artifact (the cat-mel_2bar_big bundle when present) — the
production encode/decode quality instead of the 2-minute toy fit.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

SCALE = [0, 2, 4, 5, 7, 9, 11]  # major


def make_corpus(n_songs, rng):
    """Synthetic melodic corpus: scale-walk melodies, varied keys/rhythms."""
    from smd_tpu.codec.note_sequence import NoteSequence, Tempo, TimeSignature
    songs = []
    for _ in range(n_songs):
        key = int(rng.integers(55, 67))
        ns = NoteSequence(tempos=[Tempo(qpm=120)],
                         time_signatures=[TimeSignature()])
        t, degree = 0.0, int(rng.integers(0, 7))
        n_notes = int(rng.integers(120, 200))
        for _ in range(n_notes):
            degree = int(np.clip(degree + rng.integers(-2, 3), 0, 13))
            pitch = key + SCALE[degree % 7] + 12 * (degree // 7)
            dur = float(rng.choice([0.25, 0.25, 0.5]))
            ns.add_note(pitch, 80, t, t + dur * 0.9)
            t += dur
        songs.append(ns)
    return songs


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--codec", choices=("inline", "shipped"),
                        default="inline")
    parser.add_argument("--vae_steps", type=int, default=1500)
    parser.add_argument("--steps", type=int, default=3000)
    args = parser.parse_args()
    args.vae_steps = max(args.vae_steps, 1)
    args.steps = max(args.steps, 1)

    import optax
    from smd_tpu.codec.melody import melody_2bar_converter
    from smd_tpu.codec.musicvae import (MusicVAE, MusicVAEConfig, elbo_loss,
                                        TrainedMusicVAE)
    from smd_tpu.codec.song import Song, encode_songs, embeddings_to_song
    from smd_tpu.diffusion import samplers, schedules
    from smd_tpu.eval import metrics, midi_metrics
    from smd_tpu.models import get_model
    from smd_tpu.training import diffusion as trainer

    t_start = time.time()
    results = {}
    rng_np = np.random.default_rng(0)

    # ---- 1. corpus + tokenize -------------------------------------------
    songs = make_corpus(120, rng_np)
    chunks = []
    for ns in songs:
        chunks.extend(melody_2bar_converter.to_tensors(ns).inputs[::2])
    chunks = np.stack(chunks)
    results["corpus"] = {"songs": len(songs), "chunks_2bar": len(chunks)}

    # ---- 2. train the codec (or load the shipped artifact) --------------
    if args.codec == "shipped":
        codec = TrainedMusicVAE()   # auto-loads the shipped melody bundle
        if codec.random_weights:
            raise SystemExit(
                "--codec=shipped: no shipped melody artifact found under "
                "checkpoints/ — refusing to report random-weights numbers "
                "as 'shipped artifact'. Train one with "
                "scripts/train_musicvae.py or run with --codec=inline.")
        results["vae"] = {
            "source": "shipped artifact",
            "latent_dims": codec.config.latent_dims,
            "enc_units": codec.config.enc_units,
            "dec_units": list(codec.config.dec_units)}
        return finish(results, songs, codec, rng_np, t_start,
                      shipped=True, steps=args.steps)
    cfg = MusicVAEConfig(latent_dims=64, enc_units=256, dec_units=(256, 256),
                         depth=90, max_seq_len=32, free_bits=16.0, beta=0.2)
    vae = MusicVAE(cfg)
    rng = jax.random.PRNGKey(0)
    params = vae.init({"params": rng}, jnp.asarray(chunks[:2]), rng)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-3))
    opt_state = tx.init(params)

    def _vae_update(params, opt_state, batch, k):
        def loss_fn(p):
            logits, mu, sigma = vae.apply(p, batch, k)
            loss, aux = elbo_loss(logits, batch, mu, sigma, cfg.free_bits,
                                  cfg.beta)
            acc = jnp.mean(logits.argmax(-1) == batch.argmax(-1))
            return loss, (aux, acc)

        (loss, (aux, acc)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, acc

    # K fused steps per dispatch: on the tunneled chip a per-step Python
    # loop is dispatch-bound (0.1-0.5 s/call), not device-bound.
    @jax.jit
    def vae_chunk(params, opt_state, batches, k):
        keys = jax.random.split(k, batches.shape[0])

        def body(carry, xs):
            params, opt_state = carry
            batch, key = xs
            params, opt_state, loss, acc = _vae_update(params, opt_state,
                                                       batch, key)
            return (params, opt_state), (loss, acc)

        (params, opt_state), (losses, accs) = jax.lax.scan(
            body, (params, opt_state), (batches, keys))
        return params, opt_state, losses[-1], accs[-1]

    n = len(chunks)
    acc = 0.0
    K = 50
    for step in range(0, args.vae_steps, K):
        k_i = min(K, args.vae_steps - step)
        idx = rng_np.integers(0, n, (k_i, 64))
        rng, k = jax.random.split(rng)
        params, opt_state, loss, acc = vae_chunk(
            params, opt_state, jnp.asarray(chunks[idx]), k)
        if step % 500 == 0:
            # Loss/acc are measured AFTER this chunk's K steps.
            print(f"vae step {step + K}: elbo {float(loss):.2f} "
                  f"recon acc {float(acc):.3f}", file=sys.stderr)
    results["vae"] = {"steps": args.vae_steps,
                      "teacher_forced_recon_acc": round(float(acc), 4)}
    codec = TrainedMusicVAE(params=params, config=cfg)
    return finish(results, songs, codec, rng_np, t_start, shipped=False,
                  steps=args.steps)


def finish(results, songs, codec, rng_np, t_start, shipped: bool,
           steps: int = 3000):
    """Steps 3-6: encode -> diffusion -> sample -> decode -> score."""
    from smd_tpu.codec.melody import melody_2bar_converter
    from smd_tpu.codec.song import Song, encode_songs, embeddings_to_song
    from smd_tpu.diffusion import samplers, schedules
    from smd_tpu.eval import metrics, midi_metrics
    from smd_tpu.models import get_model
    from smd_tpu.training import diffusion as trainer

    # ---- 3. encode corpus to latent sequences ---------------------------
    song_objs = [Song(ns, melody_2bar_converter, chunk_length=2)
                 for ns in songs]
    encodings = encode_songs(codec, song_objs)
    ld = codec.config.latent_dims
    ctx = 4
    windows = []
    for enc in encodings:
        z = enc[0]  # z component, (n_chunks, ld)
        for i in range(0, len(z) - ctx + 1):
            w = z[i:i + ctx]
            if (np.linalg.norm(w, axis=1) > 1e-6).all():
                windows.append(w)
    windows = np.stack(windows).astype(np.float32)

    if shipped:
        # The reference's melody pipeline slices the 512-d latent to its
        # top-variance dims before diffusion (its slice-mel-512.pkl keeps
        # 42 of 512; generate_compressed_transform.py is the fitter): a
        # free-bits posterior leaves most dims carrying ~no information,
        # and standardizing dead dims turns them into unpredictable
        # unit-variance noise that floors the diffusion loss. Same recipe
        # refit on this codec's corpus variances.
        from smd_tpu.data.transforms import SliceTransform
        n_keep = 42
        st = SliceTransform.fit(windows.reshape(-1, ld), keep=n_keep)
        sliced = st.transform(windows)
        d_mean = sliced.reshape(-1, n_keep).mean(axis=0)
        d_std = sliced.reshape(-1, n_keep).std(axis=0) + 1e-6
        data = np.clip((sliced - d_mean) / (3.0 * d_std), -1.0, 1.0)

        def from_model(gen_norm):
            lat = gen_norm * (3.0 * d_std) + d_mean
            # randn prior fill for the dropped (dead-posterior) dims —
            # the reference's inverse recipe (input_pipeline.py:103-105).
            return st.inverse_transform(lat, out_channels=ld,
                                        rng=np.random.default_rng(5))
    else:
        lo, hi = windows.min(), windows.max()
        data = 2 * (windows - lo) / (hi - lo) - 1

        def from_model(gen_norm):
            return (gen_norm + 1) / 2 * (hi - lo) + lo

    latent = data.shape[-1]
    results["latents"] = {"windows": len(windows), "shape": list(data.shape)}

    # ---- 4. train the diffusion model -----------------------------------
    betas = schedules.noise_schedule(1e-6, 0.01, 1000, "linear")
    model = get_model("TransformerDDPM", num_layers=3, num_heads=8,
                      num_mlp_layers=2, mlp_dims=512)
    config = trainer.TrainConfig(loss="ddpm", learning_rate=1e-3,
                                 batch_size=64)
    state = trainer.create_train_state(jax.random.PRNGKey(1), model,
                                       (64, ctx, latent), (64, 1, 1), config)
    # K fused steps per dispatch: on the tunneled chip a per-step Python
    # loop is dispatch-bound (0.1-0.5 s/call), not device-bound.
    step_fn = trainer.make_train_chunk(
        model, trainer.objective_by_name("ddpm"), betas, True)
    rng = jax.random.PRNGKey(2)
    K = 50
    for step in range(0, steps, K):
        k_i = min(K, steps - step)
        idx = rng_np.integers(0, len(data), (k_i, 64))
        rng, k = jax.random.split(rng)
        state, m = step_fn(state, jnp.asarray(data[idx]), k)
        if step % 1000 == 0:
            # Loss is measured AFTER this chunk's K steps.
            print(f"ddpm step {step + K}: loss {float(m['loss'][-1]):.4f}",
                  file=sys.stderr)
    results["diffusion"] = {"steps": steps,
                            "final_loss": round(float(m["loss"][-1]), 4)}

    # ---- 5. sample + decode back to MIDI --------------------------------
    mparams = state.sampling_params
    model_fn = lambda x, c: model.apply(mparams, x, c)
    init = jax.random.normal(jax.random.PRNGKey(3), (128, ctx, latent))
    out = samplers.ddim_dynamics(jax.random.PRNGKey(4), model_fn, betas,
                                 init, num_steps=50)
    gen_norm = np.asarray(out.state)
    gen_lat = from_model(gen_norm)

    real_norm = data[rng_np.integers(0, len(data), 128)]
    fd = metrics.frechet_distance(real_norm.reshape(128, -1),
                                  gen_norm.reshape(128, -1))
    fd_noise = metrics.frechet_distance(
        real_norm.reshape(128, -1),
        rng_np.normal(size=(128, ctx * latent)))
    results["latent_fd"] = {"generated": round(fd, 3),
                            "random_baseline": round(fd_noise, 3)}

    gen_songs = [embeddings_to_song(gen_lat[i].astype(np.float64), codec,
                                    melody_2bar_converter,
                                    temperature=1e-3).note_sequence
                 for i in range(8)]
    real_songs = songs[:8]
    results["decoded"] = {
        "generated_notes_per_song": round(float(np.mean(
            [len(ns.notes) for ns in gen_songs])), 1)}

    # ---- 6. perceptual OA metrics (the paper's measure) ------------------
    def mean_oa(gen_list, ref_list):
        oas = []
        for g in gen_list:
            if not g.notes:
                continue
            sims = [midi_metrics.perceptual_similarity(g, r)
                    for r in ref_list]
            oas.append(np.mean([np.mean(list(s.values())) for s in sims]))
        return round(float(np.mean(oas)), 4) if oas else None

    results["perceptual_oa_vs_real"] = mean_oa(gen_songs, real_songs)
    # Metric ceiling: disjoint real songs against the same reference set —
    # framewise OA between different songs is bounded below 1, so the
    # generated row reads against this, not against 1.0.
    results["perceptual_oa_ceiling_real_vs_real"] = mean_oa(
        songs[8:16], real_songs)
    # MATCHED-LENGTH ceiling (the round-4 "82% of ceiling" diagnosis): the
    # generated pieces are ctx-chunk snippets (8 bars) while both rows
    # above use whole 30-50-bar songs, and the OA statistics' variances
    # are length-dependent (an 8-bar window sees a tighter pitch range and
    # noisier density/duration variance than a whole song). Real 8-bar
    # snippets scored against the same whole-song reference set isolate
    # that protocol effect: read perceptual_oa_vs_real against THIS row.
    # (The 16-bar and multi workflows hit ~98.7% of ceiling precisely
    # because they score matched-length chunks on both sides.)
    snippet_songs = []
    for ns in songs[8:16]:
        s = Song(ns, melody_2bar_converter, chunk_length=2)
        snippet_songs.append(s.truncate(chunks=ctx).note_sequence)
    results["perceptual_oa_snippet_ceiling_real_vs_real"] = mean_oa(
        snippet_songs, real_songs)
    # DECODE-PATH ceiling: real latent windows pushed through the exact
    # pipeline the generated ones take (slice-inverse + randn prior-fill
    # of dropped dims + VAE decode at 1e-3 temperature). The delta between
    # this row and the snippet ceiling is the decode path's contribution
    # (codec error + the randn fill); whatever gap remains between the
    # generated row and THIS row is attributable to the diffusion model.
    rt_lat = from_model(real_norm[:8])
    rt_songs = [embeddings_to_song(rt_lat[i].astype(np.float64), codec,
                                   melody_2bar_converter,
                                   temperature=1e-3).note_sequence
                for i in range(8)]
    results["perceptual_oa_decode_path_ceiling"] = mean_oa(
        rt_songs, real_songs)
    results["total_seconds"] = round(time.time() - t_start, 1)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
