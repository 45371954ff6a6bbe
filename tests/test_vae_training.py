"""MusicVAE training: the codec learns to reconstruct synthetic melodies."""
import glob
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_train_musicvae_script(tmp_path):
    # Write a few simple MIDI melodies.
    from smd_tpu.codec import midi_io
    from smd_tpu.codec.note_sequence import NoteSequence, Tempo, TimeSignature
    rng = np.random.default_rng(0)
    midi_dir = tmp_path / "midi"
    midi_dir.mkdir()
    for i in range(3):
        ns = NoteSequence(tempos=[Tempo(qpm=120)],
                         time_signatures=[TimeSignature()])
        t = 0.0
        for _ in range(32):
            ns.add_note(int(rng.integers(60, 72)), 80, t, t + 0.2)
            t += 0.25
        midi_io.write_midi_file(ns, str(midi_dir / f"m{i}.mid"))

    out = str(tmp_path / "vae.pkl")
    env = dict(os.environ)
    env["SMD_TPU_PLATFORM"] = "cpu"
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_cache"
    proc = subprocess.run(
        [sys.executable, "scripts/train_musicvae.py",
         f"--input={midi_dir}/*.mid", f"--output={out}", "--steps=30",
         "--batch_size=8", "--enc_units=16", "--dec_units=16",
         "--dec_layers=1", "--latent_dims=8", "--log_every=10"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=420)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert os.path.exists(out)

    # The bundle loads into TrainedMusicVAE and encodes/decodes.
    from smd_tpu.codec.musicvae import TrainedMusicVAE
    from smd_tpu.utils import io as io_lib
    model = TrainedMusicVAE(params=io_lib.load(out))
    assert model.latent_dims == 8
    ns = NoteSequence(tempos=[Tempo(qpm=120)])
    t = 0.0
    for _ in range(16):
        ns.add_note(64, 80, t, t + 0.2)
        t += 0.25
    z, mu, sigma = model.encode([ns])
    assert z.shape == (1, 8)
    chunks = model.decode(z, temperature=1.0)
    assert len(chunks) == 1


@pytest.mark.slow
def test_train_musicvae_init_from(tmp_path):
    """--init_from fine-tunes a shipped artifact: the second run starts
    from the first run's params (and rejects a mismatched architecture)."""
    from smd_tpu.codec import midi_io
    from smd_tpu.codec.note_sequence import NoteSequence, Tempo, TimeSignature
    rng = np.random.default_rng(1)
    midi_dir = tmp_path / "midi"
    midi_dir.mkdir()
    for i in range(3):
        ns = NoteSequence(tempos=[Tempo(qpm=120)],
                         time_signatures=[TimeSignature()])
        t = 0.0
        for _ in range(32):
            ns.add_note(int(rng.integers(60, 72)), 80, t, t + 0.2)
            t += 0.25
        midi_io.write_midi_file(ns, str(midi_dir / f"m{i}.mid"))

    env = dict(os.environ)
    env["SMD_TPU_PLATFORM"] = "cpu"
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_cache"
    arch = ["--batch_size=8", "--enc_units=16", "--dec_units=16",
            "--dec_layers=1", "--latent_dims=8", "--log_every=10"]
    base = str(tmp_path / "base.pkl")
    proc = subprocess.run(
        [sys.executable, "scripts/train_musicvae.py",
         f"--input={midi_dir}/*.mid", f"--output={base}", "--steps=10",
         *arch], cwd=REPO, env=env, capture_output=True, text=True,
        timeout=420)
    assert proc.returncode == 0, proc.stderr[-3000:]

    tuned = str(tmp_path / "tuned.pkl")
    proc = subprocess.run(
        [sys.executable, "scripts/train_musicvae.py",
         f"--input={midi_dir}/*.mid", f"--output={tuned}", "--steps=10",
         f"--init_from={base}", "--noscheduled_sampling_ramp", *arch],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=420)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "Initialized params from" in (proc.stderr + proc.stdout)
    assert os.path.exists(tuned)

    # Mismatched architecture is rejected with a clear error.
    proc = subprocess.run(
        [sys.executable, "scripts/train_musicvae.py",
         f"--input={midi_dir}/*.mid", f"--output={tuned}", "--steps=10",
         f"--init_from={base}", "--batch_size=8", "--enc_units=24",
         "--dec_units=16", "--dec_layers=1", "--latent_dims=8"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=420)
    assert proc.returncode != 0
    assert "does not match the architecture flags" in proc.stderr


def test_vae_training_reduces_elbo(rng):
    """Direct (in-process) check: 60 steps of ELBO descent on one batch."""
    import jax
    import jax.numpy as jnp
    import optax
    from smd_tpu.codec.musicvae import MusicVAE, MusicVAEConfig, elbo_loss

    cfg = MusicVAEConfig(latent_dims=4, enc_units=8, dec_units=(8,),
                         depth=6, max_seq_len=8)
    model = MusicVAE(cfg)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (16, 8), 0, 6)
    x = jax.nn.one_hot(tokens, 6).astype(jnp.float32)
    params = model.init({"params": rng}, x, rng)
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, k):
        def loss_fn(p):
            logits, mu, sigma = model.apply(p, x, k)
            return elbo_loss(logits, x, mu, sigma, beta=0.1)[0]

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    k = rng
    for _ in range(60):
        k, sk = jax.random.split(k)
        params, opt_state, loss = step(params, opt_state, sk)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.8
