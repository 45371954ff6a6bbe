"""MusicVAE latent codec as Flax modules (TPU-resident).

The reference drives an external TF1 MusicVAE ``TrainedModel`` through Beam
workers on CPU (``generate_song_data_beam.py:52-57``, ``config.py:66-93``).
Here the 2-bar melody model (cat-mel_2bar_big architecture: BiLSTM-2048
encoder -> 512-d latent, 3x2048 LSTM categorical decoder) is implemented in
Flax so encode/decode run batched under jit on TPU — the north-star encode
path. Weights can be trained with ``elbo_loss`` or loaded from a converted
checkpoint; without either, the architecture still provides full API parity
for pipeline testing.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from smd_tpu.codec.melody import MelodyConverter, melody_2bar_converter

__all__ = ["MusicVAEConfig", "MusicVAE", "TrainedMusicVAE", "elbo_loss",
           "MEL_2BAR_BIG"]


@dataclasses.dataclass(frozen=True)
class MusicVAEConfig:
    latent_dims: int = 512
    enc_units: int = 2048
    dec_units: Tuple[int, ...] = (2048, 2048, 2048)
    depth: int = 90           # melody vocab
    max_seq_len: int = 32     # 2 bars at 16 steps/bar
    free_bits: float = 0.0
    beta: float = 0.2
    # Hierarchical decoding (hierdec-mel_16bar / hier-multiperf analogue):
    # a conductor RNN expands z into per-segment embeddings, each decoded by
    # the core decoder. 0 = flat decoding.
    hier_segments: int = 0
    conductor_units: int = 1024


MEL_2BAR_BIG = MusicVAEConfig()
MEL_16BAR_HIERDEC = MusicVAEConfig(max_seq_len=256, hier_segments=16)


class Encoder(nn.Module):
    """Bidirectional LSTM encoder -> (mu, sigma)."""
    config: MusicVAEConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        fwd = nn.RNN(nn.OptimizedLSTMCell(cfg.enc_units), return_carry=True,
                     name="fwd")
        bwd = nn.RNN(nn.OptimizedLSTMCell(cfg.enc_units), return_carry=True,
                     reverse=True, name="bwd")
        carry_f, _ = fwd(x)
        carry_b, _ = bwd(x)
        h = jnp.concatenate([carry_f[1], carry_b[1]], axis=-1)
        mu = nn.Dense(cfg.latent_dims, name="mu")(h)
        sigma = nn.softplus(nn.Dense(cfg.latent_dims, name="sigma")(h))
        return mu, sigma


class Decoder(nn.Module):
    """Stacked-LSTM categorical decoder.

    Teacher-forced mode (``targets`` given) returns logits for training;
    sampling mode draws autoregressively with a temperature.
    """
    config: MusicVAEConfig

    def setup(self):
        cfg = self.config
        self.cells = [nn.OptimizedLSTMCell(u, name=f"lstm_{i}")
                      for i, u in enumerate(cfg.dec_units)]
        self.initial_state = nn.Dense(
            2 * sum(cfg.dec_units), name="z_to_initial_state")
        self.output_projection = nn.Dense(cfg.depth, name="logits")

    def _init_carries(self, z):
        cfg = self.config
        init = jnp.tanh(self.initial_state(z))
        carries, offset = [], 0
        for u in cfg.dec_units:
            c = init[:, offset:offset + u]
            h = init[:, offset + u:offset + 2 * u]
            carries.append((c, h))
            offset += 2 * u
        return carries

    def _step(self, carries, token, z):
        x = jnp.concatenate([token, z], axis=-1)
        new_carries = []
        for cell, carry in zip(self.cells, carries):
            carry, x = cell(carry, x)
            new_carries.append(carry)
        return new_carries, self.output_projection(x)

    def __call__(self, z, targets=None, rng=None, temperature=1e-3,
                 length: Optional[int] = None):
        cfg = self.config
        B = z.shape[0]
        if length is None:
            length = targets.shape[1] if targets is not None \
                else cfg.max_seq_len
        carries = self._init_carries(z)
        token = jnp.zeros((B, cfg.depth), z.dtype)

        logits_seq, samples_seq = [], []
        for t in range(length):
            carries, logits = self._step(carries, token, z)
            logits_seq.append(logits)
            if targets is not None:   # teacher forcing
                token = targets[:, t]
            else:
                rng, step_rng = jax.random.split(rng)
                idx = jax.random.categorical(
                    step_rng, logits / jnp.maximum(temperature, 1e-6))
                token = jax.nn.one_hot(idx, cfg.depth, dtype=z.dtype)
                samples_seq.append(idx)
        logits = jnp.stack(logits_seq, axis=1)
        if targets is not None:
            return logits
        return logits, jnp.stack(samples_seq, axis=1)


class Conductor(nn.Module):
    """Hierarchical conductor: z -> per-segment latent embeddings.

    The Magenta hierdec pattern: a small LSTM rolled out for ``segments``
    steps from a z-derived initial state; each output is projected to a
    segment-level embedding that conditions the core decoder.
    """
    config: MusicVAEConfig

    @nn.compact
    def __call__(self, z):
        cfg = self.config
        cell = nn.OptimizedLSTMCell(cfg.conductor_units)
        init = jnp.tanh(nn.Dense(2 * cfg.conductor_units,
                                 name="z_to_state")(z))
        carry = (init[:, :cfg.conductor_units],
                 init[:, cfg.conductor_units:])
        out_proj = nn.Dense(cfg.latent_dims, name="segment_embedding")
        embeddings = []
        token = jnp.zeros((z.shape[0], cfg.latent_dims), z.dtype)
        for _ in range(cfg.hier_segments):
            carry, h = cell(carry, token)
            token = out_proj(h)
            embeddings.append(token)
        return jnp.stack(embeddings, axis=1)  # (B, segments, latent)


class MusicVAE(nn.Module):
    config: MusicVAEConfig = MEL_2BAR_BIG

    def setup(self):
        self.encoder = Encoder(self.config)
        self.decoder = Decoder(self.config)
        if self.config.hier_segments > 0:
            self.conductor = Conductor(self.config)

    def encode(self, x, rng):
        mu, sigma = self.encoder(x)
        z = mu + sigma * jax.random.normal(rng, mu.shape, mu.dtype)
        return z, mu, sigma

    def decode(self, z, rng, temperature=1e-3, length=None):
        cfg = self.config
        if cfg.hier_segments > 0:
            seg_len = (length or cfg.max_seq_len) // cfg.hier_segments
            embeddings = self.conductor(z)
            logits_all, samples_all = [], []
            for s in range(cfg.hier_segments):
                rng, seg_rng = jax.random.split(rng)
                logits, samples = self.decoder(
                    embeddings[:, s], rng=seg_rng, temperature=temperature,
                    length=seg_len)
                logits_all.append(logits)
                samples_all.append(samples)
            return (jnp.concatenate(logits_all, axis=1),
                    jnp.concatenate(samples_all, axis=1))
        return self.decoder(z, rng=rng, temperature=temperature,
                            length=length)

    def __call__(self, x, rng):
        """Training forward: reconstruction logits + posterior params."""
        z, mu, sigma = self.encode(x, rng)
        cfg = self.config
        if cfg.hier_segments > 0:
            seg_len = x.shape[1] // cfg.hier_segments
            embeddings = self.conductor(z)
            logits = jnp.concatenate([
                self.decoder(embeddings[:, s],
                             targets=x[:, s * seg_len:(s + 1) * seg_len])
                for s in range(cfg.hier_segments)
            ], axis=1)
        else:
            logits = self.decoder(z, targets=x)
        return logits, mu, sigma


def elbo_loss(logits, targets, mu, sigma, free_bits=0.0, beta=0.2):
    """Negative ELBO: categorical reconstruction NLL + beta * KL (free bits)."""
    labels = targets.argmax(-1)
    log_probs = jax.nn.log_softmax(logits)
    rec = -jnp.take_along_axis(log_probs, labels[..., None],
                               axis=-1).squeeze(-1).sum(-1)
    var = jnp.square(sigma)
    kl = 0.5 * jnp.sum(jnp.square(mu) + var - 1 - jnp.log(var + 1e-12),
                       axis=-1)
    free_nats = free_bits * jnp.log(2.0)
    kl_cost = jnp.maximum(kl - free_nats, 0.0)
    return jnp.mean(rec + beta * kl_cost), {
        "rec": jnp.mean(rec), "kl": jnp.mean(kl)}


class TrainedMusicVAE:
    """Batched encode/decode over NoteSequences — the TrainedModel analogue.

    API parity with magenta's ``TrainedModel`` as used by the reference
    (``song_utils.py:142-228``): ``encode(sequences) -> (z, mu, sigma)``,
    ``decode(z, temperature, length) -> [NoteSequence]``.
    """

    def __init__(self, params=None, config: MusicVAEConfig = MEL_2BAR_BIG,
                 converter: Optional[MelodyConverter] = None, seed: int = 0):
        # Accept the {"params", "config"} bundles written by
        # scripts/train_musicvae.py as well as bare param pytrees.
        if isinstance(params, dict) and set(params) == {"params", "config"}:
            config = params["config"]
            params = params["params"]
        self.config = config
        self.converter = converter or melody_2bar_converter
        self.model = MusicVAE(config)
        rng = jax.random.PRNGKey(seed)
        if params is None:
            x0 = jnp.zeros((1, config.max_seq_len, config.depth))
            params = self.model.init(
                {"params": rng}, x0, rng, method=MusicVAE.__call__)
        self.params = params
        self._rng = jax.random.PRNGKey(seed + 1)

        self._encode_jit = jax.jit(
            lambda p, x, k: self.model.apply(p, x, k,
                                             method=MusicVAE.encode))
        self._decode_jit = jax.jit(
            lambda p, z, k, temp: self.model.apply(
                p, z, k, temperature=temp, method=MusicVAE.decode))

    def _next_rng(self):
        self._rng, out = jax.random.split(self._rng)
        return out

    @property
    def latent_dims(self):
        return self.config.latent_dims

    @staticmethod
    def _bucket(n: int) -> int:
        """Round up to a power of two so jit compiles O(log N) batch shapes
        instead of one program per distinct song length."""
        b = 1
        while b < n:
            b *= 2
        return b

    def encode_tensors(self, tensors):
        n = len(tensors)
        x = np.stack(tensors).astype(np.float32)
        bucket = self._bucket(n)
        if bucket != n:
            pad = np.zeros((bucket - n, *x.shape[1:]), np.float32)
            x = np.concatenate([x, pad])
        z, mu, sigma = self._encode_jit(self.params, jnp.asarray(x),
                                        self._next_rng())
        return (np.asarray(z)[:n], np.asarray(mu)[:n],
                np.asarray(sigma)[:n])

    def encode(self, sequences: Sequence) -> Tuple[np.ndarray, ...]:
        tensors = []
        for ns in sequences:
            inputs = self.converter.to_tensors(ns).inputs
            if not inputs:
                raise ValueError("Cannot encode an empty sequence")
            tensors.append(inputs[0])
        return self.encode_tensors(tensors)

    def decode_to_tensors(self, z, temperature=1e-3):
        z = jnp.asarray(z, jnp.float32)
        _, samples = self._decode_jit(self.params, z, self._next_rng(),
                                      float(temperature))
        return np.asarray(samples)

    def decode(self, z, temperature=1e-3, length=None) -> List:
        samples = self.decode_to_tensors(z, temperature)
        return self.converter.from_tensors(samples)
