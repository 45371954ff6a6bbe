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
import os
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
    # magenta's hierdec-mel_16bar conductor is a 2-layer [1024, 1024] LSTM
    # (reference uses that pretrained bundle via config.py:41-48).
    conductor_layers: int = 2


def _conductor_layers(cfg) -> int:
    """Conductor depth; tolerates configs pickled before the field existed."""
    return getattr(cfg, "conductor_layers", 1)


def normalize_config(cfg) -> MusicVAEConfig:
    """Re-instantiate a (possibly old, pickled) config with current fields."""
    fields = {f.name for f in dataclasses.fields(MusicVAEConfig)}
    kwargs = {k: v for k, v in vars(cfg).items() if k in fields}
    # Configs pickled before conductor_layers existed were 1-layer.
    kwargs.setdefault("conductor_layers", 1)
    return MusicVAEConfig(**kwargs)


def normalize_params(params):
    """Upgrade param trees from bundles pickled before layout renames.

    The single-layer conductor LSTM was once named ``lstm``; the stacked
    conductor renamed it ``lstm_0`` (``ConductorCell``). ``normalize_config``
    fixes the config of such bundles but not the param tree — rename here so
    old hierarchical artifacts keep loading.
    """
    try:
        cell = params["params"]["conductor"]["cell"]
    except (KeyError, TypeError):
        return params
    if "lstm" in cell and "lstm_0" not in cell:
        import flax
        # freeze->unfreeze yields fresh plain dicts at every level (works
        # for dict and FrozenDict inputs), so renaming cannot mutate the
        # caller's tree.
        params = flax.core.unfreeze(flax.core.freeze(params))
        cell = params["params"]["conductor"]["cell"]
        cell["lstm_0"] = cell.pop("lstm")
    return params


MEL_2BAR_BIG = MusicVAEConfig()
MEL_16BAR_HIERDEC = MusicVAEConfig(max_seq_len=256, hier_segments=16)

# Shipped melody codec (scripts/train_musicvae.py on the synthetic melodic
# corpus; 95.6% held-out round-trip accuracy — see docs/DESIGN.md). Loaded
# automatically when a melody-shaped TrainedMusicVAE is constructed without
# explicit params, replacing the reference's downloaded Google checkpoint
# (reference config.py:17-19).
_CKPT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "checkpoints")
DEFAULT_MELODY_ARTIFACT = os.path.join(_CKPT_DIR, "musicvae-melody.pkl")
# Full-size cat-mel_2bar_big artifact (2048-unit BiLSTM encoder, 3x2048
# decoder — the architecture the reference's pretrained checkpoint uses,
# reference config.py:23-30). Preferred over the reduced artifact when
# present.
DEFAULT_MELODY_BIG_ARTIFACT = os.path.join(
    _CKPT_DIR, "musicvae-melody-big.pkl")
# hier-multiperf codec trained on the synthetic multitrack corpus
# (scripts/make_multitrack_corpus.py + train_musicvae.py --mode=multi).
DEFAULT_MULTI_ARTIFACT = os.path.join(_CKPT_DIR, "musicvae-multi.pkl")
# 16-bar hierdec melody codec (train_musicvae.py --mode=melody16), the
# hierdec-mel_16bar analogue (reference config.py:41-48).
DEFAULT_MELODY16_ARTIFACT = os.path.join(_CKPT_DIR, "musicvae-melody16.pkl")


def _load_artifact(path):
    if not os.path.exists(path):
        return None
    from smd_tpu.utils import io as io_lib
    return io_lib.load(path)


def load_default_melody_params():
    """The shipped melody codec bundle, preferring the full-size
    cat-mel_2bar_big artifact over the reduced one; None when absent."""
    return (_load_artifact(DEFAULT_MELODY_BIG_ARTIFACT) or
            _load_artifact(DEFAULT_MELODY_ARTIFACT))


def load_default_multi_params():
    """The shipped multitrack (hier-multiperf) codec bundle, or None."""
    return _load_artifact(DEFAULT_MULTI_ARTIFACT)


def load_default_melody16_params():
    """The shipped 16-bar hierdec melody codec bundle, or None."""
    return _load_artifact(DEFAULT_MELODY16_ARTIFACT)


class Encoder(nn.Module):
    """Bidirectional LSTM encoder -> (mu, sigma).

    ``dtype`` is the compute dtype (params stay fp32): bf16 keeps every
    (B, in+units) @ (in+units, 4*units) gate matmul on the fast MXU path
    and halves activation traffic. The latent head stays fp32.

    Hierarchical configs (``hier_segments > 0``) encode hierarchically, the
    magenta hier-encoder pattern: each segment (an instrument stream /
    sub-phrase) runs through the BiLSTM independently — segments fold into
    the batch axis, so the scan is ``seg_len`` steps instead of
    ``max_seq_len`` — and the per-segment carries concatenate into the
    latent head. A flat LSTM over 512 rows cannot hold a chunk's exact
    event content in one final carry; per-segment carries can (the flat
    encoder's teacher-forced accuracy plateaued at 0.72 on the multitrack
    corpus at two model sizes — see docs/DESIGN.md for the hierarchical
    numbers).
    """
    config: MusicVAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        x = x.astype(self.dtype)
        B = x.shape[0]
        S = max(cfg.hier_segments, 1)
        if S > 1:
            seg_len = x.shape[1] // S
            x = x.reshape(B * S, seg_len, x.shape[-1])
        fwd = nn.RNN(nn.OptimizedLSTMCell(cfg.enc_units, dtype=self.dtype),
                     return_carry=True, name="fwd")
        bwd = nn.RNN(nn.OptimizedLSTMCell(cfg.enc_units, dtype=self.dtype),
                     return_carry=True, reverse=True, name="bwd")
        carry_f, _ = fwd(x)
        carry_b, _ = bwd(x)
        h = jnp.concatenate([carry_f[1], carry_b[1]],
                            axis=-1).astype(jnp.float32)
        if S > 1:
            h = h.reshape(B, S * h.shape[-1])
        mu = nn.Dense(cfg.latent_dims, name="mu")(h)
        sigma = nn.softplus(nn.Dense(cfg.latent_dims, name="sigma")(h))
        return mu, sigma


class DecoderCell(nn.Module):
    """One decoder step: [token; z] through the LSTM stack -> vocab logits.

    The scan unit for both decode modes — ONE module instance so weights are
    shared. The mode is chosen statically by the per-step input's trailing
    width: teacher forcing feeds the target tokens (width = vocab depth),
    sampling feeds width-0 dummies and draws the feedback token from the
    logits. ``temperature`` rides in the carry (not as an attribute) so
    callers can jit over it as a traced value.
    """
    config: MusicVAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, carry, x_t):
        cfg = self.config
        carries, token, z, rng, temp, ss_prob = carry
        x = jnp.concatenate([token, z], axis=-1).astype(self.dtype)
        new_carries = []
        for i, u in enumerate(cfg.dec_units):
            c, x = nn.OptimizedLSTMCell(u, dtype=self.dtype,
                                        name=f"lstm_{i}")(carries[i], x)
            new_carries.append(c)
        # fp32 logits: categorical sampling + NLL want full precision.
        logits = nn.Dense(cfg.depth, name="logits")(x.astype(jnp.float32))
        if x_t.shape[-1]:   # teacher forcing (static: shape-determined)
            # Scheduled sampling (Bengio'15): with prob ss_prob feed the
            # model's own sample instead of the target, so free-running
            # decoding does not drift off the teacher-forced distribution.
            rng, step_rng, mix_rng = jax.random.split(rng, 3)
            idx = jax.random.categorical(
                step_rng, logits / jnp.maximum(temp, 1e-6))
            sampled = jax.nn.one_hot(idx, cfg.depth, dtype=x_t.dtype)
            use_model = jax.random.bernoulli(
                mix_rng, ss_prob, (logits.shape[0], 1))
            new_token = jnp.where(use_model, sampled, x_t)
        else:
            rng, step_rng = jax.random.split(rng)
            idx = jax.random.categorical(
                step_rng, logits / jnp.maximum(temp, 1e-6))
            new_token = jax.nn.one_hot(idx, cfg.depth, dtype=x.dtype)
        return (tuple(new_carries), new_token, z, rng, temp,
                ss_prob), (logits, idx)


class Decoder(nn.Module):
    """Stacked-LSTM categorical decoder as a single ``nn.scan`` program.

    Teacher-forced mode (``targets`` given) returns logits for training;
    sampling mode draws autoregressively with a temperature. Either way the
    whole rollout is ONE scan over time — a 256-step hierdec decode compiles
    as a 16-iteration loop body, not a 256-step unrolled graph (the
    reference's TF1 dynamic_decode analogue, ``song_utils.py:177-203``).
    """
    config: MusicVAEConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.config
        self.initial_state = nn.Dense(
            2 * sum(cfg.dec_units), name="z_to_initial_state")
        scan = nn.scan(DecoderCell, variable_broadcast="params",
                       split_rngs={"params": False}, in_axes=1, out_axes=1)
        self.cell = scan(cfg, self.dtype, name="cell")

    def _init_carries(self, z):
        cfg = self.config
        init = jnp.tanh(self.initial_state(z))
        carries, offset = [], 0
        for u in cfg.dec_units:
            c = init[:, offset:offset + u]
            h = init[:, offset + u:offset + 2 * u]
            carries.append((c, h))
            offset += 2 * u
        return tuple(carries)

    def __call__(self, z, targets=None, rng=None, temperature=1e-3,
                 length: Optional[int] = None, ss_prob=0.0):
        cfg = self.config
        B = z.shape[0]
        if length is None:
            length = targets.shape[1] if targets is not None \
                else cfg.max_seq_len
        carries = self._init_carries(z)
        carries = jax.tree_util.tree_map(
            lambda c: c.astype(self.dtype), carries)
        z = z.astype(self.dtype)
        token = jnp.zeros((B, cfg.depth), self.dtype)
        temp = jnp.asarray(temperature, jnp.float32)
        if rng is None:
            rng = jax.random.PRNGKey(0)   # fixed: teacher forcing w/o ss

        carry0 = (carries, token, z, rng, temp,
                  jnp.asarray(ss_prob, jnp.float32))
        if targets is not None:   # teacher forcing: feedback from targets
            _, (logits, _) = self.cell(carry0, targets.astype(self.dtype))
            return logits
        xs = jnp.zeros((B, length, 0), z.dtype)
        _, (logits, samples) = self.cell(carry0, xs)
        return logits, samples


class ConductorCell(nn.Module):
    """One conductor step: stacked LSTM + projection to a segment embedding.

    ``conductor_layers`` deep (magenta's hierdec conductor is 2-layer).
    """
    config: MusicVAEConfig

    @nn.compact
    def __call__(self, carry, _):
        cfg = self.config
        lstm_carries, token = carry
        h, new_carries = token, []
        for i in range(_conductor_layers(cfg)):
            c, h = nn.OptimizedLSTMCell(
                cfg.conductor_units, name=f"lstm_{i}")(lstm_carries[i], h)
            new_carries.append(c)
        token = nn.Dense(cfg.latent_dims, name="segment_embedding")(h)
        return (tuple(new_carries), token), token


class Conductor(nn.Module):
    """Hierarchical conductor: z -> per-segment latent embeddings.

    The Magenta hierdec pattern: a small LSTM rolled out for ``segments``
    steps from a z-derived initial state; each output is projected to a
    segment-level embedding that conditions the core decoder. The rollout is
    one ``nn.scan`` over segments.
    """
    config: MusicVAEConfig

    @nn.compact
    def __call__(self, z):
        cfg = self.config
        layers = _conductor_layers(cfg)
        u = cfg.conductor_units
        init = jnp.tanh(nn.Dense(2 * u * layers, name="z_to_state")(z))
        carry = tuple(
            (init[:, 2 * i * u:(2 * i + 1) * u],
             init[:, (2 * i + 1) * u:(2 * i + 2) * u])
            for i in range(layers))
        token = jnp.zeros((z.shape[0], cfg.latent_dims), z.dtype)
        scan = nn.scan(ConductorCell, variable_broadcast="params",
                       split_rngs={"params": False}, in_axes=1, out_axes=1)
        xs = jnp.zeros((z.shape[0], cfg.hier_segments, 0), z.dtype)
        _, embeddings = scan(cfg, name="cell")((carry, token), xs)
        return embeddings  # (B, segments, latent)


class MusicVAE(nn.Module):
    """``dtype`` = compute dtype for the LSTM stacks (params stay fp32)."""
    config: MusicVAEConfig = MEL_2BAR_BIG
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.config, self.dtype)
        self.decoder = Decoder(self.config, self.dtype)
        if self.config.hier_segments > 0:
            self.conductor = Conductor(self.config)

    def encode(self, x, rng):
        mu, sigma = self.encoder(x)
        z = mu + sigma * jax.random.normal(rng, mu.shape, mu.dtype)
        return z, mu, sigma

    def decode(self, z, rng, temperature=1e-3, length=None):
        cfg = self.config
        if cfg.hier_segments > 0:
            # Segments are conditionally independent given the conductor
            # embeddings, so fold them into the batch axis: one seg_len-step
            # scan at batch B*segments instead of a Python loop of decodes.
            S = cfg.hier_segments
            total = length or cfg.max_seq_len
            if total % S:
                raise ValueError(
                    f"Hierarchical decode length {total} must divide by "
                    f"hier_segments={S} (it would otherwise silently "
                    f"truncate the rollout to {total // S * S} steps)")
            seg_len = total // S
            embeddings = self.conductor(z)            # (B, S, latent)
            B = z.shape[0]
            flat = embeddings.reshape(B * S, cfg.latent_dims)
            logits, samples = self.decoder(flat, rng=rng,
                                           temperature=temperature,
                                           length=seg_len)
            return (logits.reshape(B, S * seg_len, cfg.depth),
                    samples.reshape(B, S * seg_len))
        return self.decoder(z, rng=rng, temperature=temperature,
                            length=length)

    def __call__(self, x, rng, ss_prob=0.0):
        """Training forward: reconstruction logits + posterior params.

        ``ss_prob``: scheduled-sampling probability — with that chance each
        teacher-forced feedback token is replaced by the model's own sample
        (drawn at temperature 1), closing the train/free-running gap.
        """
        rng, dec_rng = jax.random.split(rng)
        z, mu, sigma = self.encode(x, rng)
        cfg = self.config
        dec_kwargs = dict(ss_prob=ss_prob, rng=dec_rng, temperature=1.0)
        if cfg.hier_segments > 0:
            S = cfg.hier_segments
            B, T, depth = x.shape
            seg_len = T // S
            embeddings = self.conductor(z)            # (B, S, latent)
            flat = embeddings.reshape(B * S, cfg.latent_dims)
            seg_targets = x.reshape(B * S, seg_len, depth)
            logits = self.decoder(flat, targets=seg_targets, **dec_kwargs)
            logits = logits.reshape(B, T, cfg.depth)
        else:
            logits = self.decoder(z, targets=x, **dec_kwargs)
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
                 converter: Optional[MelodyConverter] = None, seed: int = 0,
                 compute_dtype=jnp.float32):
        # Default-shaped construction without params: shipped codecs. Only
        # full-size configs auto-load (a deliberately tiny test config must
        # keep its requested architecture with random weights).
        if params is None and config == MEL_2BAR_BIG:
            params = load_default_melody_params()
            if params is not None:
                import logging
                logging.getLogger(__name__).info(
                    "Loaded shipped melody codec (%s)",
                    "cat-mel_2bar_big" if
                    os.path.exists(DEFAULT_MELODY_BIG_ARTIFACT)
                    else DEFAULT_MELODY_ARTIFACT)
        elif params is None and config.hier_segments > 0 and \
                config.latent_dims == 512 and config.enc_units >= 1024 and \
                config.depth == 90:
            # 16-bar hierdec melody shapes (melody-16-big registry entry).
            params = load_default_melody16_params()
            if params is not None:
                import logging
                logging.getLogger(__name__).info(
                    "Loaded shipped 16-bar hierdec melody codec from %s",
                    DEFAULT_MELODY16_ARTIFACT)
        elif params is None and config.hier_segments > 0 and \
                config.latent_dims == 512 and config.enc_units >= 1024:
            params = load_default_multi_params()
            if params is not None and \
                    params["config"].depth != config.depth:
                params = None   # different event vocabulary: no fit
            if params is not None:
                import logging
                logging.getLogger(__name__).info(
                    "Loaded shipped multitrack codec from %s",
                    DEFAULT_MULTI_ARTIFACT)
        # Accept the {"params", "config"[, "metrics"]} bundles written by
        # scripts/train_musicvae.py as well as bare param pytrees.
        if isinstance(params, dict) and {"params", "config"} <= set(params):
            config = normalize_config(params["config"])
            params = normalize_params(params["params"])
        if params is not None:
            # Half-precision artifacts are restored to fp32 for compute.
            params = jax.tree_util.tree_map(
                lambda p: jnp.asarray(p, jnp.float32)
                if jnp.asarray(p).dtype == jnp.float16 else jnp.asarray(p),
                params)
        self.config = config
        if converter is None:
            # Infer from the (possibly bundle-supplied) config shape: the
            # hier-multiperf event vocabulary means the performance
            # converter; everything else defaults to the melody grid.
            from smd_tpu.codec.performance import (
                multiperf_default_1bar_converter)
            if config.hier_segments > 0 and \
                    config.depth == multiperf_default_1bar_converter.depth:
                converter = multiperf_default_1bar_converter
            elif config.max_seq_len != 32 and config.max_seq_len % 16 == 0:
                # Melody-vocab codec over longer chunks (e.g. the 16-bar
                # hierdec, max_seq_len=256): match slice_bars to the
                # sequence length (16 grid steps/bar at steps_per_quarter=4)
                # so encode() chunks what the codec was trained on.
                converter = MelodyConverter(
                    steps_per_quarter=4, slice_bars=config.max_seq_len // 16)
            else:
                converter = melody_2bar_converter
        self.converter = converter
        self.model = MusicVAE(config, dtype=compute_dtype)
        rng = jax.random.PRNGKey(seed)
        self.random_weights = params is None
        if params is None:
            import logging
            logging.getLogger(__name__).warning(
                "TrainedMusicVAE constructed WITHOUT trained parameters: "
                "encode/decode run with random weights, so decoded MIDI is "
                "musically meaningless. Train a codec with "
                "scripts/train_musicvae.py and pass its params bundle "
                "(the reference's capability assumes a pretrained MusicVAE, "
                "reference config.py:17-19).")
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
