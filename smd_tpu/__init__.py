"""smd_tpu — a TPU-native framework for symbolic music diffusion.

A from-scratch rebuild of the capabilities of magenta/symbolic-music-diffusion
(ISMIR 2021) designed for TPU hardware: JAX/Flax models, fused lax.scan sampling
loops, Pallas attention kernels, pjit/NamedSharding data+model parallelism,
optax optimization and Orbax checkpointing.

Subpackages
-----------
- ``smd_tpu.diffusion``: noise schedules, training objectives, samplers.
- ``smd_tpu.models``: Flax modules (TransformerDDPM, DenseDDPM, NCSNs, TransformerMDN).
- ``smd_tpu.ops``: Pallas TPU kernels (flash attention, fused film-resblock).
- ``smd_tpu.parallel``: device mesh + sharding utilities.
- ``smd_tpu.data``: TFRecord input pipeline, transforms, synthetic problems.
- ``smd_tpu.training``: train states, optimizers, harnesses.
- ``smd_tpu.sampling``: generation drivers (unconditional, infill, interpolation, AR decode).
- ``smd_tpu.eval``: distributional + perceptual MIDI metrics.
- ``smd_tpu.codec``: MusicVAE latent codec and MIDI/NoteSequence layer.
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("SMD_TPU_PLATFORM"):
    # Explicit platform override (e.g. SMD_TPU_PLATFORM=cpu for CI):
    # needed because the image's sitecustomize imports jax and pins the
    # remote-TPU platform before env vars can take effect.
    import jax as _jax
    _jax.config.update("jax_platforms", _os.environ["SMD_TPU_PLATFORM"])
