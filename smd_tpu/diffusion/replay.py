"""Replay buffer for EBM-style sampling (reference ``ebm_utils.py:25-49``).

Unused by the reference's mainline training but part of its public surface;
kept as a flax struct so it can live inside a jitted loop.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

__all__ = ["ReplayBuffer"]


@struct.dataclass
class ReplayBuffer:
    buffer_size: int = struct.field(pytree_node=False)
    dims: int = struct.field(pytree_node=False)
    data: Any = None

    @classmethod
    def create(cls, buffer_size: int, dims: int, rng=None):
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        data = jax.random.uniform(rng, (buffer_size, dims))
        return cls(buffer_size=buffer_size, dims=dims, data=data)

    def add(self, samples):
        num_samples = samples.shape[0]
        new_data = jnp.concatenate((samples, self.data[:-num_samples]))
        return self.replace(data=new_data)

    def sample(self, rng, n, p=0.95):
        """With prob p each sample comes from the buffer, else U[0,1)."""
        mask_rng, idx_rng, unif_rng = jax.random.split(rng, 3)
        buf_mask = jax.random.bernoulli(mask_rng, p=p, shape=(n,))[:, None]
        idx = jax.random.choice(idx_rng, self.buffer_size, shape=(n,),
                                replace=False)
        buf = self.data[idx]
        rand = jax.random.uniform(unif_rng, shape=(n, self.dims))
        return jnp.where(buf_mask, buf, rand)
