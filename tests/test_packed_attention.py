import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smd_tpu.ops import flash_attention as fa


def test_pack_group_selection():
    assert fa.pack_group(1000, 32) == 8    # 256-length packs
    assert fa.pack_group(7, 32) == 1       # prime batch: no packing
    assert fa.pack_group(64, 32) == 8
    assert fa.pack_group(4, 32) == 4       # 128-length packs


@pytest.mark.parametrize("causal", [False, True])
def test_packed_matches_reference_interpret(rng, causal):
    B, S, H, D = 16, 32, 2, 16
    k1, k2, k3 = jax.random.split(rng, 3)
    q = jax.random.normal(k1, (B, S, H, D), jnp.float32)
    k = jax.random.normal(k2, (B, S, H, D), jnp.float32)
    v = jax.random.normal(k3, (B, S, H, D), jnp.float32)
    out = fa.packed_short_seq_attention(q, k, v, causal=causal,
                                        interpret=True)
    ref = fa._reference_attention(q, k, v, causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_packed_block_diag_no_cross_talk(rng):
    """Changing one batch item must not affect any other packed item."""
    B, S, H, D = 8, 32, 1, 16
    k1, k2, k3 = jax.random.split(rng, 3)
    q = jax.random.normal(k1, (B, S, H, D), jnp.float32)
    k = jax.random.normal(k2, (B, S, H, D), jnp.float32)
    v = jax.random.normal(k3, (B, S, H, D), jnp.float32)
    out1 = fa.packed_short_seq_attention(q, k, v, interpret=True)
    q2 = q.at[0].add(100.0)
    out2 = fa.packed_short_seq_attention(q2, k, v, interpret=True)
    np.testing.assert_array_equal(np.asarray(out1[1:]), np.asarray(out2[1:]))
    assert not np.allclose(np.asarray(out1[0]), np.asarray(out2[0]))
