"""Shipped-generation-bundle tests: packager CLI + generate_melodies CLI.

The bundle collapses the reference's three wired-together artifacts (TF1
MusicVAE ckpt + diffusion ckpt + slice pickle, reference
``sample_ncsn.py:193-211``) into one pickle served by
``scripts/generate_melodies.py``.
"""
import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

from tests.test_cli import _run, toy_tfrecords, trained_toy  # noqa: F401

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _tiny_bundle(tmp_path, with_consistency=True):
    import jax
    import jax.numpy as jnp
    from smd_tpu.diffusion import schedules
    from smd_tpu.models import get_model
    from smd_tpu.training.distill import distill_grid
    from smd_tpu.utils import io as io_lib

    model = get_model("TransformerDDPM", num_layers=1, num_heads=2,
                      num_mlp_layers=1, mlp_dims=16)
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, jnp.zeros((2, 4, 8)), jnp.zeros((2, 1, 1)))
    betas = schedules.noise_schedule(1e-6, 0.01, 20, "linear")
    bundle = {
        "kind": "smd-tpu-generation-bundle",
        "arch": {"architecture": "TransformerDDPM", "num_layers": 1,
                 "num_heads": 2, "num_mlp_layers": 1, "mlp_dims": 16},
        "params": params,
        "schedule": {"sigma_begin": 1e-6, "sigma_end": 0.01,
                     "num_sigmas": 20, "kind": "linear"},
        "sample_shape": [4, 8],
        "out_channels": 16,
        "slice_idx": np.arange(8),
        "normalize": True,
        "data_min": -2.0,
        "data_max": 2.0,
        "provenance": "test",
        "consistency": ({"params": params,
                         "grid": np.asarray(distill_grid(betas, 4))}
                        if with_consistency else None),
    }
    path = str(tmp_path / "bundle.pkl")
    io_lib.save(bundle, path)
    return path


def _tiny_codec(tmp_path):
    import jax
    import jax.numpy as jnp
    from smd_tpu.codec.musicvae import MusicVAE, MusicVAEConfig
    from smd_tpu.utils import io as io_lib

    cfg = MusicVAEConfig(latent_dims=16, enc_units=8, dec_units=(8,),
                         depth=90, max_seq_len=32)
    model = MusicVAE(cfg)
    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng}, jnp.zeros((1, 32, 90)), rng)
    path = str(tmp_path / "codec.pkl")
    io_lib.save({"params": params, "config": cfg}, path)
    return path


@pytest.mark.slow
def test_generate_melodies_cli(tmp_path):
    """bundle + codec -> .mid files via both sampler families."""
    bundle = _tiny_bundle(tmp_path)
    codec = _tiny_codec(tmp_path)
    for sampler, steps in (("consistency", "2"), ("ddim", "4")):
        out_dir = str(tmp_path / f"mid_{sampler}")
        _run(["scripts/generate_melodies.py", f"--bundle={bundle}",
              f"--vae_params={codec}", f"--output_dir={out_dir}",
              "--n=2", f"--sampler={sampler}", f"--steps={steps}"])
        mids = sorted(os.listdir(out_dir))
        assert mids == ["melody_000.mid", "melody_001.mid"]
        from smd_tpu.codec import midi_io
        ns = midi_io.read_midi_file(os.path.join(out_dir, mids[0]))
        assert ns.total_time >= 0  # parses back as valid MIDI


@pytest.mark.slow
def test_generate_melodies_requires_consistency_pack(tmp_path):
    bundle = _tiny_bundle(tmp_path, with_consistency=False)
    codec = _tiny_codec(tmp_path)
    env = dict(os.environ, SMD_TPU_PLATFORM="cpu",
               JAX_COMPILATION_CACHE_DIR="/tmp/jax_cache")
    proc = subprocess.run(
        [sys.executable, "scripts/generate_melodies.py",
         f"--bundle={bundle}", f"--vae_params={codec}",
         f"--output_dir={tmp_path / 'x'}", "--n=1",
         "--sampler=consistency"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=300)
    assert proc.returncode != 0
    assert "no consistency pack" in proc.stderr


@pytest.mark.slow
def test_package_generation_bundle_cli(trained_toy, tmp_path):  # noqa: F811
    """Packager round-trip on a real (toy) model_dir: restores the latest
    checkpoint, records schedule/normalization, omits consistency."""
    out = str(tmp_path / "toy-bundle.pkl")
    _run(["scripts/package_generation_bundle.py"] + trained_toy + [
        f"--output={out}", "--provenance=toy-test"])
    with open(out, "rb") as f:
        bundle = pickle.load(f)
    assert bundle["kind"] == "smd-tpu-generation-bundle"
    assert bundle["sample_shape"] == [2]
    assert bundle["schedule"]["num_sigmas"] == 50
    assert bundle["consistency"] is None
    assert bundle["provenance"] == "toy-test"
    # fp16 artifact params
    leaves = [np.asarray(x) for x in
              __import__("jax").tree_util.tree_leaves(bundle["params"])]
    assert all(l.dtype != np.float32 for l in leaves)
    assert np.isfinite(bundle["data_min"]) and np.isfinite(bundle["data_max"])
