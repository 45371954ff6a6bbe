"""The driver's entry points must work both hot (devices available) and cold
(1-device axon platform -> subprocess re-exec onto a virtual CPU mesh)."""
import sys
import pathlib

import jax
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import __graft_entry__ as graft  # noqa: E402


def test_entry_compiles():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 32, 42)


def test_dryrun_multichip_inline():
    # conftest gives us 8 virtual CPU devices, so this runs without re-exec.
    graft.dryrun_multichip(8)


@pytest.mark.slow
def test_dryrun_multichip_reexec():
    # The driver calls this cold on the 1-chip axon platform; the re-exec
    # bootstrap must build the virtual mesh in a subprocess.
    graft._reexec_on_virtual_cpu(8)
