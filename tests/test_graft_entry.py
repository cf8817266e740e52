"""Driver-contract tests: __graft_entry__.entry() must jit-compile and run,
and dryrun_multichip must execute the full sharded training step on the
virtual 8-device mesh (both the shard_map DP path and the jit DP×TP path)."""

import os
import sys

import jax
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as graft  # noqa: E402


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    recon, mean, logvar = out
    assert recon.shape == (8, 28, 28, 3)
    assert mean.shape == (8, 7, 7, 16)
    assert logvar.shape == (8, 7, 7, 16)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)
