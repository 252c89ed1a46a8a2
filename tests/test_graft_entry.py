"""Driver entry-point contract tests."""

import sys
import os

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as graft  # noqa: E402


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    y_new, obs_new, action = out
    assert y_new.shape == (192,)
    assert obs_new.shape == (1, 8)
    assert action.shape == (1, 8)
    assert np.isfinite(np.asarray(y_new)).all()


def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)


def test_dryrun_multichip_2():
    graft.dryrun_multichip(2)
