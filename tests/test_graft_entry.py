"""Driver entry-point contracts: single-chip forward step + multichip
dry run on the virtual 8-device mesh."""

import sys

import jax
import numpy as np


def test_entry_compiles():
    sys.path.insert(0, ".")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    scores, hist = (np.asarray(o) for o in out)
    assert scores.shape == (4096, 2)
    assert hist.shape == (19001, 2)
    assert hist.sum() == 4096 * 2


def test_dryrun_multichip():
    sys.path.insert(0, ".")
    import __graft_entry__ as ge

    ge.dryrun_multichip(len(jax.devices()))
