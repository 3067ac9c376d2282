"""The driver entry points stay runnable: single-chip entry() and the full
multi-chip dry run (small-K sharded, product driver, big-K K-sharded,
forced-pigeonhole driver) on the test conftest's 8-device CPU mesh."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import __graft_entry__ as graft  # noqa: E402


def test_entry_runs():
    fn, args = graft.entry()
    out = fn(*args)
    assert np.asarray(out[0]).shape == (8192,)


def test_dryrun_multichip_8_devices():
    import jax

    n = min(8, len(jax.devices()))
    graft.dryrun_multichip(n)
