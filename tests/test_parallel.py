import jax
import numpy as np
import pytest


def test_devices_available():
    assert len(jax.devices()) >= 8


def test_dryrun_multichip():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__

    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    rgb = np.asarray(out[0])
    assert rgb.shape[1] == 3
    assert np.isfinite(rgb).all()
