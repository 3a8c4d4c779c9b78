"""Driver entry points: compile-check entry() and dryrun at several mesh
sizes (the driver may probe different device counts)."""
import numpy as np
import jax
import pytest

import __graft_entry__ as ge


def test_entry_compiles_and_tracks():
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    R, t, n_inl = out
    assert R.shape == (3, 3) and t.shape == (3,)
    assert int(n_inl) > 400  # the example scene is fully trackable
    assert np.allclose(np.asarray(R).T @ np.asarray(R), np.eye(3), atol=1e-5)


@pytest.mark.parametrize("n", [2, 4, 8])
def test_dryrun_multichip_sizes(n):
    assert len(jax.devices()) >= n
    ge.dryrun_multichip(n)
