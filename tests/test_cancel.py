"""Cooperative cancellation (utils/cancel.py + operator._flat_pcg).

TPU-native analog of the reference's ``boss->opInterrupt()`` polling
(/root/reference/Source/HDK_OctreeGrid.cpp:227-228): the CG while_loop
polls the process-global flag through a host io_callback every
``cancel_poll_iters`` iterations and exits early when it is set.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from adaptiveviscositysolver_tpu import operator
from adaptiveviscositysolver_tpu.utils import cancel

from tests.test_precond import _spd_system


@pytest.fixture(autouse=True)
def _rearm():
    cancel.clear()
    yield
    cancel.clear()


def _problem():
    a_np, b_np = _spd_system(n=300, cond=1e4, seed=7)
    a = jnp.asarray(a_np)
    diag = {(0, 0): jnp.asarray(np.diag(a_np))}
    rhs = {(0, 0): jnp.asarray(b_np)}
    x0 = {(0, 0): jnp.zeros_like(rhs[(0, 0)])}

    def apply_a(tree):
        return {(0, 0): a @ tree[(0, 0)]}

    return apply_a, rhs, x0, diag


@pytest.mark.smoke
def test_cancel_stops_at_next_poll():
    apply_a, rhs, x0, diag = _problem()
    # un-cancelled: polling enabled but flag clear — identical result to
    # the poll-free solve (the callback must not perturb the algebra)
    x_ref, it_ref, rel_ref = operator.pcg_flat(
        apply_a, rhs, x0, diag, 1e-8, 10000)
    x_p, it_p, rel_p = operator.pcg_flat(
        apply_a, rhs, x0, diag, 1e-8, 10000, cancel_poll=16)
    assert int(it_p) == int(it_ref)
    np.testing.assert_allclose(np.asarray(x_p[(0, 0)]),
                               np.asarray(x_ref[(0, 0)]), rtol=0, atol=0)

    # pre-set flag: the loop must stop at the FIRST poll (iteration 16),
    # long before the ~hundreds the system needs, returning the partial
    # iterate with an honest (unconverged) residual
    assert int(it_ref) > 64
    cancel.request()
    _, it_c, rel_c = operator.pcg_flat(
        apply_a, rhs, x0, diag, 1e-8, 10000, cancel_poll=16)
    assert int(it_c) == 16, int(it_c)
    assert float(rel_c) > 1e-8

    # re-armed: converges again
    cancel.clear()
    _, it_again, rel_again = operator.pcg_flat(
        apply_a, rhs, x0, diag, 1e-8, 10000, cancel_poll=16)
    assert int(it_again) == int(it_ref)
    assert float(rel_again) <= 1e-8


def test_cancel_config_knob():
    from adaptiveviscositysolver_tpu.config import SolverConfig

    with pytest.raises(ValueError, match="cancel_poll_iters"):
        SolverConfig(cancel_poll_iters=-1)
    SolverConfig(cancel_poll_iters=50)
