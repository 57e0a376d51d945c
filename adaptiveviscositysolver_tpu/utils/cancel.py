"""Cooperative cancellation of an in-flight solve.

TPU-native analog of the reference's ``UT_Interrupt`` checks
(``boss->opInterrupt()`` polled inside every loop, e.g.
/root/reference/Source/HDK_OctreeGrid.cpp:227-228, with mid-pipeline
bail-outs at HDK_OctreeGrid.cpp:613-615).  A jitted XLA program cannot be
interrupted from the outside, but the dominant cost of a frame is the CG
while_loop — so the solve polls a host-side flag from inside that loop via
``jax.experimental.io_callback`` every ``SolverConfig.cancel_poll_iters``
iterations and exits early when it is set.

The flag is process-global (one simulation loop per process is the
reference's model too): ``request()`` from any thread — e.g. a UI or signal
handler — makes the running CG stop within one poll interval; the solve
then completes its (cheap) writeback with the partial iterate and returns,
with ``stats.residual`` showing the unconverged value.  ``clear()`` re-arms
before the next solve.

Polling is OFF by default (``cancel_poll_iters=0``): each poll is a host
round trip (~tens of microseconds locally, ~35 ms through a remote-device
tunnel), so the interval trades responsiveness against overhead.
"""

from __future__ import annotations

import threading

import numpy as np

_EVENT = threading.Event()


def request() -> None:
    """Ask the in-flight solve (if any) to stop at its next poll."""
    _EVENT.set()


def clear() -> None:
    """Re-arm: forget a previous cancellation request."""
    _EVENT.clear()


def is_requested() -> bool:
    return _EVENT.is_set()


def poll_host() -> np.bool_:
    """io_callback target: the flag as a device-shippable scalar."""
    return np.bool_(_EVENT.is_set())
