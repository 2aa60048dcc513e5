"""Solve-state checkpointing and warm starts.

The reference has no checkpoint/resume: only a memoized ``resolve=False``
result cache (reference: LPSolver.py:525-526, SURVEY.md §5).  New
capability here: the entire solver state is a pytree, so a solve can be
snapshotted to disk and a later solve warm-started from it — useful for
parameter sweeps (re-solving after small data changes) and for resuming
long jobs.
"""

from __future__ import annotations

import numpy as np


def save_state(path, solver):
    """Snapshot a solved driver's terminal state to ``path`` (.npz)."""
    if not solver.optimal:
        raise ValueError("solve() before saving state")
    res = solver._result
    np.savez(
        path,
        x=np.asarray(res.x),
        v=(np.asarray(res.v) if res.v is not None else np.zeros(0)),
        t=np.asarray(res.t),
        value=np.asarray(res.value),
        dual_gap=np.asarray(res.dual_gap),
    )


def load_state(path):
    """Load a snapshot; returns a dict usable as solve() warm-start kwargs:
    ``solver.solve(x0=state['x'], t0=state['t'])``."""
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


def warm_solve(solver, state):
    """Resume a solve from a snapshot (same problem or a nearby one).

    Uses the snapshot iterate and barrier parameter; the barrier loop
    continues from there (phase one re-runs automatically if the snapshot
    iterate is infeasible for the new problem data)."""
    return solver.solve(x0=state["x"], t0=float(state["t"]))
