"""Solve-state checkpointing: terminal warm starts and mid-solve resume.

The reference has no checkpoint/resume: only a memoized ``resolve=False``
result cache (reference: LPSolver.py:525-526, SURVEY.md §5).  Two new
capabilities here:

* **Terminal warm start** (save_state/load_state/warm_solve): snapshot a
  finished solve and warm-start a later one — for parameter sweeps.
* **Mid-solve resume** (save_outer_state/load_outer_state): the barrier
  loop's entire OuterState is a pytree, and the host-stepped staged
  dispatch (models/base.py:_barrier_staged) crosses the host between
  stages — so ``solve(checkpoint_path=...)`` persists the full solver
  state after every barrier stage, and ``solve(checkpoint_path=...,
  resume=True)`` continues a killed job from its last completed stage.
"""

from __future__ import annotations

import os

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


# ---------------------------------------------------------------------------
# Mid-solve resume: OuterState pytree <-> .npz (atomic replace).
# ---------------------------------------------------------------------------


def _atomic_savez(path, data):
    tmp = str(path) + ".tmp.npz"
    np.savez(tmp, **data)
    os.replace(tmp, path)


def save_outer_state(path, state, phase1=None):
    """Persist a barrier OuterState (ops/ipm.py) after a completed stage;
    atomic (write-then-replace) so a kill mid-write never corrupts the
    last good checkpoint."""
    data = {f"state_{k}": np.asarray(v)
            for k, v in state._asdict().items()}
    if phase1 is not None:
        data.update(p1_x=np.asarray(phase1.x), p1_s=np.asarray(phase1.s),
                    p1_outer=np.asarray(phase1.outer_iters),
                    p1_newton=np.asarray(phase1.newton_iters))
    _atomic_savez(path, data)


def save_p1_state(path, st):
    """Persist a mid-phase-1 Phase1State (ops/ipm.py) after a completed
    phase-1 barrier stage — a kill during phase one is resumable too."""
    _atomic_savez(path, {f"p1state_{k}": np.asarray(v)
                         for k, v in st._asdict().items()})


def load_outer_state(path):
    """Load a mid-solve checkpoint; returns the raw array dict, or None
    when the file does not exist (callers then start fresh)."""
    if not os.path.exists(path):
        return None
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


def _restore_namedtuple(template, data, prefix):
    """Rebuild a state NamedTuple from checkpoint arrays, casting each
    leaf to the template's dtype and reconciling trace-array lengths.

    The template comes from the same init function on the same problem
    but the *resuming* config — its cap-sized 1-D traces (obj_vals /
    inner_iters over max_outer_iters, bt_hist over max_linesearch_steps)
    may be longer than the checkpointed run's.  A shorter checkpoint
    trace is placed into the head of the template's (already
    init-valued) array; a longer one cannot fit without dropping
    recorded history, so that raises instead of silently truncating."""
    import jax.numpy as jnp

    kwargs = {}
    for k, tv in template._asdict().items():
        arr = jnp.asarray(data[f"{prefix}{k}"]).astype(tv.dtype)
        if arr.shape != tv.shape:
            if (k in ("inner_iters", "obj_vals", "bt_hist")
                    and arr.ndim == 1 and tv.ndim == 1
                    and arr.shape[0] < tv.shape[0]):
                arr = tv.at[: arr.shape[0]].set(arr)
            else:
                raise ValueError(
                    f"checkpoint field {k!r} has shape {arr.shape} but the "
                    f"resuming config expects {tv.shape}; resume with caps "
                    "(max_outer_iters / max_linesearch_steps) at least as "
                    "large as the checkpointed run's")
        kwargs[k] = arr
    return template.__class__(**kwargs)


def restore_outer_state(template, data):
    """Rebuild an OuterState from ``load_outer_state`` arrays (template
    from ops/ipm.py:outer_init)."""
    return _restore_namedtuple(template, data, "state_")


def restore_p1_state(template, data):
    """Rebuild a Phase1State from checkpoint arrays (template from
    ops/ipm.py:phase1_init)."""
    return _restore_namedtuple(template, data, "p1state_")


def restore_phase1(data, dtype):
    """Rebuild the Phase1Result recorded in a checkpoint, if any."""
    if "p1_x" not in data:
        return None
    import jax.numpy as jnp
    from ..ops.ipm import Phase1Result

    return Phase1Result(
        x=jnp.asarray(data["p1_x"], dtype),
        s=jnp.asarray(data["p1_s"], dtype),
        outer_iters=jnp.asarray(data["p1_outer"], jnp.int32),
        newton_iters=jnp.asarray(data["p1_newton"], jnp.int32))
