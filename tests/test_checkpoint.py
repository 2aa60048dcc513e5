"""Checkpoint / warm-start tests (new capability; the reference has only a
memoized resolve cache, LPSolver.py:525-526)."""

import numpy as np

from interiorpoint_tpu import LPSolver
from interiorpoint_tpu.utils import checkpoint


def _gen(seed=21):
    rng = np.random.default_rng(seed)
    n, m, k = 30, 24, 6
    A = rng.uniform(-2, 2, (m, n))
    C = rng.uniform(-2, 2, (k, n))
    xf = rng.uniform(-2, 2, n)
    c = rng.uniform(-2, 2, n)
    return c, A, A @ xf, C, C @ xf


def test_save_load_roundtrip(tmp_path):
    c, A, b, C, d = _gen()
    ls = LPSolver(c=c, A=A, b=b, C=C, d=d, lower_bound=-3, upper_bound=3,
                  suppress_print=True, check_cvxpy=False, epsilon=1e-9)
    v1 = ls.solve()
    path = str(tmp_path / "state.npz")
    checkpoint.save_state(path, ls)
    state = checkpoint.load_state(path)
    np.testing.assert_allclose(state["x"], np.asarray(ls.xstar))
    assert float(state["value"]) == float(ls._result.value)


def test_warm_solve_converges_fast(tmp_path):
    c, A, b, C, d = _gen(seed=22)
    ls = LPSolver(c=c, A=A, b=b, C=C, d=d, lower_bound=-3, upper_bound=3,
                  suppress_print=True, check_cvxpy=False, epsilon=1e-9)
    v1 = ls.solve()
    cold_iters = sum(ls.inner_iters)
    path = str(tmp_path / "state.npz")
    checkpoint.save_state(path, ls)
    state = checkpoint.load_state(path)

    v2 = checkpoint.warm_solve(ls, state)
    warm_iters = sum(ls.inner_iters)
    assert abs(v2 - v1) / max(abs(v1), 1.0) < 1e-6
    assert warm_iters < cold_iters / 2
