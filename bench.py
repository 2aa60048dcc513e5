"""Headline benchmark: dense random LP, n=1000, reference benchmark recipe.

Problem and solver settings mirror the reference benchmark exactly
(reference: testSolver.py:75-146): A (m=0.8n × n), C (k=0.2n × n) uniform
in [-2,2], b = A·x_feas, d = C·x_feas, bounds ±3, ε=1e-4, μ=15, t0=1,
max_inner=20, max_outer=10, β=0.5, α=0.05.  Baseline: reference GPU
(NVIDIA T4, float64 CuPy) mean 1.434 s at n=1000
(BASELINE.md, testResults_jax_included_LP.csv).

Timing is steady-state (first solve warms the jit cache; XLA compilation is
a one-time cost amortized across production solves).  Output: ONE JSON line.

Usage: python bench.py  [--n N] [--reps R]
"""

import argparse
import json
import sys
import time

import numpy as np

BASELINES = {
    # reference GPU seconds by n (BASELINE.md, LP table)
    100: 0.883, 500: 0.965, 1000: 1.434, 2000: 2.507, 3000: 4.400,
    5000: 12.400,
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=1000)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--dtype", type=str, default="float64")
    args = p.parse_args()

    import jax
    if args.dtype == "float64":
        jax.config.update("jax_enable_x64", True)

    from interiorpoint_tpu import LPSolver

    n = args.n
    m, k = int(0.8 * n), int(0.2 * n)
    np.random.seed(1)  # (reference: testSolver.py:32)
    A = np.random.uniform(-2, 2, (m, n))
    C = np.random.uniform(-2, 2, (k, n))
    x_feas = np.random.uniform(-2, 2, n)
    c = np.random.uniform(-2, 2, n)
    b = A @ x_feas
    d = C @ x_feas

    solver = LPSolver(
        c=c, A=A, b=b, C=C, d=d, lower_bound=-3, upper_bound=3,
        suppress_print=True, check_cvxpy=False,
        epsilon=1e-4, mu=15, t0=1, max_inner_iters=20, max_outer_iters=10,
        beta=0.5, alpha=0.05, dtype=args.dtype,
    )

    # warmup (compile)
    t0 = time.time()
    val = solver.solve()
    warmup_s = time.time() - t0

    times = []
    for _ in range(args.reps):
        t0 = time.time()
        val = solver.solve()
        times.append(time.time() - t0)
    mean_s = float(np.mean(times))

    # correctness cross-check (stderr only)
    try:
        from scipy.optimize import linprog
        ref = linprog(c, A_ub=C, b_ub=d, A_eq=A, b_eq=b,
                      bounds=[(-3, 3)] * n, method="highs")
        rel_err = abs(val - ref.fun) / abs(ref.fun)
        print(f"# objective {val:.8f} vs scipy {ref.fun:.8f} "
              f"(rel err {rel_err:.2e}); warmup {warmup_s:.1f}s; "
              f"times {['%.3f' % t for t in times]}", file=sys.stderr)
    except Exception as e:  # pragma: no cover
        print(f"# scipy check skipped: {e}", file=sys.stderr)

    baseline = BASELINES.get(n)
    print(json.dumps({
        "metric": f"lp_n{n}_solve_seconds",
        "value": round(mean_s, 4),
        "unit": "s",
        "vs_baseline": (round(baseline / mean_s, 3) if baseline else None),
    }))


if __name__ == "__main__":
    main()
