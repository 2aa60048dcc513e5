"""Hardware smoke for the fused PD kernel (ops/pallas_pd.py).

Runs the benchmark-recipe LP at n=500 then n=1000 through
LPSolver(algorithm="pd") — which dispatches to the fused
one-kernel-per-iteration driver on TPU — and cross-checks the objective
against HiGHS.  Also times the XLA pd engine (use_pallas=False) for the
kernel-vs-XLA delta.  Run: python scripts/tpu_pd_smoke.py [n ...]
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ip_tpu_jax_cache")

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
os.makedirs("/tmp/ip_tpu_jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/ip_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(n, reps=3):
    from scipy.optimize import linprog
    from interiorpoint_tpu import LPSolver

    m, k = int(0.8 * n), int(0.2 * n)
    np.random.seed(1)
    A = np.random.uniform(-2, 2, (m, n))
    C = np.random.uniform(-2, 2, (k, n))
    xf = np.random.uniform(-2, 2, n)
    c = np.random.uniform(-2, 2, n)
    kw = dict(c=c, A=A, b=A @ xf, C=C, d=C @ xf, lower_bound=-3,
              upper_bound=3, suppress_print=True, check_cvxpy=False,
              epsilon=1e-4, t0=1)
    out = {}
    for label, extra in (("fused", {}),
                         ("xla", {"dtype": "float64"})):
        s = LPSolver(algorithm="pd", **kw, **extra)
        if label == "xla":
            import dataclasses
            s.cfg = dataclasses.replace(s.cfg, use_pallas=False)
        t0 = time.time()
        s.solve()
        compile_s = time.time() - t0
        times = []
        for _ in range(reps):
            t0 = time.time()
            s.solve()
            times.append(time.time() - t0)
        out[label] = (min(times), s.value, s.outer_iters, compile_s)
        print(f"# pd-{label} n={n}: {min(times):.4f}s "
              f"(compile+first {compile_s:.0f}s) obj {s.value:.6f} "
              f"iters {s.outer_iters}", flush=True)
    if n <= 2000:
        ref = linprog(c, A_ub=C, b_ub=C @ xf, A_eq=A, b_eq=A @ xf,
                      bounds=[(-3, 3)] * n, method="highs")
        for label, (tt, val, it, _) in out.items():
            print(f"# pd-{label} n={n} rel err vs HiGHS: "
                  f"{abs(val - ref.fun) / abs(ref.fun):.2e}", flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    t0 = time.time()
    np.asarray(jax.numpy.ones(8) * 2.0)
    print(f"d2h warm: {time.time()-t0:.1f}s", flush=True)
    sizes = [int(a) for a in sys.argv[1:]] or [500, 1000]
    for n in sizes:
        run(n)


if __name__ == "__main__":
    main()
