"""XL-regime hardware validation + the two never-measured benchmark
points (round-3 VERDICT items 4 and 6):

  * LP n=10000-class (r=2000 -> xl split pipeline), vs HiGHS
  * SOCP n=3000 (r=2950 -> SOCP xl split pipeline)
  * SOCP n=5000 (r=4950 -> staged XLA path; completes the benchmark
    matrix against the reference's 3601 s CPU / failed-GPU row)

    timeout 14000 python scripts/tpu_xl_probe.py
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ip_tpu_jax_cache")

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_enable_x64", True)
os.makedirs("/tmp/ip_tpu_jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/ip_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402


def main():
    print("devices:", jax.devices(), flush=True)
    t0 = time.time()
    np.asarray(jnp.ones(8) * 2.0)
    print(f"d2h warm: {time.time()-t0:.1f}s", flush=True)
    rtt = bench.tunnel_rtt()
    print(f"# RTT: {rtt*1e3:.2f} ms", flush=True)

    # --- SOCP n=3000: the SOCP xl pipeline (target <= 1 s steady) -----
    t0 = time.time()
    try:
        mean_s, times, val, note = bench.bench_socp(3000, 2, "float64")
        print(f"# socp n=3000 (xl): {mean_s:.4f}s obj {val:.8f} wall "
              f"{time.time()-t0:.0f}s times {['%.3f' % t for t in times]}",
              flush=True)
    except Exception as e:
        print(f"# socp n=3000 FAILED after {time.time()-t0:.0f}s: "
              f"{type(e).__name__}: {str(e)[:400]}", flush=True)

    # --- LP n=10000: the LP xl pipeline, vs HiGHS ----------------------
    from interiorpoint_tpu import LPSolver
    n = 10000
    m, k = int(0.8 * n), int(0.2 * n)
    np.random.seed(1)
    A = np.random.uniform(-2, 2, (m, n))
    C = np.random.uniform(-2, 2, (k, n))
    x_feas = np.random.uniform(-2, 2, n)
    c = np.random.uniform(-2, 2, n)
    b, d = A @ x_feas, C @ x_feas
    t0 = time.time()
    try:
        solver = LPSolver(c=c, A=A, b=b, C=C, d=d, lower_bound=-3,
                          upper_bound=3, suppress_print=True,
                          check_cvxpy=False, epsilon=1e-4, mu=15, t0=1,
                          max_inner_iters=20, max_outer_iters=10,
                          beta=0.5, alpha=0.05, dtype="float64")
        solver.solve()                        # warm/compile
        t1 = time.time()
        solver.solve()
        dt = time.time() - t1 - rtt
        print(f"# lp n=10000 (xl): {dt:.4f}s obj {solver.value:.6f} "
              f"(setup+compile {t1-t0:.0f}s)", flush=True)
        from scipy.optimize import linprog
        t2 = time.time()
        ref = linprog(c, A_ub=C, b_ub=d, A_eq=A, b_eq=b,
                      bounds=[(-3, 3)] * n, method="highs")
        if ref.success:
            rel = abs(solver.value - ref.fun) / abs(ref.fun)
            print(f"# lp n=10000 rel err vs HiGHS {rel:.2e} "
                  f"(HiGHS took {time.time()-t2:.0f}s)", flush=True)
    except Exception as e:
        print(f"# lp n=10000 FAILED after {time.time()-t0:.0f}s: "
              f"{type(e).__name__}: {str(e)[:400]}", flush=True)

    # --- SOCP n=5000: staged XLA path (one certified number) -----------
    t0 = time.time()
    try:
        mean_s, times, val, note = bench.bench_socp(5000, 1, "float64")
        print(f"# socp n=5000 (staged XLA): {mean_s:.4f}s obj {val:.8f} "
              f"wall {time.time()-t0:.0f}s", flush=True)
    except Exception as e:
        print(f"# socp n=5000 FAILED after {time.time()-t0:.0f}s: "
              f"{type(e).__name__}: {str(e)[:400]}", flush=True)


if __name__ == "__main__":
    main()
