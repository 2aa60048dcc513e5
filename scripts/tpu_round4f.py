"""Round-4f: the beyond-kernel shapes on the NEW pure-XLA step
(ops/xl_step.py): SOCP n=3000, SOCP n=5000 (both engines), LP n=10000.

    timeout 14000 python scripts/tpu_round4f.py
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
    print(f"# RTT: {bench.tunnel_rtt()*1e3:.2f} ms", flush=True)

    # SOCP n=3000 barrier on the XLA step
    t0 = time.time()
    try:
        mean_s, times, val, note = bench.bench_socp(3000, 2, "float64")
        bl = bench.BASELINES["socp"].get(3000)
        print(f"# socp_barrier n=3000 (xla-step): {mean_s:.4f}s "
              f"({bl/mean_s:.1f}x T4) obj {val:.8f} wall "
              f"{time.time()-t0:.0f}s times {['%.3f' % t for t in times]}",
              flush=True)
    except Exception as e:
        print(f"# socp n=3000 FAILED after {time.time()-t0:.0f}s: "
              f"{type(e).__name__}: {str(e)[:600]}", flush=True)

    # LP n=10000 on the XLA step
    from interiorpoint_tpu import LPSolver
    n = 10000
    m, k = int(0.8 * n), int(0.2 * n)
    np.random.seed(1)
    A = np.random.uniform(-2, 2, (m, n))
    C = np.random.uniform(-2, 2, (k, n))
    x_feas = np.random.uniform(-2, 2, n)
    c = np.random.uniform(-2, 2, n)
    t0 = time.time()
    try:
        solver = LPSolver(c=c, A=A, b=A @ x_feas, C=C, d=C @ x_feas,
                          lower_bound=-3, upper_bound=3,
                          suppress_print=True, check_cvxpy=False,
                          epsilon=1e-4, mu=15, t0=1, max_inner_iters=20,
                          max_outer_iters=10, beta=0.5, alpha=0.05,
                          dtype="float64")
        solver.solve()
        t1 = time.time()
        solver.solve()
        dt = time.time() - t1 - bench.tunnel_rtt()
        print(f"# lp n=10000 (xla-step): {dt:.4f}s obj "
              f"{solver.value:.6f} (setup+compile {t1-t0:.0f}s)",
              flush=True)
        from scipy.optimize import linprog
        ref = linprog(c, A_ub=C, b_ub=C @ x_feas, A_eq=A, b_eq=A @ x_feas,
                      bounds=[(-3, 3)] * n, method="highs")
        if ref.success:
            rel = abs(solver.value - ref.fun) / abs(ref.fun)
            print(f"# lp n=10000 rel err vs HiGHS {rel:.2e}", flush=True)
    except Exception as e:
        print(f"# lp n=10000 FAILED after {time.time()-t0:.0f}s: "
              f"{type(e).__name__}: {str(e)[:800]}", flush=True)

    # SOCP n=5000: barrier on the XLA step (the old dd-oracle path
    # RESOURCE_EXHAUSTED), then pd
    for algo in ("barrier", "pd"):
        t0 = time.time()
        try:
            mean_s, times, val, note = bench.bench_socp(
                5000, 1, "float64", algorithm=algo)
            bl = bench.BASELINES["socp"].get(5000)
            print(f"# socp_{algo} n=5000: {mean_s:.4f}s "
                  f"({bl/mean_s:.1f}x T4-fail-exit) obj {val:.8f} wall "
                  f"{time.time()-t0:.0f}s", flush=True)
        except Exception as e:
            print(f"# socp_{algo} n=5000 FAILED after "
                  f"{time.time()-t0:.0f}s: {type(e).__name__}: "
                  f"{str(e)[:800]}", flush=True)


if __name__ == "__main__":
    main()
