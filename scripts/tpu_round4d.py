"""Round-4d: the full benchmark-matrix re-measure at HEAD
(RTT-adjusted; every README table cell + the new XL points).

    timeout 14000 python scripts/tpu_round4d.py
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

    fns = {"lp": bench.bench_lp, "qp": bench.bench_qp,
           "socp": bench.bench_socp}

    rows = [
        ("lp", 1000, "barrier", 3), ("lp", 1000, "pd", 3),
        ("qp", 1000, "barrier", 3), ("qp", 1000, "pd", 3),
        ("socp", 1000, "barrier", 3), ("socp", 1000, "pd", 2),
        ("lp", 3000, "barrier", 2), ("lp", 3000, "pd", 2),
        ("socp", 3000, "barrier", 2),
        ("lp", 5000, "barrier", 2), ("lp", 5000, "pd", 2),
        ("qp", 5000, "barrier", 2), ("qp", 5000, "pd", 2),
    ]
    for suite, n, algo, reps in rows:
        t0 = time.time()
        try:
            mean_s, times, val, note = fns[suite](n, reps, "float64",
                                                  algorithm=algo)
            bl = bench.BASELINES[suite].get(n)
            sp = f" ({bl/mean_s:.1f}x T4)" if bl else ""
            print(f"# {suite}_{algo} n={n}: {mean_s:.4f}s{sp} "
                  f"obj {val:.8f} {note} wall {time.time()-t0:.0f}s "
                  f"times {['%.3f' % t for t in times]}", flush=True)
        except Exception as e:
            print(f"# {suite}_{algo} n={n} FAILED after "
                  f"{time.time()-t0:.0f}s: {type(e).__name__}: "
                  f"{str(e)[:600]}", flush=True)

    # LASSO rows
    for n in (1000, 5000):
        t0 = time.time()
        try:
            mean_s, times, val, note = bench.bench_lasso(n, 2, "float64")
            bl = bench.BASELINES["lasso"].get(n)
            print(f"# lasso n={n}: {mean_s:.4f}s ({bl/mean_s:.1f}x T4) "
                  f"wall {time.time()-t0:.0f}s", flush=True)
        except Exception as e:
            print(f"# lasso n={n} FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)

    # LP n=10000 (xl)
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
        print(f"# lp n=10000 (xl): {dt:.4f}s obj {solver.value:.6f} "
              f"(setup+compile {t1-t0:.0f}s)", flush=True)
    except Exception as e:
        print(f"# lp n=10000 FAILED after {time.time()-t0:.0f}s: "
              f"{type(e).__name__}: {str(e)[:800]}", flush=True)

    # SOCP n=5000: try the pd engine (different memory profile than the
    # barrier's dd oracle, which RESOURCE_EXHAUSTED in round-4's first
    # attempt), then the barrier with full error capture.
    for algo in ("pd", "barrier"):
        t0 = time.time()
        try:
            mean_s, times, val, note = bench.bench_socp(
                5000, 1, "float64", algorithm=algo)
            print(f"# socp_{algo} n=5000: {mean_s:.4f}s obj {val:.8f} "
                  f"wall {time.time()-t0:.0f}s", flush=True)
        except Exception as e:
            print(f"# socp_{algo} n=5000 FAILED after "
                  f"{time.time()-t0:.0f}s: {type(e).__name__}: "
                  f"{str(e)[:800]}", flush=True)


if __name__ == "__main__":
    main()
