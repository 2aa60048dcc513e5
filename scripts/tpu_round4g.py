"""Round-4g gap fillers: the auto-routed (pd) engine at the XL scale
points — LP n=10000 pd (the barrier took 29.5 s through phase-1 at the
boundary start; the infeasible-start Mehrotra engine needs no phase
one) and SOCP n=3000 pd.

    timeout 9000 python scripts/tpu_round4g.py
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
    # first d2h after another process releases the tunnel can throw a
    # transient FAILED_PRECONDITION — retry with backoff
    for attempt in range(6):
        try:
            np.asarray(jnp.ones(8) * 2.0)
            break
        except Exception as e:
            print(f"d2h warm attempt {attempt} failed: "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)
            time.sleep(60)
    print(f"d2h warm: {time.time()-t0:.1f}s", flush=True)
    print(f"# RTT: {bench.tunnel_rtt()*1e3:.2f} ms", flush=True)

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
                          dtype="float64", algorithm="pd")
        solver.solve()
        t1 = time.time()
        solver.solve()
        dt = time.time() - t1 - bench.tunnel_rtt()
        print(f"# lp_pd n=10000: {dt:.4f}s obj {solver.value:.6f} "
              f"(setup+compile {t1-t0:.0f}s)", flush=True)
    except Exception as e:
        print(f"# lp_pd n=10000 FAILED after {time.time()-t0:.0f}s: "
              f"{type(e).__name__}: {str(e)[:600]}", flush=True)

    t0 = time.time()
    try:
        mean_s, times, val, note = bench.bench_socp(3000, 2, "float64",
                                                    algorithm="pd")
        print(f"# socp_pd n=3000: {mean_s:.4f}s obj {val:.8f} wall "
              f"{time.time()-t0:.0f}s", flush=True)
    except Exception as e:
        print(f"# socp_pd n=3000 FAILED after {time.time()-t0:.0f}s: "
              f"{type(e).__name__}: {str(e)[:600]}", flush=True)


def _run_all():
    main()
    socp5000()

# appended: socp n=5000 rows (cut from round-4f when its HiGHS
# cross-check of the dense n=10000 LP ground for ~30 min)
def socp5000():
    import bench
    import time
    for algo in ("barrier", "pd"):
        t0 = time.time()
        try:
            mean_s, times, val, note = bench.bench_socp(
                5000, 1, "float64", algorithm=algo)
            print(f"# socp_{algo} n=5000: {mean_s:.4f}s obj {val:.8f} "
                  f"wall {time.time()-t0:.0f}s", flush=True)
        except Exception as e:
            print(f"# socp_{algo} n=5000 FAILED after "
                  f"{time.time()-t0:.0f}s: {type(e).__name__}: "
                  f"{str(e)[:700]}", flush=True)


if __name__ == "__main__":
    _run_all()
