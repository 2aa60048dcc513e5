"""Round-4c probe: adaptive-CH kernels (pick_ch) on the flagship rows,
with iteration-count decomposition (solve time = steps x step-time).

    PYTHONPATH=/root/repo timeout 9000 python scripts/tpu_round4c.py
"""
import json
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
import bench  # noqa: E402


def solve_with_counts(suite, n, algo):
    """One bench-recipe solve returning (seconds, value, outer, inner)."""
    import jax.numpy as jnp  # noqa: F401
    if suite == "lp":
        from interiorpoint_tpu import LPSolver
        m, k = int(0.8 * n), int(0.2 * n)
        np.random.seed(1)
        A = np.random.uniform(-2, 2, (m, n))
        C = np.random.uniform(-2, 2, (k, n))
        x_feas = np.random.uniform(-2, 2, n)
        c = np.random.uniform(-2, 2, n)
        solver = LPSolver(c=c, A=A, b=A @ x_feas, C=C, d=C @ x_feas,
                          lower_bound=-3, upper_bound=3,
                          suppress_print=True, check_cvxpy=False,
                          epsilon=1e-4, mu=15, t0=1, max_inner_iters=20,
                          max_outer_iters=10, beta=0.5, alpha=0.05,
                          dtype="float64", algorithm=algo)
    else:
        from interiorpoint_tpu import QPSolver
        m = int(0.8 * n)
        np.random.seed(1)
        Pp = np.random.uniform(-2, 2, (m, n))
        P = Pp.T @ Pp + np.eye(n)
        A = np.random.uniform(-2, 2, (m, n))
        C = np.random.uniform(-2, 2, (20, n))
        x_feas = np.random.uniform(-2, 2, n)
        solver = QPSolver(P=P, q=np.random.uniform(-2, 2, n), A=A,
                          b=A @ x_feas, C=C, d=C @ x_feas,
                          lower_bound=-3, upper_bound=3,
                          suppress_print=True, check_cvxpy=False,
                          epsilon=1e-8, mu=15, t0=0.01,
                          max_inner_iters=100, max_outer_iters=10,
                          beta=0.6, dtype="float64", algorithm=algo)
    solver.solve()       # warm
    t0 = time.time()
    solver.solve()
    dt = time.time() - t0
    inner = (sum(solver.inner_iters)
             if isinstance(solver.inner_iters, list) else solver.inner_iters)
    return dt, solver.value, solver.outer_iters, inner


def main():
    print("devices:", jax.devices(), flush=True)
    t0 = time.time()
    np.asarray(jax.numpy.ones(8) * 2.0)
    print(f"d2h warm: {time.time()-t0:.1f}s", flush=True)

    for suite, n, algo in [("lp", 1000, "barrier"), ("qp", 1000, "barrier"),
                           ("lp", 1000, "pd")]:
        t0 = time.time()
        try:
            dt, val, outer, inner = solve_with_counts(suite, n, algo)
        except Exception as e:
            print(f"# {suite}_{algo} n={n} FAILED after "
                  f"{time.time()-t0:.0f}s: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
            continue
        print(f"# {suite}_{algo} n={n}: {dt:.4f}s obj {val:.8f} "
              f"outer={outer} inner_total={inner} "
              f"(~{dt/max(inner,1)*1e3:.2f} ms/newton-step)", flush=True)

    for suite, n in [("lp", 1000), ("qp", 1000), ("lp", 5000),
                     ("lp-pd", 1000), ("qp-pd", 1000)]:
        t0 = time.time()
        try:
            res = bench.roofline(suite, n, 30, "float64")
        except Exception as e:
            print(f"# roofline {suite} n={n} FAILED after "
                  f"{time.time()-t0:.0f}s: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
            continue
        print(f"# roofline {suite} n={n}: k={res['k']} r={res['r']} "
              f"mode={res['mode']} {res['step_ms']:.2f} ms/step "
              f"({res['frac_f32_eff_peak']*100:.1f}% f32-eff peak)",
              flush=True)
        print(json.dumps({
            "metric": f"{suite}_n{n}_fused_step_tflops",
            "value": round(res["achieved_tflops"], 3), "unit": "TFLOP/s",
            "vs_baseline": round(res["frac_f32_eff_peak"], 4)}),
            flush=True)

    # socp-pd with the reverted (tight) KKT tolerances
    t0 = time.time()
    try:
        mean_s, times, val, note = bench.bench_socp(1000, 2, "float64",
                                                    algorithm="pd")
        print(f"# socp_pd n=1000: wall {time.time()-t0:.0f}s "
              f"obj {val:.8f} times {['%.3f' % t for t in times]}",
              flush=True)
    except Exception as e:
        print(f"# socp_pd n=1000 FAILED: {type(e).__name__}: "
              f"{str(e)[:300]}", flush=True)

    # pure factor-chain floor: blocked Cholesky alone at the reduced
    # shapes (isolates the sequential 128-pivot diag-block chains from
    # the pass/chunk costs measured above)
    from jax import lax
    from interiorpoint_tpu.ops.pallas_chol import cholesky_blocked
    rng = np.random.default_rng(0)
    for rdim in (256, 512, 1024):
        A = rng.standard_normal((rdim, rdim))
        H = jax.numpy.asarray((A @ A.T + rdim * np.eye(rdim))
                              .astype(np.float32))

        def chol_chain(Hm):
            def one(i, acc):
                L, _ = cholesky_blocked(acc)
                return acc + 0.0 * L
            return lax.fori_loop(0, 30, one, Hm)

        jc = jax.jit(chol_chain)
        jax.block_until_ready(jc(H))
        t0 = time.time()
        jax.block_until_ready(jc(H))
        print(f"# chol_blocked rp={rdim}: {(time.time()-t0)/30*1e3:.3f} "
              f"ms/factor", flush=True)


if __name__ == "__main__":
    main()
