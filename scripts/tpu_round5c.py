"""Round-5c: solve-surface measurements at HEAD.

What changed since round 4 and needs hardware numbers:
  * Newton-Schulz preconditioner carry in the fused LP/QP kernels
    (ops/pallas_newton.py) — expect faster barrier solves at resident
    shapes (lp/qp n=1000).
  * Hi-only refinement streams at loose ε — expect faster lp n=5000.
  * Null-space conic Mehrotra engine (models/socp.py:_solve_pd) — the
    VERDICT item-5 question: socp-pd within 1.5x of barrier at n=1000
    AND running at n=5000, or retirement.
  * SOCP n=3000 barrier ≤ 1 s goal (VERDICT item 7).
  * Flow-LP structured-instance regression at HEAD (VERDICT item 9).

    timeout 10000 python scripts/tpu_round5c.py 2>&1 | tee benchmarks/results/round5c_raw.log
"""
import gc
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


def hygiene():
    gc.collect()
    jax.clear_caches()
    gc.collect()


def row(tag, fn, *args, **kw):
    t0 = time.time()
    try:
        mean_s, times, val, note, raw = fn(*args, **kw)
        print(f"# {tag}: {mean_s:.4f}s raw={['%.3f' % t for t in raw]} "
              f"obj {val:.8f} {note} wall {time.time()-t0:.0f}s",
              flush=True)
        return mean_s
    except Exception as e:
        print(f"# {tag} FAILED after {time.time()-t0:.0f}s: "
              f"{type(e).__name__}: {str(e)[:400]}", flush=True)
        return None


def main():
    print("devices:", jax.devices(), flush=True)
    t0 = time.time()
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

    # --- n=1000 barrier rows (NS-carry effect) + lasso --------------------
    row("lp1000_barrier", bench.bench_lp, 1000, 3, "float64")
    row("qp1000_barrier", bench.bench_qp, 1000, 3, "float64")
    row("socp1000_barrier", bench.bench_socp, 1000, 3, "float64")
    row("lasso1000", bench.bench_lasso, 1000, 3, "float64")
    row("lp1000_pd", bench.bench_lp, 1000, 2, "float64", algorithm="pd")

    # --- large-shape LP (hi-only streams) ---------------------------------
    row("lp5000_barrier", bench.bench_lp, 5000, 2, "float64")
    hygiene()

    # --- conic Mehrotra, null-space engine --------------------------------
    row("socp1000_pd", bench.bench_socp, 1000, 2, "float64",
        algorithm="pd")
    hygiene()
    row("socp3000_pd", bench.bench_socp, 3000, 2, "float64",
        algorithm="pd")
    hygiene()
    row("socp3000_barrier", bench.bench_socp, 3000, 2, "float64")
    hygiene()
    row("socp5000_pd", bench.bench_socp, 5000, 1, "float64",
        algorithm="pd")
    hygiene()

    # --- vmap-of-pallas smoke: the batched engine now vmaps the
    # NS-carry kernel variant (minv rides the per-instance loop state) --
    try:
        from scipy.optimize import linprog
        from interiorpoint_tpu.models.problem import make_lp
        from interiorpoint_tpu.parallel.batch import (solve_batch,
                                                      stack_problems)
        from interiorpoint_tpu.utils.config import SolverConfig
        rng = np.random.default_rng(31)
        B, nn, kk = 4, 96, 320
        probs, refs = [], []
        for _ in range(B):
            C0 = rng.uniform(-2, 2, (kk, nn))
            C = np.vstack([C0, np.eye(nn), -np.eye(nn)])
            xf = rng.uniform(-1, 1, nn)
            dvec = np.concatenate([C0 @ xf + 0.5, np.full(nn, 3.0),
                                   np.full(nn, 3.0)])
            c = rng.uniform(-2, 2, nn)
            probs.append(make_lp(c=c, C=C, d=dvec))
            refs.append(linprog(c, A_ub=C, b_ub=dvec,
                                bounds=[(None, None)] * nn,
                                method="highs").fun)
        cfg = SolverConfig(dtype="float64", epsilon=1e-6, t0=1.0, mu=15,
                           max_outer_iters=12, max_inner_iters=60)
        t0 = time.time()
        res = solve_batch(stack_problems(probs),
                          np.zeros((B, nn)), cfg)
        vals = np.asarray(res.value)
        err = max(abs(v - rv) / max(abs(rv), 1) for v, rv in
                  zip(vals, refs))
        print(f"# vmap_ns_batch B={B}: max rel err {err:.2e} "
              f"wall {time.time()-t0:.0f}s", flush=True)
    except Exception as e:
        print(f"# vmap_ns_batch FAILED: {type(e).__name__}: "
              f"{str(e)[:400]}", flush=True)
    hygiene()

    # --- flow-LP structured-instance regression (tests/data/miplib) ------
    try:
        from interiorpoint_tpu import LPSolver
        from interiorpoint_tpu.utils.miplib import load_lp_npy
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "tests", "data", "miplib",
            "flow40.npy")
        c, A, b, C, d, ub, lb = load_lp_npy(path)
        t0 = time.time()
        solver = LPSolver(c=c, A=A, b=b, C=C, d=d, lower_bound=lb,
                          upper_bound=ub, suppress_print=True,
                          check_cvxpy=False, epsilon=1e-4, mu=15, t0=1,
                          max_inner_iters=20, max_outer_iters=10,
                          beta=0.5, alpha=0.05)
        solver.solve()
        t1 = time.time()
        v = solver.solve()
        dt = time.time() - t1 - bench.tunnel_rtt()
        from scipy.optimize import linprog
        ref = linprog(np.asarray(c), A_ub=np.asarray(C), b_ub=np.asarray(d),
                      A_eq=np.asarray(A), b_eq=np.asarray(b),
                      bounds=list(zip(np.asarray(lb), np.asarray(ub))),
                      method="highs")
        print(f"# flow40 LP: {dt:.4f}s obj {v:.6f} HiGHS {ref.fun:.6f} "
              f"rel err {abs(v-ref.fun)/max(abs(ref.fun),1e-30):.2e} "
              f"(setup+warm {t1-t0:.0f}s)", flush=True)
    except Exception as e:
        print(f"# flow40 FAILED: {type(e).__name__}: {str(e)[:400]}",
              flush=True)


if __name__ == "__main__":
    main()
