"""Round-5a: device-memory endurance probe (VERDICT r4 item 1).

Reproduces the round-4 failure shape — SOCP n=5000 solved repeatedly in
ONE process — while instrumenting HBM between reps:

  * per-rep: construct -> solve (warm + timed) -> report -> del + gc
  * after each step: device memory_stats() (when the axon plugin exposes
    them) + jax.live_arrays() census (count / total bytes / top shapes)
  * afterwards: LASSO n=1000 and LP n=1000 in the SAME process, to see
    whether a surviving process keeps serving other suites (the round-4
    sweep lost both to the cascade, round4_sweep_raw.log).

    timeout 9000 python scripts/tpu_round5a.py 2>&1 | tee benchmarks/results/round5a_raw.log
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


def mem_report(tag):
    dev = jax.local_devices()[0]
    line = f"[mem {tag}] "
    try:
        st = dev.memory_stats()
        if st:
            line += (f"in_use={st.get('bytes_in_use', -1)/2**30:.3f}GiB "
                     f"peak={st.get('peak_bytes_in_use', -1)/2**30:.3f}GiB "
                     f"limit={st.get('bytes_limit', -1)/2**30:.3f}GiB ")
    except Exception as e:
        line += f"memory_stats unavailable ({type(e).__name__}) "
    try:
        arrs = [a for a in jax.live_arrays() if a.is_fully_addressable]
        tot = sum(a.nbytes for a in arrs)
        line += f"live_arrays={len(arrs)} live_bytes={tot/2**30:.3f}GiB"
        by_shape = {}
        for a in arrs:
            k = (str(a.dtype), tuple(a.shape))
            by_shape[k] = by_shape.get(k, 0) + a.nbytes
        top = sorted(by_shape.items(), key=lambda kv: -kv[1])[:6]
        for (dt, sh), b in top:
            if b > 2**24:  # >16 MiB
                line += f"\n    {dt}{sh}: {b/2**30:.3f}GiB"
    except Exception as e:
        line += f" live_arrays failed ({type(e).__name__})"
    print(line, flush=True)


def solve_socp(n, seed_rep):
    from interiorpoint_tpu import SOCPSolver
    from interiorpoint_tpu.utils.generators import generate_socp

    p = generate_socp(n)
    x0 = p.pop("x0")
    solver = SOCPSolver(
        **p, suppress_print=True, check_cvxpy=False, epsilon=1e-4, mu=15,
        t0="auto", max_inner_iters=500, max_outer_iters=20, beta=0.5,
        alpha=0.05, x0=x0)
    t0 = time.time()
    solver.solve()
    warm = time.time() - t0
    t0 = time.time()
    val = solver.solve()
    dt = time.time() - t0
    return solver, warm, dt, val


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
    mem_report("baseline")

    np.random.seed(1)
    n = 5000
    for rep in range(3):
        t0 = time.time()
        try:
            solver, warm, dt, val = solve_socp(n, rep)
            print(f"# socp n={n} rep={rep}: {dt:.3f}s (warm {warm:.1f}s) "
                  f"val={val:.5f}", flush=True)
            mem_report(f"rep{rep} post-solve (solver alive)")
            del solver
        except Exception as e:
            print(f"# socp n={n} rep={rep} FAILED after "
                  f"{time.time()-t0:.0f}s: {type(e).__name__}: "
                  f"{str(e)[:500]}", flush=True)
            mem_report(f"rep{rep} post-FAIL")
        gc.collect()
        mem_report(f"rep{rep} post-del+gc")

    # does the process still serve other suites?
    try:
        from interiorpoint_tpu import LassoSolver
        from interiorpoint_tpu.utils.generators import generate_lasso
        p = generate_lasso(1000, num_problems=30)
        ls = LassoSolver(p["A"], p["b"], reg=p["reg"], rho=0.4,
                         max_iters=5000, check_stop=10, add_bias=True,
                         eps_rel=1e-6, eps_abs=1e-6, check_cvxpy=False)
        ls.solve()
        t0 = time.time()
        ls.solve()
    except Exception as e:
        print(f"# lasso n=1000 FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)
    else:
        print(f"# lasso n=1000 after socp reps: OK {time.time()-t0:.3f}s",
              flush=True)
    try:
        from interiorpoint_tpu import LPSolver
        n2 = 1000
        m, k = int(0.8 * n2), int(0.2 * n2)
        A = np.random.uniform(-2, 2, (m, n2))
        C = np.random.uniform(-2, 2, (k, n2))
        xf = np.random.uniform(-2, 2, n2)
        c = np.random.uniform(-2, 2, n2)
        lp = LPSolver(c=c, A=A, b=A @ xf, C=C, d=C @ xf, lower_bound=-3,
                      upper_bound=3, suppress_print=True, check_cvxpy=False,
                      epsilon=1e-4, mu=15, t0=1, max_inner_iters=20,
                      max_outer_iters=10, beta=0.5, alpha=0.05)
        lp.solve()
        t0 = time.time()
        v = lp.solve()
        print(f"# lp n=1000 after socp reps: OK {time.time()-t0:.3f}s "
              f"val={v:.5f}", flush=True)
    except Exception as e:
        print(f"# lp n=1000 FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)
    mem_report("final")


if __name__ == "__main__":
    main()
