"""Round-5b: endurance retest with executable-cache hygiene.

Round-5a facts (round5a_raw.log): after SOCP n=5000 rep 0 the client
holds ZERO live arrays, yet rep 1 dies RESOURCE_EXHAUSTED and the first
OOM poisons the process for every later dispatch (even LP n=1000).  The
only device state surviving a clean client is the loaded-executable set
(TPU programs live in HBM) and allocator fragmentation.  This probe
inserts ``jax.clear_caches()`` between reps — unloading every compiled
program — plus the round-5 driver fix that stops the t0-auto heuristic
from eagerly materializing ~2.7 GiB of oracle caches.

    timeout 9000 python scripts/tpu_round5b.py 2>&1 | tee benchmarks/results/round5b_raw.log
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
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tpu_round5a import mem_report, solve_socp  # noqa: E402


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
            del solver
        except Exception as e:
            print(f"# socp n={n} rep={rep} FAILED after "
                  f"{time.time()-t0:.0f}s: {type(e).__name__}: "
                  f"{str(e)[:400]}", flush=True)
        gc.collect()
        jax.clear_caches()
        gc.collect()
        mem_report(f"rep{rep} post-del+clear_caches")

    # cross-suite survival
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
