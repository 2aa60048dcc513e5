"""TPU smoke + timing for the fused SOCP Newton-step kernel.

Solves the reference SOCP benchmark instance (generate_socp, K=5 cones,
k=50 equalities) through SOCPSolver's reduced path — which routes every
Newton step through ops/pallas_socp.py on TPU — and compares objective
and wall-clock against the XLA dd-oracle path (use_pallas=False).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_socp_smoke.py [n]
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ip_tpu_jax_cache")

import numpy as np
import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

from interiorpoint_tpu import SOCPSolver  # noqa: E402
from interiorpoint_tpu.utils.generators import generate_socp  # noqa: E402

n = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
print("devices:", jax.devices(), flush=True)

np.random.seed(1)
p = generate_socp(n)
x0 = p.pop("x0")

results = {}
for use_pallas in (True, False):
    t0 = time.time()
    solver = SOCPSolver(
        **p, suppress_print=True, check_cvxpy=False, epsilon=1e-4, mu=15,
        t0="auto", max_inner_iters=500, max_outer_iters=20, beta=0.5,
        alpha=0.05, x0=x0)
    if not use_pallas:
        import dataclasses
        solver.cfg = dataclasses.replace(solver.cfg, use_pallas=False)
    print(f"construct (pallas={use_pallas}): {time.time()-t0:.1f}s",
          flush=True)
    t0 = time.time()
    val = solver.solve()
    print(f"first solve: {time.time()-t0:.1f}s obj={val:.9f}", flush=True)
    times = []
    for _ in range(3):
        t0 = time.time()
        solver.solve()
        times.append(time.time() - t0)
    mean_s = float(np.mean(times))
    results[use_pallas] = (mean_s, val, solver.outer_iters,
                           sum(solver.inner_iters))
    print(f"pallas={use_pallas}: steady {mean_s:.4f}s "
          f"(outer {solver.outer_iters}, newton {sum(solver.inner_iters)})",
          flush=True)

(tp, vp, op_, np_), (tx, vx, ox, nx) = results[True], results[False]
rel = abs(vp - vx) / max(1.0, abs(vx))
print(f"fused {tp:.4f}s vs xla {tx:.4f}s -> {tx/tp:.2f}x; "
      f"obj rel diff {rel:.2e}", flush=True)
print("SOCP-FUSED", "PASS" if rel < 1e-5 else "FAIL", flush=True)
