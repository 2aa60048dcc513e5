"""TPU validation: vmap-of-pallas batched solves (round-1 VERDICT next #6).

Solves a batch of inequality-only LP instances through solve_batch with
the fused Pallas Newton kernel ENABLED (the batched engine vmaps the
pallas_call, which Pallas lowers by prepending a grid dimension), and
checks every instance against its scipy-HiGHS optimum.

Pass -> delete the use_pallas=False override in parallel/batch.py.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_vmap_pallas_check.py
"""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ip_tpu_jax_cache")

import numpy as np
import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
import jax.numpy as jnp  # noqa: E402
from scipy.optimize import linprog  # noqa: E402

from interiorpoint_tpu.models.problem import make_lp  # noqa: E402
from interiorpoint_tpu.parallel.batch import solve_batch, stack_problems  # noqa: E402
from interiorpoint_tpu.utils.config import SolverConfig  # noqa: E402

print("devices:", jax.devices(), flush=True)

B, n, k = 4, 96, 320
probs, refs = [], []
rng = np.random.default_rng(31)
for s in range(B):
    C0 = rng.uniform(-2, 2, (k, n))
    # box rows folded into C: inequality-only problem (lin_form set ->
    # fused kernel path active in newton_feasible)
    C = np.vstack([C0, np.eye(n), -np.eye(n)])
    xf = rng.uniform(-1, 1, n)
    d = np.concatenate([C0 @ xf + 0.5, np.full(2 * n, 3.0)])
    c = rng.uniform(-2, 2, n)
    probs.append(make_lp(c, None, None, C, d, None, None))
    refs.append(linprog(c, A_ub=C, b_ub=d, bounds=[(None, None)] * n,
                        method="highs").fun)

batch = stack_problems(probs)
x0 = jnp.zeros((B, n), dtype=jnp.float64)
cfg = SolverConfig(epsilon=1e-8, t0=1.0, dtype="float64")

t0 = time.time()
res = solve_batch(batch, x0, cfg)
vals = np.asarray(res.value)
print(f"first solve (compile+run+d2h): {time.time()-t0:.1f}s", flush=True)
rel = np.abs(vals - np.asarray(refs)) / np.abs(refs)
print("objectives:", vals, flush=True)
print("rel errors vs HiGHS:", rel, flush=True)

t0 = time.time()
res = solve_batch(batch, x0, cfg)
jax.block_until_ready(res.value)
print(f"steady-state batched solve: {time.time()-t0:.3f}s", flush=True)
print("VMAP-PALLAS", "PASS" if rel.max() < 1e-4 else "FAIL", flush=True)
