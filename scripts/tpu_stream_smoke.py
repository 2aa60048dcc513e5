"""TPU smoke test for the HBM-streaming fused Newton kernel.

Runs the streaming kernel at the reference's n=5000 LP reduced shape
(k=11000, r=1000 -> padded 11264x1024) on the real chip, checks the
direction against an on-host f64 solve, and times steady-state.

Usage: python scripts/tpu_stream_smoke.py [k r]
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
import jax.numpy as jnp  # noqa: E402

from interiorpoint_tpu.ops import pallas_newton as pn  # noqa: E402

k = int(sys.argv[1]) if len(sys.argv) > 1 else 11000
r = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
has_P = len(sys.argv) > 3 and sys.argv[3] == "qp"

print("devices:", jax.devices(), flush=True)
print("mode:", pn.kernel_mode(k, r, has_P), "supported_resident:",
      pn.supported(k, r, has_P), flush=True)

rng = np.random.default_rng(5)
C = rng.standard_normal((k, r))
z = rng.standard_normal(r) * 0.1
d = C @ z + rng.uniform(0.05, 2.0, k)
tc = 10.0 * rng.standard_normal(r)
tP = None
if has_P:
    M = rng.standard_normal((r, r))
    tP = (M @ M.T / r + np.eye(r)) * 3.0

t0 = time.time()
consts = pn.prep_reduced_consts(jnp.asarray(C), jnp.asarray(d))
jax.block_until_ready(consts.Chi)
print(f"prep: {time.time()-t0:.1f}s", flush=True)

sig = jnp.asarray(0.6 ** np.arange(40))


def step(tc_, z_, tP_):
    return pn.reduced_newton_step_prepared(
        consts, tc_, z_, tP_, sig, alpha=0.2, stream=True)


jit_step = jax.jit(step)
t0 = time.time()
out = jit_step(jnp.asarray(tc), jnp.asarray(z),
               None if tP is None else jnp.asarray(tP))
jax.block_until_ready(out)
print(f"compile+first-run+first-d2h: {time.time()-t0:.1f}s", flush=True)
x_new, nd, sigma, any_acc, dir_ok = [np.asarray(o) for o in out]
print("sigma:", sigma, "any_acc:", any_acc, "dir_ok:", dir_ok,
      "nd:", nd, flush=True)

# verify against host f64
s = d - C @ z
g = tc + C.T @ (1.0 / s)
H = C.T @ ((1.0 / s**2)[:, None] * C)
if tP is not None:
    g = g + tP @ z
    H = H + tP
dx_ref = np.linalg.solve(H, -g)
dx_tpu = (x_new - z) / sigma if sigma > 0 else x_new * 0
rel = np.max(np.abs(dx_tpu - dx_ref)) / np.max(np.abs(dx_ref))
print("dx rel err vs host f64:", rel, flush=True)

# steady-state timing
N = 10
t0 = time.time()
for _ in range(N):
    out = jit_step(jnp.asarray(tc), jnp.asarray(z),
                   None if tP is None else jnp.asarray(tP))
jax.block_until_ready(out)
dt = (time.time() - t0) / N
print(f"steady-state per-step: {dt*1e3:.2f} ms", flush=True)
ok = rel < 1e-9 and any_acc
print("SMOKE", "PASS" if ok else "FAIL", flush=True)
