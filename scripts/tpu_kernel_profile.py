"""Decompose the fused Newton-step kernel's per-step time on hardware.

The round-3 roofline rows showed a ~3 ms per-step floor that barely
moves between (k=2200, r=200) and (k=6600, r=600) — a serial component
dominates below the streaming regime.  This script separates it by
timing, at several reduced shapes, chained inside one jitted fori_loop
(no per-call dispatch):

- dir kernel at refine=0        (slacks+gradient+Gram+factor+solve)
- dir kernel at refine=3        (+ dd refinement passes)
- full step kernel at refine=3  (+ 64-candidate line-search sweep)

    PYTHONPATH=/root/repo python scripts/tpu_kernel_profile.py
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ip_tpu_jax_cache")

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

jax.config.update("jax_enable_x64", True)
os.makedirs("/tmp/ip_tpu_jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/ip_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from interiorpoint_tpu.ops import pallas_newton as pn  # noqa: E402

SHAPES = [(2200, 200), (6600, 600), (11000, 1000)]
REPS = 30


def time_chain(fn, z0, reps=REPS):
    """Median-of-3 of one jitted reps-long dependent chain."""
    jit_fn = jax.jit(lambda z: lax.fori_loop(0, reps,
                                             lambda i, zc: fn(zc), z))
    jax.block_until_ready(jit_fn(z0))
    best = np.inf
    for _ in range(3):
        t0 = time.time()
        jax.block_until_ready(jit_fn(z0))
        best = min(best, (time.time() - t0) / reps)
    return best


def main():
    print("devices:", jax.devices(), flush=True)
    t0 = time.time()
    np.asarray(jnp.ones(8) * 2.0)
    print(f"d2h warm: {time.time()-t0:.1f}s", flush=True)

    rng = np.random.default_rng(0)
    for (k, r) in SHAPES:
        mode = pn.kernel_mode(k, r, False)
        if mode is None:
            print(f"k={k} r={r}: no kernel regime", flush=True)
            continue
        C = rng.standard_normal((k, r))
        x0 = rng.standard_normal(r)
        d = C @ x0 + 1.0 + rng.random(k)          # strict interior at z=x0
        consts = pn.prep_reduced_consts(jnp.asarray(C), jnp.asarray(d))
        tc = jnp.asarray(rng.standard_normal(r))
        z0 = jnp.asarray(x0)
        sig = jnp.asarray(0.5 ** np.arange(64))
        stream = mode == "stream"

        def dir_r0(z):
            dx, g, rn = pn.reduced_newton_dir_prepared(
                consts, tc, z, None, refine=0, stream=stream)
            return z + 1e-12 * dx                 # keep the chain dependent

        def dir_r3(z):
            dx, g, rn = pn.reduced_newton_dir_prepared(
                consts, tc, z, None, refine=3, stream=stream)
            return z + 1e-12 * dx

        def full_step(z):
            xn, nd, s_, acc, rn = pn.reduced_newton_step_prepared(
                consts, tc, z, None, sig, alpha=0.2, refine=3,
                stream=stream)
            return xn

        rows = {}
        for name, fn in [("dir_refine0", dir_r0), ("dir_refine3", dir_r3),
                         ("full_refine3", full_step)]:
            try:
                rows[name] = time_chain(fn, z0) * 1e3
            except Exception as e:
                rows[name] = None
                print(f"k={k} r={r} {name} FAILED: {e!r}", flush=True)
        gram_gflop = 2.0 * k * r * r / 1e9
        print(f"k={k} r={r} mode={mode}: "
              + " ".join(f"{nm}={v:.3f}ms" if v is not None else f"{nm}=FAIL"
                         for nm, v in rows.items())
              + f"  (Gram {gram_gflop:.2f} GFLOP -> "
              f"{gram_gflop/32.8e3*1e3:.3f} ms at f32-eff peak)",
              flush=True)


if __name__ == "__main__":
    main()
