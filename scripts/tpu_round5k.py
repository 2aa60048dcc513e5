"""Round-5k: final hardware validation after the block-LDL factor —
the vmapped batched engine (vmap-of-pallas now lowers the hybrid
kernel) and the graft entry's single-chip compile.

    timeout 6000 python scripts/tpu_round5k.py 2>&1 | tee benchmarks/results/round5k_raw.log
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
        res = solve_batch(stack_problems(probs), np.zeros((B, nn)), cfg)
        vals = np.asarray(res.value)
        err = max(abs(v - rv) / max(abs(rv), 1) for v, rv in
                  zip(vals, refs))
        print(f"# vmap_ldl_batch B={B}: max rel err {err:.2e} "
              f"wall {time.time()-t0:.0f}s", flush=True)
    except Exception as e:
        print(f"# vmap_ldl_batch FAILED: {type(e).__name__}: "
              f"{str(e)[:400]}", flush=True)

    try:
        import __graft_entry__ as g
        fn, a = g.entry()
        t0 = time.time()
        jax.block_until_ready(jax.jit(fn)(*a))
        print(f"# graft entry single-chip: OK {time.time()-t0:.0f}s",
              flush=True)
    except Exception as e:
        print(f"# graft entry FAILED: {type(e).__name__}: "
              f"{str(e)[:400]}", flush=True)


if __name__ == "__main__":
    main()
