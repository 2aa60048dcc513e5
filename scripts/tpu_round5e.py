"""Round-5e: socp-pd decomposition at n=1000 — where do the 206 ms go?

The null-space reduction removed the per-direction Schur-CG, yet
socp1000_pd measures 0.206 s vs barrier 0.076 s (round5c).  The fused
KKT kernel's chained step is 0.76 ms (round4e roofline), so ~15
Mehrotra iterations should cost ~25 ms.  This probe reads the actual
iteration count/convergence from the result pytree and times the
per-iteration pieces.

    timeout 6000 python scripts/tpu_round5e.py 2>&1 | tee benchmarks/results/round5e_raw.log
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
    for attempt in range(6):
        try:
            np.asarray(jnp.ones(8) * 2.0)
            break
        except Exception as e:
            print(f"d2h warm attempt {attempt} failed: "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)
            time.sleep(60)
    print(f"d2h warm: {time.time()-t0:.1f}s", flush=True)
    rtt = bench.tunnel_rtt()
    print(f"# RTT: {rtt*1e3:.2f} ms", flush=True)

    from interiorpoint_tpu import SOCPSolver
    from interiorpoint_tpu.utils.generators import generate_socp

    np.random.seed(1)
    p = generate_socp(1000)
    x0 = p.pop("x0")
    solver = SOCPSolver(
        **p, suppress_print=True, check_cvxpy=False, epsilon=1e-4, mu=15,
        t0="auto", max_inner_iters=500, max_outer_iters=20, beta=0.5,
        alpha=0.05, x0=x0, algorithm="pd")
    solver.solve()
    t1 = time.time()
    solver.solve()
    dt = time.time() - t1 - rtt
    m = solver.last_metrics
    print(f"# socp1000_pd: {dt:.4f}s iters={m['outer_iters']} "
          f"extra={m.get('extra')}", flush=True)

    # per-direction cost in isolation: chain the fused KKT direction at
    # the solve's reduced shape with a REPRESENTATIVE H (from the first
    # NT iteration), 40 chained calls
    rf = solver._reduced
    pprob = rf.prob
    from interiorpoint_tpu.ops.socp_pd import cone_operator
    from interiorpoint_tpu.ops.pallas_kkt import (kkt_dir_prepared,
                                                  kkt_supported,
                                                  prep_kkt_consts,
                                                  prep_kkt_h)
    G, h, qv = cone_operator(pprob)
    K, M1, r = G.shape
    print(f"# reduced shape: K={K} M1={M1} r={r} "
          f"kkt_supported={kkt_supported(r, 0)}", flush=True)
    dtype = G.dtype
    # representative SPD H: Gram of the stacked map + I
    Gf = G.reshape(K * M1, r)
    H = (Gf.T @ Gf + jnp.eye(r, dtype=dtype))
    Hhi, Hlo = prep_kkt_h(H, r)
    consts = prep_kkt_consts(None, r)
    r1 = jnp.asarray(np.random.standard_normal(r))

    def chain(r1_):
        def body(i, acc):
            dx, _, _, _ = kkt_dir_prepared(Hhi, Hlo, consts, acc,
                                           None, dir_tol=1e-6,
                                           cg_tol=1e-13, rounds=24)
            return acc + 1e-6 * dx
        return jax.lax.fori_loop(0, 40, body, r1_)

    jc = jax.jit(chain)
    jax.block_until_ready(jc(r1))
    t0 = time.time()
    jax.block_until_ready(jc(r1))
    per = (time.time() - t0 - rtt) / 40
    print(f"# kkt dir (pe=0) chained: {per*1e3:.3f} ms/direction",
          flush=True)

    # H assembly + NT-algebra cost per iteration, isolated: run the pd
    # solve body's einsums at the same shapes
    jsign = jnp.concatenate([jnp.ones((1,), dtype),
                             -jnp.ones((M1 - 1,), dtype)])
    t0 = time.time()
    JG = jnp.einsum("m,kmn,kmo->kno", jsign, G, G,
                    precision=jax.lax.Precision.HIGHEST)
    jax.block_until_ready(JG)
    print(f"# JG precompute: {time.time()-t0-rtt:.3f}s", flush=True)

    @jax.jit
    def iter_glue(z):
        wt = jnp.ones((K, M1), dtype)
        qk = jnp.einsum("kmn,km->kn", G, wt,
                        precision=jax.lax.Precision.HIGHEST)
        Hx = (2.0 * jnp.einsum("kn,ko->no", qk, qk,
                               precision=jax.lax.Precision.HIGHEST)
              - jnp.einsum("k,kno->no", jnp.ones((K,), dtype), JG,
                           precision=jax.lax.Precision.HIGHEST))
        rd = qv - jnp.einsum("kmn,km->n", G, z,
                             precision=jax.lax.Precision.HIGHEST)
        rp_ = jnp.einsum("kmn,n->km", G, rd[:r],
                         precision=jax.lax.Precision.HIGHEST)
        return Hx, rd, rp_

    z0 = jnp.ones((K, M1), dtype)
    jax.block_until_ready(iter_glue(z0))
    t0 = time.time()
    for _ in range(10):
        out = iter_glue(z0)
    jax.block_until_ready(out)
    print(f"# per-iteration glue (H assembly + residual einsums): "
          f"{(time.time()-t0)/10*1e3:.2f} ms (incl dispatch)", flush=True)


if __name__ == "__main__":
    main()
