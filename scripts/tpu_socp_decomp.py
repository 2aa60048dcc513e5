"""Decompose the SOCP fused-step and conic-Mehrotra per-iteration
costs on hardware (RTT-adjusted).

Hypotheses from the latency probe + round-4b rooflines:
  * socp barrier step measured 7.3 ms real at rp=1024 where the LP
    stream step is 2.2 ms at the same rp with 2.75x the rows — suspect
    the dd-PCG stall escalation fires every chained step (48 sequential
    dd passes) rather than intrinsic pass cost.
  * socp-pd spends ~15 ms/Mehrotra-iteration where its two fused KKT
    directions cost ~2 ms — suspect the Schur-CG's 24 rounds each pay a
    full dd-refined H-solve whose own PCG escalates late.

    timeout 9000 python scripts/tpu_socp_decomp.py
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
import bench  # noqa: E402


def main():
    print("devices:", jax.devices(), flush=True)
    t0 = time.time()
    np.asarray(jnp.ones(8) * 2.0)
    print(f"d2h warm: {time.time()-t0:.1f}s", flush=True)
    rtt = bench.tunnel_rtt()
    print(f"# RTT: {rtt*1e3:.2f} ms", flush=True)

    from interiorpoint_tpu import SOCPSolver
    from interiorpoint_tpu.ops import pallas_socp as ps
    from interiorpoint_tpu.utils.generators import generate_socp

    np.random.seed(1)
    p = generate_socp(1000)
    x0 = p.pop("x0")
    solver = SOCPSolver(**p, suppress_print=True, check_cvxpy=False,
                        epsilon=1e-4, t0="auto", dtype="float64")
    rf = solver._reduced
    sprob = rf.prob
    K, M, r = sprob.A.shape
    consts = ps.prep_socp_consts(sprob)
    z0 = rf.basis.N.T @ (jnp.asarray(x0) - rf.basis.x_p)
    dt64 = solver.cfg.jnp_dtype
    t = jnp.asarray(10.0, dt64)
    tq = (t * sprob.q if sprob.q is not None else jnp.zeros((r,), dt64))
    tP = t * sprob.P if sprob.P is not None else None
    sig = jnp.asarray(0.6 ** np.arange(40))

    # 1. SOCP fused-step variants: dir_tol x refine — if loose dir_tol
    # collapses the step time, the escalation fires every step.
    for dir_tol, refine in [(1e-6, 3), (1e-2, 3), (1e-2, 6), (1e-6, 6)]:
        def step(z, dir_tol=dir_tol, refine=refine):
            xn, _, _, _, _, _ = ps.socp_newton_step_prepared(
                consts, tq, z, tP, sig, alpha=0.2, refine=refine,
                dir_tol=dir_tol)
            return xn

        def chain(z):
            return lax.fori_loop(0, 30, lambda i, zc: step(zc), z)

        jc = jax.jit(chain)
        jax.block_until_ready(jc(z0))
        t0 = time.time()
        jax.block_until_ready(jc(z0))
        per = (time.time() - t0 - rtt) / 30
        print(f"# socp step dir_tol={dir_tol:.0e} refine={refine}: "
              f"{per*1e3:.3f} ms/step", flush=True)

    # also: the stats of a single step at the solver's real start (does
    # the direction stall at this conditioning?)
    xn, nd, sg, acc, ok, _dx = jax.jit(
        lambda z: ps.socp_newton_step_prepared(
            consts, tq, z, tP, sig, alpha=0.2))(z0)
    print(f"# socp single-step stats at z0: nd={float(nd):.3e} "
          f"sigma={float(sg):.4f} dir_ok={bool(ok)}", flush=True)

    # 2. socp-pd KKT tolerance ladder
    from interiorpoint_tpu.models.problem import make_socp
    from interiorpoint_tpu.ops.socp_pd import cone_operator, socp_pd_solve
    from interiorpoint_tpu.utils.config import SolverConfig

    prob = make_socp(A=p["A"], b=p["b"], c=p["c"], d=p["d"],
                     P=p["P"], q=p["q"], F=p["F"], g=p["g"])
    G, h, qv = cone_operator(prob)
    cfg = SolverConfig(epsilon=1e-4)
    kw = dict(P=jnp.asarray(p["P"]), F=jnp.asarray(p["F"]),
              g=jnp.asarray(p["g"]))
    for label, tols in [("tight(default)", None),
                        ("cg1e-10", (1e-6, 1e-10, 24)),
                        ("cg1e-13-r12", (1e-6, 1e-13, 12)),
                        ("mid(1e-5,1e-11,16)", (1e-5, 1e-11, 16))]:
        try:
            f = jax.jit(lambda x0_, tols=tols: socp_pd_solve(
                G, h, qv, x0_, cfg, kkt_tols=tols, **kw))
            x0j = jnp.asarray(x0)
            res = f(x0j)
            jax.block_until_ready(res.x)
            t0 = time.time()
            res = f(x0j)
            jax.block_until_ready(res.x)
            dt = time.time() - t0 - rtt
            print(f"# socp_pd n=1000 {label}: {dt:.4f}s iters="
                  f"{int(res.iters)} conv={bool(res.converged)} "
                  f"gap={float(res.gap):.2e} rp={float(res.rp_norm):.2e} "
                  f"rd={float(res.rd_norm):.2e}", flush=True)
        except Exception as e:
            print(f"# socp_pd {label} FAILED: {type(e).__name__}: "
                  f"{str(e)[:250]}", flush=True)


if __name__ == "__main__":
    main()
