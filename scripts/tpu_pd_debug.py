"""Per-iteration trace of the fused PD kernel on the benchmark recipes.

The XLA f64 engine converges in ~10 Mehrotra iterations on the QP
n=1000 benchmark recipe, but the fused kernel path ran the full 60 on
hardware (0.32 s) — this script steps ``pd_step_prepared`` from Python
on the real chip and prints [gap, rp, rd, ap, ad, sigma, srn2, sbn2]
per iteration to show which exit criterion never fires.

    PYTHONPATH=/root/repo python scripts/tpu_pd_debug.py [lp|qp] [n]
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

SUITE = sys.argv[1] if len(sys.argv) > 1 else "qp"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 1000


def main():
    from interiorpoint_tpu import LPSolver, QPSolver
    from interiorpoint_tpu.ops.pallas_newton import prep_reduced_consts
    from interiorpoint_tpu.ops.pallas_pd import pd_step_prepared, \
        pd_kernel_mode

    print("devices:", jax.devices(), flush=True)
    t0 = time.time()
    np.asarray(jnp.ones(8) * 2.0)
    print(f"d2h warm: {time.time()-t0:.1f}s", flush=True)

    n = N
    m = int(0.8 * n)
    np.random.seed(1)
    A = np.random.uniform(-2, 2, (m, n))
    x_feas = np.random.uniform(-2, 2, n)
    if SUITE == "qp":
        Pp = np.random.uniform(-2, 2, (m, n))
        P = Pp.T @ Pp + np.eye(n)
        C = np.random.uniform(-2, 2, (20, n))
        solver = QPSolver(P=P, q=np.random.uniform(-2, 2, n), A=A,
                          b=A @ x_feas, C=C, d=C @ x_feas,
                          lower_bound=-3, upper_bound=3, epsilon=1e-8,
                          suppress_print=True, check_cvxpy=False)
    else:
        C = np.random.uniform(-2, 2, (int(0.2 * n), n))
        solver = LPSolver(c=np.random.uniform(-2, 2, n), A=A, b=A @ x_feas,
                          C=C, d=C @ x_feas, lower_bound=-3, upper_bound=3,
                          epsilon=1e-4, suppress_print=True,
                          check_cvxpy=False)

    rf = solver._reduced
    prob = rf.prob
    Cz, dz = prob.C, prob.d
    Pz = getattr(prob, "P", None)
    k, r = Cz.shape
    mode = pd_kernel_mode(k, r, Pz is not None)
    print(f"reduced k={k} r={r} pd-kernel mode={mode}", flush=True)
    consts = prep_reduced_consts(Cz, dz)
    q = prob.c if Pz is None else (prob.q if prob.q is not None
                                   else jnp.zeros(r))
    tP = None if Pz is None else jnp.asarray(Pz)

    # same start the fused driver builds (ops/pd.py pd_solve_fused)
    z0 = jnp.asarray(np.asarray(rf.basis.N.T @ (jnp.asarray(x_feas)
                                                - rf.basis.x_p)))
    s_hat = dz - Cz @ z0
    floor = 1e-4 * (1.0 + jnp.max(jnp.abs(dz)))
    smin = jnp.min(s_hat)
    delta = jnp.where(smin < floor, -1.5 * jnp.minimum(smin, 0.0) + floor,
                      0.0)
    s = jnp.maximum(s_hat + delta, floor)
    lam = jnp.clip(1.0 / s, 1e-6, 1e6)
    z = z0

    step = jax.jit(lambda z_, s_, l_: pd_step_prepared(
        consts, q, z_, s_, l_, tP, refine=3, stream=mode == "stream"))

    names = ["gap", "rp", "rd", "ap", "ad", "sigma", "srn2", "sbn2",
             "gap_pre", "rp_pre", "rd_pre", "pad"]
    for it in range(60):
        z, s, lam, stats = step(z, s, lam)
        row = np.asarray(stats)
        msg = " ".join(f"{nm}={v:.3e}" for nm, v in zip(names, row))
        print(f"it={it:2d} {msg}", flush=True)
        if not np.all(np.isfinite(row)):
            print("non-finite stats; stopping", flush=True)
            break


if __name__ == "__main__":
    main()
