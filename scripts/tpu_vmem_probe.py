"""AOT-compile the benchmark-critical Pallas kernel shapes against the
chipless TPU compiler and report pass/VMEM-overflow — the fast iteration
loop for VMEM trims (no chip claim needed).

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_vmem_probe.py
"""
import os
import re
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ip_tpu_jax_cache")

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from interiorpoint_tpu.ops import pallas_newton as pn  # noqa: E402
from interiorpoint_tpu.ops import pallas_pd as ppd  # noqa: E402
from interiorpoint_tpu.ops import pallas_socp as ps  # noqa: E402
from interiorpoint_tpu.ops import pallas_kkt as pk  # noqa: E402


def _compile(name, fn, *args):
    t0 = time.time()
    try:
        jax.jit(fn).lower(*args).compile()
    except Exception as e:
        msg = str(e)
        m = re.search(r"Used ([\d.]+)M of 128.00M", msg)
        detail = f"VMEM {m.group(1)}M" if m else msg.splitlines()[0][:120]
        print(f"FAIL {name} ({time.time()-t0:.1f}s): {detail}", flush=True)
        return False
    print(f"ok   {name} ({time.time()-t0:.1f}s)", flush=True)
    return True


def main():
    rng = np.random.default_rng(0)
    ok = True

    # --- pd stream kernels at the n=5000 benchmark shape ----------------
    k, r = 11000, 1000
    C = jnp.asarray(rng.normal(size=(k, r)) * 0.01)
    dvec = jnp.asarray(np.abs(rng.normal(size=k)) + 2.0)
    consts = pn.prep_reduced_consts(C, dvec)
    q = jnp.asarray(rng.normal(size=r))
    z = jnp.zeros(r, jnp.float64)
    s0 = jnp.ones(k, jnp.float64)
    lam0 = jnp.ones(k, jnp.float64)
    tP = jnp.asarray(np.eye(r))

    print(f"# pd stream shapes: k={k} r={r} "
          f"mode_lp={ppd.pd_kernel_mode(k, r, False)} "
          f"mode_qp={ppd.pd_kernel_mode(k, r, True)}", flush=True)
    ok &= _compile("pd_step/stream/lp@5000",
                   lambda qq, zz, ss, ll: ppd.pd_step_prepared(
                       consts, qq, zz, ss, ll, None, stream=True),
                   q, z, s0, lam0)
    ok &= _compile("pd_step/stream/qp@5000",
                   lambda qq, zz, ss, ll: ppd.pd_step_prepared(
                       consts, qq, zz, ss, ll, tP, stream=True),
                   q, z, s0, lam0)

    # --- SOCP barrier kernel at the n=1000 benchmark shape ---------------
    from interiorpoint_tpu.models.problem import make_socp
    K, M, rs = 5, 800, 950
    A = rng.normal(size=(K, M, rs)) * 0.01
    b = rng.normal(size=(K, M))
    cS = rng.normal(size=(K, rs))
    dS = np.abs(rng.normal(size=K)) + 50.0
    sprob = make_socp(A=list(A), b=list(b), c=list(cS), d=list(dS))
    sconsts = ps.prep_socp_consts(sprob)
    tq = jnp.asarray(rng.normal(size=rs))
    zs = jnp.zeros(rs, jnp.float64)
    tPs = jnp.asarray(np.eye(rs))
    sig = jnp.asarray(0.6 ** np.arange(40))
    print(f"# socp shape: K={K} M={M} r={rs} "
          f"supported={ps.supported(K, M, rs, True)}", flush=True)
    ok &= _compile("socp_step@1000",
                   lambda tqq, zz: ps.socp_newton_step_prepared(
                       sconsts, tqq, zz, tPs, sig, alpha=0.05),
                   tq, zs)

    # --- fused KKT direction kernel at the socp-pd n=1000 shape -----------
    n_k, pe = 1000, 50
    Mh = rng.normal(size=(n_k, n_k))
    H = jnp.asarray(Mh @ Mh.T + np.eye(n_k))
    F = jnp.asarray(rng.normal(size=(pe, n_k)))
    r1 = jnp.asarray(rng.normal(size=n_k))
    rpe = jnp.asarray(rng.normal(size=pe))
    kc = pk.prep_kkt_consts(F, n_k)
    print(f"# kkt shape: n={n_k} pe={pe} "
          f"supported={pk.kkt_supported(n_k, pe)}", flush=True)

    def kkt_fn(HH, rr1, rrpe):
        Hhi, Hlo = pk.prep_kkt_h(HH, n_k)
        return pk.kkt_dir_prepared(Hhi, Hlo, kc, rr1, rrpe)

    ok &= _compile("kkt_dir@1000", kkt_fn, H, r1, rpe)

    def kkt_fn0(HH, rr1):
        Hhi, Hlo = pk.prep_kkt_h(HH, n_k)
        return pk.kkt_dir_prepared(Hhi, Hlo, pk.prep_kkt_consts(None, n_k),
                                   rr1)

    ok &= _compile("kkt_dir_noeq@1000", kkt_fn0, H, r1)

    # --- barrier Newton kernels (regression guard for trims) -------------
    k2, r2 = 2200, 200
    C2 = jnp.asarray(rng.normal(size=(k2, r2)) * 0.01)
    d2 = jnp.asarray(np.abs(rng.normal(size=k2)) + 2.0)
    c2 = pn.prep_reduced_consts(C2, d2)
    tc2 = jnp.asarray(rng.normal(size=r2))
    z2 = jnp.zeros(r2, jnp.float64)
    sig2 = jnp.asarray(0.6 ** np.arange(64))
    ok &= _compile("newton_step/resident@1000",
                   lambda tcc, zz: pn.reduced_newton_step_prepared(
                       c2, tcc, zz, None, sig2, alpha=0.2),
                   tc2, z2)
    ok &= _compile("newton_step/stream@5000",
                   lambda tcc, zz: pn.reduced_newton_step_prepared(
                       consts, tcc, zz, None,
                       jnp.asarray(0.6 ** np.arange(64)), alpha=0.2,
                       stream=True),
                   jnp.asarray(rng.normal(size=r)), z)

    print("ALL OK" if ok else "FAILURES", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
