"""AOT-compile every Pallas kernel entry point for the real TPU target.

Interpret-mode tests validate kernel MATH on CPU but cannot catch Mosaic
lowering failures — e.g. the boolean all-reduction in the SOCP line
search lowered to an f64 ``vector.multi_reduction minimumf`` that the
v5e Mosaic backend rejects ("Unsupported element type for the selected
reduction"), found only when the kernel first met hardware.  This
script closes that gap WITHOUT needing a chip claim: on this platform
``jax.jit(...).lower(...).compile()`` routes through the terminal's
chipless TpuAotCompiler, so every kernel x mode combination is compiled
for the true v5e target in seconds.

Run after touching any ops/pallas_*.py:

    PYTHONPATH=/root/repo python scripts/tpu_compile_check.py

Exits nonzero if any combination fails.
"""
import os
import sys
import time
import traceback

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
    except Exception:
        print(f"FAIL {name} ({time.time()-t0:.1f}s)", flush=True)
        traceback.print_exc()
        return False
    print(f"ok   {name} ({time.time()-t0:.1f}s)", flush=True)
    return True


def main():
    rng = np.random.default_rng(0)
    k, r = 24, 16
    C = jnp.asarray(rng.normal(size=(k, r)))
    dvec = jnp.asarray(np.abs(rng.normal(size=k)) + 2.0)
    consts = pn.prep_reduced_consts(C, dvec)
    tc = jnp.asarray(rng.normal(size=r))
    z = jnp.zeros(r, jnp.float64)
    tP = jnp.asarray(np.eye(r))
    sig = jnp.asarray(0.6 ** np.arange(40))
    s0 = jnp.ones(k, jnp.float64)
    lam0 = jnp.ones(k, jnp.float64)

    K, M = 2, 3
    A3 = jnp.asarray(rng.normal(size=(K, M, r)))
    b2 = jnp.asarray(rng.normal(size=(K, M)))
    c2 = jnp.asarray(rng.normal(size=(K, r)))
    d1 = jnp.asarray(np.abs(rng.normal(size=K)) + 5.0)

    class _P:
        pass

    sp = _P()
    sp.A, sp.b, sp.c, sp.d = A3, b2, c2, d1
    sconsts = ps.prep_socp_consts(sp)

    ok = True
    for stream in (False, True):
        tag = "stream" if stream else "resident"
        ok &= _compile(
            f"newton_dir/{tag}/lp",
            lambda tc_, z_, s=stream: pn.reduced_newton_dir_prepared(
                consts, tc_, z_, None, stream=s), tc, z)
        ok &= _compile(
            f"newton_step/{tag}/lp",
            lambda tc_, z_, s=stream: pn.reduced_newton_step_prepared(
                consts, tc_, z_, None, sig, alpha=0.2, stream=s), tc, z)
        ok &= _compile(
            f"newton_step/{tag}/qp",
            lambda tc_, z_, tP_, s=stream: pn.reduced_newton_step_prepared(
                consts, tc_, z_, tP_, sig, alpha=0.2, stream=s), tc, z, tP)
        ok &= _compile(
            f"pd_step/{tag}/lp",
            lambda q_, z_, s_, l_, s=stream: ppd.pd_step_prepared(
                consts, q_, z_, s_, l_, None, stream=s), tc, z, s0, lam0)
        ok &= _compile(
            f"pd_step/{tag}/qp",
            lambda q_, z_, s_, l_, tP_, s=stream: ppd.pd_step_prepared(
                consts, q_, z_, s_, l_, tP_, stream=s), tc, z, s0, lam0, tP)

    ok &= _compile(
        "socp_step/lp",
        lambda tq_, z_: ps.socp_newton_step_prepared(
            sconsts, tq_, z_, None, sig, alpha=0.2), tc, z)
    ok &= _compile(
        "socp_step/qp",
        lambda tq_, z_, tP_: ps.socp_newton_step_prepared(
            sconsts, tq_, z_, tP_, sig, alpha=0.2), tc, z, tP)

    # fused dense-KKT direction kernel (eq + no-eq)
    pe = 4
    Hd = jnp.asarray(np.eye(r) * 2.0 + 0.1)
    F1 = jnp.asarray(rng.normal(size=(pe, r)))
    rpe1 = jnp.asarray(rng.normal(size=pe))
    kc_eq = pk.prep_kkt_consts(F1, r)
    kc_ne = pk.prep_kkt_consts(None, r)

    def _kkt(HH, r1_, rpe_):
        Hhi, Hlo = pk.prep_kkt_h(HH, r)
        return pk.kkt_dir_prepared(Hhi, Hlo, kc_eq, r1_, rpe_)

    def _kkt0(HH, r1_):
        Hhi, Hlo = pk.prep_kkt_h(HH, r)
        return pk.kkt_dir_prepared(Hhi, Hlo, kc_ne, r1_)

    ok &= _compile("kkt_dir/eq", _kkt, Hd, tc, rpe1)
    ok &= _compile("kkt_dir/noeq", _kkt0, Hd, tc)

    if not ok:
        sys.exit(1)
    print("all kernels compile for the TPU target", flush=True)


if __name__ == "__main__":
    main()
