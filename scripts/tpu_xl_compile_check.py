"""AOT-compile the XL split-pipeline steps at the target benchmark
shapes (no chip claim needed — the terminal's chipless TpuAotCompiler
reports exact VMEM budgets).  This is how the spill-aware _xl_ch model
was calibrated: the first xl cut compiled 133.7 MB of register-
allocator spill slots at ch=256, rp=1920 (~70 words of ch*rp, 5x the
hand-counted dd temporaries) and OOM'd the 128 MB VMEM.

Arrays are passed as jit ARGUMENTS: closure-captured (k, r)-sized
constants get EMBEDDED in the MLIR payload and the remote-compile
endpoint rejects >100 MB bodies (HTTP 413).

    PYTHONPATH=/root/repo python scripts/tpu_xl_compile_check.py
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
from interiorpoint_tpu.ops import pallas_socp as ps  # noqa: E402
from interiorpoint_tpu.ops import pallas_xl as px  # noqa: E402
from interiorpoint_tpu.ops.pallas_newton import ReducedConsts  # noqa: E402
from interiorpoint_tpu.ops.pallas_socp import SOCPConsts  # noqa: E402
from interiorpoint_tpu.models.problem import make_socp  # noqa: E402


def _compile(name, fn, *args):
    t0 = time.time()
    try:
        jax.jit(fn).lower(*args).compile()
    except Exception as e:
        msg = str(e)
        cut = msg.find("Largest program allocations")
        print(f"FAIL {name} ({time.time()-t0:.1f}s): "
              f"{msg[:cut if cut > 0 else 600]}", flush=True)
        return False
    print(f"ok   {name} ({time.time()-t0:.1f}s)", flush=True)
    return True


def main():
    ok = True
    sig = jnp.asarray(0.5 ** np.arange(40))

    # LP n=10000-class reduced shape: k=22000, r=2000 (+ QP variant)
    for (k, r, qp) in [(22000, 2000, False), (6600, 1800, True)]:
        rng = np.random.default_rng(0)
        C = rng.standard_normal((k, r)) * 0.1
        consts0 = pn.prep_reduced_consts(jnp.asarray(C),
                                         jnp.ones(k, jnp.float64))
        tP0 = jnp.eye(r, dtype=jnp.float64) if qp else None
        print(f"# lp/qp-xl k={k} r={r} qp={qp}: ch="
              f"{px._xl_ch(pn._pad(r), qp)}", flush=True)

        def step(Chi, Clo, dhi, dlo, tc_, z_, tP_):
            c2 = ReducedConsts(Chi, Clo, dhi, dlo, k=k, r=r)
            return px.reduced_newton_step_xl_prepared(
                c2, tc_, z_, tP_, sig, alpha=0.2)

        ok &= _compile(
            f"lp/qp-xl step k={k} r={r} qp={qp}", step, consts0.Chi,
            consts0.Clo, consts0.dhi, consts0.dlo,
            jnp.zeros(r, jnp.float64), jnp.zeros(r, jnp.float64), tP0)

    # SOCP n=3000-class: K=5, M=2401, r=2950, with P (the benchmark
    # recipe is quadratic)
    K, M, r = 5, 2401, 2950
    rng = np.random.default_rng(1)
    A = [rng.standard_normal((M, r)) * 0.05 for _ in range(K)]
    b = [rng.standard_normal(M) for _ in range(K)]
    c = [rng.standard_normal(r) * 0.05 for _ in range(K)]
    d = [float(2 * M)] * K
    Pm = np.eye(r)
    q = rng.standard_normal(r)
    prob = make_socp(A, b, c, d, Pm, q, None, None, None, None,
                     dtype=jnp.float64)
    sconsts = ps.prep_socp_consts(prob)
    print(f"# socp-xl K={K} M={M} r={r} P=True: ch="
          f"{px._xl_ch(pn._pad(r), True)} supported="
          f"{px.xl_socp_supported(K, M, r, True)}", flush=True)

    def sstep(Ahi, Alo, bhi, blo, E, chi, clo, dhi, dlo, tq_, z_, tP_):
        c2 = SOCPConsts(Ahi=Ahi, Alo=Alo, bhi=bhi, blo=blo, E=E,
                        chi=chi, clo=clo, dhi=dhi, dlo=dlo,
                        K=K, M=M, r=r)
        return px.socp_newton_step_xl_prepared(
            c2, tq_, z_, tP_, sig, alpha=0.2)

    ok &= _compile(
        f"socp-xl step K={K} M={M} r={r} P=True", sstep, sconsts.Ahi,
        sconsts.Alo, sconsts.bhi, sconsts.blo, sconsts.E, sconsts.chi,
        sconsts.clo, sconsts.dhi, sconsts.dlo,
        jnp.zeros(r, jnp.float64), jnp.zeros(r, jnp.float64),
        jnp.asarray(10.0 * Pm))

    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
